package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.queries.Fixtures

/** Fixture-drift tripwire: if the driver regenerates /root/testdata with a
  * changed schema, fail HERE with the table name — not as dozens of opaque
  * query errors (round 8 lost 28 correctness rows to a silent events
  * ts-type change from TIMESTAMP(NANOS) to timestamp[us]). */
class FixturesSpec extends SparkFunSuite {
  private val dir = "/root/testdata/sf0.001"

  test("every driver fixture table reads with a non-empty schema") {
    for (n <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val df =
        try Fixtures.table(spark, dir, n)
        catch { case scala.util.control.NonFatal(e) =>
          fail(s"fixture table '$n' unreadable (driver fixture drift?): ${e.getMessage}")
        }
      assert(df.schema.nonEmpty, s"fixture '$n' has an empty schema")
    }
  }

  test("events dispatch: a BIGINT nanos ts goes through the div-1000 shim") {
    // the TIMESTAMP(NANOS) generation of the fixture surfaces ts as BIGINT
    // under nanosAsLong; the on-disk fixture is currently timestamp[us],
    // so pin the long branch against a synthesized table
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("fx_nanos").toString
    Seq((1L, 1700000000123456000L), (2L, 1700000000987654000L))
      .toDF("event_id", "ts").write.parquet(s"$tmp/events.parquet")
    val df = Fixtures.events(spark, tmp)
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(1700000000123456L, 1700000000987654L),
      "nanos → µs must be lossless integer division")
  }

  test("every engine base frame analyzes; events.ts normalizes to TIMESTAMP") {
    val bases: Seq[(String, () => DataFrame)] = Seq(
      "events" -> (() => Fixtures.events(spark, dir)),
      "stage" -> (() => Fixtures.stage(spark, dir)),
      "production" -> (() => Fixtures.production(spark, dir)),
      "harvest" -> (() => Fixtures.harvest(spark, dir)))
    for ((n, f) <- bases) {
      val df =
        try { val d = f(); d.queryExecution.analyzed; d }
        catch { case scala.util.control.NonFatal(e) =>
          fail(s"base frame '$n' fails analysis (driver fixture drift? " +
            s"check $dir vs Fixtures.scala): ${e.getMessage}")
        }
      if (n == "events")
        assert(df.schema("ts").dataType === TimestampType,
          s"events.ts must normalize to TIMESTAMP whatever the fixture's " +
            s"physical type; got ${df.schema("ts").dataType}")
    }
  }
}
