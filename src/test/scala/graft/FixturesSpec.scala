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
        catch { case e: Throwable =>
          fail(s"fixture table '$n' unreadable (driver fixture drift?): ${e.getMessage}")
        }
      assert(df.schema.nonEmpty, s"fixture '$n' has an empty schema")
    }
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
        catch { case e: Throwable =>
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
