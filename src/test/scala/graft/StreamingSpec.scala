package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streaming

/** ST1 — file-source catch-up and event-time windows. */
class StreamingSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("catchUp processes all files once, and nothing on a second run (idempotency)") {
    val base = Files.createTempDirectory("st1_spec").toString
    val src = s"$base/src"; val out = s"$base/out"; val cp = s"$base/cp"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(src)
    val schema = spark.read.parquet(src).schema

    Streaming.catchUp(spark, src, schema, cp, out)
    assert(spark.read.schema(schema).parquet(out).count() === 2)

    // second run with the same checkpoint: no new files → no new rows
    Streaming.catchUp(spark, src, schema, cp, out)
    assert(spark.read.schema(schema).parquet(out).count() === 2)

    // a newly arrived file IS picked up (the reference's S2 skip-if-processed,
    // but tracked by the checkpoint log, not per-file head-object probes)
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(src)
    Streaming.catchUp(spark, src, schema, cp, out)
    assert(spark.read.schema(schema).parquet(out).count() === 3)
  }

  test("tumblingCounts buckets by event time") {
    val df = Seq((ts(1), "view"), (ts(2), "view"), (ts(61), "view"), (ts(61), "click"))
      .toDF("ts", "event_type")
    val got = Streaming.tumblingCounts(df, "ts", "1 hour", Seq("event_type"))
      .orderBy("bucket", "event_type").collect()
    assert(got.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSeq
      === Seq(("view", 2L), ("click", 1L), ("view", 1L)))
  }

  test("streamingTumbling aggregates a stream with a watermark (memory sink)") {
    val base = Files.createTempDirectory("st1_stream").toString
    Seq((ts(1), "view"), (ts(2), "view"), (ts(61), "click"))
      .toDF("ts", "event_type").write.parquet(s"$base/src")
    val schema = spark.read.parquet(s"$base/src").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/src")
    val agg = Streaming.streamingTumbling(stream, "ts", "1 hour", "2 hours", Seq("event_type"))
    val q = agg.writeStream.format("memory").queryName("st1_mem")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("st1_mem").orderBy("bucket", "event_type").collect()
    assert(got.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSeq
      === Seq(("view", 2L), ("click", 1L)))
  }
}
