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

  test("catchUp with maxFilesPerTrigger drains a backlog in bounded batches") {
    val base = Files.createTempDirectory("st1_throttle").toString
    val src = s"$base/src"; val out = s"$base/out"; val cp = s"$base/cp"
    for (i <- 1 to 4)
      Seq((i.toLong, s"v$i")).toDF("id", "v").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    Streaming.catchUp(spark, src, schema, cp, out, maxFilesPerTrigger = Some(1))
    assert(spark.read.schema(schema).parquet(out).count() === 4,
      "AvailableNow must still drain the whole backlog")
    // each committed micro-batch leaves one file in commits/: 1 file per
    // trigger -> at least 4 commits (vs exactly 1 for the unthrottled run)
    val commits = new java.io.File(s"$cp/commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(commits >= 4, s"expected >= 4 bounded micro-batches, saw $commits")
  }

  test("tumblingCounts buckets by event time") {
    val df = Seq((ts(1), "view"), (ts(2), "view"), (ts(61), "view"), (ts(61), "click"))
      .toDF("ts", "event_type")
    val got = Streaming.tumblingCounts(df, "ts", "1 hour", Seq("event_type"))
      .orderBy("bucket", "event_type").collect()
    assert(got.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSeq
      === Seq(("view", 2L), ("click", 1L), ("view", 1L)))
  }

  test("statefulSessionCounts carries state across micro-batches (mapGroupsWithState)") {
    val base = Files.createTempDirectory("st1_state").toString
    import spark.implicits._
    // two files → two micro-batches with maxFilesPerTrigger=1; user 1's
    // session must NOT reset at the batch boundary (10:00 → 10:10 same
    // session), and the 40-min gap within batch 2 must open a new one.
    Seq((1L, 600_000_000L, 1L), (1L, 1_200_000_000L, 2L))
      .toDF("user_id", "ts_us", "event_id").write.parquet(s"$base/src/f1")
    Seq((1L, 1_800_000_000L, 3L), (1L, 4_500_000_000L, 4L), (2L, 0L, 5L))
      .toDF("user_id", "ts_us", "event_id").write.parquet(s"$base/src/f2")
    val schema = spark.read.parquet(s"$base/src/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src/*")
      .as[graft.streaming.SessionEvent]
    val q = Streaming.statefulSessionCounts(stream, 1800L * 1000000L)
      .writeStream.format("memory").queryName("sessions_mem")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val last = spark.table("sessions_mem")
      .groupBy("user_id").agg(max("n_sessions").as("s"), max("n_events").as("e"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(last(1L) === ((2L, 4L))) // one session spanning the batch seam + one after the gap
    assert(last(2L) === ((1L, 1L)))
  }

  test("statefulSessionCounts on a batch Dataset matches the window-function sessionizer") {
    import spark.implicits._
    val micros = Seq((1L, 0L, 1L), (1L, 100_000_000L, 2L), (1L, 4_000_000_000L, 3L),
      (2L, 0L, 4L), (3L, 0L, 5L), (3L, 1_900_000_000L, 6L))
    val ds = micros.toDF("user_id", "ts_us", "event_id").as[graft.streaming.SessionEvent]
    val stateful = Streaming.statefulSessionCounts(ds, 1800L * 1000000L)
      .collect().map(s => s.user_id -> ((s.n_sessions, s.n_events))).toMap
    assert(stateful === Map(1L -> ((2L, 3L)), 2L -> ((1L, 1L)), 3L -> ((2L, 2L))))
  }

  test("statefulSessionCounts handles a 50k-event skewed user on the registered path") {
    // the per-batch buffer is one primitive long per event (8 B/event, no
    // boxed Seq) — a pathological user in ONE batch slice must fold fine;
    // events arrive shuffled to exercise the in-batch timestamp sort
    import spark.implicits._
    val gap = 1800L * 1000000L
    val rows = scala.util.Random.shuffle(
      (0 until 50000).map(i => (7L, i.toLong * 1000L + (i / 10000L) * 2 * gap, i.toLong))
        .toVector)
    val ds = rows.toDF("user_id", "ts_us", "event_id").as[graft.streaming.SessionEvent]
    val got = Streaming.statefulSessionCounts(ds, gap)
      .collect().map(s => s.user_id -> ((s.n_sessions, s.n_events))).toMap
    // 5 blocks of 10k events, each block separated by > gap
    assert(got === Map(7L -> ((5L, 50000L))))
  }

  test("sortedSessionCounts streams a skewed user without materializing the group") {
    import spark.implicits._
    // user 1: 50k events in 1-min steps with a >30-min gap every 1000th
    // event; user 2: a single event.  The secondary-sort fold must match the
    // window-function sessionizer exactly.
    val skew = (0 until 50000).map { i =>
      val gaps = i / 1000 // completed gaps before event i
      (1L, Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
        + i * 60_000_000L + gaps * 3600_000_000L, i.toLong)
    } :+ ((2L, 0L, 99999L))
    val df = skew.toDF("user_id", "us", "event_id")
      .withColumn("ts", timestamp_micros($"us")).drop("us")
    val got = Streaming.sortedSessionCounts(df, "user_id", "ts", "event_id",
        1800L * 1000000L)
      .collect().map(s => s.user_id -> ((s.n_sessions, s.n_events))).toMap
    val expected = graft.engine.Relational.sessionize(df, "user_id", "ts", "event_id",
        1800L * 1000000L)
      .groupBy("user_id")
      .agg(max("session_id").as("s"), count(lit(1)).as("e"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    assert(got(1L)._1 === 50L) // 49 completed gaps + the initial session
    assert(got(1L)._2 === 50000L)
  }

  test("upsertSink merges each micro-batch into the lake (streaming ON CONFLICT)") {
    val base = Files.createTempDirectory("st1_upsert").toString
    import spark.implicits._
    // batch 1 bootstraps the lake; batch 2 updates one key, inserts another
    Seq(("co", 2020, 100L, "old", 1L), ("co", 2021, 200L, "keep", 1L))
      .toDF("state", "year", "estimate", "herd", "seq").write.parquet(s"$base/src/f1")
    Seq(("co", 2020, 999L, "new", 2L), ("wy", 2020, 300L, "wy", 2L))
      .toDF("state", "year", "estimate", "herd", "seq").write.parquet(s"$base/src/f2")
    val schema = spark.read.parquet(s"$base/src/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src/*")
    Streaming.upsertSink(stream, s"$base/lake", s"$base/cp",
      keys = Seq("state", "year"), updateCols = Seq("estimate", "seq"),
      preserveCols = Seq("herd"), partCol = "year", orderCol = "seq")
    val lake = spark.read.parquet(s"$base/lake")
      .select("state", "year", "estimate", "herd").orderBy("state", "year")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(lake.toSeq === Seq(
      ("co", 2020, 999L, "old"),  // updated estimate, preserved herd
      ("co", 2021, 200L, "keep"), // untouched
      ("wy", 2020, 300L, "wy")))  // inserted
  }

  test("sortedSessionCounts fails fast on a non-integral key column") {
    val df = Seq(("u1", ts(0), 1L)).toDF("user_id", "ts", "event_id")
    val e = intercept[IllegalArgumentException] {
      Streaming.sortedSessionCounts(df, "user_id", "ts", "event_id", 1L)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("sortedSessionCounts accepts DECIMAL(p,0) surrogate keys (exact long cast)") {
    val df = Seq((1L, ts(0), 10L), (1L, ts(1), 11L))
      .toDF("user_id", "ts", "event_id")
      .withColumn("user_id", col("user_id").cast("decimal(10,0)"))
      .withColumn("event_id", col("event_id").cast("decimal(18,0)"))
    val got = Streaming.sortedSessionCounts(df, "user_id", "ts", "event_id", 60_000_000L)
      .collect()
    assert(got.length === 1 && got.head.n_events === 2L)
  }

  test("stateSession isolates its conf from the parent session") {
    val parentBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val ss = Streaming.stateSession(spark, 7)
    assert(ss.conf.get("spark.sql.shuffle.partitions") === "7")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === parentBefore,
      "tuning the child must not leak into the shared session")
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

  test("dedupStreamBounded collapses in-horizon replays (watermark-bounded state)") {
    val base = Files.createTempDirectory("st5_bounded").toString
    // key 1 delivered twice (a replay within the horizon), key 2 once
    Seq((1L, ts(1), "a"), (1L, ts(2), "a-replay"), (2L, ts(3), "b"))
      .toDF("k", "ts", "v").write.parquet(s"$base/src")
    val schema = spark.read.parquet(s"$base/src").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/src")
    val q = Streaming.dedupStreamBounded(stream, Seq("k"), "ts", "1 hour")
      .writeStream.format("memory").queryName("st5_bounded_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("st5_bounded_mem").orderBy("k").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L),
      "one survivor per key; the in-horizon replay is suppressed")
  }
}
