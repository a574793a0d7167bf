package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.engine.Relational
import graft.streaming.{SessionEvent, Streaming}

/** Randomized FOUR-WAY equivalence fuzz for gap-based sessionization: the
  * same random event set must produce identical per-user (n_sessions,
  * n_events) through
  *
  *  1. [[Streaming.statefulSessionCounts]] on a batch Dataset,
  *  2. the SAME operator as an actual stream cut into micro-batches at
  *     RANDOM positions (in global time order, per the operator's
  *     documented in-order bound — the cuts still land mid-session, at
  *     exact-boundary events, and between tied timestamps, which is where
  *     cross-batch state carry breaks if it ever will),
  *  3. [[Streaming.sortedSessionCounts]] (the secondary-sort bounded-memory
  *     batch form),
  *  4. [[Relational.sessionize]] (the window-function form) aggregated to
  *     counts,
  *
  * and an in-memory reference model.  Timestamp deltas are drawn to hammer
  * the boundary algebra: ties (delta 0), gap−1 / gap / gap+1 (a boundary is
  * strictly `diff > gap`), and far jumps.  Seeds fixed; failures name the
  * seed and path.
  */
class SessionFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private val Gap = 1000L // micros — small so probes land densely on it

  for (seed <- FuzzSeeds.seeds(41L, 137L)) {
    test(s"random event set (seed $seed): stateful batch, stateful stream " +
      "with random cuts, sorted fold, and window sessionizer all agree") {
      val rng = new scala.util.Random(seed)
      val deltas = Seq(0L, 1L, Gap - 1, Gap, Gap + 1, 3 * Gap)
      var eid = 0L
      val events: Seq[(Long, Long, Long)] = (1L to 6L).flatMap { u =>
        var t = rng.nextLong(Gap)
        (0 until (5 + rng.nextInt(36))).map { _ =>
          t += (if (rng.nextBoolean()) deltas(rng.nextInt(deltas.size))
                else rng.nextLong(2 * Gap))
          eid += 1
          (u, t, eid)
        }
      }

      val model: Map[Long, (Long, Long)] = events.groupBy(_._1).map {
        case (u, evs) =>
          val ts = evs.map(_._2).sorted
          val sessions = 1L + ts.sliding(2).count {
            case Seq(a, b) => b - a > Gap
            case _ => false
          }
          u -> (sessions, ts.size.toLong)
      }

      def countsOf(rows: Array[graft.streaming.SessionCounts]) =
        rows.map(s => s.user_id -> ((s.n_sessions, s.n_events))).toMap

      // 1. stateful operator on a batch Dataset
      val ds = events.toDF("user_id", "ts_us", "event_id").as[SessionEvent]
      assert(countsOf(Streaming.statefulSessionCounts(ds, Gap).collect()) == model,
        s"seed $seed: stateful-batch path diverged")

      // 2. stateful operator as a stream: random cut positions in global
      // time order, one file per micro-batch
      val base = Files.createTempDirectory(s"sessfuzz_$seed").toString
      val inOrder = rng.shuffle(events).sortBy(_._2) // time order, ties shuffled
      val nCuts = 2 + rng.nextInt(3)
      val cutAt = (rng.shuffle((1 until inOrder.size).toList).take(nCuts - 1)
        .sorted :+ inOrder.size).distinct
      var start = 0
      val mtimeBase = System.currentTimeMillis() - cutAt.size * 120000L
      cutAt.zipWithIndex.foreach { case (end, i) =>
        val dir = f"$base/src/f$i%03d"
        // ONE part file per slice: a multi-part slice would split its rows
        // arbitrarily across two micro-batches, breaking the in-time-order
        // delivery the operator documents as its contract
        inOrder.slice(start, end).toDF("user_id", "ts_us", "event_id")
          .coalesce(1).write.parquet(dir)
        // the file source orders batches by MODIFICATION TIME — pin each
        // slice's files a minute apart so batch order provably equals slice
        // order (sub-second write spacing is not a reliable order)
        java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).forEach { p =>
          java.nio.file.Files.setLastModifiedTime(p,
            java.nio.file.attribute.FileTime.fromMillis(mtimeBase + i * 60000L))
        }
        start = end
      }
      val schema = spark.read.parquet(s"$base/src/f000").schema
      val q = Streaming.statefulSessionCounts(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$base/src/*").as[SessionEvent], Gap)
        .writeStream.format("memory").queryName(s"sessfuzz_mem_$seed")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamed = spark.table(s"sessfuzz_mem_$seed")
        .groupBy("user_id")
        .agg(max("n_sessions").as("s"), max("n_events").as("e"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(streamed == model,
        s"seed $seed: streamed path (cuts at $cutAt) diverged")

      // 3 + 4. batch forms over a real timestamp column
      val df = events.toDF("user_id", "ts_us", "event_id")
        .withColumn("ts", timestamp_micros(col("ts_us")))
      assert(countsOf(Streaming.sortedSessionCounts(
        df, "user_id", "ts", "event_id", Gap).collect()) == model,
        s"seed $seed: sorted-fold path diverged")
      val windowed = Relational.sessionize(df, "user_id", "ts", "event_id", Gap)
        .groupBy("user_id")
        .agg(max("session_id").as("s"), count(lit(1)).as("e"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(windowed == model, s"seed $seed: window path diverged")
    }
  }
}
