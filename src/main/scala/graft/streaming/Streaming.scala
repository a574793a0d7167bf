package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}
import org.apache.spark.sql.types.StructType

/** Typed rows for the stateful sessionizer. */
case class SessionEvent(user_id: Long, ts_us: Long, event_id: Long)
case class SessionState(lastTsUs: Long, nSessions: Long, nEvents: Long)
case class SessionCounts(user_id: Long, n_sessions: Long, n_events: Long)

/** Typed rows for the timeout-closing sessionizer ([[Streaming.closedSessions]]). */
case class TimedEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
case class OpenSession(startUs: Long, lastUs: Long, n: Long)
case class ClosedSession(user_id: Long, session_start_us: Long, n_events: Long)

/** ST1 — incremental file-source catch-up (SURVEY §2.10).
  *
  * The reference hand-rolls incremental ingestion: list S3, skip files whose
  * processed key already exists, process the rest
  * (ref `src/etl/ingest_harvest_data.py:42-64,349-379`, and the
  * `# TODO: Trigger on S3 put.` at `:11`).  Structured Streaming's file
  * source IS that loop, made durable: the checkpoint's file-source log
  * replaces the per-file head-object existence probe, and
  * `Trigger.AvailableNow` reproduces batch catch-up (process everything new,
  * then stop).  At scale the checkpoint read is O(new files), not O(lake).
  */
object Streaming {

  /** Child session sized for STATEFUL streaming: the state-store instance
    * count equals `spark.sql.shuffle.partitions` and is PINNED into the
    * checkpoint at first run, and every instance pays a per-micro-batch
    * commit (delta file + checksum, per store — a stream-stream join runs
    * FOUR stores).  When per-key state is bounded, fewer larger state
    * partitions beat many tiny ones: measured locally, 8 partitions halve
    * the stream-stream join wall time vs 32 (state scales by keys held, the
    * commit overhead by partitions × stores × batches).  On a cluster, size
    * to ~1–2× executor count, not to the batch-shuffle default.  Isolated
    * via `newSession()` — the caller's session conf is never mutated (the
    * conf-in-closure order-dependence this engine bans). */
  def stateSession(s: SparkSession, statePartitions: Int): SparkSession = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    ss
  }

  /** ST12 — sessions CLOSED by event-time TIMEOUT via
    * `flatMapGroupsWithState`: the canonical custom-state streaming pattern
    * the built-in `session_window` cannot express variants of (per-session
    * emission the moment no more events can arrive, custom state payloads,
    * early partial emissions).  A session closes two ways: a later event of
    * the SAME user past the gap (emitted in that batch), or the global
    * WATERMARK passing `last_event + gap` (emitted by the timeout callback —
    * this is what flushes every still-open tail session without waiting for
    * that user to speak again).
    *
    * Caller contract: `events` is a STREAMING Dataset already watermarked on
    * `ts` (timeouts only exist under a watermark), and batches respect
    * event-time order per user up to the watermark (the file-stream queries
    * pin this with mtime-ordered single files).  Within a batch, timestamps
    * are sorted as primitive longs — same 8 B/event bound as
    * [[statefulSessionCounts]].  State per user is THREE longs however long
    * the stream runs; the timeout clears it. */
  def closedSessions(events: Dataset[TimedEvent],
                     gapMicros: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (user: Long, evts: Iterator[TimedEvent], state: GroupState[OpenSession]) =>
            if (state.hasTimedOut) {
              // watermark passed last_event + gap: no event can extend it
              val s = state.get
              state.remove()
              Iterator.single(ClosedSession(user, s.startUs, s.n))
            } else {
              val b = scala.collection.mutable.ArrayBuilder.make[Long]
              // getTime is millis (floor of nanos); re-attach the sub-ms part
              evts.foreach(e =>
                b += e.ts.getTime * 1000L + (e.ts.getNanos % 1000000L) / 1000L)
              val ts = b.result()
              java.util.Arrays.sort(ts)
              val out = scala.collection.mutable.ListBuffer.empty[ClosedSession]
              var cur = state.getOption.orNull
              var i = 0
              while (i < ts.length) {
                if (cur == null) cur = OpenSession(ts(i), ts(i), 1L)
                else if (ts(i) - cur.lastUs > gapMicros) {
                  out += ClosedSession(user, cur.startUs, cur.n)
                  cur = OpenSession(ts(i), ts(i), 1L)
                } else cur = OpenSession(cur.startUs, ts(i), cur.n + 1L)
                i += 1
              }
              state.update(cur)
              // timeout fires once the WATERMARK (not wall clock) passes this
              state.setTimeoutTimestamp(cur.lastUs / 1000L + gapMicros / 1000L + 1L)
              out.iterator
            }
        }
  }

  /** Catch up on all unprocessed files matching `glob`, append them to
    * `outDir` as parquet, and record progress in `checkpointDir`.  Running
    * twice with the same checkpoint processes nothing the second time —
    * the reference's idempotency check (S2), without per-file probes. */
  def catchUp(spark: SparkSession, glob: String, schema: StructType,
              checkpointDir: String, outDir: String,
              maxFilesPerTrigger: Option[Int] = None): Unit = {
    // Backpressure knob: a month-long backlog must not become ONE giant
    // micro-batch (a single all-or-nothing shuffle + a commit holding the
    // whole backlog's state).  `maxFilesPerTrigger` caps each batch; with
    // AvailableNow the stream still drains the full backlog, one bounded
    // batch at a time, each durably committed — a crash mid-backfill
    // resumes at the last commit instead of re-reading everything.
    val src = spark.readStream.schema(schema)
    val limited = maxFilesPerTrigger
      .fold(src)(n => src.option("maxFilesPerTrigger", n.toString))
    val q = limited.parquet(glob)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Event-time tumbling aggregation — the same expression serves batch and
    * stream (`window()` is engine-agnostic in Spark). */
  def tumblingCounts(df: DataFrame, tsCol: String, duration: String,
                     keys: Seq[String]): DataFrame =
    df.groupBy(window(col(tsCol), duration) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket") +: keys.map(col) :+ col("n"): _*)

  /** Streaming keyed upsert into a partitioned parquet lake: each
    * micro-batch is deduped (last-wins) and merged via
    * `Upsert.upsertPartitioned` — the streaming form of the reference's
    * ON CONFLICT hydration (`load_population_production.sql:30-32`), with
    * the checkpoint providing exactly-once batch tracking.  Only lake
    * partitions touched by the batch are rewritten. */
  def upsertSink(stream: DataFrame, lakeRoot: String, checkpointDir: String,
                 keys: Seq[String], updateCols: Seq[String], preserveCols: Seq[String],
                 partCol: String, orderCol: String): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val deduped = graft.engine.Upsert.dedupLastWins(batch, keys, orderCol)
        graft.engine.Upsert.upsertPartitioned(batch.sparkSession, lakeRoot,
          deduped, keys, updateCols, preserveCols, partCol)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Custom per-key state via `mapGroupsWithState` — the streaming form of
    * Relational.sessionize (gap-based sessions).  PERSISTED state per user is
    * three longs regardless of history length, so a billion-user stream holds
    * O(users) state, partitioned by the group key across executors.  Works
    * on batch Datasets too (Spark runs the state function per group).
    *
    * Two documented bounds (not silent assumptions):
    *  - groups arrive UNORDERED within a micro-batch, so each batch's
    *    timestamps are sorted per user — 8 bytes/event of primitive buffer
    *    (mapGroupsWithState offers no spill path, so a user's batch slice
    *    must fit; 8 B/event ≈ 8 MB per million-event slice).
    *    [[sortedSessionCounts]] is the fully-bounded batch form
    *    (secondary sort through Spark's spillable machinery);
    *  - only `lastTsUs` crosses batches: an event older than the previous
    *    batch's last timestamp would be folded as if in order.  Callers
    *    needing late-data tolerance must bound lateness upstream with
    *    `withWatermark` (see [[streamingTumbling]]) or buffer within an
    *    allowed-lateness window keyed by it. */
  def statefulSessionCounts(events: Dataset[SessionEvent],
                            gapMicros: Long): Dataset[SessionCounts] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionCounts](GroupStateTimeout.NoTimeout) {
        (user: Long, evts: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          // micro-batches deliver groups unordered; impose event-time order.
          // Only the TIMESTAMPS need sorting: a boundary is `diff > gap`, and
          // equal timestamps have diff 0, so order among ties cannot change
          // the count — the buffer is one primitive long per event (no
          // boxed SessionEvent Seq, no tuple comparator)
          val b = scala.collection.mutable.ArrayBuilder.make[Long]
          while (evts.hasNext) b += evts.next().ts_us
          val ts = b.result()
          java.util.Arrays.sort(ts)
          var st = prev
          var i = 0
          while (i < ts.length) {
            val newSession = st.lastTsUs == Long.MinValue || (ts(i) - st.lastTsUs) > gapMicros
            st = SessionState(ts(i), st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
            i += 1
          }
          state.update(st)
          SessionCounts(user, st.nSessions, st.nEvents)
      }
  }

  /** Bounded-memory batch sessionization via SECONDARY SORT: repartition by
    * user, sort within partitions by (user, ts, id), then one streaming fold
    * over each partition's iterator emitting a user's counts at its group
    * boundary.  No user's events are ever materialized as a collection —
    * running state is four longs — so a pathological single user with
    * billions of events streams through one task at O(1) memory (the spill
    * happens in Spark's sort machinery, which is built for it). */
  def sortedSessionCounts(df: org.apache.spark.sql.DataFrame, userCol: String,
                          tsCol: String, idCol: String,
                          gapMicros: Long): Dataset[SessionCounts] = {
    import df.sparkSession.implicits._
    // The encoder is (Long, Long, Long) non-nullable: a string key would
    // cast("long") to NULL silently (merging users / NPE downstream) — fail
    // fast on the schema instead.
    Seq(userCol, idCol).foreach { c =>
      import org.apache.spark.sql.types._
      val ok = df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        // integer-surrogate keys often arrive as DECIMAL(p,0) via JDBC/Hive;
        // p <= 18 fits a long, so the cast below stays exact
        case d: DecimalType if d.scale == 0 && d.precision <= 18 => true
        case _ => false
      }
      require(ok, s"sortedSessionCounts: column '$c' must be an integral type " +
        s"(or DECIMAL(<=18,0)), got ${df.schema(c).dataType.simpleString}")
    }
    val sorted = df.select(col(userCol).cast("long").as("u"),
        unix_micros(col(tsCol)).as("t"), col(idCol).cast("long").as("i"))
      .repartition(col("u"))
      .sortWithinPartitions("u", "t", "i")
      .as[(Long, Long, Long)]
    sorted.mapPartitions { it =>
      new Iterator[SessionCounts] {
        private var pending: Option[SessionCounts] = None
        private var exhausted = false
        private var haveUser = false
        private var curUser, lastTs, nSess, nEv = 0L
        private def advance(): Unit =
          while (pending.isEmpty && !exhausted) {
            if (it.hasNext) {
              val (u, ts, _) = it.next()
              if (haveUser && u != curUser) {
                pending = Some(SessionCounts(curUser, nSess, nEv))
                haveUser = false
              }
              if (!haveUser) {
                haveUser = true; curUser = u; lastTs = Long.MinValue
                nSess = 0L; nEv = 0L
              }
              if (lastTs == Long.MinValue || ts - lastTs > gapMicros) nSess += 1
              nEv += 1
              lastTs = ts
            } else {
              exhausted = true
              if (haveUser) pending = Some(SessionCounts(curUser, nSess, nEv))
            }
          }
        def hasNext: Boolean = { advance(); pending.nonEmpty }
        def next(): SessionCounts = {
          advance(); val r = pending.get; pending = None; r
        }
      }
    }
  }

  /** ST5 — exactly-once duplicate elimination across micro-batches
    * (`dropDuplicates` over the key): the cure for at-least-once sources and
    * replayed files — one state row per key, held forever (EXACT, but
    * unbounded state).  Where an event-time column exists, bound the store
    * with `withWatermark(ts, horizon)` +
    * `dropDuplicatesWithinWatermark(keys)` instead: state older than the
    * horizon is evicted, at the cost of not deduplicating replays that
    * arrive later than it. */
  def dedupStream(stream: DataFrame, keys: Seq[String]): DataFrame =
    stream.dropDuplicates(keys)

  /** The bounded-state form [[dedupStream]]'s Scaladoc prescribes: watermark
    * on `tsCol` + `dropDuplicatesWithinWatermark` — duplicates arriving
    * within `horizon` of the first sighting collapse, state older than the
    * horizon is EVICTED.  At 100 TB/day this is the only sustainable dedup
    * store (exact dedup state grows with distinct keys forever; replay
    * storms are always near-in-time, so a horizon covering the source's
    * redelivery window loses nothing in practice). */
  def dedupStreamBounded(stream: DataFrame, keys: Seq[String], tsCol: String,
                         horizon: String): DataFrame =
    stream.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keys)

  /** ST7 — stream-static enrichment: join a streaming fact to a STATIC
    * reference frame by broadcast.  Stateless — no store, no watermark: the
    * static side is (re)resolved per micro-batch, so a small dim can even
    * be swapped under the running query (classic reference-data join).
    * Left join: an unmatched fact row must flow through enriched-with-NULL,
    * not vanish (dropping telemetry because a lookup table lags is the
    * reference-data bug this guards against). */
  def enrichStream(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Streaming variant with a watermark bounding state: late data beyond
    * `watermark` is dropped and closed windows are evicted from the store. */
  def streamingTumbling(stream: DataFrame, tsCol: String, duration: String,
                        watermark: String, keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), duration) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket") +: keys.map(col) :+ col("n"): _*)
}
