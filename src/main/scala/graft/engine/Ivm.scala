package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** INCREMENTAL VIEW MAINTENANCE over the TxTable change feed — the consumer
  * that makes [[TxTable.readChanges]] pay for itself: a keyed
  * `(key, n, <sum>)` aggregate table is kept current by applying each CDF
  * window's DELTA, never by re-aggregating the fact table.
  *
  * The classic IVM identity for self-maintainable aggregates (SUM/COUNT are
  * distributive): feed rows contribute `+1` for insert / update_postimage
  * and `-1` for update_preimage / delete, so
  * `new_agg(k) = old_agg(k) + Σ sign·measure` over the window's change rows
  * for k.  A key whose count reaches zero leaves the view (the HAVING
  * COUNT(*) > 0 of the recompute).
  *
  * Scale shape — everything after the feed read is CHANGE-sized:
  * the delta is one hash aggregate over the window's change rows; the old
  * rows it touches come from a semi-join of the view against the BROADCAST
  * delta key set (the view is scanned but never shuffled); the final
  * full-outer join runs between two change-sized frames; and the publish is
  * a segment-pruned [[TxTable.commitMerge]] (plus a [[TxTable.commitDelete]]
  * for keys that zeroed out), so a window touching 0.1% of keys rewrites
  * ~0.1% of the view, transactionally.
  *
  * The measure accumulates in DECIMAL(38,6): decimal addition is exact and
  * order-independent, so the incrementally-maintained sum equals a
  * from-scratch recompute BIT FOR BIT — the property the oracle checks.
  */
object Ivm {

  private val Dec = DecimalType(38, 6)

  /** Refresh the `(key, nCol, sumCol)` view at `aggRoot` with the fact
    * table's changes in versions `(fromVersion, toVersion]` (which must
    * have been written with `cdf = true`).  Bootstraps the view when
    * `aggRoot` has no commits.  Returns the view's new head version.
    *
    * EXACTLY-ONCE: the view commit records `toVersion` as its batch id
    * (the fact version the view has applied through), so a replayed
    * refresh of an already-applied window is a no-op — the same guard the
    * streaming sinks use, which makes the view safe to maintain from
    * inside `foreachBatch` (see [[refreshLatest]]).  Callers composing
    * windows by hand must keep them contiguous: apply `(a, b]` then
    * `(b, c]`, never overlapping ranges. */
  def refreshSumCount(spark: SparkSession, factRoot: String, aggRoot: String,
                      fromVersion: Long, toVersion: Long,
                      key: String, valueCol: String,
                      nCol: String = "n", sumCol: String = "sum"): Long = {
    if (TxTable.lastCommittedBatch(spark, aggRoot).exists(_ >= toVersion))
      return TxTable.latestVersion(spark, aggRoot).get // replay: already applied
    val ch = TxTable.readChanges(spark, factRoot, fromVersion, toVersion)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    // persist the CHANGE-SIZED delta: the apply consumes it twice
    // (broadcast key set + the union arm), so without the cache the feed
    // scan + aggregate would run twice inside one action; a layout-only
    // (empty) window is detected by the apply's summary probe
    val delta = ch.groupBy(key).agg(
      sum(sign).cast(LongType).as("__dn"),
      sum(col(valueCol).cast(Dec) * sign).cast(Dec).as("__dsum"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try applySignedDelta(spark, aggRoot, delta, key, nCol, sumCol, toVersion)
    finally delta.unpersist(false)
  }

  /** Publish a `(key, __dn, __dsum)` signed delta into the view at
    * `aggRoot` (bootstrap when the view has no commits): existing rows for
    * delta keys are fetched by broadcast semi-join and SUMMED with the
    * delta through one union + hash aggregate (a full-outer join would
    * cost two shuffles and a sort where the union-agg costs one exchange —
    * addition is the same merge the join's coalesce arithmetic expressed).
    * Keys whose count reaches zero leave the view, and the commit records
    * `batchId` as the applied-through horizon.  An EMPTY delta (layout-only
    * window) publishes nothing.  Returns the view head. */
  private def applySignedDelta(spark: SparkSession, aggRoot: String,
                               delta: DataFrame, key: String,
                               nCol: String, sumCol: String,
                               batchId: Long): Long = {
    val bootstrap = TxTable.latestVersion(spark, aggRoot).isEmpty
    val asView = delta.select(col(key), col("__dn").as(nCol), col("__dsum").as(sumCol))
    val merged =
      if (bootstrap) asView
      else {
        // only the view rows whose key has a delta; broadcast the key set
        val existing = TxTable.read(spark, aggRoot)
          .join(broadcast(delta.select(key)), Seq(key), "left_semi")
        existing.select(col(key), col(nCol), col(sumCol).cast(Dec).as(sumCol))
          .unionByName(asView)
          .groupBy(key).agg(
            sum(col(nCol)).cast(LongType).as(nCol),
            sum(col(sumCol)).cast(Dec).as(sumCol))
      }
    // merged is consumed three times (summary probe, delete, merge write) —
    // cache the change-sized frame so the feed scan + joins run once.  On
    // bootstrap, merged is a bare projection of the delta the CALLER
    // already persisted: a second cache would only copy those blocks.
    if (!bootstrap)
      merged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE summary action decides both branches (empty window? any zeroed
      // keys?) and materializes the cache the commits below reuse
      val probe = merged.agg(count(lit(1)).as("__rows"),
        count(when(col(nCol) <= 0, 1)).as("__dead")).collect().head
      val (rows, deadCnt) = (probe.getLong(0), probe.getLong(1))
      if (rows == 0L) // layout-only window: nothing to apply, nothing to publish
        return TxTable.latestVersion(spark, aggRoot).getOrElse(0L)
      // CRASH-ATOMIC ordering: delete zeroed keys FIRST, latch the
      // applied-through horizon ONLY on the final merge commit.  A crash
      // between the two leaves the horizon unlatched, so the whole window
      // replays — and the replay converges bit-for-bit: a half-applied
      // dead key's view row is already gone, so its replayed balance is
      // `0 + __dn ≤ 0`, which routes it back to the (now no-op) delete and
      // keeps it out of the merge set.  The old order (merge-with-horizon
      // then delete) latched the guard before the deletes were durable —
      // a crash between them left stale zeroed rows forever.
      if (!bootstrap && deadCnt > 0L)
        TxTable.commitDelete(spark, aggRoot,
          merged.filter(col(nCol) <= 0).select(key), Seq(key))
      TxTable.commitMerge(spark, aggRoot, merged.filter(col(nCol) > 0),
        Seq(key), Seq(nCol, sumCol), Nil, batch = Some(batchId))
    } finally if (!bootstrap) merged.unpersist(false)
  }

  /** JOIN-VIEW IVM — maintain a `(groupKey, n, sum)` aggregate of
    * `fact ⋈ dim` (inner equi-join on `factKey = dimKey`, grouped by a DIM
    * attribute) from BOTH tables' change feeds, never re-running the join.
    *
    * The bilinear delta identity: with signed deltas Δ and snapshots
    * `F_old` (fact at `factFrom`) and `D_new` (dim at `dimTo`),
    *
    * {{{ Δ(F ⋈ D) = ΔF ⋈ D_new  ∪  F_old ⋈ ΔD }}}
    *
    * (expand `(F+ΔF)⋈(D+ΔD)`: the cross term `ΔF⋈ΔD` lands in the first
    * part because `D_new` already contains `ΔD`).  A joined row's sign is
    * the sign of the change row that produced it — dim preimage/postimage
    * pairs therefore MOVE a fact row's contribution between groups, dim
    * deletes retract every joined fact row, dim inserts admit previously
    * unmatched facts: every case is the same algebra, no special-casing.
    *
    * Both snapshots come straight from the table format: `D_new` is a
    * time-travel read at `dimTo`, `F_old` at `factFrom` — IVM rides on
    * snapshot isolation instead of keeping shadow copies.
    *
    * Scale shape: part 1 joins the CHANGE-sized fact delta against the
    * broadcast dim (dims that fit the broadcast budget — the star-schema
    * case); part 2 scans the old fact snapshot but joins it against the
    * BROADCAST change-sized dim delta (the scan is the price of a dim
    * change; an unchanged dim makes part 2 empty without touching the
    * fact).  Everything downstream is delta-sized and the publish is the
    * same segment-pruned merge as [[refreshSumCount]].
    *
    * EXACTLY-ONCE: the view's applied-through horizon covers TWO tables,
    * packed into one batch id as `factTo << 20 | dimTo` (dim versions must
    * stay below 2^20) — monotone because windows must advance JOINTLY and
    * contiguously: apply `(fa,fb]×(da,db]` then `(fb,fc]×(db,dc]`.  A
    * replayed refresh of an applied window is a no-op. */
  def refreshJoinSumCount(spark: SparkSession, factRoot: String,
                          dimRoot: String, aggRoot: String,
                          factFrom: Long, factTo: Long,
                          dimFrom: Long, dimTo: Long,
                          factKey: String, dimKey: String,
                          groupKey: String, valueCol: String,
                          nCol: String = "n", sumCol: String = "sum"): Long = {
    require(dimTo < (1L << 20),
      s"Ivm.refreshJoinSumCount: dim version $dimTo overflows the packed horizon")
    val packed = (factTo << 20) | dimTo
    if (TxTable.lastCommittedBatch(spark, aggRoot).exists(_ >= packed))
      return TxTable.latestVersion(spark, aggRoot).get // replay: already applied
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    // part 1: fact delta ⋈ dim head — change-sized ⋈ broadcast dim
    val p1 = {
      val chF = TxTable.readChanges(spark, factRoot, factFrom, factTo)
        .select(col(factKey).as("__k"), col(valueCol).cast(Dec).as("__v"),
          sign.as("__s"))
      val dNew = TxTable.readVersion(spark, dimRoot, dimTo)
        .select(col(dimKey).as("__k"), col(groupKey))
      chF.join(broadcast(dNew), "__k").select(col(groupKey), col("__v"), col("__s"))
    }
    // part 2: old fact snapshot ⋈ dim delta — fact ⋈ broadcast change set
    val p2 = {
      val chD = TxTable.readChanges(spark, dimRoot, dimFrom, dimTo)
        .select(col(dimKey).as("__k"), col(groupKey), sign.as("__s"))
      val fOld =
        if (factFrom == 0L)
          TxTable.read(spark, factRoot).limit(0) // no old snapshot yet
        else TxTable.readVersion(spark, factRoot, factFrom)
      fOld.select(col(factKey).as("__k"), col(valueCol).cast(Dec).as("__v"))
        .join(broadcast(chD), "__k")
        .select(col(groupKey), col("__v"), col("__s"))
    }
    // persist the GROUP-SIZED delta: the apply's two consumers would
    // otherwise re-run both delta parts — including part 2's old-fact
    // snapshot scan — twice inside one action; a layout-only (empty)
    // window is detected by the apply's summary probe
    val delta = p1.unionByName(p2).groupBy(groupKey).agg(
      sum(col("__s")).cast(LongType).as("__dn"),
      sum(col("__v") * col("__s")).cast(Dec).as("__dsum"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try applySignedDelta(spark, aggRoot, delta, groupKey, nCol, sumCol, packed)
    finally delta.unpersist(false)
  }

  /** Catch the view up to the fact table's HEAD, exactly-once and
    * self-driving: the window starts at the fact version the view last
    * applied (its recorded batch id) and ends at the current fact head —
    * the call a `foreachBatch` sink makes right after its fact commit to
    * maintain a STREAMING MATERIALIZED VIEW.  Replays no-op; windows are
    * contiguous by construction.  Returns the view head. */
  def refreshLatest(spark: SparkSession, factRoot: String, aggRoot: String,
                    key: String, valueCol: String,
                    nCol: String = "n", sumCol: String = "sum"): Long = {
    val to = TxTable.latestVersion(spark, factRoot).getOrElse(
      return TxTable.latestVersion(spark, aggRoot).getOrElse(0L))
    val from = TxTable.lastCommittedBatch(spark, aggRoot).getOrElse(0L)
    if (from >= to) TxTable.latestVersion(spark, aggRoot).getOrElse(0L)
    else refreshSumCount(spark, factRoot, aggRoot, from, to, key, valueCol,
      nCol, sumCol)
  }
}
