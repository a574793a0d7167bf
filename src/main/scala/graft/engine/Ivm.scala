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
    if (ch.isEmpty) // layout-only window: nothing to apply, nothing to publish
      return TxTable.latestVersion(spark, aggRoot).getOrElse(0L)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val delta = ch.groupBy(key).agg(
      sum(sign).cast(LongType).as("__dn"),
      sum(col(valueCol).cast(Dec) * sign).cast(Dec).as("__dsum"))
    val merged = TxTable.latestVersion(spark, aggRoot) match {
      case None => delta.select(col(key), col("__dn").as(nCol), col("__dsum").as(sumCol))
      case Some(_) =>
        // only the view rows whose key has a delta; broadcast the key set
        val existing = TxTable.read(spark, aggRoot)
          .join(broadcast(delta.select(key)), Seq(key), "left_semi")
        existing.join(delta, Seq(key), "full_outer")
          .select(col(key),
            (coalesce(col(nCol), lit(0L)) + coalesce(col("__dn"), lit(0L))).as(nCol),
            (coalesce(col(sumCol), lit(BigDecimal(0)).cast(Dec)) +
              coalesce(col("__dsum"), lit(BigDecimal(0)).cast(Dec))).cast(Dec).as(sumCol))
    }
    // merged is consumed three times (dead probe, merge write, delete) —
    // cache the change-sized frame so the feed scan + joins run once
    merged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dead = merged.filter(col(nCol) <= 0).select(key)
      // batch = toVersion: the view manifest remembers the fact version it
      // has applied through (commit carries the max id forward, so the
      // trailing delete keeps it too)
      val v = TxTable.commitMerge(spark, aggRoot, merged.filter(col(nCol) > 0),
        Seq(key), Seq(nCol, sumCol), Nil, batch = Some(toVersion))
      if (dead.isEmpty) v
      else TxTable.commitDelete(spark, aggRoot, dead, Seq(key))
    } finally merged.unpersist(false)
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
