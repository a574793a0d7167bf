package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches for approximate statistics over 100 TB inputs.
  *
  * The engine's exact aggregates (COUNT DISTINCT, percentiles) shuffle every
  * distinct value; at corpus scale the distinct set itself is the bottleneck
  * (URL cardinality per domain, distinct n-grams per shard).  A sketch keeps
  * a BOUNDED summary per group that partial aggregation can merge — the
  * classic trade every engine ships (Spark's HyperLogLog
  * `approx_count_distinct`, DuckDB's `approx_distinct`).
  *
  * Spark's HLL and DuckDB's HLL hash differently, so neither is
  * cross-engine checkable.  [[kmvDistinct]] instead implements the KMV
  * (k-minimum-values) estimator (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM'02) over md5 — which both engines
  * spell identically — so the whole sketch, not just its error bound, is
  * oracle-verifiable bit-for-bit.
  */
object Sketch {

  /** Per-group approximate distinct count via the KMV estimator.
    *
    * Keep the k lexicographically-smallest md5(value) digests per group
    * (md5 hex order ≡ numeric order of the 128-bit digest); if the group
    * has fewer than k distinct values the count is EXACT (the sketch
    * degenerates to the distinct set), otherwise estimate
    * `(k-1) / r_k` where `r_k` is the k-th smallest digest normalized to
    * [0,1) by its first 13 hex digits (52 bits — exact in a double).
    *
    * Scale shape: one distinct on (group, digest) — dropping duplicate
    * values early, exactly like exact dedup — then the bounded-heap
    * [[graft.plans.TopKPerKey]] operator keeps k rows per group with NO
    * per-group sort; state per group is k × 32-char digests however many
    * billions of values stream past.  Everything after the heap touches
    * ≤ k rows per group.
    *
    * Determinism: md5 is identical across engines; the normalization uses
    * only exactly-representable doubles (digit sums < 2^53, division by
    * 2^52), so estimate values hash-match DuckDB without tolerance.
    *
    * Returns `(groupCol, n_est)` with `n_est` rounded to 6 dp. */
  def kmvDistinct(df: DataFrame, groupCol: String, valCol: Column,
                  k: Int = 256): DataFrame =
    kmvEstimate(kmvSketch(df, groupCol, valCol, k), groupCol, k)

  /** The sketch STATE: the k lexicographically-smallest distinct md5
    * digests per group, one `(groupCol, __h)` row each — k × 32 chars per
    * group regardless of input size. */
  def kmvSketch(df: DataFrame, groupCol: String, valCol: Column,
                k: Int): DataFrame = {
    require(k >= 2, s"kmvSketch: k must be >= 2, got $k")
    // NULLs don't count — COUNT(DISTINCT x) semantics (a NULL digest would
    // otherwise sort first and poison both kk and r_k)
    val h = df.filter(valCol.isNotNull)
      .select(col(groupCol), md5(valCol.cast("string")).as("__h"))
      .distinct()
    graft.plans.TopKPerKey(h, Seq(groupCol), Seq(col("__h").asc), k)
  }

  /** Merge independently-built sketch shards — LOSSLESS, the property that
    * makes the sketch a partial aggregate: the k smallest of the
    * distinct-union of per-shard k-smallest sets IS the global k-smallest
    * (any globally-small digest is small in its own shard too), so
    * shard-then-merge equals the single-pass sketch exactly. */
  def kmvMerge(shards: Seq[DataFrame], groupCol: String, k: Int): DataFrame =
    graft.plans.TopKPerKey(shards.reduce(_ unionByName _).distinct(),
      Seq(groupCol), Seq(col("__h").asc), k)

  /** Finish a sketch into the per-group estimate (see [[kmvDistinct]]). */
  def kmvEstimate(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    // lexicographic hex order is monotone with the numeric digest, so the
    // max 13-hex-digit prefix among the k kept rows IS the k-th smallest r
    val r = conv(substring(col("__h"), 1, 13), 16, 10).cast("double") /
      lit(math.pow(16.0, 13))
    sketch.groupBy(groupCol)
      .agg(count(lit(1)).as("__kk"), max(r).as("__rk"))
      .select(col(groupCol),
        when(col("__kk") < k, col("__kk").cast("double"))
          .otherwise(round((lit(k) - 1) / col("__rk"), 6)).as("n_est"))
  }
}
