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
    // otherwise sort first and poison both kk and r_k).  Dedup rides the
    // heap itself (distinct mode, r16): the old standalone `.distinct()`
    // was a full extra shuffle + two HashAggregate layers of the digest
    // relation before the heap's own exchange; the ordered-set heap keeps
    // the k smallest DISTINCT digests in one pass, and its map-side
    // partial bounds the one remaining shuffle at k rows per group per
    // partition.  (__h determines the whole row within a group, the
    // distinct-mode contract.)
    val h = df.filter(valCol.isNotNull)
      .select(col(groupCol), md5(valCol.cast("string")).as("__h"))
    graft.plans.TopKPerKey(h, Seq(groupCol), Seq(col("__h").asc), k,
      distinct = true)
  }

  /** Merge independently-built sketch shards — LOSSLESS, the property that
    * makes the sketch a partial aggregate: the k smallest of the
    * distinct-union of per-shard k-smallest sets IS the global k-smallest
    * (any globally-small digest is small in its own shard too), so
    * shard-then-merge equals the single-pass sketch exactly. */
  def kmvMerge(shards: Seq[DataFrame], groupCol: String, k: Int): DataFrame =
    // cross-shard duplicate digests collapse in the heap's ordered set —
    // no standalone distinct shuffle (r16)
    graft.plans.TopKPerKey(shards.reduce(_ unionByName _),
      Seq(groupCol), Seq(col("__h").asc), k, distinct = true)

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

  // ------------------------------------------------------------ Count-Min

  /** Row-i bucket of key `k` for a width-`width` Count-Min row: md5 over
    * `"<key>#<i>"`, first 15 hex digits (60 bits, exact in a long), mod
    * width — the same engine-portable hash family as [[kmvSketch]]
    * (DuckDB: `CAST('0x' || substr(md5(k || '#' || i), 1, 15) AS BIGINT)
    * % width`). */
  private def cmsBucket(k: Column, i: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(k, lit("#"), i.cast("string"))), 1, 15), 16, 10)
      .cast("long"), lit(width.toLong))

  /** COUNT-MIN frequency sketch (Cormode & Muthukrishnan, "An improved
    * data stream summary: the count-min sketch and its applications",
    * J. Algorithms 2005): `depth` hash rows × `width` counters; a key's
    * count estimate is the MIN over its `depth` cells, which can only
    * OVER-estimate (collisions add, never subtract) by ≤ `e·N/width` with
    * probability `1 − e^(−depth)`.
    *
    * This is the heavy-hitter primitive the engine's own skew guards need
    * at 100 TB: find the hot keys of a shuffle BEFORE paying for it
    * (then salt exactly those — [[Relational.saltedSum]]) with d×w bounded
    * cells instead of a full exact groupBy of billions of keys.
    *
    * Scale shape: one `explode` to `depth` rows per input (depth is 4-8),
    * then a hash aggregate onto at most d×w cells — map-side partial
    * combine collapses each task to ≤ d×w rows, so the shuffle carries
    * sketch-sized data regardless of input size.  NULL keys are excluded
    * (COUNT(col) semantics).  Returns `(__i, __b, __c)` cell rows. */
  def cmsSketch(df: DataFrame, keyCol: Column,
                depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, s"cmsSketch: bad dims d=$depth w=$width")
    df.filter(keyCol.isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("__i"),
        keyCol.cast("string").as("__k"))
      .select(col("__i"), cmsBucket(col("__k"), col("__i"), width).as("__b"))
      .groupBy("__i", "__b").agg(count(lit(1)).as("__c"))
  }

  /** Merge independently-built CMS shards — cell-wise sum, LOSSLESS (the
    * counter matrix is linear in the input multiset), so shard-then-merge
    * equals the single-pass sketch exactly: the partial-aggregate
    * property that lets each executor sketch its split locally. */
  def cmsMerge(shards: Seq[DataFrame]): DataFrame =
    shards.reduce(_ unionByName _)
      .groupBy("__i", "__b").agg(sum("__c").as("__c"))

  /** Point-estimate the counts of `keys` from a sketch: min over the
    * key's `depth` cells (a missing cell means a zero count).  Returns
    * `(keyCol, n_est)`. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame = {
    val probes = keys.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(0), lit(depth - 1))).as("__i"))
      .withColumn("__b", cmsBucket(col(keyCol).cast("string"), col("__i"), width))
    probes.join(sketch, Seq("__i", "__b"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("__c"), lit(0L))).as("n_est"))
  }

  // ------------------------------------------------- bottom-k quantiles

  /** Bottom-k uniform-sample QUANTILE sketch: keep the k rows whose
    * md5(rowId) digest is lexicographically smallest per group, carrying
    * the value column along.
    *
    * md5 order is independent of the value order, so the kept rows are a
    * uniform sample without replacement of size k per group — but a
    * DETERMINISTIC one (no seed, no partition-order dependence), so the
    * whole sketch is reproducible across reruns, AQE re-plans, and
    * engines.  A sample quantile at rank ⌈q·k⌉ then estimates the true
    * quantile with rank error O(n·√(q(1−q)/k)) (Chernoff on the binomial
    * count of sampled rows below the true quantile) — the same trade
    * GK/KLL sketches make, bought here with machinery the engine already
    * trusts: [[graft.plans.TopKPerKey]] keeps k rows per group with NO
    * per-group sort and k-row state however many billions stream past.
    *
    * NULL values are excluded (ordinary aggregate semantics).  `idCol`
    * must be row-unique per group (digest ties would make the cut
    * ambiguous).  Returns `(groupCol, __h, __v)` sample rows. */
  def qsampleSketch(df: DataFrame, groupCol: String, valCol: Column,
                    idCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"qsampleSketch: k must be >= 2, got $k")
    val rows = df.filter(valCol.isNotNull)
      .select(col(groupCol), md5(idCol.cast("string")).as("__h"), valCol.as("__v"))
    graft.plans.TopKPerKey(rows, Seq(groupCol), Seq(col("__h").asc), k)
  }

  /** Merge independently-built sample shards — LOSSLESS when the shards
    * partition the input (the global bottom-k of digests is the bottom-k
    * of the union of per-shard bottom-k sets, the [[kmvMerge]] argument),
    * so shard-then-merge equals the single-pass sketch row for row.  The
    * distinct guards idempotence under overlapping shards. */
  def qsampleMerge(shards: Seq[DataFrame], groupCol: String, k: Int): DataFrame =
    // The distinct here must stay FULL-ROW (not the heap's ordering-equal
    // collapse): sample rows carry `__v`, and a caller whose `idCol` is
    // not perfectly row-unique (the registered fixture has duplicate
    // (orderkey, linenumber) keys) produces digest TIES with different
    // values — full-row distinct keeps both tied rows as separate sample
    // rows, exactly as the rn<=k oracle does, while an ordering-equal
    // collapse would silently drop one and pull in a different digest
    // (measured: 127 of 1536 sample rows diverged at sf0.001).  KMV can
    // use the heap's distinct mode only because its rows ARE the ordering.
    graft.plans.TopKPerKey(shards.reduce(_ unionByName _).distinct(),
      Seq(groupCol), Seq(col("__h").asc), k)

  /** Finish a sample sketch into per-group order-statistic quantiles: for
    * each requested permille `q_pm`, the sample value at 1-based rank
    * ⌈q_pm·n/1000⌉ (n = sample size, ties broken by digest so the pick is
    * total-ordered).  All rank arithmetic is on exact small integers
    * (q_pm·n < 2^53), so the estimates hash-match a DuckDB restatement.
    * The window is over the ≤ k sample rows per group, never the input.
    * Returns `(groupCol, q_pm, est, n_sample)`. */
  def qsampleQuantiles(sketch: DataFrame, groupCol: String,
                       qPermille: Seq[Int]): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
      s"qsampleQuantiles: permilles must be in [1,1000], got $qPermille")
    val byVal = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__v"), col("__h"))
    val byGrp = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    val ranked = sketch.select(col(groupCol), col("__v"),
      row_number().over(byVal).as("__vr"),
      count(lit(1)).over(byGrp).as("__ns"))
    val probes = ranked
      .select(col(groupCol), explode(lit(qPermille.toArray)).as("q_pm"),
        col("__vr"), col("__ns"), col("__v"))
    probes
      .filter(col("__vr") ===
        greatest(lit(1L), floor((col("q_pm") * col("__ns") + 999) / lit(1000.0))))
      .select(col(groupCol), col("q_pm"), col("__v").as("est"),
        col("__ns").as("n_sample"))
  }
}
