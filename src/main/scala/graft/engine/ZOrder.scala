package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) clustering — multi-dimensional data skipping for
  * the lake and [[TxTable]], the Delta Lake `OPTIMIZE ZORDER BY` idea:
  * range-sorting by ONE column makes that column's segment min/max ranges
  * disjoint (perfect pruning) but leaves every OTHER column's ranges full-
  * width (zero pruning).  Interleaving the bits of two columns' rank-space
  * positions gives a 1-D sort key whose contiguous ranges are ~square tiles
  * in 2-D value space, so a range predicate on EITHER column maps to a
  * bounded set of tiles: both columns prune to ~sqrt-of-segments instead of
  * one column pruning perfectly and the other not at all.
  *
  * At 100 TB this is a WRITE-SIDE layout choice with zero read-side cost:
  * cluster by z-value once per compaction (a `repartitionByRange` + local
  * sort — one shuffle, same cost shape as any sorted write), record plain
  * per-segment min/max stats on the ORIGINAL columns, and every existing
  * skipping path ([[TxTable.readWhere]], parquet row-group stats) gets
  * two-dimensional pruning for free — no new reader logic, no index.
  *
  * [[zorderValue]] is pure column algebra (shifts/masks/OR), so it stays
  * inside whole-stage codegen; scaling to rank space uses the column
  * bounds, one tiny aggregate per write. */
object ZOrder {

  /** Bit-interleave two non-negative ints already scaled to `[0, 2^bits)`:
    * bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1.  `bits` ≤ 31
    * per column (62-bit z keeps the result in a positive long). */
  def interleaveBits(a: Column, b: Column, bits: Int): Column =
    interleaveBitsN(Seq(a, b), bits)

  /** N-ary bit interleave: bit i of column j lands at z-bit `i*n + j`, the
    * straight generalization of the 2-D Morton pattern — contiguous
    * z-ranges are ~hypercubic tiles of the N-D value space.  `bits × n`
    * must stay ≤ 62 so the z-value is a positive long.  `n == 1` is the
    * identity interleave (z-bit i = bit i), i.e. plain rank-space range
    * clustering — matching Delta's `OPTIMIZE ZORDER BY (one_col)`. */
  def interleaveBitsN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, s"ZOrder.interleaveBitsN: need ≥ 1 column, got $n")
    require(bits >= 1 && bits * n <= 62,
      s"ZOrder.interleaveBitsN: bits $bits × $n columns exceeds a positive long")
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Min-max scale a numeric column onto the `[0, 2^bits)` integer rank
    * space given its bounds (a degenerate `lo = hi` column maps to 0). */
  def scaleToBits(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val span = hi.cast("double") - lo.cast("double")
    val unit = (c.cast("double") - lo.cast("double")) / when(span === 0.0, 1.0).otherwise(span)
    least(floor(unit * ((1L << bits) - 1)).cast("long"), lit((1L << bits) - 1L))
  }

  /** The Morton z-value of `(colA, colB)` for `df`: compute both columns'
    * bounds (one tiny aggregate — the only driver-side data, 4 scalars),
    * scale each to `[0, 2^bits)` rank space, interleave.  Attach with
    * `withColumn` and range-cluster on it. */
  def zColumn(df: DataFrame, colA: String, colB: String, bits: Int = 16): Column =
    zColumnN(df, Seq(colA, colB), bits)

  /** N-dimensional [[zColumn]]: one bounds aggregate (2×n scalars to the
    * driver), scale each column to `[0, 2^bits)`, N-ary interleave.  The
    * per-dimension resolution shrinks as dimensions are added (bits×n ≤
    * 62) — exactly the Delta/Iceberg OPTIMIZE ZORDER BY (a, b, c, …)
    * trade-off: more clustered dimensions, coarser tiles per dimension. */
  def zColumnN(df: DataFrame, colNames: Seq[String], bits: Int = 16): Column = {
    val aggs = colNames.flatMap(c => Seq(min(c).as(s"__lo_$c"), max(c).as(s"__hi_$c")))
    val b = df.agg(aggs.head, aggs.tail: _*).collect().head
    interleaveBitsN(
      colNames.zipWithIndex.map { case (c, i) =>
        scaleToBits(col(c), lit(b.get(2 * i)), lit(b.get(2 * i + 1)), bits)
      }, bits)
  }

  /** [[zColumnN]] with CALLER-SUPPLIED bounds (exact decimal strings, the
    * manifest-stats rendering): when a table format already recorded each
    * segment's min/max at write time, re-aggregating the same rows just to
    * learn the same two scalars is a wasted driver job — the caller folds
    * the recorded stats and passes them here.  `scaleToBits` casts bounds
    * to double either way, so a decimal-string bound and the aggregate's
    * boxed value produce the SAME double and therefore identical z values. */
  def zColumnNFromBounds(colNames: Seq[String], bounds: Seq[(String, String)],
                         bits: Int = 16): Column = {
    require(colNames.length == bounds.length,
      s"ZOrder.zColumnNFromBounds: ${colNames.length} cols vs ${bounds.length} bounds")
    interleaveBitsN(
      colNames.zip(bounds).map { case (c, (lo, hi)) =>
        scaleToBits(col(c), lit(new java.math.BigDecimal(lo)),
          lit(new java.math.BigDecimal(hi)), bits)
      }, bits)
  }

  /** `df` clustered into `numSegments` ranges of the Morton order over
    * `(colA, colB)` — one `repartitionByRange` shuffle, partitions become
    * ~square tiles of the 2-D value space.  Write each partition as its
    * own segment (e.g. [[TxTable]] appends, or a sorted parquet write)
    * and record min/max stats on the ORIGINAL columns: range predicates
    * on EITHER column now prune to a tile band instead of scanning
    * everything. */
  def clusterByZ(df: DataFrame, colA: String, colB: String,
                 numSegments: Int, bits: Int = 16): DataFrame =
    clusterByZN(df, Seq(colA, colB), numSegments, bits)

  /** N-dimensional [[clusterByZ]]. */
  def clusterByZN(df: DataFrame, colNames: Seq[String],
                  numSegments: Int, bits: Int = 16): DataFrame = {
    require(numSegments >= 1, s"ZOrder.clusterByZN: numSegments $numSegments < 1")
    df.withColumn("__z", zColumnN(df, colNames, bits))
      .repartitionByRange(numSegments, col("__z"))
      .drop("__z")
  }
}
