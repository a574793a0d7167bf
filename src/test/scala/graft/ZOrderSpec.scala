package graft

import org.apache.spark.sql.functions._

import graft.engine.ZOrder

/** Morton-curve clustering (engine/ZOrder.scala): bit-exact interleave,
  * rank-space scaling bounds, and the two-dimensional tiling property that
  * makes either-column range predicates prunable. */
class ZOrderSpec extends SparkFunSuite {
  import spark.implicits._

  private def refInterleave(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("interleaveBits is bit-exact against the reference loop") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (43690L, 21845L), (12345L, 54321L))
    val df = cases.toDF("a", "b")
      .withColumn("z", ZOrder.interleaveBits(col("a"), col("b"), 16))
    df.collect().foreach { r =>
      assert(r.getLong(2) === refInterleave(r.getLong(0), r.getLong(1), 16),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // spot-identity: interleave(x, 0) spreads x's bits to even positions
    assert(refInterleave(3L, 0L, 16) === 5L && refInterleave(0L, 3L, 16) === 10L)
  }

  private def refInterleaveN(vs: Seq[Long], bits: Int): Long =
    vs.zipWithIndex.foldLeft(0L) { case (acc, (v, j)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a | (((v >> i) & 1L) << (i * vs.size + j))
      }
    }

  test("interleaveBitsN is bit-exact and generalizes the 2-ary layout") {
    val cases = Seq(Seq(0L, 0L, 0L), Seq(1L, 0L, 0L), Seq(0L, 1L, 0L),
      Seq(0L, 0L, 1L), Seq(65535L, 0L, 65535L), Seq(43690L, 21845L, 12345L))
    val df = cases.map(c => (c(0), c(1), c(2))).toDF("a", "b", "c")
      .withColumn("z", ZOrder.interleaveBitsN(
        Seq(col("a"), col("b"), col("c")), 16))
    df.collect().foreach { r =>
      assert(r.getLong(3) === refInterleaveN(
        Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 16),
        s"(${r.getLong(0)}, ${r.getLong(1)}, ${r.getLong(2)})")
    }
    // the 2-ary entry point is exactly the n=2 instance
    val two = Seq((12345L, 54321L)).toDF("a", "b")
      .withColumn("z", ZOrder.interleaveBitsN(Seq(col("a"), col("b")), 16))
    assert(two.collect().head.getLong(2) === refInterleave(12345L, 54321L, 16))
    // the 62-bit budget is enforced
    intercept[IllegalArgumentException](
      ZOrder.interleaveBitsN(Seq(col("a"), col("b"), col("a")), 21))
    intercept[IllegalArgumentException](ZOrder.interleaveBitsN(Seq.empty, 16))
  }

  test("n=1 interleave is the identity: ZORDER BY (one_col) = range clustering") {
    // Delta's OPTIMIZE ZORDER BY accepts a single column (degenerating to
    // plain rank-space range clustering); the 1-ary interleave must be the
    // identity over the low `bits` bits, preserving sort order exactly.
    val vs = Seq(0L, 1L, 3L, 255L, 43690L, 65535L)
    val one = vs.toDF("a")
      .withColumn("z", ZOrder.interleaveBitsN(Seq(col("a")), 16))
    one.collect().foreach(r => assert(r.getLong(1) === r.getLong(0),
      s"identity broken for ${r.getLong(0)}"))
    // budget still enforced at n = 1
    intercept[IllegalArgumentException](
      ZOrder.interleaveBitsN(Seq(col("a")), 63))
  }

  test("scaleToBits maps bounds to [0, 2^bits) and is monotone") {
    val df = Seq(10L, 20L, 55L, 100L).toDF("v")
      .withColumn("r", ZOrder.scaleToBits(col("v"), lit(10L), lit(100L), 8))
    val rs = df.orderBy("v").collect().map(_.getLong(1))
    assert(rs.head === 0L && rs.last === 255L, "bounds must hit the rank extremes")
    assert(rs.sorted.toSeq === rs.toSeq, "scaling must preserve order")
    // degenerate lo = hi column: everything maps to 0, no divide-by-zero
    val d = Seq(7L, 7L).toDF("v")
      .withColumn("r", ZOrder.scaleToBits(col("v"), lit(7L), lit(7L), 8))
    assert(d.collect().map(_.getLong(1)).toSeq === Seq(0L, 0L))
  }

  test("z-range slices are 2-D tiles: a band in EITHER dimension misses most slices") {
    // 64x64 full grid; 16 z-slices = 16 square tiles (4x4 tile grid).  A
    // quarter-width band on either axis intersects exactly 4 of 16 tiles —
    // the sqrt-ish pruning a single-column sort gives only one dimension.
    val n = 64
    val grid = (0 until n * n).map(i => (i / n * 1L, i % n * 1L)).toDF("x", "y")
    val z = grid.withColumn("__z", ZOrder.interleaveBits(col("x"), col("y"), 6))
    val cuts = z.stat.approxQuantile("__z", (1 until 16).map(_ / 16.0).toArray, 0.0)
      .map(_.toLong)
    val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
    def slicesHit(pred: org.apache.spark.sql.Column): Int =
      (0 until 16).count { i =>
        z.filter(col("__z") > bounds(i) && col("__z") <= bounds(i + 1))
          .filter(pred).limit(1).count() > 0
      }
    assert(slicesHit(col("x") >= 16 && col("x") < 32) === 4,
      "an x-band must hit one tile column (4 of 16 slices)")
    assert(slicesHit(col("y") >= 16 && col("y") < 32) === 4,
      "a y-band must hit one tile row (4 of 16 slices)")
  }
}
