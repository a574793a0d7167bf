package graft

import org.apache.spark.sql.functions._

import graft.engine.Sketch

class SketchSpec extends SparkFunSuite {
  import spark.implicits._

  test("kmvDistinct: exact below k, within KMV error above k, duplicate-proof") {
    // "small": 50 distinct values, each duplicated 3x — must be EXACTLY 50
    // "big": 20_000 distinct values — estimate within the ~3/sqrt(k) band
    val rows =
      (1L to 50L).flatMap(i => Seq(("small", i), ("small", i), ("small", i))) ++
        (1L to 20000L).map(i => ("big", i))
    val df = rows.toDF("g", "v")
      .unionByName(Seq(("small", Option.empty[Long]), ("small", Option.empty[Long]))
        .toDF("g", "v")) // NULLs must not count (COUNT DISTINCT semantics)
    val got = Sketch.kmvDistinct(df, "g", col("v"), k = 256)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("small") === 50.0, "below k the sketch degenerates to the exact count")
    val rel = math.abs(got("big") - 20000.0) / 20000.0
    assert(rel < 3.0 / math.sqrt(256.0), s"estimate ${got("big")} off by ${rel * 100}%")
  }

  test("count-min never under-counts, is exact sans collisions, zero for absent keys") {
    // 20 keys with distinct counts 10,20,...,200 into a 4x64 sketch
    val df = (1 to 20).flatMap(k => Seq.fill(k * 10)(s"key$k")).toDF("k")
    val sketch = Sketch.cmsSketch(df, col("k"), depth = 4, width = 64)
    val probes = ((1 to 20).map(k => s"key$k") :+ "absent").toDF("k")
    val est = Sketch.cmsEstimate(sketch, probes, "k", depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 20).foreach { k =>
      assert(est(s"key$k") >= k * 10L,
        s"key$k estimated ${est(s"key$k")} under true ${k * 10} — CMS must over-count only")
    }
    assert(est("absent") >= 0L && est("absent") <= 400L,
      "an absent key's estimate is bounded by collision mass")
    // total over-estimate is bounded in aggregate: sum of cells per row = N
    assert(est.values.sum >= (1 to 20).map(_ * 10L).sum)
  }

  test("count-min shard merge equals the single-pass sketch cell for cell") {
    val df = (1L to 5000L).map(i => s"k${i % 97}").toDF("k")
    val whole = Sketch.cmsSketch(df, col("k"), depth = 4, width = 32)
    val shards = (0 to 2).map(i =>
      Sketch.cmsSketch(df.filter(length(col("k")) % 3 === i), col("k"),
        depth = 4, width = 32))
    val merged = Sketch.cmsMerge(shards)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty,
      "cell-wise sum of shard sketches must equal the one-pass counter matrix")
  }

  test("qsample quantiles: exact below k, rank-bounded above k, NULL-proof") {
    // "small" has 40 non-null values 1..40 — sample IS the group, so the
    // p50/p90 are the exact order statistics ceil(q*40/1000).
    // "big" has 10_000 values 1..10000 — sample quantile rank error within
    // 5 sigma of the binomial bound n*sqrt(q(1-q)/k).
    val rows = (1L to 40L).map(i => ("small", i)) ++
      (1L to 10000L).map(i => ("big", i))
    val df = rows.toDF("g", "v")
      .unionByName(Seq(("small", Option.empty[Long])).toDF("g", "v"))
    val est = Sketch.qsampleQuantiles(
      Sketch.qsampleSketch(df, "g", col("v"), concat(col("g"), col("v")), k = 256),
      "g", Seq(500, 900))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(est(("small", 500)) === 20L && est(("small", 900)) === 36L,
      "below k the sketch degenerates to exact order statistics")
    Seq(500 -> 5000.0, 900 -> 9000.0).foreach { case (q, want) =>
      val sigma = 10000.0 * math.sqrt(q / 1000.0 * (1 - q / 1000.0) / 256.0)
      assert(math.abs(est(("big", q)) - want) <= 5 * sigma,
        s"p$q estimate ${est(("big", q))} outside 5 sigma ($sigma) of $want")
    }
  }

  test("qsample shard merge picks exactly the single-pass sample rows") {
    val df = (1L to 5000L).map(i => (s"g${i % 3}", i)).toDF("g", "v")
    val whole = Sketch.qsampleSketch(df, "g", col("v"), col("v"), k = 64)
    val shards = (0 to 2).map(i =>
      Sketch.qsampleSketch(df.filter(col("v") % 3 === i), "g", col("v"),
        col("v"), k = 64))
    val merged = Sketch.qsampleMerge(shards, "g", k = 64)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty,
      "bottom-k of the shard-sample union must equal the one-pass bottom-k")
  }

  test("kmvDistinct plans the bounded heap, not a per-group sort") {
    import org.apache.spark.sql.execution.SortExec
    val df = (1L to 1000L).map(i => (s"g${i % 3}", i)).toDF("g", "v")
    val plan = Sketch.kmvDistinct(df, "g", col("v"), k = 16)
      .queryExecution.sparkPlan
    assert(plan.collect { case e: graft.plans.TopKPerKeyExec => e }.nonEmpty,
      "the k-minimum digests must come off TopKPerKeyExec")
    assert(plan.collect { case s: SortExec => s }.isEmpty,
      "no sort: the heap bounds per-group state at k digests")
  }
}
