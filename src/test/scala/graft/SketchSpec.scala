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
