package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Sketch

/** Randomized shard-split fuzz for the mergeable-sketch property the scale
  * story rests on: for ANY partition of the input into shards,
  * shard-then-merge must equal the single-pass sketch EXACTLY (KMV and
  * qsample: row for row; CMS: cell for cell) — that is what makes each a
  * partial aggregate executors can build locally.  The targeted SketchSpec
  * cases pin one hand-built split each; this suite draws random data and
  * RANDOM shard assignments (2–4 shards, unbalanced, some shards missing
  * whole groups), and additionally duplicates a shard in the KMV/qsample
  * merges — the `distinct` guard makes those merges idempotent under
  * overlapping shards (CMS is linear by design, so overlap is excluded
  * there).  Seeds fixed.
  */
class SketchFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private def rows(df: DataFrame, cols: String*): Set[Seq[Any]] =
    df.select(cols.map(col): _*).collect().map(_.toSeq).toSet

  for (seed <- FuzzSeeds.seeds(71L, 227L)) {
    test(s"random shard splits (seed $seed): KMV, CMS, and qsample merges " +
      "equal the single-pass sketches exactly") {
      val rng = new scala.util.Random(seed)
      val nShards = 2 + rng.nextInt(3)
      val data: Seq[(Long, Long, Long, Int)] = (1 to 120).map { i =>
        (1L + rng.nextLong(3), rng.nextLong(40), i.toLong, rng.nextInt(nShards))
      }
      val all = data.toDF("g", "v", "id", "shard")
      val shards: Seq[DataFrame] =
        (0 until nShards).map(s => all.filter(col("shard") === s))

      // KMV — and idempotent under a duplicated shard
      val k = 16
      val kmvSingle = rows(Sketch.kmvSketch(all, "g", col("v"), k), "g", "__h")
      val kmvShards = shards.map(Sketch.kmvSketch(_, "g", col("v"), k))
      assert(rows(Sketch.kmvMerge(kmvShards, "g", k), "g", "__h") == kmvSingle,
        s"seed $seed: KMV shard-merge diverged from the single pass")
      assert(rows(Sketch.kmvMerge(kmvShards :+ kmvShards.head, "g", k),
        "g", "__h") == kmvSingle,
        s"seed $seed: KMV merge is not idempotent under an overlapping shard")

      // CMS — cell-for-cell
      val (d, w) = (4, 32)
      val cmsSingle = rows(Sketch.cmsSketch(all, col("v"), d, w),
        "__i", "__b", "__c")
      val cmsMerged = rows(Sketch.cmsMerge(
        shards.map(Sketch.cmsSketch(_, col("v"), d, w))), "__i", "__b", "__c")
      assert(cmsMerged == cmsSingle,
        s"seed $seed: CMS shard-merge diverged from the single pass " +
          s"(missing ${cmsSingle -- cmsMerged}, extra ${cmsMerged -- cmsSingle})")

      // qsample — row-for-row, then identical finished quantiles
      val qsSingle = Sketch.qsampleSketch(all, "g", col("v"), col("id"), k)
      val qsMergedDf = Sketch.qsampleMerge(
        shards.map(Sketch.qsampleSketch(_, "g", col("v"), col("id"), k)) :+
          Sketch.qsampleSketch(shards.head, "g", col("v"), col("id"), k),
        "g", k)
      assert(rows(qsMergedDf, "g", "__h", "__v") ==
        rows(qsSingle, "g", "__h", "__v"),
        s"seed $seed: qsample shard-merge diverged from the single pass")
      val pm = Seq(100, 500, 900)
      assert(rows(Sketch.qsampleQuantiles(qsMergedDf, "g", pm),
        "g", "q_pm", "est") ==
        rows(Sketch.qsampleQuantiles(qsSingle, "g", pm), "g", "q_pm", "est"),
        s"seed $seed: finished quantiles diverged between merge and single pass")
    }
  }
}
