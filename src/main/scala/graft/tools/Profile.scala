package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Text

/** Scratch profiling main: time labeled sub-plans of a hot query in
  * isolation (`runMain graft.tools.Profile <sfDir>`). */
object Profile {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    System.err.println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")

    time("tokens")(d.select(explode(Text.tokens(col("text")))).count())
    time("shingle rows")(Text.shingleRows(d, "text", "doc_id").count())
    time("bands")(Text.minhashBands(d, "text", "doc_id").count())
    time("candidates")(Text.minhashCandidates(Text.minhashBands(d, "text", "doc_id")).count())
    time("simhash")(Text.simhashRelational(d, "text", "doc_id").count())
    time("ngram jaccard")(Text.ngramJaccardPairs(d, "text", "doc_id", 20, 0.1).count())
    time("dedup exact")(Text.dedupExact(d, "text", "doc_id").count())
    if (sys.env.contains("GRAFT_EXPLAIN")) {
      System.err.println("=== flagship revenue ===")
      graft.queries.Catalog.flagshipRevenue(spark, sfDir).explain("formatted")
      System.err.println("=== g1 explode production ===")
      graft.queries.Fixtures.production(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
