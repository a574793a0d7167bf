package graft.tools

import graft.GraftSession

/** Throwaway timing harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    for (name <- args; rep <- 1 to 2) {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      if (sys.env.contains("SCRATCH_NOCK")) ss.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      val t0 = System.nanoTime()
      val df = qs(name)(ss, sfDir)
      if (sys.env.contains("SCRATCH_EXPLAIN") && rep == 1) df.explain("formatted")
      val n = df.count()
      println(f"[scratch] TUNED $name rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
