package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line on stdout.
  *
  * Each query runs REPS times in the same JVM and reports its MINIMUM — the
  * honest plan cost on a VM whose CPU stalls for multi-minute windows (the
  * round-3 bench reported 175 s for a query that re-times at 2-3 s; minima
  * across in-JVM repeats are stall- and warmup-robust).  A query that throws
  * is recorded in `failed` (and its timing excluded from the total) instead
  * of being silently swallowed as a plausible number.
  */
object Bench {
  private val Reps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to Reps).map { rep =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name rep $rep FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            false
          }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      val okTimes = times.collect { case (true, t) => t }
      val best = if (okTimes.nonEmpty) okTimes.min else -1.0
      System.err.println(f"[bench] $name%-32s min $best%8.2f s  (${times.map(t => f"${t._2}%.2f").mkString(", ")})")
      (name, best, okTimes.nonEmpty)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total_of_minima","value":$total,"unit":"sec","reps":$Reps,"queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
