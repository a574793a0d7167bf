package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line on stdout.
  *
  * Each query runs REPS times in the same JVM and reports its MINIMUM — the
  * honest plan cost on a VM whose CPU stalls for multi-minute windows (the
  * round-3 bench reported 175 s for a query that re-times at 2-3 s; minima
  * across in-JVM repeats are stall- and warmup-robust).  The reps are
  * ROUND-ROBIN — pass 1 runs every query once, then pass 2, then pass 3 —
  * so a stall window long enough to cover several queries poisons ONE
  * pass's contiguous block, not all three reps of the same queries
  * (BENCH_r03/r04 both show alphabetically-contiguous slow blocks, the
  * stall signature under back-to-back reps).  A query that throws is
  * recorded in `failed` (and its timing excluded from the total) instead
  * of being silently swallowed as a plausible number.
  */
object Bench {
  private val Reps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val timesByQuery = scala.collection.mutable.Map.empty[String, List[Double]]
    for (pass <- 1 to Reps; (name, fn) <- names) {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name pass $pass FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] pass $pass $name%-32s $dt%8.2f s${if (ok) "" else "  FAILED"}")
      if (ok) timesByQuery(name) = dt :: timesByQuery.getOrElse(name, Nil)
    }
    val results = names.map { case (name, _) =>
      val okTimes = timesByQuery.getOrElse(name, Nil)
      val best = if (okTimes.nonEmpty) okTimes.min else -1.0
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
