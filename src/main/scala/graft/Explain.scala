package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: print the formatted physical plan of one registered
  * query (`runMain graft.Explain <query> [sfDir]`) — the loop used to check
  * pushdown (`PushedFilters`/`ReadSchema`), exchange counts, and
  * whole-stage-codegen spans after every operator change. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.builder("local[4]", 4)
      // AQE performs exchange reuse at RUNTIME; disable to make reuse and
      // exchange placement visible in the static plan.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
