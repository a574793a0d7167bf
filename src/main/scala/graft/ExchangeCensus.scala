package graft

/** Exchange-budget census: for each named query (default: the bench's most
  * expensive set pinned in PlansSpec), build the final frame at sf0.001 and
  * print how many shuffle and broadcast exchanges its static physical plan
  * carries, plus one line per exchange (partitioning / build side) — the
  * recording half of PlansSpec's exchange-budget regression pin.  An
  * accidental extra shuffle does not change answers, so without a budget it
  * is invisible until a bench regresses; with one it fails CI naming the
  * query.  `runMain graft.ExchangeCensus [sfDir] [name ...]`. */
object ExchangeCensus {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("local[8]", 8)
      // exchanges are INSERTED by EnsureRequirements (an executedPlan
      // preparation) and AQE wraps the tree at runtime — count on the
      // static executedPlan with AQE off, exactly like Explain
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.queries.Catalog.all.map(_.name)
    for (n <- names) {
      try {
        val plan = SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
        val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
        val bcasts = plan.collect { case e: BroadcastExchangeExec => e }
        println(s"[census] $n shuffles=${shuffles.size} broadcasts=${bcasts.size}")
        shuffles.foreach(e => println(s"[census]   shuffle: ${e.outputPartitioning}"))
        bcasts.foreach(e => println(s"[census]   broadcast: ${e.mode.getClass.getSimpleName}"))
      } catch {
        case t: Throwable =>
          println(s"[census] $n BUILD FAILED: ${String.valueOf(t.getMessage).take(120)}")
      }
    }
    spark.stop()
  }
}
