package graft

/** Exchange-budget census over the registered catalog: for each named query,
  * build the final frame at sf0.001 and count the shuffle and broadcast
  * exchanges its static physical plan carries.  An accidental extra shuffle
  * does not change answers, so without a recorded budget it is invisible
  * until a bench regresses; with one it fails CI naming the query.
  *
  * Two consumers share [[countExchanges]]:
  *  - PlansSpec's exact pins (the ~27 most expensive plans, asserted
  *    EXACTLY), and
  *  - the full-catalog drift guard: `runMain graft.ExchangeCensus --record`
  *    snapshots every query's counts into
  *    `src/test/resources/exchange_census.tsv`, and PlansSpec fails any
  *    query whose counts GREW past the snapshot (decreases pass — re-record
  *    to ratchet them in).  Re-record after any deliberate plan change or
  *    query registration, with the commit explaining the move.
  *
  * `runMain graft.ExchangeCensus [--record] [sfDir] [name ...]` — without
  * `--record` it prints counts plus one line per exchange (partitioning /
  * build side) for the named queries (default: all).
  */
object ExchangeCensus {

  val SnapshotPath = "src/test/resources/exchange_census.tsv"

  /** Queries excluded from the census: q_aqe_skew's in-body gate asserts a
    * RUNTIME AQE re-plan that depends on the building session's partition
    * sizing (Verify/selfcheck validate it under the driver session). */
  val Skip: Set[String] = Set("q_aqe_skew")

  /** Canonicalized-distinct (shuffles, broadcasts) of a frame's STATIC
    * executed plan.  Exchanges are inserted by EnsureRequirements (an
    * executedPlan preparation); queries that derive their own session
    * inherit AQE from the SparkConf regardless of the caller's override, so
    * an adaptive wrapper is unwrapped to its INITIAL plan
    * (post-EnsureRequirements, nothing executed yet).  Counts dedup on
    * `canonicalized` — exactly the equality ReuseExchange uses — so an AQE
    * initial plan that still carries duplicates it will reuse at runtime
    * counts them once, like the AQE-off plan's ReusedExchangeExec already
    * does. */
  def countExchanges(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    (plan.collect { case e: ShuffleExchangeExec => e }
       .map(_.canonicalized).distinct.size,
     plan.collect { case e: BroadcastExchangeExec => e }
       .map(_.canonicalized).distinct.size)
  }

  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    val record = args.contains("--record")
    val rest = args.filterNot(_ == "--record").toSeq
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.001")
    // Record mode REPLICATES the consumer's environment (SparkTestBase +
    // the drift test's experimental extras) instead of GraftSession:
    // counts must be taken where they are asserted.  Two measured reasons
    // a GraftSession census records different numbers than the test sees:
    // (a) an explicit repartition(np) exchange canonicalizes EQUAL to an
    // EnsureRequirements hash(k, np) only when np == the session's shuffle
    // partitions; (b) extension-injected vs experimental-appended
    // optimizer rules run at different batch positions, which changes
    // inferred not-null filters around rewritten windows and with them
    // whole-subtree exchange REUSE (q_scd2_upsert: 3 exchanges under
    // GraftSession, 5 under the test session).
    val spark =
      if (record) {
        val base = org.apache.spark.sql.SparkSession.builder()
          .master("local[2]")
          .config("spark.sql.shuffle.partitions", "2")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        val ss = base.newSession()
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        ss.experimental.extraOptimizations = Seq(graft.plans.RewriteRankFilterToTopK)
        ss.experimental.extraStrategies = Seq(graft.plans.TopKPerKeyStrategy)
        ss.conf.set("spark.sql.adaptive.enabled", "false")
        ss
      } else GraftSession.builder("local[8]", 8)
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (rest.length > 1) rest.drop(1)
      else graft.queries.Catalog.all.map(_.name).filterNot(Skip)
    val recorded = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val (s, b) = countExchanges(df)
        recorded += ((n, s, b))
        println(s"[census] $n shuffles=$s broadcasts=$b")
        if (!record) {
          val plan = df.queryExecution.executedPlan
          plan.collect { case e: ShuffleExchangeExec => e }
            .foreach(e => println(s"[census]   shuffle: ${e.outputPartitioning}"))
          plan.collect { case e: BroadcastExchangeExec => e }
            .foreach(e => println(s"[census]   broadcast: ${e.mode.getClass.getSimpleName}"))
        }
      } catch {
        case t: Throwable =>
          println(s"[census] $n BUILD FAILED: ${String.valueOf(t.getMessage).take(120)}")
      }
    }
    if (record) {
      val lines = recorded.sortBy(_._1)
        .map { case (n, s, b) => s"$n\t$s\t$b" }
      java.nio.file.Files.write(java.nio.file.Paths.get(SnapshotPath),
        (("# generated by `sbt \"runMain graft.ExchangeCensus --record\"` — " +
          "per-query (shuffles, broadcasts) of the static plan at sf0.001; " +
          "PlansSpec fails any query that GROWS past these") +: lines)
          .mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[census] recorded ${recorded.size} queries into $SnapshotPath")
    }
    spark.stop()
  }
}
