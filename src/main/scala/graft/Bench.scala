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
  *
  * SELF-DEFENSE against environment anomalies (round-6 lesson: the official
  * record carried 10.9 s / 4.1 s for two queries that re-measure at ~1.6 s /
  * ~0.4 s on an idle machine — all three round-robin passes were poisoned):
  *
  *  - [[BenchFloors]] records each query's demonstrated clean-run minimum.
  *    After the round-robin passes, any query whose minimum still exceeds
  *    3× its floor is RE-RUN (up to 2 extra reps); both numbers are
  *    reported in the stderr `outliers` map and the extra reps fold into
  *    the final minimum — a transient anomaly heals, a real regression
  *    reproduces and stays visible (floor ratio in the artifact).
  *  - Per-pass JVM telemetry goes to stderr: GC time delta and codegen
  *    compilation count/time deltas (CodegenMetrics), so a poisoned run is
  *    diagnosable from the artifact alone (high GC = memory pressure;
  *    pass-2/3 compilation ≈ pass-1 = codegen-cache thrash).
  *  - `spark.sql.codegen.cache.maxEntries` is raised from the default 100:
  *    this suite generates far more than 100 codegen units per pass, so at
  *    the default every pass repays every Janino compile (the candidates
  *    plan alone costs ~6 s cold) — exactly the between-pass eviction the
  *    round-6 verdict flagged.
  *
  * The stdout line must stay SHORT: the driver keeps only a ~3 KB tail of
  * the run's output, and BENCH_r04's 85-query × 9-decimal line (~3.4 KB)
  * was truncated mid-line → `"parsed": null`, i.e. the round had NO usable
  * bench numbers.  So the machine-readable line carries the all-query
  * total plus per-query minima for a fixed HEADLINE subset (one per
  * operator family); the full per-query map goes to stderr first, where
  * truncation costs nothing.
  */
object Bench {
  private val Reps = 3
  private val FloorRatio = 3.0 // min > ratio × floor ⇒ anomaly suspect
  private val MaxRescues = 20  // > this many outliers = whole-run contamination

  /** One representative per operator family — the queries whose plans we
    * tune and whose regressions matter.  Kept ≤ ~26 names so the stdout
    * JSON stays well under the driver's tail buffer. */
  private val Headline: Seq[String] = Seq(
    "q1_lineitem_agg",          // hash agg
    "q_flagship_revenue",       // join→agg→rank analytics
    "q_bucketed_join",          // shuffle-free co-located join
    "q_salted_agg",             // skew salting
    "q_window_topk_per_group",  // window rank
    "q_rolling_sum",            // window frame
    "q_range_join",             // binned interval join
    "q_asof_join",              // one-shuffle asof
    "q_s4_extract_blocks",      // extract reconstruction pipeline
    "q_s10_upsert_partitioned", // partitioned lake upsert
    "q_union_offsets",          // two-stage global offsets
    "q_dedup_exact",            // exact dedup
    "q_minhash_candidates",     // MinHash LSH candidate join
    "q_ngram_jaccard",          // shingle self-join w/ DF cutoff
    "q_simhash_near_dup",       // banded SimHash + Hamming verify
    "q_lsh_topk_multiprobe",    // ANN multi-probe
    "q_ivf_topk",               // ANN IVF
    "q_tfidf_top_term",         // corpus-wide TF-IDF
    "q_corpus_pipeline",        // end-to-end corpus assembly
    "q_sessionize",             // sessionization
    "q_custom_topk",            // custom heap operator
    "q_st6_stream_stream_join", // streaming join
    "q_tx_merge",               // segment-pruned ACID MERGE (r6)
    "q_bpe_pairs",              // BPE tokenizer-induction statistic (r6)
    "q_st9_tx_stream_sink",     // exactly-once streaming sink (r6)
    "q_semdedup",               // cluster-scoped semantic dedup (r6)
    "q_kmv_distinct",           // deterministic distinct sketch (r6)
    "q_tx_prune",               // manifest-level data skipping (r6)
    "q_quantile_sketch")        // bottom-k quantile sketch (r7)

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  /** (compilations so far, current mean ms/compile) from Spark's codegen
    * source.  The mean is a snapshot of the sliding reservoir — reported
    * as-is, NOT multiplied back into a total (reservoir decay makes that
    * non-monotonic). */
  private def codegenStats(): (Long, Long) = {
    val h = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
    (h.getCount, h.getSnapshot.getMean.round)
  }

  /** Fixed single-thread CPU score: wall ms for a constant FNV-1a integer
    * loop (2^27 steps).  Floors are only comparable across rounds when the
    * machine class is — the r16 clean-idle run measured a uniform ~1.3×
    * min/floor ratio on queries untouched for rounds while the wall-clock-
    * bound streaming queries sat at 1.0×, the slower-CPU signature (same as
    * the r15 windows at 1.27/1.39).  This score, emitted per pass, makes
    * that attribution a direct comparison against the score recorded with
    * the floors (BenchFloors scaladoc) instead of an inference from ratio
    * patterns. */
  private def cpuScoreMs(): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    val t0 = System.nanoTime()
    while (i < (1 << 27)) {
      h ^= i
      h *= 0x100000001b3L
      i += 1
    }
    val ms = (System.nanoTime() - t0) / 1000000
    if (h == 42L) System.err.println("[bench] fnv sentinel") // keep the loop live
    ms
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      // default 100 entries evicts within one pass over this suite: every
      // round-robin pass would repay every Janino compile (round-6 verdict)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional args(0) regex restricts the suite for targeted local timing;
    // the driver's no-args invocation benches everything
    val nameFilter: String => Boolean =
      if (args.nonEmpty) { val re = args(0).r; n => re.findFirstIn(n).isDefined }
      else _ => true
    val names = SparkEntry.queries.toSeq.filter(kv => nameFilter(kv._1)).sortBy(_._1)
    val timesByQuery = scala.collection.mutable.Map.empty[String, List[Double]]

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                tag: String): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name $tag FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $tag $name%-32s $dt%8.2f s${if (ok) "" else "  FAILED"}")
      if (ok) { timesByQuery(name) = dt :: timesByQuery.getOrElse(name, Nil); Some(dt) }
      else None
    }

    for (pass <- 1 to Reps) {
      val cpuMs = cpuScoreMs()
      val (gc0, (cc0, _)) = (gcMillis(), codegenStats())
      val t0 = System.nanoTime()
      names.foreach { case (name, fn) => runOnce(name, fn, s"pass $pass") }
      val (gc1, (cc1, meanMs)) = (gcMillis(), codegenStats())
      // pass telemetry: a poisoned pass shows here (GC storm) or codegen
      // thrash shows as pass-2/3 compile counts ≈ pass-1's
      System.err.println(
        s"""{"pass_telemetry":{"pass":$pass,"wall_s":${f"${(System.nanoTime() - t0) / 1e9}%.1f"},""" +
          s""""gc_ms":${gc1 - gc0},"codegen_compiles":${cc1 - cc0},"codegen_mean_ms":$meanMs,"cpu_score_ms":$cpuMs}}""")
    }

    // floor-based anomaly rescue: a min still >3× its demonstrated clean
    // cost after 3 spread-out passes is an environment suspect — re-measure
    // now (same JVM, warm caches) instead of shipping it unchallenged
    val floorsApply = sfDir.contains("sf0.1") // floors were recorded at sf0.1
    val outliers = if (!floorsApply) Seq.empty else names.flatMap { case (name, fn) =>
      val min3 = timesByQuery.get(name).map(_.min)
      val floor = BenchFloors.floors.get(name)
      (min3, floor) match {
        case (Some(m), Some(f)) if m > FloorRatio * f => Some((name, fn, m, f))
        case _ => None
      }
    }
    val rescued = outliers.take(MaxRescues).map { case (name, fn, min3, floor) =>
      (1 to 2).foreach(r => runOnce(name, fn, s"rescue $r"))
      val after = timesByQuery(name).min
      (name, min3, after, floor)
    }
    if (outliers.size > MaxRescues)
      System.err.println(s"[bench] ${outliers.size} outliers exceed the rescue cap " +
        s"$MaxRescues — whole-run contamination, interpret totals accordingly")
    if (rescued.nonEmpty)
      System.err.println("""{"outliers":{""" + rescued.map { case (n, m3, af, fl) =>
        "\"" + n + s"""":{"min3":${f"$m3%.3f"},"after_rescue":${f"$af%.3f"},"floor":${f"$fl%.3f"}}"""
      }.mkString(",") + "}}")

    val results = names.map { case (name, _) =>
      val okTimes = timesByQuery.getOrElse(name, Nil)
      val best = if (okTimes.nonEmpty) okTimes.min else -1.0
      (name, best, okTimes.nonEmpty)
    }
    def fmt(v: Double): String = f"$v%.3f"
    def qmap(rs: Seq[(String, Double, Boolean)]): String =
      rs.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // full detail → stderr (BEFORE stdout so it can never push the
    // machine-readable line out of the driver's tail buffer)
    System.err.println(s"""{"all_queries":${qmap(results)}}""")
    val headline = results.filter { case (k, _, ok) => ok && Headline.contains(k) }
    println(s"""{"metric":"total_of_minima","value":${fmt(total)},"unit":"sec","reps":$Reps,"n_queries":${results.size},"rescued":${rescued.size},"queries":${qmap(headline)},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
