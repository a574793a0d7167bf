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
    "q_tx_prune")               // manifest-level data skipping (r6)

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
    println(s"""{"metric":"total_of_minima","value":${fmt(total)},"unit":"sec","reps":$Reps,"n_queries":${results.size},"queries":${qmap(headline)},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
