package graft

import org.apache.spark.sql.functions._

import graft.engine.Vector

/** Driver-contract smoke: what the harness checks, checked here first. */
class EntrySpec extends SparkFunSuite {
  import spark.implicits._

  test("entry (flagship) returns rows on sf0.001 and the expected columns") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq === Seq("n_name", "n_orders", "revenue", "n_items"))
    assert(df.count() > 0)
  }

  test("every query has a distinct name; every oracle key is a registered query") {
    val names = queries.Catalog.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 55)
  }

  test("EVERY registered query carries an oracle (zero rows-only entries)") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  test("every oracle declares a total ORDER BY (hash compare is order-sensitive)") {
    // single-row global aggregates are inherently ordered
    val singleRow = Set("q_c3_rename_defaults", "q_c4_rename_regex",
      "q_c6_metadata_lits", "q_tx_merge", "q_minhash_recall", "q_oph_recall",
      "q_tx_prune",
      "q_st11_tx_stream_merge", "q_csv_corrupt_records", "q_k_anonymity",
      "q_tx_prune_str", "q_runtime_bloom", "q_tx_stats_sidecar", "q_tx_dfp",
      "q_tx_wap", "q_zipf_fit", "q_l_diversity", "q_hhi", "q_gini",
      "q_welch_t", "q_spearman")
    SparkEntry.oracleSql.filterNot(kv => singleRow(kv._1)).foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"), s"$name oracle lacks ORDER BY")
    }
  }

  test("ivfTopK finds neighbors from the query's own cluster") {
    // two tight clusters; centroid stand-ins are the first 2 vectors (one in
    // each cluster) so probing nprobe=1 stays within the right cluster.
    def v(base: Double, i: Int) = Seq.tabulate(8)(j =>
      (base + (if (j == i % 8) 0.01f else 0f)).toFloat)
    val vecs = (Seq((0L, v(1.0, 0)), (1L, v(-1.0, 1))) ++
      (2L to 9L).map(i => (i, v(if (i % 2 == 0) 1.0 else -1.0, i.toInt))))
      .toDF("vec_id", "embedding")
    val got = Vector.ivfTopK(vecs.filter($"vec_id" === 2), vecs, 3, nlist = 2, nprobe = 1)
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getAs[Long]("c_id") % 2 === 0,
      "neighbors must come from the even (same-direction) cluster"))
  }
}
