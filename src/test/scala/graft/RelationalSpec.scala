package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.engine.Relational

class RelationalSpec extends SparkFunSuite {
  import spark.implicits._

  test("P1 footer filter drops 'total' rows case/space-insensitively") {
    val df = Seq(" Total ", "TOTAL", "total", "12", "Totals").toDF("first")
    val got = Relational.dropFooterRows(df, "first").collect().map(_.getString(0))
    assert(got.toSet === Set("12", "Totals"))
  }

  test("P3 numeric CSV gate") {
    val df = Seq("7, 8, 9", "7;8", "see map", " 14 ", "").toDF("g")
    val got = df.filter(Relational.numericCsvOnly($"g")).collect().map(_.getString(0))
    assert(got.toSet === Set("7, 8, 9", " 14 "))
  }

  test("G1 explode: output rows = sum of list sizes over surviving rows") {
    val df = Seq(("a", "1,2,3"), ("b", "4"), ("c", "bad;"), ("d", "5, 6")).toDF("id", "g")
    val out = Relational.explodeCsv(df, "g", "unit")
    assert(out.count() === 6)
    assert(out.columns.toSeq === Seq("id", "unit"))
    assert(out.filter($"id" === "d").collect().map(_.getInt(1)).toSet === Set(5, 6))
  }

  test("property: explode row count equals total element count of valid rows") {
    val xs = Gen.listOfN(100, Gen.nonEmptyListOf(Gen.choose(0, 999))).sample.get
    val rows = xs.zipWithIndex.map { case (l, i) => (i, l.mkString(",")) }
    val expected = rows.map(_._2.split(",").length).sum
    assert(Relational.explodeCsv(rows.toDF("id", "g"), "g", "u").count() === expected)
  }

  test("O3 topK returns k rows in order") {
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 100).toDouble)).toDF("id", "v")
    val got = Relational.topK(df, 5, $"v".desc, $"id").collect()
    assert(got.length === 5)
    val vs = got.map(_.getDouble(1)).toSeq
    assert(vs === vs.sorted.reverse)
  }

  test("U1 unionWithOffsets numbers rows globally in (page, row) order") {
    val p1 = Seq((1, 1, "a"), (1, 2, "b")).toDF("page", "row", "v")
    val p2 = Seq((2, 1, "c")).toDF("page", "row", "v")
    val got = Relational.unionWithOffsets(Seq(p1, p2), "page", "row")
      .orderBy("global_row").collect()
    assert(got.map(r => (r.getAs[Long]("global_row"), r.getAs[String]("v"))).toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("U1 two-stage offsets match single-window numbering on uneven pages") {
    val pages = Seq(
      Seq((3, 1, "g"), (3, 2, "h")).toDF("page", "row", "v"),
      Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "c")).toDF("page", "row", "v"),
      Seq((2, 7, "f"), (2, 4, "e")).toDF("page", "row", "v"))
    val got = Relational.unionWithOffsets(pages, "page", "row")
      .orderBy("global_row").collect()
      .map(r => (r.getAs[Long]("global_row"), r.getAs[String]("v"))).toSeq
    assert(got === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "e"), (5L, "f"), (6L, "g"), (7L, "h")))
  }

  test("property: two-stage offsets equal naive global (page, row) numbering") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 500).map(i => (rnd.nextInt(7) + 1, i, s"v$i"))
    val byPage = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (p, rs) => rs.toDF("page", "row", "v") }
    val got = Relational.unionWithOffsets(byPage, "page", "row")
      .orderBy("global_row").collect()
      .map(r => (r.getAs[Long]("global_row"), r.getAs[String]("v"))).toSeq
    val expected = rows.sortBy(t => (t._1, t._2)).zipWithIndex
      .map { case ((_, _, v), i) => ((i + 1).toLong, v) }
    assert(got === expected)
  }

  test("every registered window-family query plans ONLY partitioned Windows") {
    // The catalog-wide 100 TB invariant: a partition-less Window funnels the
    // whole input through ONE task.  Every lazily-constructed registered
    // query that uses window functions is asserted here (eager queries —
    // streaming/upsert — are excluded from the walk, not from the rule;
    // their windows come from the same audited helpers).
    import org.apache.spark.sql.execution.window.WindowExec
    val windowQueries = Seq(
      "q_union_offsets", "q_s4_extract_blocks", "q_window_topk_per_group",
      "q_rolling_sum", "q_percent_rank", "q_ntile_shards", "q_lag_lead",
      "q_streaks", "q_range_frame", "q_mode_per_user", "q_forward_fill",
      "q_sessionize", "q_tfidf_top_term",
      "q_pack_chunks", "q_sample_fixed_k", "q_shuffle_order")
    for (name <- windowQueries) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
      assert(windows.nonEmpty, s"$name: expected at least one Window")
      windows.foreach(w =>
        assert(w.partitionSpec.nonEmpty, s"$name plans a partition-less window"))
    }
  }

  test("no join-bearing registered query plans a cartesian or unbounded nested loop") {
    // The catalog-wide no-all-pairs invariant: every candidate generation
    // and join must be key-based (hash/sort-merge/broadcast-hash) — a
    // CartesianProduct or a non-broadcast nested loop is the O(N²) shape
    // that dies at 100 TB.  q_cosine_brute_topk is the one DOCUMENTED
    // broadcast-nested-loop baseline (bounded broadcast query side); it is
    // asserted separately to stay broadcast, never cartesian.
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val joinQueries = Seq(
      "q_flagship_revenue", "q_semi_join", "q_anti_join", "q_bucketed_join",
      "q_pop_harvest_join", "q_range_join", "q_asof_join",
      "q_minhash_candidates", "q_near_dup_jaccard", "q_ngram_jaccard",
      "q_dedup_incremental", "q_vocab_overlap", "q_contamination",
      "q_simhash_near_dup", "q_corpus_pipeline", "q_centroid_dist",
      "q_lsh_topk", "q_ivf_topk", "q_outlier_mad", "q_snapshot_diff",
      "q_mixture_sample", "q_dedup_embed_cosine", "q_near_dup_edit", "q_semdedup",
      "q_kmv_distinct", "q_containment_pairs", "q_containment_dedup",
      "q_kmv_intersect")
    for (name <- joinQueries) {
      val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.sparkPlan
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
        s"$name plans a CartesianProduct")
      assert(plan.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
        s"$name plans a nested-loop join")
    }
    val brute = SparkEntry.queries("q_cosine_brute_topk")(spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan
    assert(brute.collect { case c: CartesianProductExec => c }.isEmpty,
      "brute-force baseline must broadcast its bounded query side, not go cartesian")
  }

  test("corpus pipeline scan is pruned to the 4 referenced columns") {
    // The flagship composition claim, checked: chaining gate → dedup →
    // mixture → packing must still push column pruning to the parquet scan
    // (n_chars never read).  Guards against a future stage accidentally
    // widening the scan with a select-star.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val plan = SparkEntry.queries("q_corpus_pipeline")(spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val cols = s.requiredSchema.fieldNames.toSet
      assert(cols.subsetOf(Set("doc_id", "source", "lang", "text")),
        s"corpus pipeline scan reads unnecessary columns: $cols")
    }
  }

  test("headline queries hold their exchange budgets (shuffle-count regression guard)") {
    // Exchanges only exist in the PREPARED plan with AQE off — sparkPlan
    // predates EnsureRequirements and an AdaptiveSparkPlanExec hides its
    // inner plan from collect(), so any exchange assert elsewhere is
    // vacuous.  Budgets are the measured counts (incl. the presentation
    // sort); a future plan regression (lost broadcast, widened scan,
    // doubled shuffle) fails here before it costs anything at scale.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    val budgets = Map(
      "q1_lineitem_agg" -> 2,     // agg + presentation sort
      "q_flagship_revenue" -> 3,  // join key + agg + sort (dims broadcast)
      "q_corpus_pipeline" -> 3,   // dedup agg + packing window + sort
      "q_dedup_exact" -> 2,
      "q_mixture_sample" -> 2,    // rate join is broadcast: agg + sort only
      "q_token_budget" -> 2,      // budget window + agg share the group key
      "q_pack_chunks" -> 2,
      "q_chunk_overlap" -> 1,     // presentation sort ONLY: op is shuffle-free
      "q_sessionize" -> 2,
      "q_topk_orders" -> 0,       // TakeOrderedAndProject
      "q_salted_join" -> 2,       // dim broadcasts even replicated: agg + sort
      "q_resample_gapfill" -> 4,  // bucket agg + bounds agg + grid join + LOCF/sort
      "q_partial_agg_merge" -> 3, // shard partials + merge + sort
      "q_variant_extract" -> 2,
      "q_sample_weighted" -> 0,   // A-ES top-k is TakeOrderedAndProject twice
      "q_expectations" -> 1,      // one agg for N rules; stack is free
      "q_inverted_index" -> 3,    // distinct + term agg + sort
      "q_custom_topk" -> 2,       // key exchange + presentation sort, NO group sort
      "q_funnel" -> 2,            // user agg + global funnel agg
      "q_zscore" -> 3,            // moments agg + post-clip agg + sort (bounds broadcast)
      "q_winsorize" -> 3,         // percentile agg + clipped agg + sort
      "q_string_agg" -> 2,        // collect agg + sort
      "q_novelty" -> 3,           // doc repartition + df agg + doc agg (sort reuses)
      "q_triangles" -> 6,         // edge distinct + two wedge joins + stats aggs
      "q_bpe_pairs" -> 2,         // word-freq agg + pair agg; top-k is TakeOrdered
      "q_unigram_surprisal" -> 4, // model agg + co-partitioned join + doc agg + sort
      "q_dsir_weights" -> 4, // model agg + co-partitioned join + doc agg + sort
      "q_semdedup" -> 4, // assign is shuffle-free (broadcast-literal argmax): vec join + pair join + distinct + sort
      "q_kmv_distinct" -> 5,      // digest distinct + heap key exchange + exact-side agg + join + sort
      "q_ewma" -> 2,              // key repartition (the fold's only exchange) + presentation sort
      "q_gopher_rules" -> 1,      // presentation sort only: the rules are shuffle-free per-row arithmetic
      "q_mixture_temperature" -> 3) // source agg + 1-row normalizer + sort
    for ((name, budget) <- budgets) {
      val n = SparkEntry.queries(name)(ss, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }.size
      assert(n <= budget, s"$name plans $n shuffles, budget $budget")
    }
  }

  test("asofJoin matches the most recent right row at or before each left ts") {
    val l = Seq((1L, 10L, 100L), (1L, 5L, 101L), (1L, 2L, 103L), (2L, 7L, 102L))
      .toDF("k", "ts", "lid")
    val r = Seq((1L, 5L, 201L, 1.5), (1L, 8L, 202L, 2.5), (2L, 9L, 203L, 3.5))
      .toDF("k", "ts", "rid", "v")
    val got = Relational.asofJoin(l, r, Seq("k"), "ts", Seq("rid", "v"))
      .orderBy("lid").collect()
      .map(row => row.getAs[Long]("lid") ->
        (if (row.isNullAt(row.fieldIndex("r_rid"))) None
         else Some((row.getAs[Long]("r_rid"), row.getAs[Double]("r_v"))))).toMap
    assert(got(100L) === Some((202L, 2.5))) // ts 10 → latest right at 8
    assert(got(101L) === Some((201L, 1.5))) // equal ts matches (>= semantics)
    assert(got(103L) === None)              // before any right row
    assert(got(102L) === None)              // right exists only AFTER left ts
  }

  test("asofJoin keeps the matched row's NULL values (no cross-row column mixing)") {
    // right ts=2 row has v = NULL: the match must return (rid=20, v=NULL),
    // NOT resurrect v=5.0 from the older ts=1 row.
    val l = Seq((1L, 3L, 100L)).toDF("k", "ts", "lid")
    val r = Seq((1L, 1L, 10L, Some(5.0)), (1L, 2L, 20L, None: Option[Double]))
      .toDF("k", "ts", "rid", "v")
    val row = Relational.asofJoin(l, r, Seq("k"), "ts", Seq("rid", "v")).head()
    assert(row.getAs[Long]("r_rid") === 20L)
    assert(row.isNullAt(row.fieldIndex("r_v")),
      "NULL on the matched right row must stay NULL")
  }

  test("rangeJoin pairs rows within the window, inclusive bounds, across bin edges") {
    val w = 3600L * 1000000L
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_micros($"us")).drop("us")
    val l = withTs(Seq((1L, 10L * w + 500000L, 100L), (2L, 5L * w, 101L))
      .toDF("k", "us", "lid"))
    val r = withTs(Seq(
      (1L, 10L * w + 500000L, 1.0), // equal ts → included
      (1L, 9L * w + 600000L, 2.0),  // within window, PREVIOUS bin → included
      (1L, 9L * w + 400000L, 3.0),  // older than window start → excluded
      (1L, 10L * w + 900000L, 4.0), // after the click → excluded
      (2L, 4L * w, 5.0)             // exactly window start (lts - w) → included
    ).toDF("k", "us", "v"))
    val got = Relational.rangeJoin(l, r, Seq("k"), "ts", "ts", w)
      .select("lid", "r_v").collect().map(x => (x.getLong(0), x.getDouble(1))).toSet
    assert(got === Set((100L, 1.0), (100L, 2.0), (101L, 5.0)))
  }

  test("property: rangeJoin agrees with a naive quadratic filter on random data") {
    val rnd = new scala.util.Random(7)
    val w = 100L * 1000000L // 100 s window
    val ls = (0 until 200).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong * 1000000L, i.toLong))
    val rs = (0 until 200).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong * 1000000L, i.toLong))
    def df(xs: Seq[(Long, Long, Long)], id: String) = xs.toDF("k", "us", id)
      .withColumn("ts", timestamp_micros($"us")).drop("us")
    val got = Relational.rangeJoin(df(ls, "lid"), df(rs, "rid"), Seq("k"), "ts", "ts", w)
      .select("lid", "r_rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = (for {
      (lk, lus, lid) <- ls
      (rk, rus, rid) <- rs
      if lk == rk && rus >= lus - w && rus <= lus
    } yield (lid, rid)).toSet
    assert(got === naive)
    assert(naive.nonEmpty) // the generator must actually exercise matches
  }

  test("property: asofJoin agrees with a naive per-row scan on random data") {
    val rnd = new scala.util.Random(42)
    val ls = (0 until 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rs = (0 until 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong * 7 % 1000, i.toLong))
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, ts)
    val lDf = ls.toDF("k", "ts", "lid")
    val rDf = rs.toDF("k", "ts", "rid")
    val got = Relational.asofJoin(lDf, rDf, Seq("k"), "ts", Seq("rid"))
      .collect().map(r => r.getAs[Long]("lid") ->
        (if (r.isNullAt(r.fieldIndex("r_rid"))) -1L else r.getAs[Long]("r_rid"))).toMap
    ls.foreach { case (k, ts, lid) =>
      val naive = rs.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3).getOrElse(-1L)
      assert(got(lid) === naive, s"left $lid (k=$k, ts=$ts)")
    }
  }

  test("sessionize: gap larger than threshold starts a new session") {
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val df = Seq(
      (1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(50), 3L), // 40-min gap → new session
      (2L, ts(5), 4L)
    ).toDF("user_id", "ts", "event_id")
    val out = Relational.sessionize(df, "user_id", "ts", "event_id", 30L * 60 * 1000000)
    val u1 = out.filter($"user_id" === 1).orderBy("event_id")
      .select("session_id").collect().map(_.getLong(0)).toSeq
    assert(u1 === Seq(1L, 1L, 2L))
    assert(out.filter($"user_id" === 2).head().getAs[Long]("session_id") === 1L)
  }

  test("rankWithin assigns dense per-partition row numbers") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val got = Relational.rankWithin(df, Seq("g"), Seq($"v".desc), "rn")
      .filter($"rn" === 1).collect()
    assert(got.map(r => (r.getString(0), r.getInt(1))).toSet === Set(("a", 3), ("b", 9)))
  }

  test("asofJoin drops NULL-timestamp right rows instead of carrying them forward") {
    // a NULL-ts right row sorts FIRST under Spark's ascending default; were
    // it kept, its struct would match every left row of the key — ASOF
    // semantics (r.ts <= l.ts) can never match a NULL ts.
    val l = Seq((1L, 5L, 100L)).toDF("k", "ts", "lid")
    val r = Seq((1L, Some(3L), 10L), (1L, None: Option[Long], 99L))
      .toDF("k", "ts", "rid")
    val row = Relational.asofJoin(l, r, Seq("k"), "ts", Seq("rid")).head()
    assert(row.getAs[Long]("r_rid") === 10L,
      "the NULL-ts right row must never be the match")
    // and with ONLY null-ts right rows, the left row matches nothing
    val rOnlyNull = Seq((1L, None: Option[Long], 99L)).toDF("k", "ts", "rid")
    val row2 = Relational.asofJoin(l, rOnlyNull, Seq("k"), "ts", Seq("rid")).head()
    assert(row2.isNullAt(row2.fieldIndex("r_rid")))
  }

  test("approx_count_distinct tracks exact distinct within its error bound") {
    // the HLL++ sketch is the 100 TB cardinality path (mergeable, O(1)
    // memory per group); it has NO cross-engine oracle — DuckDB's
    // approx_count_distinct is a different HLL — so the contract is an
    // error-bound spec, not a hash match.
    val df = (1 to 5000).map(i => i % 700).toDF("v")
    val exact = df.distinct().count()
    val approx = df.agg(approx_count_distinct($"v", 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx $approx vs exact $exact")
  }

  test("dailyStreaks: consecutive days form one streak, gaps split them") {
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    val df = Seq(
      (1L, ts(1)), (1L, ts(1)), (1L, ts(2)), (1L, ts(3)), // dup day collapses
      (1L, ts(7)), (1L, ts(8)),                           // second streak
      (2L, ts(5))
    ).toDF("user_id", "ts")
    val got = Relational.dailyStreaks(df, "user_id", "ts")
      .collect().map(r => r.getAs[Long]("user") ->
        (r.getAs[Long]("n_streaks"), r.getAs[Long]("max_streak"), r.getAs[Long]("n_days"))).toMap
    assert(got(1L) === ((2L, 3L, 5L)))
    assert(got(2L) === ((1L, 1L, 1L)))
  }

  test("snapshotDiff classifies keys and distinguishes NULL from empty string") {
    val o = Seq((1L, Option("a"), "x"), (2L, Option("b"), "y"),
      (3L, Option.empty[String], "z"), (4L, Option("d"), "w"))
      .toDF("k", "c1", "c2")
    val n = Seq((1L, Option("a"), "x"), (2L, Option("B"), "y"),
      (3L, Option(""), "z"), (5L, Option("e"), "v"))
      .toDF("k", "c1", "c2")
    val got = Relational.snapshotDiff(o, n, Seq("k"), Seq("c1", "c2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "changed", // NULL vs "" must differ — sentinel, not coalesce-to-""
      4L -> "removed", 5L -> "added"))
  }

  test("takeTokenBudget keeps a hash-order prefix, monotone in the budget") {
    val df = (1L to 10L).map(i => ("s", i, "t " * 9 + "t")).toDF("g", "id", "text")
    def kept(b: Long) = graft.engine.Text.takeTokenBudget(
        df, "g", "id", size(graft.engine.Text.tokens(col("text"))), b)
      .collect().map(_.getLong(1)).toSet
    val k35 = kept(35); val k45 = kept(45)
    assert(k35.size === 3 && k45.size === 4, "10-token docs fill 35/45 budgets with 3/4 docs")
    assert(k35.subsetOf(k45), "a doc inside a budget stays inside a larger one")
    assert(kept(5).isEmpty && kept(1000) === (1L to 10L).toSet)
  }

  test("incrementalJoin equals the full recomputed join (append-only IVM)") {
    val a = (1L to 100L).map(i => (i % 11, i)).toDF("k", "va")
    val b = (1L to 40L).map(i => (i % 11, i * 10)).toDF("k", "vb")
    val (a0, da) = (a.filter($"va" % 3 =!= 0), a.filter($"va" % 3 === 0))
    val (b0, db) = (b.filter($"vb" % 40 =!= 0), b.filter($"vb" % 40 === 0))
    val inc = Relational.incrementalJoin(
      a0.join(b0, Seq("k")), a0, da, b0, db, Seq("k"))
    val full = a.join(b, Seq("k"))
    assert(inc.count() === full.count(), "multiset cardinality must match")
    assert(inc.except(full).isEmpty && full.except(inc).isEmpty)
  }

  test("saltedJoin equals the plain join at any salt count (incl. 1)") {
    val big = (1L to 1000L).map(i => (s"k${i % 3}", i)).toDF("k", "v")
    val small = Seq(("k0", 10L), ("k1", 20L), ("k2", 30L), ("k9", 99L)).toDF("k", "w")
    val plain = big.join(small, Seq("k")).select("k", "v", "w")
    for (n <- Seq(1, 8)) {
      val salted = Relational.saltedJoin(big, small, Seq("k"), col("v"), n)
        .select("k", "v", "w")
      assert(salted.count() === plain.count(), s"nSalts=$n changed cardinality")
      assert(salted.except(plain).count() === 0 &&
        plain.except(salted).count() === 0, s"nSalts=$n changed content")
    }
  }

  test("skewSplitJoin equals the plain join for any hot set (empty, some, all)") {
    val big = (1L to 1000L).map(i => (s"k${i % 4}", i)).toDF("k", "v")
    val small = Seq(("k0", 10L), ("k1", 20L), ("k2", 30L), ("k3", 40L),
      ("k9", 99L)).toDF("k", "w")
    val plain = big.join(small, Seq("k")).select("k", "v", "w")
    for (hot <- Seq(Seq.empty[String], Seq("k0"), Seq("k0", "k1", "k9"),
        Seq("k0", "k1", "k2", "k3"))) {
      val split = Relational.skewSplitJoin(big, small, Seq("k"),
          hot.toDF("k")).select("k", "v", "w")
      assert(split.count() === plain.count(), s"hot=$hot changed cardinality")
      assert(split.except(plain).count() === 0 &&
        plain.except(split).count() === 0, s"hot=$hot changed content")
    }
  }

  test("salting levels a 99%-one-key distribution: max shuffle partition ~even") {
    // 99% of rows on one key — the distribution that wedges one reducer
    // in a plain hash shuffle (the load a groupBy/sort-merge join hashes
    // to a partition is exactly repartition-by-expression's).
    val n = 96000
    val salts = 256 // fine salts: many small (key, salt) groups per reducer
    val parts = 32
    val df = (1L to n)
      .map(i => (if (i % 100 != 0) "hot" else s"cold${i % 37}", i, 1.0))
      .toDF("k", "id", "v")
    def maxPartRows(d: org.apache.spark.sql.DataFrame, cols: Seq[org.apache.spark.sql.Column]) =
      d.repartition(parts, cols: _*)
        .rdd.mapPartitions(it => Iterator(it.size)).collect().max
    val unsalted = maxPartRows(df, Seq(col("k")))
    val salted = maxPartRows(
      df.withColumn("__salt", pmod(hash(col("id")), lit(salts))),
      Seq(col("k"), col("__salt")))
    val even = n / parts
    assert(unsalted >= (n * 0.98).toInt,
      s"fixture must be genuinely skewed: one partition held $unsalted of $n")
    assert(salted <= 2 * even,
      s"salted max partition $salted exceeds 2x the even share $even")

    // and the salted aggregate over this distribution is still exact
    val got = Relational.saltedSum(df, Seq("k"),
        col("v"), col("id"), salts, "sum_v")
      .filter(col("k") === "hot").collect().head
    assert(got.getAs[Double]("sum_v") === (n - n / 100).toDouble &&
      got.getAs[Long]("n") === (n - n / 100).toLong)
  }

  test("resampleLocf densifies each key's day grid and forward-fills gaps") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 08:00:00"), 1.0),
      (1L, Timestamp.valueOf("2024-01-01 09:00:00"), 2.0), // same bucket, sums
      (1L, Timestamp.valueOf("2024-01-04 12:00:00"), 4.0), // 2-day hole before
      (2L, Timestamp.valueOf("2024-01-02 00:00:00"), 7.0)  // single-day key
    ).toDF("k", "ts", "x")
    val out = Relational.resampleLocf(df, "k", "ts", sum(col("x")), "DAY", "1 day")
      .orderBy("k", "bucket").collect()
    assert(out.length === 5, "key 1 spans 4 grid days, key 2 spans 1")
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getDouble(2)).toSeq === Seq(3.0, 3.0, 3.0, 4.0),
      "gap days carry the last observed value")
    assert(k1.map(_.getBoolean(3)).toSeq === Seq(false, true, true, false),
      "only the hole days are flagged as gaps")
  }

  test("mergeAggState over any sharding equals the direct aggregation") {
    val df = (1L to 500L)
      .map(i => (s"g${i % 3}", i % 7, (i % 13).toDouble)).toDF("g", "sh", "x")
    val direct = df.groupBy("g")
      .agg(count("x").as("n"),
        sum(col("x").cast("decimal(38,6)")).cast("double").as("sum"),
        min("x").as("min"), max("x").as("max"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    for (shard <- Seq(col("sh"), lit(0))) { // many shards and the degenerate one
      val merged = Relational.mergeAggState(
        Relational.partialAggState(df, Seq("g"), shard, col("x")), Seq("g"))
      merged.collect().foreach { r =>
        val (n, s, mn, mx) = direct(r.getString(0))
        assert(r.getLong(1) === n && r.getDouble(2) === s)
        assert(r.getDouble(3) === mn && r.getDouble(4) === mx)
        assert(r.getDouble(5) === s / n, "avg derived at merge, not stored")
      }
    }
  }

  test("ewmaLast folds per key in event order with the exact recursion") {
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    // key 1: x = [4, 8, 2] in ts order (ids break the tie at ms=20)
    //   y = 4 -> 4*.75 + 8*.25 = 5 -> 5*.75 + 2*.25 = 4.25
    // key 2: single event -> y = its value
    val df = Seq(
      (1L, ts(10), 1L, 4.0), (1L, ts(20), 3L, 2.0), (1L, ts(20), 2L, 8.0),
      (2L, ts(5), 9L, 7.5)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = graft.engine.Relational
      .ewmaLast(df, "user_id", "ts", "event_id", "value", alpha = 0.25)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === Map(1L -> (3L, 4.25), 2L -> (1L, 7.5)))
  }

  test("intervalJoin: overlap semantics, single attribution, malformed drop") {
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(min * 60000L)
    val binW = 10L * 60 * 1000000L // 10-minute bins
    // key 1: L=[0,25] overlaps R=[20,40] (touching R=[25,..] inclusive) and
    // R=[25,30]; misses R=[26,30]... boundaries are CLOSED: [0,25]∩[25,30]≠∅
    val left = Seq((1L, ts(0), ts(25), "a"), (1L, ts(50), ts(55), "b"),
      (2L, ts(0), ts(100), "c"), (3L, ts(10), ts(5), "bad"))
      .toDF("k", "s", "e", "lid")
    val right = Seq((1L, ts(20), ts(40), "x"), (1L, ts(25), ts(30), "y"),
      (1L, ts(56), ts(60), "z"), (2L, ts(30), ts(35), "w"),
      (3L, ts(0), ts(20), "v"), (2L, ts(99), ts(90), "bad2"))
      .toDF("k", "s", "e", "rid")
    val got = graft.engine.Relational
      .intervalJoin(left, right, Seq("k"), "s", "e", "s", "e", binW)
      .select("lid", "r_rid").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    // brute force over well-formed intervals: pairs with ls<=re && rs<=le
    assert(got.toSeq === Seq(("a", "x"), ("a", "y"), ("c", "w")),
      s"overlap pairs mismatch: ${got.toSeq}")
    // single attribution: spans covering MANY shared bins still emit one
    // row per pair — (c,w) shares bins 3 (30-40) despite L covering 0..10
    assert(got.count(_ == (("c", "w"))) === 1, "no duplicate attribution")

    // plan shape: the non-equi predicate must ride an EQUI join on
    // (key, bin) — never a nested-loop/cartesian candidate generator
    val plan = graft.engine.Relational
      .intervalJoin(left, right, Seq("k"), "s", "e", "s", "e", binW)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"intervalJoin must plan as an equi-join on (key, bin):\n$plan")
  }

  test("acf: alternating series hand values, gaps drop pairs") {
    // v = 1,2,1,2,1,2 at t = 0..5: mean 1.5, deviations ±0.5
    // acf(1) = 5·(−0.25)/(6·0.25) = −5/6; acf(2) = 4·(0.25)/1.5 = 2/3
    val pts = Seq((0L, 1L), (1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L), (5L, 2L))
    val s = pts.toDF("t", "v")
    val got = graft.engine.Relational.acf(s, col("t"), col("v"), maxLag = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // sxy at lag 1: 1·2+2·1+1·2+2·1+1·2 = 10; lag 2: 1+4+1+4 = 10
    assert(got.toSeq === Seq((1L, 5L, 10L, r9(-5.0 / 6)), (2L, 4L, 10L, r9(2.0 / 3))),
      s"hand ACF mismatch: ${got.toSeq}")

    // a gap at t=3 drops exactly the pairs that straddle it
    val gappy = pts.filterNot(_._1 == 3L).toDF("t", "v")
    val g1 = graft.engine.Relational.acf(gappy, col("t"), col("v"), maxLag = 1)
      .collect().head
    assert(g1.getLong(1) === 3L, "lag-1 pairs must drop (2,3) and (3,4)")
  }

  test("spearman: monotone link scores 1, reversal -1, brute-force parity") {
    def sp(rows: Seq[(Double, Double)]) = graft.engine.Relational.spearman(
      rows.zipWithIndex.map { case ((x, y), i) => (x, y, i.toLong) }
        .toDF("x", "y", "id"),
      col("x"), col("y"), col("id")).collect().head
    // any monotone (even wildly nonlinear) link → exactly 1 after rounding
    val mono = sp(Seq((1.0, 2.0), (2.0, 9.0), (3.0, 9.5), (100.0, 2000.0)))
    assert(mono.getLong(0) === 4L && mono.getDouble(1) === 1.0, s"got $mono")
    assert(sp(Seq((1.0, 8.0), (2.0, 4.0), (3.0, 2.0), (4.0, 1.0))).getDouble(1) === -1.0)

    // brute-force parity on a seeded positive sample spanning octaves
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((math.exp(rnd.nextGaussian() * 3) + 0.01,
      math.exp(rnd.nextGaussian() * 3) + 0.01))
    val got = sp(rows).getDouble(1)
    // reference: rank by (value, index), Pearson on ranks
    def ranks(vs: Seq[Double]) = vs.zipWithIndex.sortBy(identity)
      .zipWithIndex.map { case ((_, i), r) => i -> (r + 1).toDouble }.toMap
    val (rx, ry) = (ranks(rows.map(_._1)), ranks(rows.map(_._2)))
    val n = rows.size
    val pairs = rows.indices.map(i => (rx(i), ry(i)))
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val brute = (pairs.map(p => p._1 * p._2).sum - sx * sy / n) /
      math.sqrt((pairs.map(p => p._1 * p._1).sum - sx * sx / n) *
        (pairs.map(p => p._2 * p._2).sum - sy * sy / n))
    assert(math.abs(got - brute) < 1e-8, s"engine rho=$got vs brute=$brute")
  }

  test("ccf: x leading y by one step peaks at positive lag, antiphase at 0") {
    // x=[1,0,1,0], y=[0,1,0,1]: μ=0.5 both, full central moments 1 and 1.
    // lag 0: Σxy=0 → num = 0−1−1+4·.25 = −1 → ccf −1 (perfect antiphase)
    // lag 1 (x leads): pairs (1,1),(0,0),(1,1) → num = 2−1−1+3·.25 = 0.75
    val s = Seq((0L, 1L, 0L), (1L, 0L, 1L), (2L, 1L, 0L), (3L, 0L, 1L))
      .toDF("t", "x", "y")
    val got = graft.engine.Relational
      .ccf(s, col("t"), col("x"), col("y"), maxLag = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(got(0L) === ((4L, -1.0)), s"lag 0 must be perfect antiphase: $got")
    assert(got(1L) === ((3L, 0.75)), s"lag 1 (x leads y) must peak: $got")
    assert(got(-1L)._2 === 0.75, "the alternating series is lag-symmetric")
    assert(got.keySet === Set(-1L, 0L, 1L))
  }
}
