package graft

import org.apache.spark.sql.functions.col

import graft.engine.{Multimodal, Quality}

class QualitySpec extends SparkFunSuite {
  import spark.implicits._

  test("Q3 validateColumns: Right when all present, Left listing each missing") {
    val df = Seq((1, "x")).toDF("id", "v")
    assert(Quality.validateColumns(df, Seq("id", "v")).isRight)
    Quality.validateColumns(df, Seq("id", "nope", "also_nope")) match {
      case Left(warnings) => assert(warnings.length === 2)
      case Right(_) => fail("expected Left")
    }
  }

  test("Q2 runTolerant continues past failures and reports both sides") {
    val (ok, failed) = Quality.runTolerant(Seq(
      "good" -> (() => 42),
      "bad" -> (() => throw new RuntimeException("boom")),
      "alsogood" -> (() => 7)))
    assert(ok.map(_._1) === List("good", "alsogood"))
    assert(failed.map(_._1) === List("bad"))
  }

  test("Q1 schemaAudit distributes footer reads over 120+ files") {
    val base = java.nio.file.Files.createTempDirectory("audit").toString
    // two 60-part datasets: one with the required column, one without
    (1 to 600).map(i => (i.toLong, s"t$i")).toDF("id", "text")
      .repartition(60).write.parquet(s"$base/with")
    (1 to 600).map(i => (i.toLong, i)).toDF("id", "other")
      .repartition(60).write.parquet(s"$base/without")
    def parts(d: String): Seq[String] = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val files = parts(s"$base/with") ++ parts(s"$base/without") :+ s"$base/nonexistent"
    assert(files.length >= 121)
    val got = Quality.schemaAudit(spark, files, "text").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got.size === files.length)
    parts(s"$base/with").foreach(p => assert(got(p) === "ok", p))
    parts(s"$base/without").foreach(p => assert(got(p) === "missing", p))
    assert(got(s"$base/nonexistent") === "missing")
    // directory paths probe a part-file footer
    val dirAudit = Quality.schemaAudit(spark,
      Seq(s"$base/with", s"$base/without"), "text").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(dirAudit(s"$base/with") === "ok")
    assert(dirAudit(s"$base/without") === "missing")
    // Hive-partitioned layout: the probe descends into k=v subdirectories;
    // data columns are found, partition columns are NOT in footers
    // (documented caveat of footer-only audits)
    (1 to 100).map(i => (i.toLong, s"t$i", i % 3)).toDF("id", "text", "part")
      .write.partitionBy("part").parquet(s"$base/hive")
    val hive = Quality.schemaAudit(spark,
        Seq(s"$base/hive", s"$base/hive", s"$base/hive"), "text")
      .collect().map(_.getString(2))
    assert(hive.forall(_ === "ok"))
    assert(Quality.schemaAudit(spark, Seq(s"$base/hive"), "part")
      .head().getString(2) === "missing")
  }

  test("profile quotes hostile column names and rejects an empty column list") {
    val df = Seq((1, "a", 2.0), (2, "b", 3.0), (2, null, 4.0))
      .toDF("the key", "weird.name", "it's")
    val got = Quality.profile(df, Seq("the key", "weird.name", "it's"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("the key") === ((3L, 3L, 2L)))
    assert(got("weird.name") === ((3L, 2L, 2L)))   // null not counted present
    assert(got("it's") === ((3L, 3L, 3L)))
    intercept[IllegalArgumentException] { Quality.profile(df, Seq.empty) }
  }

  test("multimodal sampleChecksum: empty and null text yield 0 (sequence guard)") {
    val df = Seq(Some("abc"), Some(""), None).toDF("text")
    val got = Multimodal.sampleChecksum(df, "text", 2).collect()
      .map(_.getAs[Long]("sample_checksum"))
    assert(got(0) === ('a'.toLong + 'c'.toLong)) // indices 1, 3
    assert(got(1) === 0L)
    assert(got(2) === 0L)
  }

  test("multimodal decodeStub is deterministic and schema-complete") {
    val df = Multimodal.withBinaryPayload(
      Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text"), "text")
    val out = Multimodal.decodeStub(df, "doc_id", "payload").orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Int]("width") >= 64 && out(0).getAs[Int]("n_frames") >= 1)
    val again = Multimodal.decodeStub(df, "doc_id", "payload").orderBy("doc_id").collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("robustOutliers: MAD ignores the outlier that drags mean/stddev") {
    // group a: 9 values near 10 plus one at 1000.  median 10, MAD 1 —
    // only the 1000 exceeds |x-med| > 3*MAD.  (A stddev gate computed on
    // the same data would be ~313, hiding everything but the 1000 too —
    // but shift it to 300 and stddev misses it while MAD still fires.)
    val a = Seq(8.0, 9.0, 9.0, 10.0, 10.0, 10.0, 11.0, 11.0, 12.0, 1000.0)
    val b = Seq(5.0, 5.0, 5.0, 5.0) // zero MAD: any deviation is an outlier
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val got = graft.engine.Quality.robustOutliers(df, "g", "v", k = 3.0)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(4)))
    assert(got(0) === (("a", 10.0, 1.0, 1L)))
    assert(got(1) === (("b", 5.0, 0.0, 0L)))
  }

  test("expectations: one pass, per-rule counts, NULL predicate = violation") {
    import org.apache.spark.sql.functions._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (5L, "b"), (null, "a"))
      .toDF("v", "g")
    val got = Quality.expectations(df, Seq(
        "v_small" -> (col("v") < 3),        // NULL v -> violation
        "g's domain" -> col("g").isin("a"), // quote in the rule name survives
        "always" -> lit(true)))
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got(0) === (("always", 3L, 3L, 0L)))
    assert(got(1) === (("g's domain", 3L, 2L, 1L)))
    assert(got(2) === (("v_small", 3L, 1L, 2L)), "NULL comparison counts as failed")
    intercept[IllegalArgumentException](Quality.expectations(df, Seq.empty))
  }

  test("psiDrift: zero on identical slices, hand value on a swap, terms >= 0") {
    val same = Seq((1, true), (1, false), (2, true), (2, false)).toDF("bkt", "a")
    val z = Quality.psiDrift(same, col("bkt"), col("a")).collect()
    assert(z.forall(_.getAs[Double]("psi_term") === 0.0),
      "equal per-bucket counts must give exactly zero drift")
    // buckets (a=3,b=1) and (a=1,b=3): smoothed p=4/6 vs 2/6 both ways
    val shifted = (Seq.fill(3)((1, true)) ++ Seq((1, false)) ++
      Seq((2, true)) ++ Seq.fill(3)((2, false))).toDF("bkt", "a")
    val got = Quality.psiDrift(shifted, col("bkt"), col("a"))
      .collect().map(r => r.getAs[Int]("bucket") -> r.getAs[Double]("psi_term")).toMap
    val want = (4.0 / 6 - 2.0 / 6) * math.log((4.0 / 6) / (2.0 / 6))
    assert(math.abs(got(1) - want) < 1e-8 && math.abs(got(2) - want) < 1e-8,
      s"per-bucket terms must match the hand-computed smoothed value ($got vs $want)")
    assert(got.values.forall(_ >= 0), "every PSI term is nonnegative")
  }

  test("ksDrift: hand values, sign/zero octave paging, brute-force parity") {
    // A={1,2,3}, B={2,3,4}: pooled ECDF gaps are 1/3,1/3,1/3,0 — all "1/3",
    // but in IEEE doubles 1.0 − 2/3 is one ulp ABOVE 1/3 − 0, so the peak
    // is uniquely at v=3 (DuckDB computes the identical doubles, so this
    // is also what the oracle sees — not a tie)
    val simple = Seq((1.0, true), (2.0, true), (3.0, true),
      (2.0, false), (3.0, false), (4.0, false)).toDF("v", "a")
    val r1 = Quality.ksDrift(simple, col("v"), col("a")).collect().head
    assert(r1.getLong(0) === 3L && r1.getLong(1) === 3L)
    assert(math.abs(r1.getDouble(2) - 1.0 / 3) < 1e-12 && r1.getDouble(3) === 3.0,
      s"D≈1/3, peaking at v=3 by the 1.0−2/3 ulp, got $r1")

    // negative / zero values cross octave-page signs, and quarters are
    // dyadic so the two d=0.5 gaps are EXACT ties → smallest value wins:
    // A={-4,-2,0,2}, B={-1,0,8,9} → gaps 1/4,1/2,1/4,1/4,1/2,1/4,0
    val signed = Seq((-4.0, true), (-2.0, true), (0.0, true), (2.0, true),
      (-1.0, false), (0.0, false), (8.0, false), (9.0, false)).toDF("v", "a")
    val r2 = Quality.ksDrift(signed, col("v"), col("a")).collect().head
    assert(r2.getDouble(2) === 0.5 && r2.getDouble(3) === -2.0,
      s"exact-tied D=1/2 must break toward the smallest value -2, got $r2")

    // brute-force parity on a seeded sample with duplicates across octaves
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(400) { i =>
      val v = math.round(rnd.nextGaussian() * 8) / 2.0 // duplicates, ±, zeros
      (if (rnd.nextBoolean()) v + (if (i % 5 == 0) 1.5 else 0) else v, i % 2 == 0)
    }
    val got = Quality.ksDrift(rows.toDF("v", "a"), col("v"), col("a"))
      .collect().head.getDouble(2)
    val (as, bs) = (rows.filter(_._2).map(_._1).sorted, rows.filterNot(_._2).map(_._1).sorted)
    val brute = (as ++ bs).distinct.map { v =>
      math.abs(as.count(_ <= v).toDouble / as.size - bs.count(_ <= v).toDouble / bs.size)
    }.max
    assert(math.abs(got - brute) < 1e-12, s"engine D=$got must equal brute D=$brute")
  }

  test("chi2Drift: hand-computed contingency terms, identical halves score 0") {
    // A: x×3 y×1, B: x×1 y×3 → totals ta=tb=4, n=8; per cat r=4, e=2
    val df = (Seq.fill(3)(("x", true)) ++ Seq(("y", true)) ++
      Seq(("x", false)) ++ Seq.fill(3)(("y", false))).toDF("c", "a")
    val got = Quality.chi2Drift(df, col("c"), col("a")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // each cat: (3-2)²/2 + (1-2)²/2 = 1.0
    assert(got.toSeq === Seq(("x", 3L, 1L, 2.0, 2.0, 1.0),
      ("y", 1L, 3L, 2.0, 2.0, 1.0)),
      s"hand contingency mismatch: ${got.toSeq}")
    // perfectly homogeneous halves → every term 0; a category absent from
    // one half still yields a finite term (expected counts never 0 when
    // the row total is > 0 on a non-degenerate split)
    val same = Seq(("x", true), ("x", false), ("y", true), ("y", false))
      .toDF("c", "a")
    assert(Quality.chi2Drift(same, col("c"), col("a")).collect()
      .forall(_.getDouble(5) === 0.0), "identical halves must score 0")
    val lop = Seq(("x", true), ("x", false), ("y", true)).toDF("c", "a")
    val yRow = Quality.chi2Drift(lop, col("c"), col("a")).collect()
      .find(_.getString(0) == "y").get
    assert(yRow.getDouble(5) > 0 && !yRow.getDouble(5).isNaN,
      "a one-sided category must contribute a finite positive term")

    // an EMPTY slice refuses loudly instead of NaN-ing every term
    val oneSided = Seq(("x", true), ("y", true)).toDF("c", "a")
    val e = intercept[IllegalArgumentException](
      Quality.chi2Drift(oneSided, col("c"), col("a")))
    assert(e.getMessage.contains("non-empty"), s"must name the slice rule: $e")
  }

  test("jsdDrift: identical halves score 0, disjoint buckets approach 1 bit") {
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // identical smoothed distributions → p = q = m → every term exactly 0
    val same = Seq((1L, true), (1L, false), (2L, true), (2L, false))
      .toDF("bucket", "a")
    assert(Quality.jsdDrift(same, col("bucket"), col("a")).collect()
      .forall(_.getDouble(5) === 0.0), "identical halves must score 0")

    // fully disjoint: A in bucket 1 ×9, B in bucket 2 ×9, k=2, add-1:
    // bucket 1: p=10/11, q=1/11; JSD sum < 1 by smoothing, each term > 0
    val dis = (Seq.fill(9)((1L, true)) ++ Seq.fill(9)((2L, false)))
      .toDF("bucket", "a")
    val terms = Quality.jsdDrift(dis, col("bucket"), col("a")).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(terms.forall(_._4 > 0))
    val total = terms.map(t => BigDecimal(t._4)).sum.toDouble
    assert(total > 0.5 && total <= 1.0, s"disjoint JSD must approach 1 bit: $total")
    // hand value of bucket 1's term: p=10/11, q=1/11, m=(p+q)/2
    val (p, q) = (10.0 / 11, 1.0 / 11)
    val m = (p + q) / 2
    assert(terms.find(_._1 == 1L).get._4 ===
      r9((p * (math.log(p / m) / math.log(2)) + q * (math.log(q / m) / math.log(2))) / 2))
  }

  test("welchT: hand-computed statistic, identical halves score ~0") {
    // A={1,2,3}: mean 2, var 1; B={4,6}: mean 5, var 2
    // t = (2−5)/√(1/3 + 2/2) = −3/√(4/3)
    val df = Seq((1.0, true), (2.0, true), (3.0, true),
      (4.0, false), (6.0, false)).toDF("x", "a")
    val r = Quality.welchT(df, col("x"), col("a")).collect().head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 2L)))
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 5.0)
    val want = BigDecimal((2.0 - 5.0) / math.sqrt(1.0 / 3 + 2.0 / 2))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) === want, s"hand Welch t mismatch: $r vs $want")
    // mirrored halves: identical distributions → t exactly 0
    val same = Seq((1.0, true), (9.0, true), (1.0, false), (9.0, false))
      .toDF("x", "a")
    assert(Quality.welchT(same, col("x"), col("a")).collect().head.getDouble(4) === 0.0)

    // degenerate inputs refuse LOUDLY (the ksDrift discipline), never a
    // silent null/NaN statistic: a side with n < 2, and a side whose
    // values are all NULL after the double cast
    val tiny = Seq((1.0, true), (4.0, false), (6.0, false)).toDF("x", "a")
    val e1 = intercept[IllegalArgumentException](
      Quality.welchT(tiny, col("x"), col("a")))
    assert(e1.getMessage.contains("n >= 2"), s"must name the bound: $e1")
    val allNull = Seq((Option.empty[Double], true), (Option.empty[Double], true),
      (Some(1.0), false), (Some(2.0), false)).toDF("x", "a")
    val e2 = intercept[IllegalArgumentException](
      Quality.welchT(allNull, col("x"), col("a")))
    assert(e2.getMessage.contains("NULL"), s"must name the null side: $e2")
  }

  test("expectationsWilson: hand-computed interval, bounds bracket the " +
    "rate, more rows tighten the interval") {
    def wilson(pass: Long, n: Long, z: Double = 1.96): (Double, Double) = {
      val p = pass.toDouble / n
      val z2 = z * z
      val denom = 1.0 + z2 / n
      val center = p + z2 / (n * 2.0)
      val rad = z * math.sqrt(p * (1.0 - p) / n + z2 / (n.toDouble * n * 4))
      def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r9((center - rad) / denom), r9((center + rad) / denom))
    }
    val small = (1L to 200L).map(i => (i, i % 200 != 0)).toDF("id", "ok")
    val r = Quality.expectationsWilson(small, Seq("ok" -> col("ok")))
      .collect().head
    val (lo, hi) = wilson(199L, 200L)
    assert(r.getAs[Double]("wilson_lo") === lo &&
      r.getAs[Double]("wilson_hi") === hi,
      s"hand Wilson mismatch: $r vs ($lo, $hi)")
    assert(lo < 199.0 / 200 && 199.0 / 200 < hi, "bounds bracket the rate")
    // same 99.5% rate on 20 000 rows: the interval must TIGHTEN — the
    // whole point of gating on wilson_lo instead of the raw rate
    val big = (1L to 20000L).map(i => (i, i % 200 != 0)).toDF("id", "ok")
    val rb = Quality.expectationsWilson(big, Seq("ok" -> col("ok")))
      .collect().head
    assert(rb.getAs[Double]("wilson_lo") > r.getAs[Double]("wilson_lo") &&
      rb.getAs[Double]("wilson_hi") < r.getAs[Double]("wilson_hi"),
      "20k rows at the same rate must give a strictly tighter interval")
  }

  test("gini: equality scores 0, concentration approaches 1, ties rank-invariant") {
    // perfectly equal: G = 2·Σr·x/(n·n·x) − (n+1)/n = (n+1)/n − (n+1)/n = 0
    val eq = (1L to 8L).map(i => (i, 5.0)).toDF("id", "x")
    val e = Quality.gini(eq, col("x"), col("id")).collect().head
    assert(e.getLong(0) === 8L && e.getDouble(1) === 40.0 && e.getDouble(2) === 0.0,
      s"perfect equality must score exactly 0, got $e")

    // one holder: x = [0-excluded, tiny..., 1000]: hand value
    // values 1,1,1,998 (n=4, Σ=1001): Σr·x = 1+2+3+4·998 = 3998
    // G = 2·3998/(4·1001) − 5/4 = 7996/4004 − 1.25
    val sk = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 998.0), (5L, -7.0), (6L, 0.0))
      .toDF("id", "x")
    val g = Quality.gini(sk, col("x"), col("id")).collect().head
    assert(g.getLong(0) === 4L, "non-positive values are excluded")
    assert(math.abs(g.getDouble(2) - (2.0 * 3998 / (4 * 1001) - 5.0 / 4)) < 1e-12,
      s"hand Gini mismatch: $g")

    // tie invariance: equal values spanning a page boundary permute ranks
    // freely but Σr·x — and so G — is unchanged vs the exact formula
    val ties = Seq((1L, 2.0), (2L, 2.0), (3L, 2.0), (4L, 6.0)).toDF("id", "x")
    val t = Quality.gini(ties, col("x"), col("id")).collect().head
    // Σr·x = 2(1+2+3) + 6·4 = 36; G = 72/(4·12) − 5/4 = 1.5 − 1.25 = 0.25
    assert(t.getDouble(2) === 0.25, s"tie-permutation-invariant Gini, got $t")
  }

  test("hhi: uniform mix scores 1/g, monopoly scores 1, top_share tracks max") {
    val uni = Seq("a", "b", "c", "d").flatMap(g => Seq.fill(5)(g)).toDF("g")
    val u = Quality.hhi(uni, col("g")).collect().head
    assert((u.getLong(0), u.getLong(1)) === ((4L, 20L)))
    assert(u.getDouble(2) === 0.25 && u.getDouble(3) === 0.25,
      s"uniform over 4 groups must score 1/4, got $u")
    val mono = Seq.fill(7)("only").toDF("g")
    val m = Quality.hhi(mono, col("g")).collect().head
    assert(m.getDouble(2) === 1.0 && m.getDouble(3) === 1.0)
    // skew: 8/10 + 1/10 + 1/10 → 0.64 + 0.01 + 0.01 = 0.66, top 0.8
    val sk = (Seq.fill(8)("big") ++ Seq("s1", "s2")).toDF("g")
    val k = Quality.hhi(sk, col("g")).collect().head
    assert(math.abs(k.getDouble(2) - 0.66) < 1e-9 && k.getDouble(3) === 0.8)
  }

  test("mutualInfo: independence scores 0, perfect dependence ln(2), terms signed") {
    // perfectly dependent: y = x over {a,b} × 4 rows each → MI = ln 2
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b")).toDF("u", "v")
    val dterms = Quality.mutualInfo(dep, col("u"), col("v")).collect()
      .map(_.getDouble(5))
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(dterms.toSeq === Seq.fill(2)(r9(0.5 * math.log((2.0 / 2) / (2.0 / 4)))),
      "each diagonal cell contributes p·ln(1/p(y)) = ½·ln 2")

    // independent: uniform 2×2 → every term exactly 0
    val ind = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")).toDF("u", "v")
    assert(Quality.mutualInfo(ind, col("u"), col("v")).collect()
      .forall(_.getDouble(5) === 0.0), "independent columns must score 0")

    // skewed 3-cell table: terms are SIGNED but their sum is positive
    val sk = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "y")).toDF("u", "v")
    val terms = Quality.mutualInfo(sk, col("u"), col("v")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(5))).toMap
    assert(terms(("a", "y")) < 0, "an under-independence cell contributes negatively")
    assert(terms.values.sum > 0, "total MI is nonnegative")
    // hand value of one cell: p(a,x)=1/2, p(a)=3/4, p(x)=1/2
    assert(terms(("a", "x")) === r9((2.0 / 4) * math.log((2.0 / 3) / (2.0 / 4))))
  }

  test("lDiversity: homogeneous groups flagged that kAnonymity passes") {
    // group (1): 4 rows, all sensitive "s1" → k=3-safe but 1-diverse
    // group (2): 3 rows, sensitive s1/s2/s3 → 3-diverse
    val df = Seq((1, "s1"), (1, "s1"), (1, "s1"), (1, "s1"),
      (2, "s1"), (2, "s2"), (2, "s3")).toDF("qi", "s")
    val ld = Quality.lDiversity(df, Seq("qi"), col("s"), l = 2).collect().head
    assert((ld.getLong(0), ld.getLong(1), ld.getLong(2), ld.getLong(3))
      === ((2L, 1L, 4L, 1L)),
      s"group 1 must be risky (1-diverse, 4 rows), got $ld")
    // the SAME data passes k-anonymity at k=3: the homogeneity blind spot
    val ka = Quality.kAnonymity(df, Seq("qi"), k = 3).collect().head
    assert(ka.getLong(1) === 0L, "k-anonymity alone must miss the leak")
    // at l=4 both groups are risky; all 7 rows counted
    val strict = Quality.lDiversity(df, Seq("qi"), col("s"), l = 4).collect().head
    assert((strict.getLong(1), strict.getLong(2)) === ((2L, 7L)))
    intercept[IllegalArgumentException](
      Quality.lDiversity(df, Seq("qi"), col("s"), l = 1))
  }

  test("benford: digit spine, exact extraction, term arithmetic") {
    // 30 values: first digits 1×10, 2×6, 9×2, rest spread; includes exact
    // powers of ten (the log-free extraction's hard case) and v<1 excluded
    val vals = Seq.fill(10)(1000.0) ++ Seq.fill(6)(25.5) ++ Seq.fill(2)(9.99) ++
      Seq(3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 10.0, 100.0, 0.5, 0.01, 37.2, 42.0)
    val got = Quality.benford(vals.toDF("v"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq === (1L to 9L), "all nine digits, in order")
    val n = got.map(_._2)
    // 1: 1000×10 + 10 + 100 = 12; 2: 25.5×6 = 6; 3: 3.0, 37.2 = 2;
    // 4: 4.0, 42.0 = 2; 9: 9.99×2 = 2; 5-8: one each; 0.5/0.01 excluded
    assert(n.toSeq === Seq(12L, 6L, 2L, 2L, 1L, 1L, 1L, 1L, 2L), s"counts: ${n.toSeq}")
    assert(n.sum === 28, "the two sub-1 values are excluded")
    // values at/above 2^63 sit outside the exact floor→BIGINT domain and
    // are EXCLUDED (documented), never saturated into digit 9
    val big = Seq(1.0e19, 9.3e18, 2.0, 9.223372036854776e18).toDF("v")
    val bigN = Quality.benford(big, col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bigN(9L) === 0L && bigN(2L) === 1L && bigN.values.sum === 1L,
      s"out-of-domain magnitudes must be excluded, got $bigN")
    got.foreach { case (d, nn, p, term) =>
      assert(math.abs(p - math.log10(1.0 + 1.0 / d)) < 1e-9)
      val e = 28L * p
      assert(math.abs(term - BigDecimal((nn - e) * (nn - e) / e)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-15,
        s"digit $d term must be the 9-dp-rounded χ² contribution")
    }
  }

  test("tCloseness: hand-computed ordered EMD, thresholds, loud degenerates") {
    // class A holds values (1,1,2), class B (3,3,3); global = (2,1,3)/6.
    // EMD(A): integer cums on denominator n_c·n_g = cum(cnt·6 − g·3)
    //   = 6, 9, 0 → Σ|cum| = 15; / ((m−1)·n_c·n_g = 2·3·6) = 15/36 = 5/12.
    // EMD(B): cums −6, −9, 0 → also 5/12 ≈ 0.416666667.
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 3L), ("B", 3L), ("B", 3L))
      .toDF("grp", "v")
    val got = Quality.tCloseness(df, Seq("grp"), col("v"), t = 0.3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.toSeq === Seq(("A", 3L, 0.416666667, true), ("B", 3L, 0.416666667, true)))
    val loose = Quality.tCloseness(df, Seq("grp"), col("v"), t = 0.5)
      .collect().map(_.getBoolean(3))
    assert(loose.forall(!_), "t = 0.5 must clear both classes")
    // degenerate alphabet (one distinct value) and out-of-range t are loud
    val one = Seq(("A", 1L), ("B", 1L)).toDF("grp", "v")
    val e = intercept[IllegalArgumentException] {
      Quality.tCloseness(one, Seq("grp"), col("v"), t = 0.3)
    }
    assert(e.getMessage.contains("distinct non-null value"))
    intercept[IllegalArgumentException] {
      Quality.tCloseness(df, Seq("grp"), col("v"), t = 1.5)
    }
  }
}
