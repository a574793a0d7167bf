package graft

import org.apache.spark.sql.functions._

import graft.engine.Text

class TextSpec extends SparkFunSuite {
  import spark.implicits._

  test("bpeMerge: greedy leftmost-first pass, overlapping runs do not double-merge") {
    val df = Seq("aaab").toDF("w")
    val got = df.select(Text.bpeMerge(split($"w", ""), "a", "a").as("s"))
      .collect().head.getSeq[String](0)
    assert(got === Seq("aa", "a", "b"), "aaa merges leftmost pair only")
    val got2 = df.select(Text.bpeMerge(split($"w", ""), "a", "b").as("s"))
      .collect().head.getSeq[String](0)
    assert(got2 === Seq("a", "a", "ab"))
    val noHit = df.select(Text.bpeMerge(split($"w", ""), "x", "y").as("s"))
      .collect().head.getSeq[String](0)
    assert(noHit === Seq("a", "a", "a", "b"))
  }

  test("bpeTrain matches a sequential reference BPE on a toy corpus") {
    // reference implementation: greedy BPE over a word-frequency map
    def refBpe(words: Map[String, Long], k: Int): Seq[(String, String)] = {
      var syms = words.map { case (w, f) => (w.split("").toSeq, f) }
      val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
      var done = false
      while (out.length < k && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((s, f) <- syms; i <- 0 until s.length - 1)
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + f
        val best = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a + " " + b) }.headOption
        best match {
          case Some(((a, b), n)) if n >= 2 =>
            out += ((a, b))
            syms = syms.map { case (s, f) =>
              val r = scala.collection.mutable.ListBuffer.empty[String]
              var i = 0
              while (i < s.length) {
                if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { r += a + b; i += 2 }
                else { r += s(i); i += 1 }
              }
              (r.toSeq, f)
            }
          case _ => done = true
        }
      }
      out.toList
    }
    val corpus = Seq("low low low lower lowest", "new newer newest low",
      "wide wider widest new new")
    val df = corpus.toDF("text")
    val wordFreq = corpus.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }
    val exp = refBpe(wordFreq, 8)
    val got = Text.bpeTrain(df, "text", 8)
    assert(got === exp, s"distributed merges must equal the sequential reference")
    // applying the merges re-segments a known word deterministically
    val seg = df.limit(1).select(Text.bpeApply(lit("lowest"), got).as("s"))
      .collect().head.getSeq[String](0)
    assert(seg.mkString("|").replace("|", "") === "lowest", "segments must tile the word")
    assert(seg.exists(_.length > 1), "at least one learned merge must apply")
  }

  test("bpeTrainBatched: identical merge table to the sequential trainer, " +
    "measurably fewer driver rounds") {
    val corpus = Seq("low low low lower lowest", "new newer newest low",
      "wide wider widest new new", "deep deeper deepest wide",
      "fast faster fastest deep deep slow slower slowest fast")
    val df = corpus.toDF("text")
    for (k <- Seq(4, 8, 16)) {
      val seq = Text.bpeTrain(df, "text", k)
      val (bat, rounds) = Text.bpeTrainBatched(df, "text", k)
      assert(bat === seq,
        s"numMerges=$k: batched merges must equal sequential BPE exactly")
      assert(rounds <= seq.length,
        s"numMerges=$k: rounds ($rounds) must never exceed merges (${seq.length})")
    }
    // the round cut is real where merges are symbol-disjoint (the shape a
    // diversifying vocabulary reaches; ubiquitous-letter corpora conflict
    // early and legitimately degrade toward one merge per round): five
    // disjoint bigram families at strictly decreasing frequencies must
    // land in ONE round
    val disj = Seq.tabulate(5)(i =>
      Seq.fill(10 - i)("ab cd ef gh ij".split(" ")(i)).mkString(" "))
      .mkString(" ")
    val ddf = Seq(disj).toDF("text")
    val (m5, r5) = Text.bpeTrainBatched(ddf, "text", 5)
    assert(m5 === Text.bpeTrain(ddf, "text", 5), "disjoint corpus equality")
    assert(m5.length === 5 && r5 === 1,
      s"five disjoint merges must batch into one round (took $r5)")
    // batchK = 1 degrades to the sequential step count, same table
    val (m1, r1) = Text.bpeTrainBatched(df, "text", 6, batchK = 1)
    assert(m1 === Text.bpeTrain(df, "text", 6) && r1 === 6)
  }

  test("bpeTrainBatched ≡ bpeTrain across random corpora (the batching " +
    "proof's adversarial cases: ties, shared symbols, merged-string collisions)") {
    val vocabChars = "abcd" // tiny alphabet maximizes symbol collisions/ties
    for (seed <- FuzzSeeds.seeds(31L, 5L)) {
      val rng = new scala.util.Random(seed)
      val words = (1 to 40).map(_ =>
        (1 to (2 + rng.nextInt(6))).map(_ =>
          vocabChars(rng.nextInt(vocabChars.length))).mkString)
      val doc = (1 to 120).map(_ => words(rng.nextInt(words.length))).mkString(" ")
      val df = Seq(doc).toDF("text")
      val seq = Text.bpeTrain(df, "text", 12)
      val (bat, rounds) = Text.bpeTrainBatched(df, "text", 12, batchK = 6)
      assert(bat === seq, s"seed $seed: batched diverged from sequential " +
        s"(batched $bat vs sequential $seq)")
      assert(rounds <= math.max(1, seq.length), s"seed $seed: rounds $rounds")
    }
  }

  test("lshBandingPlan: identity at b=r=1, monotone S-curve, knee near " +
    "(1/b)^(1/r), s=1 always collides") {
    val plan = Text.lshBandingPlan(spark, Seq((1, 1), (4, 4)), steps = 20)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getDouble(2), r.getDouble(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    // b = r = 1: p(s) = s exactly (the curve degenerates to identity)
    plan((1, 1)).foreach { case (s, p) =>
      assert(math.abs(p - s) < 1e-9, s"b=r=1 must give p=s, got $p at $s") }
    // 4×4 (the engine's own MinhashK=16 banding): monotone, p(1) = 1,
    // and the 50% crossing sits near (1/4)^(1/4) ≈ 0.707
    val c44 = plan((4, 4))
    assert(c44.map(_._2).zip(c44.map(_._2).tail).forall { case (a, b) => a <= b },
      "p(s) must be non-decreasing in s")
    assert(c44.last._2 === 1.0, "identical sets always collide")
    val knee = c44.minBy { case (_, p) => math.abs(p - 0.5) }._1
    assert(math.abs(knee - math.pow(0.25, 0.25)) < 0.06,
      s"the 4x4 knee must sit near (1/4)^(1/4) ~ 0.707, got $knee")
  }

  test("shingles: short docs yield empty arrays, not descending sequences") {
    val df = Seq("one two", "", "a b c d").toDF("text")
    val got = df.select(Text.shingles($"text").as("sh")).collect().map(_.getSeq[String](0))
    assert(got(0) === Seq())
    assert(got(1) === Seq())
    assert(got(2) === Seq("a b c", "b c d"))
  }

  test("exact dedup groups identical normalized text and keeps the min id") {
    val df = Seq((1L, "Hello World"), (2L, "  hello world  "), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Text.dedupExact(df, "text", "doc_id").orderBy("keep_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("keep_id") === 1L && out(0).getAs[Long]("copies") === 2L)
  }

  test("minhash: identical docs share every band; disjoint docs share none") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val cands = Text.minhashCandidates(Text.minhashBands(df, "text", "doc_id")).collect()
    assert(cands.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("verifiedPairs computes exact shingle-set jaccard on candidates only") {
    val df = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x y")).toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = Text.verifiedPairs(df, "text", "doc_id", cands, 0.3).collect()
    // (1,2): shingles {abc,bcd} vs {abc,bce} → 1/3; (1,3): no shingles → 0
    assert(got.length === 1)
    assert(got.head.getAs[Double]("jaccard") === 0.333333)
  }

  test("ngram jaccard: df cutoff suppresses stop-shingles") {
    // 'c c c' appears in every doc → with maxDf=2 it cannot generate candidates
    val df = Seq((1L, "c c c a b"), (2L, "c c c d e"), (3L, "c c c f g")).toDF("doc_id", "text")
    val strict = Text.ngramJaccardPairs(df, "text", "doc_id", maxDf = 2, threshold = 0.0)
    assert(strict.count() === 0)
    val loose = Text.ngramJaccardPairs(df, "text", "doc_id", maxDf = 3, threshold = 0.0)
    assert(loose.count() === 3) // all pairs share the common shingle
  }

  test("simhash: identical docs get identical fingerprints, bounded to 48 bits") {
    val df = Seq((1L, "spark data query"), (2L, "spark data query"), (3L, "totally different words"))
      .toDF("doc_id", "text")
    val fp = df.select($"doc_id", Text.simhash($"text").as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
    fp.values.foreach(v => assert(v >= 0 && v < (1L << 48)))
  }

  test("fingerprint is order-sensitive (unlike minhash)") {
    val df = Seq((1L, "a b"), (2L, "b a")).toDF("doc_id", "text")
    val fp = df.select(Text.fingerprint($"text").as("f")).collect().map(_.getLong(0))
    assert(fp(0) !== fp(1))
  }

  test("quality columns: ratios bounded, token counts exact") {
    val r = Seq("the the data").toDF("text")
      .select(Text.qualityColumns($"text").map { case (n, c) => c.as(n) }: _*).head()
    assert(r.getAs[Long]("n_tokens") === 3L)
    assert(r.getAs[Long]("n_distinct") === 2L)
    assert(r.getAs[Double]("stopword_ratio") === 0.666667)
    val q = r.getAs[Double]("quality_score")
    assert(q > 0.0 && q <= 1.0)
  }

  test("langIdHeuristic: lexicon majority with deterministic tie-break") {
    val got = Seq("the a of x", "spark data y", "zz").toDF("text")
      .select(Text.langIdHeuristic($"text").as("l")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("en", "tech", "unknown"))
  }

  test("scrubPii replaces emails, phones, and long digit runs in order") {
    val df = Seq(
      "mail me at a.b+c@ex-ample.org now",
      "call +1 (303) 555-0142 today",
      "zip 80301 and card 4111111111111111",
      "clean text stays").toDF("t")
    val got = df.select(Text.scrubPii($"t").as("s")).collect().map(_.getString(0))
    assert(got(0) === "mail me at <EMAIL> now")
    assert(got(1) === "call <PHONE> today")
    assert(got(2) === "zip <NUM> and card <PHONE>") // 16 digits match the phone run first
    assert(got(3) === "clean text stays")
  }

  test("sampleHash is deterministic, key-stable, and near the target rate") {
    val df = (1L to 2000L).toDF("id")
    val once = df.filter(Text.sampleHash($"id", 300)).collect().map(_.getLong(0)).toSet
    val again = df.filter(Text.sampleHash($"id", 300)).collect().map(_.getLong(0)).toSet
    assert(once === again)
    assert(once.size > 480 && once.size < 720) // ~30% of 2000
    // monotone in permille: the 300-permille sample is a subset of the 500 one
    val bigger = df.filter(Text.sampleHash($"id", 500)).collect().map(_.getLong(0)).toSet
    assert(once.subsetOf(bigger))
  }

  test("bigramsOf: adjacent pairs; single-token and empty docs yield empty arrays") {
    val df = Seq("a b c", "solo", "").toDF("text")
    val got = df.select(Text.bigramsOf(Text.tokens($"text")).as("b"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("a b", "b c"))
    assert(got(1) === Seq())
    assert(got(2) === Seq())
  }

  test("topBigrams counts corpus-wide with deterministic tie-break") {
    val df = Seq("x y x y", "x y z", "z q").toDF("text")
    val got = Text.topBigrams(df, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.head === ("x y", 3L))
    // ties (count 1) break on the bigram string ascending
    assert(got.tail === got.tail.sortBy(identity))
  }

  test("segmentDedupStats flags only segments shared across documents") {
    val rep = (1 to 20).map(i => s"w$i").mkString(" ")        // exactly one 20-word segment
    val uniq = (21 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, rep + " " + uniq), (2L, rep), (3L, "tail " + uniq))
      .toDF("doc_id", "text")
    val got = Text.segmentDedupStats(df, "text", "doc_id", 20)
      .collect().map(r => r.getAs[Long]("doc") ->
        (r.getAs[Long]("n_segments"), r.getAs[Long]("n_dup_segments"))).toMap
    assert(got(1L) === ((2L, 1L)))  // [rep] shared with doc 2; [uniq] not (doc 3 shifts it)
    assert(got(2L) === ((1L, 1L)))
    assert(got(3L) === ((2L, 0L)))  // "tail …" offsets the window → both segments unique
  }

  test("dedupSegmentsRewrite cuts shared segments, preserves order, drops emptied docs") {
    // words=2 segments; "b1 b2" is boilerplate shared by all three docs
    val df = Seq(
      (1L, "a1 a2 b1 b2 c1 c2"), // middle segment cut → "a1 a2 c1 c2"
      (2L, "b1 b2 d1 d2"),       // leading segment cut → "d1 d2"
      (3L, "b1 b2")              // only segment cut → doc leaves the corpus
    ).toDF("doc_id", "text")
    val got = Text.dedupSegmentsRewrite(df, "text", "doc_id", words = 2, maxDocs = 2)
      .collect().map(r => r.getAs[Long]("doc") ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("clean_text"))).toMap
    assert(got === Map(
      1L -> ((2L, "a1 a2 c1 c2")),
      2L -> ((1L, "d1 d2"))))
  }

  test("normalizeMarkup strips tags, collapses whitespace, casefolds") {
    val df = Seq("<p>Hello  <b>World</b></p>", "no markup here", "<br>x<br>y")
      .toDF("text")
    val got = df.select(Text.normalizeMarkup($"text").as("n")).collect().map(_.getString(0))
    assert(got(0) === "hello world")
    assert(got(1) === "no markup here")
    assert(got(2) === "x y", "tags must become spaces, not weld tokens")
  }

  test("simhashNearDupPairs: identical docs pair at hamming 0, unrelated docs do not pair") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words about spark query planning internals")
    ).toDF("doc_id", "text")
    val got = Text.simhashNearDupPairs(df, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((1L, 2L, 0)))
  }
  test("chunkOverlap: overlapping spans, tail chunk short, empty doc yields one empty chunk") {
    // 10 tokens, window 4, stride 3 -> k = 1 + ceil(6/3) = 3 chunks
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, ten), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val got = Text.chunkOverlap(df, "text", "doc_id", window = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L),
      (2L, 0L, 0L, 2L), (3L, 0L, 0L, 1L)))
    // overlap check: chunk 1 of doc 1 starts inside chunk 0's span (3 < 4)
  }

  test("chunkOverlap: exact-fit doc emits exactly one chunk, hash keys the slice") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d e")).toDF("doc_id", "text")
    val got = Text.chunkOverlap(df, "text", "doc_id", window = 4, stride = 4)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
    assert(got.count(_._1 == 1L) === 1, "n == window must not spawn an empty tail chunk")
    assert(got.count(_._1 == 2L) === 2)
    // doc 1 chunk 0 and doc 2 chunk 0 cover identical tokens -> identical hash
    assert(got(0)._3 === got(1)._3)
  }

  test("charEntropy: closed-form values for uniform and single-char texts") {
    val df = Seq((1L, "aabb"), (2L, "aaaa"), (3L, "abcd")).toDF("id", "text")
    val got = Text.charEntropy(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 1.0, "two equiprobable symbols = 1 bit")
    assert(got(2L) === 0.0, "a single repeated symbol carries no information")
    assert(got(3L) === 2.0, "four equiprobable symbols = 2 bits")
  }

  test("urlHost extracts the host and groups non-URLs into the empty bucket") {
    val df = Seq("https://a.example.org/p/1", "ftp://x.y:21/f",
      "not a url", "https://bare").toDF("u")
    val got = df.select(Text.urlHost(col("u")).as("h")).collect().map(_.getString(0))
    assert(got.toSeq === Seq("a.example.org", "x.y", "", "bare"))
  }

  test("sampleWeighted: deterministic, exactly k rows, identity when k >= n") {
    val df = (1L to 100L).map(i => (i, (i % 10 + 1).toDouble)).toDF("id", "w")
    def pick(k: Int) = Text.sampleWeighted(df, "id", col("w"), k)
      .collect().map(_.getLong(0)).toSet
    val a = pick(10)
    assert(a.size === 10 && a === pick(10), "same data, same k -> same sample")
    assert(pick(500) === (1L to 100L).toSet, "k >= n keeps everything")
  }

  test("sampleWeighted: an overwhelming weight is always selected, zero-ish never") {
    // ln(u)/w -> 0- as w grows: the heavy row ranks first for any u
    val df = ((1L to 50L).map(i => (i, 1.0)) :+ (99L, 1e12)).toDF("id", "w")
    assert(Text.sampleWeighted(df, "id", col("w"), 5)
      .collect().map(_.getLong(0)).contains(99L))
    // and a near-zero weight drives the key to -inf: never beats real rows
    val df2 = ((1L to 50L).map(i => (i, 1.0)) :+ (99L, 1e-12)).toDF("id", "w")
    assert(!Text.sampleWeighted(df2, "id", col("w"), 25)
      .collect().map(_.getLong(0)).contains(99L))
  }

  test("dsirLogWeights: target-like docs score positive, off-target negative") {
    // model by hand: rf(aa)=3 tf(aa)=2, rf(bb)=3 tf(bb)=0, V=2, rn=6, tn=2
    //   term(aa) = log2(3/4) - log2(4/8) = +0.585;  term(bb) = log2(1/4) - log2(1/2) = -1
    val docs = Seq((1L, "aa aa", "en"), (2L, "bb bb", "fr"), (3L, "aa bb", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = Text.dsirLogWeights(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got.values.forall(_._1 == 2L), "each doc has two tokens")
    val (w1, w2, w3) = (got(1L)._2, got(2L)._2, got(3L)._2)
    assert(w1 > 0 && w2 < 0, s"target-like must be positive ($w1), off-target negative ($w2)")
    assert(w1 > w3 && w3 > w2, "mixed doc sits between the pure ones")
    assert(math.abs(w1 - 2 * (math.log(0.75 / 0.5) / math.log(2))) < 1e-6,
      "weight equals the hand-computed smoothed log-ratio sum")
  }

  test("zipfFit: hand-checked regression on a tiny corpus; perfect Zipf slope -1") {
    // freqs a=4, b=2, c=1 -> ranks 1,2,3; reference least-squares inline
    def fit(pairs: Seq[(Long, Double)]): (Double, Double) = {
      def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      val t = pairs.map { case (rnk, f) => (r9(math.log(rnk.toDouble) / math.log(2)),
        r9(math.log(f) / math.log(2))) }
      val n = t.size.toDouble
      val (sx, sy) = (t.map(_._1).sum, t.map(_._2).sum)
      val sxy = t.map { case (x, y) => r9(x * y) }.sum
      val sxx = t.map { case (x, _) => r9(x * x) }.sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      (slope, (sy - slope * sx) / n)
    }
    val df = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val got = Text.zipfFit(df, "text").collect().head
    assert(got.getLong(0) === 3L && got.getLong(1) === 7L)
    val (ws, wi) = fit(Seq((1L, 4.0), (2L, 2.0), (3L, 1.0)))
    assert(math.abs(got.getDouble(2) - ws) < 1e-9, "slope matches the reference fit")
    assert(math.abs(got.getDouble(3) - wi) < 1e-9, "intercept matches")
    assert(got.getDouble(2) < 0, "frequency must fall with rank")
  }

  test("bigramLmScore: hand-computed smoothed NLL; unseen transitions cost more") {
    // target model from doc 1 "abab": n2(ab)=2, n2(ba)=1; n1(a)=2, n1(b)=1; V=2
    val docs = Seq((1L, "abab", "en"), (2L, "zz", "fr"), (3L, "aabb", "fr"),
      (4L, "x", "fr")).toDF("doc_id", "text", "lang")
    val got = Text.bigramLmScore(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === Set(1L, 2L, 3L), "a 1-char doc has no bigrams and drops")
    assert(got(1L)._1 === 3L && got(2L)._1 === 1L && got(3L)._1 === 3L)
    // ab: -log2(3/4); ba: -log2(2/3); terms rounded to 9dp before the sum
    assert(math.abs(got(1L)._2 - (2 * 0.415037499 + 0.584962501)) < 1e-8,
      "doc 1 NLL must equal the hand-computed smoothed sum")
    // "zz": pair AND context unseen -> add-1 floor = -log2(1/V) = 1 bit
    assert(math.abs(got(2L)._2 - 1.0) < 1e-9)
    // doc 3 has the same char bag as the model corpus, but transitions
    // aa/bb were never observed: per-bigram cost must exceed doc 1's
    assert(got(3L)._2 > got(1L)._2,
      "scrambled transitions must score worse than in-model ones")
  }

  test("strideInterleave: keys are (2r-1)/2n and the epoch order spreads sources evenly") {
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = ((1L to 4L).map(i => (i, "big")) ++ Seq((5L, "small"), (6L, "small")))
      .toDF("doc_id", "source")
    val got = Text.strideInterleave(docs, "doc_id", "source")
      .orderBy("stride_key", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // rank within source follows the md5 hash order (the model, independently)
    val wantRanks = Seq("big", "small").flatMap { src =>
      val ids = if (src == "big") (1L to 4L) else (5L to 6L)
      ids.sortBy(i => md5hex(i.toString).take(15)).zipWithIndex
        .map { case (id, r) => (id, src) -> (r + 1L) }
    }.toMap
    got.foreach { case (id, src, rank, key) =>
      assert(rank === wantRanks((id, src)), s"rank of ($id,$src)")
      val n = if (src == "big") 4 else 2
      assert(key === (2.0 * rank - 1.0) / (2 * n), s"key of ($id,$src)")
    }
    // sizes 4 and 2: keys 1/8,3/8,5/8,7/8 and 1/4,3/4 -> exact alternation
    assert(got.map(_._2).toSeq ===
      Seq("big", "small", "big", "big", "small", "big"),
      "the 4/2 mix must interleave small at exact proportional positions")
  }

  test("urlCanonicalize property: rule-based reference agrees on generated URLs") {
    import org.scalacheck.Gen
    // independent reference implementing the RULES (not the regexes):
    // strip fragment, lowercase scheme+host, drop :80/:443, drop params
    // whose NAME is exactly utm_[a-z]+ (anchored — "myutm_source" stays,
    // consecutive utm chains all go), fix dangling ?/&, strip trailing '/'
    def ref(u: String): Option[String] = {
      val noFrag = u.takeWhile(_ != '#')
      val si = noFrag.indexOf("://")
      if (si <= 0) return None
      val scheme = noFrag.substring(0, si)
      if (!scheme.matches("[A-Za-z][A-Za-z0-9+.-]*")) return None
      val afterScheme = noFrag.substring(si + 3)
      val hostEnd = afterScheme.indexWhere(c => c == '/' || c == '?') match {
        case -1 => afterScheme.length; case i => i
      }
      val host = afterScheme.substring(0, hostEnd).toLowerCase
        .replaceAll(":(443|80)$", "")
      if (host.isEmpty) return None
      val rest = afterScheme.substring(hostEnd)
      val (path, query) = rest.span(_ != '?')
      val keptParams =
        if (query.isEmpty) Nil
        else query.drop(1).split("&", -1).toSeq
          .filterNot(_.takeWhile(_ != '=').matches("utm_[a-z]+"))
      val rebuilt = path +
        (if (keptParams.nonEmpty) "?" + keptParams.mkString("&") else "")
      val noSlash = if (rebuilt.endsWith("/")) rebuilt.dropRight(1) else rebuilt
      Some(scheme.toLowerCase + "://" + host + noSlash)
    }
    val param = for {
      n <- Gen.oneOf("id", "ref", "utm_source", "utm_a", "utm_campaign",
        "myutm_source", "xutm_b", "uTm_c") // uTm_c: NOT utm_[a-z]+ — must stay
      v <- Gen.alphaNumStr.map(_.take(5))
    } yield s"$n=$v"
    val urlGen = for {
      scheme <- Gen.oneOf("http", "HTTPS", "Ftp")
      host <- Gen.oneOf("Example.org", "a-B.com", "x.Y.z")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/p/5", "/p/5/", "/A/b")
      ps <- Gen.listOfN(4, param).flatMap(l => Gen.choose(0, 4).map(l.take))
      frag <- Gen.oneOf("", "#sec-2")
    } yield s"$scheme://$host$port$path" +
      (if (ps.nonEmpty) "?" + ps.mkString("&") else "") + frag
    val urls = Gen.listOfN(200, Gen.frequency(
      9 -> urlGen, 1 -> Gen.const("definitely not a url"))).sample.get
    val got = urls.toDF("u")
      .select(col("u"), Text.urlCanonicalize(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1)))
    got.foreach { case (u, c) =>
      assert(c === ref(u), s"urlCanonicalize disagrees with the rules on: $u")
    }
  }

  test("burstiness: closed form matches per-doc hand counts, ordered by dispersion") {
    val docs = Seq((1L, "a a b"), (2L, "a c b"), (3L, "c c c c"), (4L, "b b"))
      .toDF("doc_id", "text")
    val got = Text.burstiness(docs, "text", "doc_id", minDf = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // N=4; a: counts(2,1) tf=3 tf2=5; b: (1,1,2) tf=4 tf2=6; c: (1,4) tf=5 tf2=17
    val want = Seq(
      ("c", 2L, 5L, 17.0 / 5 - 5.0 / 4),  // 2.15 — clumped → most bursty
      ("a", 2L, 3L, 5.0 / 3 - 3.0 / 4),   // 0.9166…
      ("b", 3L, 4L, 6.0 / 4 - 4.0 / 4))   // 0.5 — spread evenly → least
    assert(got.length === 3)
    got.zip(want).foreach { case ((w, df, tf, d), (ww, wdf, wtf, wd)) =>
      assert(w === ww && df === wdf && tf === wtf && math.abs(d - wd) < 1e-12,
        s"burstiness row mismatch: got ${(w, df, tf, d)} want ${(ww, wdf, wtf, wd)}")
    }
    // minDf cuts: only b appears in ≥3 docs
    val cut = Text.burstiness(docs, "text", "doc_id", minDf = 3, topK = 10)
      .collect().map(_.getString(0)).toSeq
    assert(cut === Seq("b"), "df cutoff must keep only terms in ≥ minDf docs")
  }

  test("pmiCollocations: hand-computed PMI ranks the bound pair above chance") {
    // "x y" always adjacent (bound pair); "a b" co-occur at chance rate.
    // tokens: x y a b x y | a x y b a b → T=12; bigrams: B=10
    val docs = Seq((1L, "x y a b x y"), (2L, "a x y b a b")).toDF("doc_id", "text")
    val got = Text.pmiCollocations(docs, "text", minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // c: x=3 y=3 a=3 b=3; bigram counts: "x y"=3, "a b"=2, others 1
    def pmi(nxy: Long, cx: Long, cy: Long): Double =
      BigDecimal(math.log((nxy.toDouble / 10) / ((cx.toDouble / 12) * (cy.toDouble / 12))))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq === Seq(
      ("x y", 3L, 3L, 3L, pmi(3, 3, 3)),
      ("a b", 2L, 3L, 3L, pmi(2, 3, 3))),
      s"bound pair must out-PMI the chance pair: ${got.toSeq}")
    assert(got(0)._5 > got(1)._5)
    // minCount guards the hapax pathology: at 1, singletons flood in
    assert(Text.pmiCollocations(docs, "text", minCount = 1, topK = 100)
      .count() > 2)
  }

  test("qualityLinearProbe: weights satisfy the normal equations on the seed") {
    // 12 docs with varying token counts / word lengths / repetition so
    // the Gram matrix is well-conditioned
    val docs = (0L until 12L).map { i =>
      val words = (0 to (i % 5).toInt + 2).map(j => s"w${(i + j) % 7}" * ((j % 3) + 1))
      (i, (words ++ words.take((i % 3).toInt)).mkString(" "))
    }.toDF("doc_id", "text")
    val out = Text.qualityLinearProbe(docs, "doc_id", "text",
      col("doc_id") % 5 =!= 0).collect()
    assert(out.length === 12, "every document scores")
    val w0 = out.head.getAs[Double]("w0")
    val w1 = out.head.getAs[Double]("w1")
    val w2 = out.head.getAs[Double]("w2")
    assert(out.forall(r => r.getAs[Double]("w0") == w0),
      "one global weight vector on every row")
    // least-squares optimality = residual orthogonality on the TRAINING
    // slice: sum r, sum r*x1, sum r*x2 all ~0 (w rounds to 9 dp, so the
    // orthogonality holds to ~1e-6 on these magnitudes, not exactly)
    val seed = out.filter(r => r.getAs[Long]("doc_id") % 5 != 0)
    def dot(f: org.apache.spark.sql.Row => Double): Double =
      seed.map(r => (r.getAs[Double]("y") -
        (w0 + w1 * r.getAs[Double]("x1") + w2 * r.getAs[Double]("x2"))) * f(r)).sum
    assert(math.abs(dot(_ => 1.0)) < 1e-4, s"sum r = ${dot(_ => 1.0)}")
    assert(math.abs(dot(_.getAs[Double]("x1"))) < 1e-3,
      s"sum r*x1 = ${dot(_.getAs[Double]("x1"))}")
    assert(math.abs(dot(_.getAs[Double]("x2"))) < 1e-3,
      s"sum r*x2 = ${dot(_.getAs[Double]("x2"))}")
    // the probe scores HELD-OUT docs too (the serving pattern's point)
    assert(out.exists(r => r.getAs[Long]("doc_id") % 5 == 0))
  }

  test("qualityProbeGopher: labels are the Gopher keep, agreement is the " +
    "held-out thresholded match rate, degenerate seeds fail loudly") {
    // seven document classes varying token count, word length and stopword
    // kinds — enough independent (1,x1..x5) rows for a non-singular 6×6
    // Gram, with the label (the Gopher keep) reducing to x1 AND x5 (the
    // two binding rules), which the least-squares fit represents EXACTLY
    // as score = x1 + x5 - 1 (no (x1,x5)=(0,0) class exists, so the fit
    // interpolates with zero residual): thresholded scores reproduce the
    // labels on BOTH slices
    val stop = Seq("the", "a", "of", "and", "to", "in")
    def mk(nWords: Int, wordLen: Int, nk: Int): String =
      (stop.take(nk) ++
        (0 until (nWords - nk)).map(i => ("w" * wordLen) + i)).mkString(" ")
    val classes = Seq((60, 3, 3), (5, 2, 2), (80, 5, 0), (100, 4, 2),
      (55, 6, 1), (70, 3, 4), (40, 5, 2))
    val wantKeep = Seq(1.0, 0.0, 0.0, 1.0, 0.0, 1.0, 0.0)
    val docs = (0L until 21L)
      .map(i => (i, (mk _).tupled(classes((i % 7).toInt))))
      .toDF("doc_id", "text")
    val out = Text.qualityProbeGopher(docs, "doc_id", "text",
      col("doc_id") % 5 =!= 0).collect()
    assert(out.length === 21, "every document scores")
    out.foreach { r =>
      val want = wantKeep((r.getAs[Long]("doc_id") % 7).toInt)
      assert(r.getAs[Double]("y") === want,
        s"label must equal the Gopher keep for doc ${r.getAs[Long]("doc_id")}")
      assert((r.getAs[Double]("score") >= 0.5) === (want >= 0.5))
    }
    assert(out.head.getAs[Double]("holdout_agree") === 1.0,
      "held-out agreement on a separable fixture is exactly 1")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    // degenerate seed slice (empty): the solve must raise naming the probe
    val e = intercept[Exception] {
      Text.qualityProbeGopher(docs, "doc_id", "text", lit(false)).collect()
    }
    assert(messages(e).exists(_.contains("degenerate seed slice")),
      s"want a loud degenerate-seed error, got: ${messages(e).mkString(" | ")}")
    // SINGULAR seed slice: one class only → x1 is constant over the seed →
    // exactly collinear with the intercept (indicator features have exact
    // 9-dp-rounded products, so no rounding noise hides the rank drop) —
    // the elimination's 0/0 pivot must surface as the same loud error, not
    // as silently absurd weights
    val eSing = intercept[Exception] {
      Text.qualityProbeGopher(docs, "doc_id", "text",
        col("doc_id") % 7 === 0).collect()
    }
    assert(messages(eSing).exists(_.contains("degenerate seed slice")),
      s"want a loud singular-seed error, got: ${messages(eSing).mkString(" | ")}")
    // ALL-SEED predicate: zero held-out rows → the agreement is undefined
    // and must raise naming the probe, not broadcast a silent null
    val eAll = intercept[Exception] {
      Text.qualityProbeGopher(docs, "doc_id", "text", lit(true)).collect()
    }
    assert(messages(eAll).exists(_.contains("zero held-out rows")),
      s"want a loud all-seed error, got: ${messages(eAll).mkString(" | ")}")
  }

  test("ophSignatures: bucket mins + rotation densification match a sequential reference") {
    // reference hash ≡ Text.tokenHash: first 15 hex chars of md5, base 16
    def th(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val M = 1000000007L
    val k = Text.MinhashK
    val C = M // rotation-step offset (Text.OphC)
    def refSig(text: String): Option[Seq[Long]] = {
      val t = text.trim.split(" ").toSeq
      if (t.length < 3) None
      else {
        val hs = (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" "))
          .distinct.map(s => th(s) % M)
        val mins = Array.fill[Option[Long]](k)(None)
        for (h <- hs) {
          val b = (h % k).toInt; val v = h / k
          if (mins(b).forall(_ > v)) mins(b) = Some(v)
        }
        Some((0 until k).map { i =>
          (0 until k).iterator
            .flatMap(j => mins((i + j) % k).map(_ + j * C)).next()
        })
      }
    }
    val fixtures = Map(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three", // exactly one shingle → 15 empty buckets
      3L -> "too short",     // below the shingle width → excluded
      4L -> "alpha beta gamma delta epsilon zeta eta theta") // dup of 1
    val docs = fixtures.toSeq.toDF("doc_id", "text")
    val got = Text.ophSignatures(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong)).toMap
    assert(!got.contains(3L), "docs too short to shingle are excluded")
    for (id <- Seq(1L, 2L, 4L))
      assert(got(id) === refSig(fixtures(id)).get, s"signature mismatch for doc $id")
    assert(got(1L) === got(4L), "identical text → identical OPH signature")
    // single-shingle doc: one real bucket; every other component is that
    // bucket's value plus a DISTINCT rotation offset (the densification
    // guarantee that borrowed components collide only at equal distance)
    assert(got(2L).distinct.size === k,
      "borrowed components must carry distinct rotation offsets")
  }
}
