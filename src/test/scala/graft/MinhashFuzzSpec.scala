package graft

import org.apache.spark.sql.functions.col

import graft.engine.Text

/** End-to-end model fuzz for the MinHash near-dup pipeline: random corpora
  * of doc families (a base token sequence plus mutated near-copies, plus
  * unrelated docs, plus too-short docs that must be excluded) driven
  * through `minhashBands → minhashCandidates → verifiedPairs`, checked
  * against a Scala model that mirrors the engine arithmetic EXACTLY —
  * md5-prefix 60-bit token hash mod M, the k affine permutations mod P,
  * 4×4 banding with the string band key, candidate = any shared (band,
  * band_key), and exact distinct-shingle Jaccard rounded HALF_UP to 6
  * decimals at the threshold.
  *
  * The oracle queries pin the pipeline against DuckDB on fixture text;
  * this suite pins it on adversarial family structure (mutation rates
  * straddling the banding threshold) where candidate membership flips on
  * single-component signature differences.  Seeds fixed.
  */
class MinhashFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private val M = 1000000007L
  private val P = 2147483647L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def tokenHash(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  private def shinglesOf(tokens: Seq[String]): Seq[String] =
    if (tokens.size < 3) Nil
    else tokens.sliding(3).map(_.mkString(" ")).toSeq.distinct

  private def signature(tokens: Seq[String]): Seq[Long] = {
    val hs = shinglesOf(tokens).map(t => tokenHash(t) % M)
    (0 until Text.MinhashK).map(i => hs.map(h => ((2 * i + 1) * h + 7 + 13 * i) % P).min)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  for (seed <- FuzzSeeds.seeds(83L, 239L)) {
    test(s"random doc families (seed $seed): bands, candidates, and " +
      "verified pairs match the exact arithmetic model") {
      val rng = new scala.util.Random(seed)
      val vocab = (0 until 30).map(i => f"w$i%02d")
      def freshTokens(n: Int): Seq[String] =
        Seq.fill(n)(vocab(rng.nextInt(vocab.size)))

      var docId = 0L
      val docs = scala.collection.mutable.ArrayBuffer[(Long, Seq[String])]()
      // families: a base doc + 1-3 mutated copies at varying mutation rates
      for (_ <- 1 to 5) {
        val base = freshTokens(8 + rng.nextInt(12))
        docId += 1; docs += ((docId, base))
        for (_ <- 0 until (1 + rng.nextInt(3))) {
          val nMut = rng.nextInt(1 + base.size / 2)
          val mutated = rng.shuffle(base.indices.toList).take(nMut)
            .foldLeft(base)((t, i) => t.updated(i, vocab(rng.nextInt(vocab.size))))
          docId += 1; docs += ((docId, mutated))
        }
      }
      // unrelated docs + too-short docs (< 3 tokens: no shingles, excluded)
      for (_ <- 1 to 4) { docId += 1; docs += ((docId, freshTokens(6 + rng.nextInt(10)))) }
      for (_ <- 1 to 2) { docId += 1; docs += ((docId, freshTokens(1 + rng.nextInt(2)))) }

      val df = docs.toSeq.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")

      // model: signatures -> band keys -> candidate pairs
      val sigs = docs.toSeq.collect {
        case (id, t) if t.size >= 3 => id -> signature(t)
      }.toMap
      val bandKeys: Map[Long, Seq[(Int, String)]] = sigs.view.mapValues { s =>
        (0 until Text.MinhashK / Text.BandRows).map(b =>
          b -> (0 until Text.BandRows).map(r => s(b * Text.BandRows + r)).mkString("-"))
      }.toMap
      val ids = bandKeys.keys.toSeq.sorted
      val wantCand = (for {
        a <- ids; b <- ids if a < b
        if bandKeys(a).exists { case (bi, k) => bandKeys(b).contains((bi, k)) }
      } yield (a, b)).toSet

      val bands = Text.minhashBands(df, "text", "doc_id")
      val gotCand = Text.minhashCandidates(bands)
        .as[(Long, Long)].collect().toSet
      assert(gotCand == wantCand,
        s"seed $seed: candidate pairs diverged " +
          s"(missing ${wantCand -- gotCand}, extra ${gotCand -- wantCand})")

      // model: exact distinct-shingle Jaccard on candidates, threshold 0.3
      val tokMap = docs.toMap
      val thr = 0.3
      val wantVer = wantCand.flatMap { case (a, b) =>
        val (sa, sb) = (shinglesOf(tokMap(a)).toSet, shinglesOf(tokMap(b)).toSet)
        val inter = (sa & sb).size
        val j = round6(inter.toDouble / (sa.size + sb.size - inter))
        if (j >= thr) Some((a, b, j)) else None
      }
      val gotVer = Text.verifiedPairs(df, "text", "doc_id",
          Text.minhashCandidates(bands), thr)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(gotVer == wantVer,
        s"seed $seed: verified pairs diverged " +
          s"(missing ${wantVer -- gotVer}, extra ${gotVer -- wantVer})")
    }
  }
}
