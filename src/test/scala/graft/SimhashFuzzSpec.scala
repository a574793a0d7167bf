package graft

import graft.engine.Text

/** Model fuzz for the SimHash near-dup path — and a direct verification of
  * its PIGEONHOLE recall claim: with 4 bands and `maxHamming ≤ 3`, every
  * pair within the Hamming threshold must agree on at least one whole band,
  * so `simhashNearDupPairs` must return EXACTLY the set of all pairs with
  * `popcount(simhash_a XOR simhash_b) <= maxHamming` — computed here from a
  * Scala mirror of the fingerprint arithmetic (md5-prefix 60-bit token
  * hash, per-bit ±1 sums over ALL tokens including duplicates, strict > 0
  * bit set).  Doc families with small mutations make near-threshold Hamming
  * distances common, so the boundary (3 vs 4) is exercised constantly.
  * Fingerprints themselves are also checked doc-for-doc.  Seeds fixed.
  */
class SimhashFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def tokenHash(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  private def simhash(tokens: Seq[String]): Long = {
    val hs = tokens.map(tokenHash)
    (0 until Text.SimhashBits).foldLeft(0L) { (acc, b) =>
      val s = hs.map(h => if ((h & (1L << b)) != 0) 1L else -1L).sum
      if (s > 0) acc | (1L << b) else acc
    }
  }

  for (seed <- FuzzSeeds.seeds(97L, 263L)) {
    test(s"random doc families (seed $seed): fingerprints match the model; " +
      "banded near-dup pairs are exactly the within-Hamming pairs") {
      val rng = new scala.util.Random(seed)
      val vocab = (0 until 30).map(i => f"w$i%02d")
      def freshTokens(n: Int): Seq[String] =
        Seq.fill(n)(vocab(rng.nextInt(vocab.size)))

      var docId = 0L
      val docs = scala.collection.mutable.ArrayBuffer[(Long, Seq[String])]()
      for (_ <- 1 to 5) {
        val base = freshTokens(6 + rng.nextInt(12))
        docId += 1; docs += ((docId, base))
        for (_ <- 0 until (1 + rng.nextInt(3))) {
          val nMut = 1 + rng.nextInt(3) // small mutations: near-threshold pairs
          val mutated = rng.shuffle(base.indices.toList).take(nMut)
            .foldLeft(base)((t, i) => t.updated(i, vocab(rng.nextInt(vocab.size))))
          docId += 1; docs += ((docId, mutated))
        }
      }
      for (_ <- 1 to 4) { docId += 1; docs += ((docId, freshTokens(5 + rng.nextInt(8)))) }

      val df = docs.toSeq.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val want = docs.toSeq.map { case (id, t) => id -> simhash(t) }.toMap

      val got = Text.simhashRelational(df, "text", "doc_id")
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"seed $seed: fingerprints diverged " +
        s"(${want.keySet.filter(k => got.get(k) != want.get(k))})")

      val maxH = 3
      val ids = want.keys.toSeq.sorted
      val wantPairs = (for {
        a <- ids; b <- ids if a < b
        h = java.lang.Long.bitCount(want(a) ^ want(b))
        if h <= maxH
      } yield (a, b, h.toLong)).toSet
      val gotPairs = Text.simhashNearDupPairs(df, "text", "doc_id", maxH)
        .as[(Long, Long, Long)].collect().toSet
      assert(gotPairs == wantPairs,
        s"seed $seed: near-dup pairs diverged — a missing pair violates the " +
          s"pigeonhole recall claim (missing ${wantPairs -- gotPairs}, " +
          s"extra ${gotPairs -- wantPairs})")
    }
  }
}
