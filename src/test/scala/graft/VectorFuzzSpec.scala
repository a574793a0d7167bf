package graft

import graft.engine.Vector

/** Randomized fuzz for the ANN stack's exact core:
  *
  *  1. [[Vector.bruteForceTopK]] vs an in-memory model that mirrors the
  *     engine's arithmetic exactly — index-order dot accumulation,
  *     `dot / (sqrt(na) * sqrt(nb))`, HALF_UP round to 6 decimals, ties
  *     broken by ascending candidate id.  Rounding to 1e-6 makes exact
  *     cosine TIES common in random integer-valued vectors, so the
  *     tie-break path is exercised constantly, not incidentally.
  *  2. `ivfTopK(nprobe = nlist)` must equal `bruteForceTopK` EXACTLY: with
  *     every list probed the IVF candidate set is the whole corpus, so the
  *     zero-exchange centroid argmax, the probe explode, and the re-rank
  *     must reduce to exhaustive search — any divergence is a routing bug
  *     (a vector assigned to one list but probed under another, a dropped
  *     candidate, a tie-break inversion).
  *
  * The recall-audit queries gate the APPROXIMATE behavior against DuckDB;
  * this suite pins the exact paths under random data.  Seeds fixed.
  */
class VectorFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  for (seed <- FuzzSeeds.seeds(61L, 197L)) {
    test(s"random vectors (seed $seed): brute-force top-k matches the exact " +
      "model; full-probe IVF equals brute force") {
      val rng = new scala.util.Random(seed)
      val dims = 6
      val corpus: Seq[(Long, Seq[Double])] = (0L until 40L).map { id =>
        // +1 keeps every vector nonzero (cosine undefined on zero vectors)
        id -> Seq.fill(dims)(rng.nextInt(9).toDouble + 1.0)
      }
      val queryIds = rng.shuffle(corpus.map(_._1)).take(8).toSet
      val queries = corpus.filter(q => queryIds.contains(q._1))

      val corpusDf = corpus.toDF("vec_id", "embedding")
      val queryDf = queries.toDF("vec_id", "embedding")
      val k = 5

      def collectTopK(df: org.apache.spark.sql.DataFrame) =
        df.select("q_id", "rank", "c_id", "cos")
          .as[(Long, Int, Long, Double)].collect().toSet

      val brute = collectTopK(Vector.bruteForceTopK(queryDf, corpusDf, k))

      // exact model with the engine's arithmetic, tie-break by c_id
      def dot(a: Seq[Double], b: Seq[Double]): Double =
        a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val want = (for {
        (qId, qv) <- queries
        scored = corpus.filter(_._1 != qId).map { case (cId, cv) =>
          (cId, round6(dot(qv, cv) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(cv, cv)))))
        }
        ((cId, cos), i) <- scored.sortBy { case (cId, cos) => (-cos, cId) }
          .take(k).zipWithIndex
      } yield (qId, i + 1, cId, cos)).toSet
      assert(brute == want,
        s"seed $seed: bruteForceTopK diverged from the exact model " +
          s"(missing ${want -- brute}, extra ${brute -- want})")

      // full-probe IVF ≡ exhaustive search
      val ivf = collectTopK(Vector.ivfTopK(queryDf, corpusDf, k,
        nlist = 8, nprobe = 8))
      assert(ivf == brute,
        s"seed $seed: ivfTopK(nprobe=nlist) diverged from brute force " +
          s"(missing ${brute -- ivf}, extra ${ivf -- brute})")

      // ROW-PATH quantizer: nlist × dims (40 × 64 = 2560) exceeds the
      // unrolled-expression codegen budget, so assignment runs through the
      // typed mapPartitions path — full probe must STILL equal brute
      // force, pinning that path's arithmetic (index-order folds, HALF_UP
      // round) and (cos desc, id asc) ordering against the expression form
      val dims2 = 64
      val corpus2: Seq[(Long, Seq[Double])] = (0L until 80L).map { id =>
        id -> Seq.fill(dims2)(rng.nextInt(9).toDouble + 1.0)
      }
      val qIds2 = rng.shuffle(corpus2.map(_._1)).take(5).toSet
      val c2 = corpus2.toDF("vec_id", "embedding")
      val q2 = corpus2.filter(x => qIds2(x._1)).toDF("vec_id", "embedding")
      val brute2 = collectTopK(Vector.bruteForceTopK(q2, c2, k))
      val ivf2 = collectTopK(Vector.ivfTopK(q2, c2, k, nlist = 40, nprobe = 40))
      assert(ivf2 == brute2,
        s"seed $seed: row-path ivfTopK(nprobe=nlist) diverged from brute " +
          s"force (missing ${brute2 -- ivf2}, extra ${ivf2 -- brute2})")
    }
  }
}
