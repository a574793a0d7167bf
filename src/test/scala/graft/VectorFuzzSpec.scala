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

    test(s"random vectors (seed $seed): PQ encode matches the exact model " +
      "on BOTH paths; codebook members reconstruct exactly; finer " +
      "subspaces never increase reconstruction error") {
      val rng = new scala.util.Random(seed * 31 + 7)
      val dims = 16
      val kCode = 6
      val corpus: Seq[(Long, Seq[Double])] = (0L until 30L).map { id =>
        id -> Seq.fill(dims)(rng.nextInt(9).toDouble + 1.0)
      }
      val df = corpus.toDF("vec_id", "embedding")

      // in-memory model with the engine's arithmetic: per-subspace
      // index-order squared-diff fold, HALF_UP 6-dp round, ties → lowest j
      val cb = corpus.filter(_._1 < kCode).sortBy(_._1).map(_._2)
      def modelEncode(m: Int): Map[Long, (Seq[Int], Seq[Double], Double)] = {
        val sub = dims / m
        corpus.map { case (id, v) =>
          val perSub = (0 until m).map { s =>
            cb.indices.map { j =>
              val d = (0 until sub).foldLeft(0.0) { (acc, i) =>
                val t = v(s * sub + i) - cb(j)(s * sub + i); acc + t * t
              }
              (round6(d), j)
            }.min
          }
          val codes = perSub.map(_._2)
          val rv = (0 until m).flatMap(s =>
            cb(codes(s)).slice(s * sub, (s + 1) * sub))
          val err = round6(perSub.map(_._1).foldLeft(0.0)(_ + _))
          id -> ((codes, rv, err))
        }.toMap
      }

      for (m <- Seq(4, 8); forceRow <- Seq(false, true)) {
        val got = Vector.pqEncodePath(df, m, kCode, rowPath = Some(forceRow))
          .select("c_id", "codes", "rv", "err")
          .as[(Long, Seq[Int], Seq[Double], Double)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
        val want = modelEncode(m)
        assert(got == want,
          s"seed $seed m=$m rowPath=$forceRow: pqEncode diverged from the " +
            s"exact model at ids ${
              want.keys.filter(k => got.get(k) != want.get(k)).toSeq.sorted.take(3)}")
        // codebook members must reconstruct themselves bit for bit
        for (id <- 0L until kCode.toLong) {
          val (_, rv, err) = got(id)
          assert(err == 0.0 && rv == corpus(id.toInt)._2,
            s"seed $seed m=$m rowPath=$forceRow: codebook member $id does " +
              s"not reconstruct exactly (err=$err)")
        }
      }

      // splitting a subspace can only tighten each per-slice argmin, so
      // total reconstruction error is monotone non-increasing in m
      val errByM = Seq(1, 2, 4, 8, 16).map(m => modelEncode(m).map(_._2._3).sum)
      assert(errByM.zip(errByM.tail).forall { case (c, f) => f <= c + 1e-9 },
        s"seed $seed: reconstruction error not monotone over m: $errByM")

      // full-probe IVF-PQ ≡ plain PQ ADC: with every list probed the
      // candidate set is the whole corpus and the scoring expression is
      // shared, so any divergence is a list-routing bug
      val queryIds = rng.shuffle(corpus.map(_._1)).take(6).toSet
      val qdf = corpus.filter(x => queryIds(x._1)).toDF("vec_id", "embedding")
      def topK(res: org.apache.spark.sql.DataFrame) =
        res.select("q_id", "rank", "c_id", "cos")
          .as[(Long, Int, Long, Double)].collect().toSet
      val pq = topK(Vector.pqTopK(qdf, df, 4, m = 4, kCode = kCode))
      val ivfpq = topK(Vector.ivfPqTopK(qdf, df, 4, nlist = 8, nprobe = 8,
        m = 4, kCode = kCode))
      assert(ivfpq == pq,
        s"seed $seed: ivfPqTopK(nprobe=nlist) diverged from pqTopK " +
          s"(missing ${pq -- ivfpq}, extra ${ivfpq -- pq})")

      // Lloyd refinement (assign → per-dim means → re-encode) cannot worsen
      // total reconstruction error: SSE(new cb, new asg) ≤ SSE(new cb, old
      // asg) ≤ SSE(old cb, old asg) — up to the 6-dp dist rounding and the
      // trainer's 9-dp centroid quantization
      def totalErr(enc: org.apache.spark.sql.DataFrame): Double =
        enc.agg(org.apache.spark.sql.functions.sum("err"))
          .collect().head.getDouble(0)
      val errInit = totalErr(Vector.pqEncode(df, m = 4, kCode = kCode))
      val errTrained = totalErr(
        Vector.pqEncodeWith(df, 4, Vector.pqTrain(df, m = 4, kCode = kCode)))
      assert(errTrained <= errInit + 1e-3,
        s"seed $seed: trained codebook worsened reconstruction " +
          s"($errInit -> $errTrained)")

      // an unclamped Hamming prefilter admits every candidate, so the
      // exact re-rank must reduce binaryTopK to brute force — any
      // divergence is a prefilter-cut or packing bug
      val bin = topK(Vector.binaryTopK(qdf, df, 4,
        prefilter = corpus.size, dims = dims))
      val bf = topK(Vector.bruteForceTopK(qdf, df, 4))
      assert(bin == bf,
        s"seed $seed: binaryTopK(prefilter=all) diverged from brute force " +
          s"(missing ${bf -- bin}, extra ${bin -- bf})")
    }
  }
}
