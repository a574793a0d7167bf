package graft

import org.apache.spark.sql.functions._

import graft.engine.Text

/** Randomized model fuzz for the training-mix assembly ops — the
  * sampling/packing arithmetic a pretraining pipeline stakes its data mix
  * on, each mirrored exactly in Scala:
  *
  *  - [[Text.takeTokenBudget]] — hash-order cumulative cut per group
  *    (md5-prefix order, `cum <= budget` inclusive boundary);
  *  - [[Text.sampleWeighted]] — Efraimidis–Spirakis A-ES with the exact
  *    integer-hash uniform and `ln(u)/w` ranking, id tiebreak;
  *  - [[Text.packChunks]] — concat-and-chunk spans from running token
  *    sums, including zero-token docs and spans landing exactly on chunk
  *    boundaries;
  *  - [[Text.chunkOverlap]] — sliding-window chunk counts, starts, sizes,
  *    and md5 chunk hashes, windows/strides straddling doc lengths.
  *
  * Random budgets/weights/lengths hit every boundary case the targeted
  * specs pin once.  Seeds fixed.
  */
class TextOpsFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  for (seed <- FuzzSeeds.seeds(109L, 283L)) {
    test(s"takeTokenBudget (seed $seed): hash-order cumulative cut matches " +
      "the model at a random budget") {
      val rng = new scala.util.Random(seed)
      val data = (1 to 60).map(i =>
        (1L + rng.nextLong(3), s"doc$i", 1L + rng.nextLong(50)))
      val budget = 50L + rng.nextLong(300)
      val got = Text.takeTokenBudget(data.toDF("g", "key", "nt"),
          "g", "key", col("nt"), budget)
        .select("g", "key").as[(Long, String)].collect().toSet
      // .toSeq before flatMap: a pair-producing flatMap straight off the
      // groupBy Map would collect back INTO a Map and keep one doc per group
      val want = data.groupBy(_._1).toSeq.flatMap { case (g, docs) =>
        var cum = 0L
        docs.sortBy(d => (md5hex(d._2).substring(0, 15), d._2)).flatMap { d =>
          cum += d._3
          if (cum <= budget) Some((g, d._2)) else None
        }
      }.toSet
      assert(got == want, s"seed $seed budget $budget: cut diverged " +
        s"(missing ${want -- got}, extra ${got -- want})")
    }

    test(s"sampleWeighted (seed $seed): A-ES top-k matches the exact " +
      "integer-hash model") {
      val rng = new scala.util.Random(seed)
      val data = (1L to 80L).map(id => (id, 0.5 + rng.nextInt(8)))
      val k = 5 + rng.nextInt(10)
      val got = Text.sampleWeighted(
          data.toDF("id", "w"), "id", col("w"), k)
        .select("id").as[Long].collect().toSet
      val want = data.map { case (id, w) =>
        val u = ((id % 2654435761L) * 2654435761L % 4294967296L + 0.5) / 4294967296.0
        (id, math.log(u) / w)
      }.sortBy { case (id, aes) => (-aes, id) }.take(k).map(_._1).toSet
      assert(got == want, s"seed $seed k=$k: A-ES selection diverged " +
        s"(missing ${want -- got}, extra ${got -- want})")
    }

    test(s"packChunks (seed $seed): spans match the running-sum model, " +
      "boundary-landing and zero-token docs included") {
      val rng = new scala.util.Random(seed)
      val budget = 16
      // lengths biased to multiples of the budget → spans that END exactly
      // on chunk boundaries; plus explicit zero-token docs
      val data = (1 to 40).map { i =>
        val n = rng.nextInt(4) match {
          case 0 => 0L
          case 1 => budget.toLong * (1 + rng.nextInt(2))
          case _ => rng.nextLong(3L * budget)
        }
        (1L + rng.nextLong(3), i.toLong, n)
      }
      val got = Text.packChunks(data.toDF("g", "ord", "nt"),
          "g", "ord", col("nt"), budget)
        .select("g", "ord", "first_chunk", "last_chunk", "n_chunks")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = data.groupBy(_._1).flatMap { case (g, docs) =>
        var cum = 0L
        docs.sortBy(_._2).map { case (_, ord, n) =>
          val start = cum; cum += n
          val first = start / budget
          val last = math.max(cum - 1, start) / budget
          (g, ord, first, last, last - first + 1)
        }
      }.toSet
      assert(got == want, s"seed $seed: spans diverged " +
        s"(missing ${want -- got}, extra ${got -- want})")
    }

    test(s"chunkOverlap (seed $seed): counts, starts, sizes, and hashes " +
      "match the sliding-window model") {
      val rng = new scala.util.Random(seed)
      val vocab = (0 until 20).map(i => f"w$i%02d")
      val (window, stride) = (4 + rng.nextInt(4), 1 + rng.nextInt(4))
      val docs = (1L to 15L).map { id =>
        // lengths from shorter-than-window through several windows
        id -> Seq.fill(rng.nextInt(3 * window) + 1)(vocab(rng.nextInt(vocab.size)))
      }
      val got = Text.chunkOverlap(
          docs.map { case (id, t) => (id, t.mkString(" ")) }.toDF("id", "text"),
          "text", "id", window, stride)
        .select("id", "chunk_id", "start_tok", "n_tok", "chunk_hash")
        .as[(Long, Long, Long, Long, String)].collect().toSet
      val want = docs.flatMap { case (id, t) =>
        val over = math.max(t.size.toLong - window, 0L)
        val k = 1L + (over + stride - 1) / stride
        (0L until k).map { c =>
          val start = c * stride
          val slice = t.slice(start.toInt, start.toInt + window)
          (id, c, start, slice.size.toLong, md5hex(slice.mkString(" ")))
        }
      }.toSet
      assert(got == want, s"seed $seed window=$window stride=$stride: " +
        s"chunks diverged (missing ${want -- got}, extra ${got -- want})")
    }

    test(s"lineDedup (seed $seed): first-occurrence keep matches the model " +
      "including empty docs and exact-multiple lengths") {
      val rng = new scala.util.Random(seed)
      // tiny vocab → heavy cross-doc line collisions; lengths cover empty,
      // shorter-than-line, and exact multiples of the line width
      val vocab = Seq("a", "b", "c")
      val lineTokens = 2 + rng.nextInt(4)
      val docs = (1L to 25L).map { id =>
        val n =
          if (rng.nextInt(6) == 0) 0
          else if (rng.nextInt(4) == 0) lineTokens * (1 + rng.nextInt(3))
          else rng.nextInt(4 * lineTokens) + 1
        id -> Seq.fill(n)(vocab(rng.nextInt(vocab.size)))
      }
      val got = Text.lineDedup(
          docs.map { case (id, t) => (id, t.mkString(" ")) }.toDF("id", "text"),
          "text", "id", lineTokens)
        .select("doc_id", "n_lines", "n_kept", "cleaned")
        .as[(Long, Long, Long, String)].collect().toSet
      // model mirrors Spark's split semantics: split("", " ") = [""], so an
      // empty doc has exactly one (empty) line
      val seen = scala.collection.mutable.Set.empty[String]
      val want = docs.sortBy(_._1).map { case (id, t) =>
        val toks = if (t.isEmpty) Seq("") else t
        val ls = toks.grouped(lineTokens).map(_.mkString(" ")).toSeq
        val kept = ls.filter(l => seen.add(l))
        (id, ls.size.toLong, kept.size.toLong, kept.mkString(" "))
      }.toSet
      assert(got == want, s"seed $seed lineTokens=$lineTokens: dedup " +
        s"diverged (missing ${want -- got}, extra ${got -- want})")
    }

    test(s"lineBoilerplate (seed $seed): distinct-doc frequency cut matches " +
      "the model; within-doc repeats survive") {
      val rng = new scala.util.Random(seed ^ 0x5eed)
      val vocab = Seq("a", "b", "c")
      val lineTokens = 2 + rng.nextInt(4)
      val maxDocs = 1 + rng.nextInt(3)
      val docs = (1L to 25L).map { id =>
        val n =
          if (rng.nextInt(6) == 0) 0
          else if (rng.nextInt(4) == 0) lineTokens * (1 + rng.nextInt(3))
          else rng.nextInt(4 * lineTokens) + 1
        id -> Seq.fill(n)(vocab(rng.nextInt(vocab.size)))
      }
      val got = Text.lineBoilerplate(
          docs.map { case (id, t) => (id, t.mkString(" ")) }.toDF("id", "text"),
          "text", "id", lineTokens, maxDocs)
        .select("doc_id", "n_lines", "n_kept", "cleaned")
        .as[(Long, Long, Long, String)].collect().toSet
      val allLines = docs.map { case (id, t) =>
        val toks = if (t.isEmpty) Seq("") else t
        id -> toks.grouped(lineTokens).map(_.mkString(" ")).toSeq
      }
      val df = allLines.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.size }
      val want = allLines.map { case (id, ls) =>
        val kept = ls.filter(l => df(l) <= maxDocs)
        (id, ls.size.toLong, kept.size.toLong, kept.mkString(" "))
      }.toSet
      assert(got == want, s"seed $seed lineTokens=$lineTokens maxDocs=$maxDocs: " +
        s"boilerplate cut diverged (missing ${want -- got}, extra ${got -- want})")
    }

    test(s"dupSpanProfile (seed $seed): covered-position union matches the " +
      "sliding-window model including within-doc repeats") {
      val rng = new scala.util.Random(seed ^ 0xd0b)
      val vocab = Seq("a", "b", "c")
      val w = 3 + rng.nextInt(3)
      val docs = (1L to 20L).map { id =>
        val n = if (rng.nextInt(6) == 0) rng.nextInt(w) // below-window docs
                else rng.nextInt(4 * w) + 1
        id -> Seq.fill(n)(vocab(rng.nextInt(vocab.size)))
      }
      val got = Text.dupSpanProfile(
          docs.map { case (id, t) => (id, t.mkString(" ")) }.toDF("id", "text"),
          "text", "id", w)
        .select("doc_id", "n_tok", "n_dup_tok")
        .as[(Long, Long, Long)].collect().toSet
      val winCount = scala.collection.mutable.Map.empty[String, Int]
      val winsByDoc = docs.map { case (id, t) =>
        val toks = if (t.isEmpty) Seq("") else t
        val ws = if (toks.size < w) Seq.empty
          else (0 to toks.size - w).map(i => i -> toks.slice(i, i + w).mkString(" "))
        ws.foreach { case (_, s0) => winCount(s0) = winCount.getOrElse(s0, 0) + 1 }
        (id, toks.size.toLong, ws)
      }
      val want = winsByDoc.map { case (id, n, ws) =>
        val cov = ws.filter { case (_, s0) => winCount(s0) >= 2 }
          .flatMap { case (i, _) => i until i + w }.toSet
        (id, n, cov.size.toLong)
      }.toSet
      assert(got == want, s"seed $seed w=$w: dup-span profile diverged " +
        s"(missing ${want -- got}, extra ${got -- want})")
    }
  }
}
