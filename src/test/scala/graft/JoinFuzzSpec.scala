package graft

import org.apache.spark.sql.functions._

import graft.engine.Relational

/** Randomized model fuzz for the two custom temporal joins:
  *
  *  - [[Relational.asofJoin]] — for each left row, the LATEST right row
  *    with `r.ts <= l.ts` on the key (equal ts matches).  Random
  *    timestamps land on exact ties constantly; right value columns are
  *    sometimes NULL to pin the one-struct carry (a matched row's NULL
  *    value must surface as NULL, never resurrect an older row's value);
  *    a NULL-timestamp right row is thrown in to pin the documented drop.
  *  - [[Relational.rangeJoin]] — all (left, right) pairs on the key with
  *    `r.ts ∈ [l.ts − W, l.ts]` inclusive.  Timestamps cluster around
  *    multiples of the bin width, so both window endpoints and both bin
  *    boundaries (the probe-two-bins trick's failure surface) are hit
  *    repeatedly.
  *
  * Both are checked row-for-row against direct in-memory models.  The
  * oracle queries cover fixture data; this suite covers the adversarial
  * boundary placements fixtures rarely produce.  Seeds fixed.
  */
class JoinFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  for (seed <- FuzzSeeds.seeds(53L, 149L)) {
    test(s"asofJoin (seed $seed): latest right at-or-before, ties match, " +
      "NULL values carry as NULL, NULL-ts right rows drop") {
      val rng = new scala.util.Random(seed)
      def nextTs(): Long = rng.nextLong(20) * 5 // coarse grid → many ties
      val left: Seq[(Long, Long, Long)] =
        (1 to 30).map(i => (1L + rng.nextLong(4), nextTs(), i.toLong))
      val right: Seq[(Long, Long, Option[Long], Option[Long])] =
        rng.shuffle((for (k <- 1L to 4L; ts <- 0L to 95L by 5L) yield (k, ts))
          .toList).take(25)
          .map { case (k, ts) =>
            (k, ts,
              if (rng.nextInt(4) == 0) None else Some(rng.nextLong(100)),
              if (rng.nextInt(4) == 0) None else Some(rng.nextLong(100)))
          }
      val rightDf = right.toDF("k", "ts", "a", "b")
        // a NULL-ts right row: ASOF can never match it; it must be dropped,
        // not sorted first and carried into every left row of the key
        .unionByName(Seq((1L, Option.empty[Long], Option(7L), Option(7L)))
          .toDF("k", "ts", "a", "b"))
      val got = Relational.asofJoin(left.toDF("k", "ts", "lval"), rightDf,
          Seq("k"), "ts", Seq("a", "b"))
        .select("k", "ts", "lval", "r_a", "r_b")
        .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet
      val want = left.map { case (k, lts, lv) =>
        val m = right.filter(r => r._1 == k && r._2 <= lts)
          .sortBy(_._2).lastOption
        (k, lts, lv, m.flatMap(_._3), m.flatMap(_._4))
      }.toSet
      assert(got == want, s"seed $seed: asofJoin diverged " +
        s"(missing ${want -- got}, extra ${got -- want})")
    }

    test(s"rangeJoin (seed $seed): exactly the pairs in [l.ts - W, l.ts], " +
      "across bin boundaries") {
      val rng = new scala.util.Random(seed * 31)
      val W = 1000L // micros
      // cluster on and around bin edges: n*W - 1, n*W, n*W + 1, interior
      def nextTs(): Long = {
        val base = (1 + rng.nextLong(8)) * W
        base + Seq(-1L, 0L, 1L, W / 2, rng.nextLong(W))(rng.nextInt(5))
      }
      val left: Seq[(Long, Long, Long)] =
        (1 to 25).map(i => (1L + rng.nextLong(3), nextTs(), i.toLong))
      val right: Seq[(Long, Long, Long)] =
        (1 to 25).map(i => (1L + rng.nextLong(3), nextTs(), 100L + i))
      val lDf = left.toDF("k", "ts_us", "lid")
        .withColumn("lts", timestamp_micros(col("ts_us"))).drop("ts_us")
      val rDf = right.toDF("k", "ts_us", "rid")
        .withColumn("rts", timestamp_micros(col("ts_us"))).drop("ts_us")
      val got = Relational.rangeJoin(lDf, rDf, Seq("k"), "lts", "rts", W)
        .select("k", "lid", "r_rid")
        .as[(Long, Long, Long)].collect()
      val want = for {
        (lk, lts, lid) <- left
        (rk, rts, rid) <- right
        if lk == rk && rts >= lts - W && rts <= lts
      } yield (lk, lid, rid)
      assert(got.sorted.toSeq == want.sorted.toSeq,
        s"seed $seed: rangeJoin diverged " +
          s"(missing ${want.toSet -- got.toSet}, extra ${got.toSet -- want.toSet})")
    }
  }
}
