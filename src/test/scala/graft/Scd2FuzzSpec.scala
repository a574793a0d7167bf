package graft

import org.apache.spark.sql.DataFrame

import graft.engine.Upsert

/** Model-based fuzz for the SCD2 history upsert: seeded random batch
  * sequences (each batch a random mix of updates to live keys and brand-new
  * keys, at strictly increasing timestamps) applied through
  * [[Upsert.scd2]], against an in-memory interval model.  After the full
  * history:
  *
  *  - the table equals the model's complete version set (every closed and
  *    open interval, exactly once);
  *  - per key, intervals CHAIN: sorted by `valid_from`, each closed
  *    version's `valid_to` equals the next version's `valid_from`, and
  *    only the last version is open — the invariant every downstream
  *    point-in-time join silently assumes;
  *  - [[Upsert.scd2AsOf]] at random probe times (including exact batch
  *    timestamps, where the boundary must resolve to the NEW version, and
  *    times before the first batch, where a key must be absent) equals the
  *    model's as-of state.
  *
  * The targeted q_scd2_upsert / q_scd2_pit queries pin one hand-built
  * history; this suite covers the interleavings they cannot (keys updated
  * in consecutive batches, keys that skip batches, keys born late).
  */
class Scd2FuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private type Version = (Long, Long, Long, Option[Long]) // k, v, from, to

  private def toDf(rows: Seq[Version]): DataFrame =
    rows.toDF("k", "v", "valid_from", "valid_to")

  private def fromDf(df: DataFrame): Set[Version] =
    df.select("k", "v", "valid_from", "valid_to")
      .as[(Long, Long, Long, Option[Long])].collect().toSet

  for (seed <- FuzzSeeds.seeds(5L, 89L)) {
    test(s"random batch history (seed $seed): table equals the interval " +
      "model, intervals chain, as-of reads match at every probe time") {
      val rng = new scala.util.Random(seed)
      // model: every version ever created, in creation order per key
      var model = Map.empty[Long, Vector[(Long, Long, Option[Long])]] // k -> (v, from, to)
      var table = toDf(Seq.empty[Version])
      var nextKey = 0L
      var ts = 0L
      val batchTimes = scala.collection.mutable.ArrayBuffer[Long]()

      for (_ <- 1 to 8) {
        ts += 1 + rng.nextLong(20)
        batchTimes += ts
        val updates = rng.shuffle(model.keys.toSeq)
          .take(rng.nextInt(1 + model.size / 2))
          .map(k => k -> rng.nextLong(1000))
        val births = (nextKey until nextKey + rng.nextLong(4) + 1)
          .map(k => k -> rng.nextLong(1000))
        nextKey += births.size
        val batch = (updates ++ births).toMap
        table = toDf(fromDf(Upsert.scd2(table,
          batch.toSeq.toDF("k", "v"), Seq("k"), Seq("v"), ts)).toSeq)
        model = batch.foldLeft(model) { case (m, (k, v)) =>
          val closed = m.getOrElse(k, Vector.empty) match {
            case init :+ ((lv, lf, None)) => init :+ ((lv, lf, Some(ts)))
            case other => other
          }
          m.updated(k, closed :+ ((v, ts, None: Option[Long])))
        }
      }

      val wantAll: Set[Version] =
        model.toSeq.flatMap { case (k, vs) =>
          vs.map { case (v, f, t) => (k, v, f, t) }
        }.toSet
      assert(fromDf(table) == wantAll,
        s"seed $seed: full version set diverged from the interval model")

      // chain invariant, asserted on the TABLE (catches closure bugs the
      // model would mask): closed versions meet the next version exactly,
      // one open version per key, at the end
      fromDf(table).groupBy(_._1).foreach { case (k, vs) =>
        val sorted = vs.toSeq.sortBy(_._3)
        sorted.sliding(2).foreach {
          case Seq((_, _, _, to), (_, _, from2, _)) =>
            assert(to.contains(from2),
              s"seed $seed key $k: interval gap — valid_to $to != next valid_from $from2")
          case _ =>
        }
        assert(sorted.init.forall(_._4.isDefined) && sorted.last._4.isEmpty,
          s"seed $seed key $k: expected all-closed history + one open version")
      }

      // as-of probes: exact batch timestamps (boundary → NEW version),
      // random interior times, before-history, after-history
      val probes = batchTimes.toSeq ++ batchTimes.map(_ - 1) ++
        Seq(-1L, ts + 100) ++ (1 to 4).map(_ => rng.nextLong(ts + 10))
      probes.foreach { t =>
        val got = fromDf(Upsert.scd2AsOf(table, t))
          .map(r => (r._1, r._2)).toSet
        val want = model.toSeq.flatMap { case (k, vs) =>
          vs.collectFirst {
            case (v, f, to) if f <= t && to.forall(_ > t) => (k, v)
          }
        }.toSet
        assert(got == want,
          s"seed $seed: as-of t=$t diverged (missing ${want -- got}, " +
            s"extra ${got -- want})")
      }
    }
  }
}
