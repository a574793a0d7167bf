package graft

import graft.engine.Upsert

/** Randomized model fuzz for the Debezium-shaped changelog fold
  * ([[Upsert.applyChangelog]]): random snapshots and random per-key change
  * sequences (I/U/D at distinct change-order values, shuffled into one
  * frame) folded against an in-memory model — per key the LATEST change
  * decides (D drops the key, I/U replaces or inserts), keys without
  * changes pass through untouched.  Covers the compositions the targeted
  * cases pin once each: D-then-reinsert histories, a D as the latest
  * change for a key that never existed (must not materialize), updates to
  * NULL-bearing values, multi-change keys whose intermediate states must
  * leave no trace.  Seeds fixed.
  */
class ChangelogFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  for (seed <- FuzzSeeds.seeds(107L, 281L)) {
    test(s"random changelog (seed $seed): fold equals the per-key " +
      "latest-change model") {
      val rng = new scala.util.Random(seed)
      val existing: Map[Long, (Long, Option[Long])] =
        (0L until 15L).map(k => k -> (rng.nextLong(100),
          if (rng.nextInt(5) == 0) None else Some(rng.nextLong(100)))).toMap

      // random change sequences over existing AND never-seen keys
      var ord = 0L
      val changes = scala.collection.mutable.ArrayBuffer[
        (Long, Long, Option[Long], String, Long)]()
      val touched = rng.shuffle((0L until 22L).toList).take(12)
      touched.foreach { k =>
        (0 until 1 + rng.nextInt(4)).foreach { _ =>
          ord += 1
          val op = Seq("I", "U", "D")(rng.nextInt(3))
          changes += ((k, rng.nextLong(100),
            if (rng.nextInt(5) == 0) None else Some(rng.nextLong(100)), op, ord))
        }
      }

      val want: Map[Long, (Long, Option[Long])] = {
        val latest = changes.groupBy(_._1).view.mapValues(_.maxBy(_._5)).toMap
        val afterChanges = latest.foldLeft(existing) {
          case (m, (k, (_, v1, v2, op, _))) =>
            if (op == "D") m - k else m.updated(k, (v1, v2))
        }
        afterChanges
      }

      val got = Upsert.applyChangelog(
          existing.toSeq.map { case (k, (v1, v2)) => (k, v1, v2) }
            .toDF("k", "v1", "v2"),
          rng.shuffle(changes.toList).toDF("k", "v1", "v2", "op", "ord"),
          Seq("k"), Seq("v1", "v2"), "op", "ord")
        .as[(Long, Long, Option[Long])].collect()
        .map { case (k, v1, v2) => k -> (v1, v2) }.toMap
      assert(got == want,
        s"seed $seed: changelog fold diverged " +
          s"(missing ${want.toSet -- got.toSet}, extra ${got.toSet -- want.toSet})")
    }
  }
}
