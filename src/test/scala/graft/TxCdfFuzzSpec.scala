package graft

import graft.engine.TxTable

/** Randomized COMPOSITION fuzz for the change data feed: for ANY two
  * recorded versions v1 <= v2 of ANY history, folding
  * `readChanges(v1, v2)` onto the v1 snapshot must reproduce the v2
  * snapshot exactly — the contract an incremental consumer (IVM, a
  * downstream sync) relies on.  The targeted TxTableSpec case replays one
  * hand-built 4-commit feed to the head; this suite drives seeded random
  * histories mixing every change-producing op (append, merge, copy-on-write
  * delete, DV delete — all with `cdf = true` — plus overwrite and restore,
  * whose feeds are derived snapshot diffs, and layout-only compact/Z-order,
  * whose feeds must be EMPTY) and then folds a dozen random version
  * windows per history against recorded model snapshots.
  *
  * Fold rule (mirrors the documented feed semantics): versions apply in
  * ascending order; within one version deletes apply BEFORE
  * inserts/update_postimages, because overwrite and restore emit the
  * whole previous snapshot as 'delete' plus the new one as 'insert' under
  * the SAME commit version, and a key present in both must land on its
  * new value.  Seeds are fixed; failures name the seed and window.
  */
class TxCdfFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("txcdf_spec").toString + "/tbl"

  private def df(rows: Iterable[(Long, Long)]) = rows.toSeq.toDF("k", "v")

  for (seed <- FuzzSeeds.seeds(13L, 211L)) {
    test(s"random cdf history (seed $seed): readChanges(v1, v2) folds any " +
      "recorded snapshot v1 into snapshot v2") {
      val rng = new scala.util.Random(seed)
      val root = newRoot()
      var model = Map.empty[Long, Long]
      var nextKey = 0L
      def freshRows(n: Int): Map[Long, Long] = {
        val ks = nextKey until (nextKey + n)
        nextKey += n
        ks.map(k => k -> rng.nextLong(1000)).toMap
      }
      val init = freshRows(20)
      var head = TxTable.commitAppend(spark, root, df(init),
        statsCols = Seq("k"))
      model = init
      val snapshots = scala.collection.mutable.Map[Long, Map[Long, Long]](
        head -> model)

      for (op <- 1 to 14) {
        val choice = rng.nextInt(12)
        choice match {
          case 0 | 1 =>
            val rows = freshRows(2 + rng.nextInt(8))
            head = TxTable.commitAppend(spark, root, df(rows),
              statsCols = Seq("k"))
            model = model ++ rows
          case 2 | 3 | 4 =>
            val updates = rng.shuffle(model.keys.toSeq)
              .take(1 + rng.nextInt(1 + model.size / 3))
              .map(k => k -> rng.nextLong(1000))
            val batch = updates.toMap ++ freshRows(rng.nextInt(4))
            head = TxTable.commitMerge(spark, root, df(batch),
              Seq("k"), Seq("v"), Nil, cdf = true)
            model = model ++ batch
          case 5 | 6 =>
            val victims = rng.shuffle(model.keys.toSeq)
              .take(rng.nextInt(1 + (model.size - 1) / 2))
            if (victims.nonEmpty) {
              head = TxTable.commitDelete(spark, root, victims.toDF("k"),
                Seq("k"), cdf = true)
              model = model -- victims
            }
          case 7 =>
            val victims = rng.shuffle(model.keys.toSeq)
              .take(rng.nextInt(1 + (model.size - 1) / 2))
            if (victims.nonEmpty) {
              head = TxTable.commitDeleteVectors(spark, root,
                victims.toDF("k"), Seq("k"), cdf = true)
              model = model -- victims
            }
          case 8 =>
            val rows = freshRows(3 + rng.nextInt(6))
            head = TxTable.commitOverwrite(spark, root, df(rows),
              statsCols = Seq("k"))
            model = rows
          case 9 =>
            head = TxTable.compactTx(spark, root, targetBytes = 1L << 20)
          case 10 =>
            head = TxTable.compactZOrder(spark, root, "k", "v",
              numSegments = 2, bits = 8)
          case _ =>
            val target = 1L + rng.nextLong(head)
            head = TxTable.restore(spark, root, target)
            model = snapshots(target)
        }
        snapshots(head) = model
      }

      val versions = snapshots.keys.toSeq.sorted
      for (probe <- 1 to 12) {
        val v1 = versions(rng.nextInt(versions.size))
        val v2s = versions.filter(_ >= v1)
        val v2 = v2s(rng.nextInt(v2s.size))
        val changes = TxTable.readChanges(spark, root, v1, v2)
          .select("k", "v", "_change_type", "_commit_version")
          .as[(Long, Long, String, Long)].collect()
        val folded = changes.groupBy(_._4).toSeq.sortBy(_._1)
          .foldLeft(snapshots(v1)) { case (state, (_, ch)) =>
            val afterDeletes = state -- ch.collect {
              case (k, _, "delete", _) => k
            }
            afterDeletes ++ ch.collect {
              case (k, v, "insert" | "update_postimage", _) => k -> v
            }
          }
        assert(folded == snapshots(v2),
          s"seed $seed probe #$probe: folding ($v1, $v2] diverged " +
            s"(missing ${snapshots(v2).toSet -- folded.toSet}, " +
            s"extra ${folded.toSet -- snapshots(v2).toSet})")
      }
    }
  }
}
