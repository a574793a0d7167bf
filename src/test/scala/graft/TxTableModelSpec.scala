package graft

import org.apache.spark.sql.functions._

import graft.engine.TxTable

/** MODEL-BASED randomized stress for the TxTable commit protocol: a seeded
  * random interleaving of every content-bearing and layout-bearing op —
  * append (fresh keys), keyed merge-upsert, keyed delete, deletion-vector
  * delete, one-commit keyed rewrite (commitRewriteHit), compaction,
  * Z-order clustering, snapshot restore — is applied in
  * lockstep to the real table and to an in-memory `Map[k, v]` reference
  * model.  After EVERY op the table's head must equal the model exactly,
  * and after the full sequence EVERY recorded version must time-travel back
  * to the model state that produced it — including versions published by
  * layout-only commits (compact/Z-order must not change content) and the
  * forward-commit snapshots restore re-publishes.
  *
  * The targeted TxTableSpec cases each pin ONE protocol property; this
  * suite exists for the interactions no targeted case enumerates (a DV
  * landing on a segment a later compact materializes, a restore reaching
  * back across a delete, a merge whose hit segments were just z-ordered).
  * Seeds are fixed: a failure names the seed and op index, and replays
  * deterministically.
  */
class TxTableModelSpec extends SparkFunSuite {
  import spark.implicits._

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("txmodel_spec").toString + "/tbl"

  private def df(rows: Iterable[(Long, Long)]) = rows.toSeq.toDF("k", "v")

  private def tableState(root: String): Map[Long, Long] =
    TxTable.read(spark, root).select("k", "v").as[(Long, Long)]
      .collect().toMap

  private def versionState(root: String, v: Long): Map[Long, Long] =
    TxTable.readVersion(spark, root, v).select("k", "v").as[(Long, Long)]
      .collect().toMap

  for (seed <- FuzzSeeds.seeds(11L, 47L)) {
    test(s"random op sequence (seed $seed): head tracks the model, " +
      "every version time-travels to its recorded state") {
      val rng = new scala.util.Random(seed)
      val root = newRoot()
      var model = Map.empty[Long, Long]
      var nextKey = 0L
      def freshKeys(n: Int): Seq[Long] = {
        val ks = nextKey until (nextKey + n)
        nextKey += n
        ks
      }
      // bootstrap: the table must exist before delete/compact/restore ops
      val init = freshKeys(20).map(k => k -> rng.nextLong(1000)).toMap
      var head = TxTable.commitMerge(spark, root, df(init),
        Seq("k"), Seq("v"), Nil)
      model = init
      val snapshots = scala.collection.mutable.Map[Long, Map[Long, Long]](
        head -> model)

      for (op <- 1 to 12) {
        // randomly flip the stats-placement budget mid-history, so the
        // model also walks tables whose manifests MIX inline stats and
        // per-commit sidecars (placement is correctness-neutral by design;
        // every read/carry/restore path must behave identically)
        if (rng.nextInt(4) == 0)
          spark.conf.set("spark.graft.tx.statsInlineMax",
            if (rng.nextBoolean()) "0" else "2048")
        val choice = rng.nextInt(10)
        val desc = choice match {
          case 0 | 1 => // append fresh keys (disjoint: append is a multiset op)
            val rows = freshKeys(1 + rng.nextInt(8))
              .map(k => k -> rng.nextLong(1000)).toMap
            head = TxTable.commitAppend(spark, root, df(rows),
              statsCols = Seq("k"))
            model = model ++ rows
            s"append ${rows.size}"
          case 2 | 3 => // merge: mix of updates to live keys and inserts
            val updates = rng.shuffle(model.keys.toSeq)
              .take(1 + rng.nextInt(1 + model.size / 3))
              .map(k => k -> rng.nextLong(1000))
            val inserts = freshKeys(rng.nextInt(5))
              .map(k => k -> rng.nextLong(1000))
            val batch = (updates ++ inserts).toMap
            head = TxTable.commitMerge(spark, root, df(batch),
              Seq("k"), Seq("v"), Nil)
            model = model ++ batch
            s"merge ${updates.size}u+${inserts.size}i"
          case 4 => // keyed delete (rewrite path); never empties the table
            val victims = rng.shuffle(model.keys.toSeq)
              .take(rng.nextInt(1 + (model.size - 1) / 2))
            if (victims.nonEmpty) {
              head = TxTable.commitDelete(spark, root,
                victims.toDF("k"), Seq("k"))
              model = model -- victims
            }
            s"delete ${victims.size}"
          case 5 => // deletion-vector delete (no rewrite); same model effect
            val victims = rng.shuffle(model.keys.toSeq)
              .take(rng.nextInt(1 + (model.size - 1) / 2))
            if (victims.nonEmpty) {
              head = TxTable.commitDeleteVectors(spark, root,
                victims.toDF("k"), Seq("k"))
              model = model -- victims
            }
            s"dv-delete ${victims.size}"
          case 6 => // compaction (full or small-segment-only): layout only,
            // content must not move either way
            if (rng.nextBoolean()) {
              head = TxTable.compactTx(spark, root, targetBytes = 1L << 20)
              "compact"
            } else {
              // threshold below may leave <2 small segments → legal no-op
              head = TxTable.compactSmall(spark, root, minBytes = 1L << 14)
              "compactSmall"
            }
          case 7 => // Z-order rewrite: layout only, content must not move
            head = TxTable.compactZOrder(spark, root, "k", "v",
              numSegments = 2)
            "zorder"
          case 8 => // ONE-COMMIT keyed rewrite (commitRewriteHit, the IVM
            // apply primitive): re-value some live keys, DROP some, INSERT
            // fresh keys — all decided by the rewrite callback in a single
            // atomic commit.  Touched rows whose key is not in the key set
            // must pass through unchanged; dropped keys simply do not
            // reappear in the replacement.
            val live = rng.shuffle(model.keys.toSeq)
              .take(rng.nextInt(1 + model.size / 2))
            val (drops, sets0) = live.partition(_ => rng.nextInt(3) == 0)
            val sets = sets0.map(k => k -> rng.nextLong(1000)).toMap
            val inserts = freshKeys(rng.nextInt(4))
              .map(k => k -> rng.nextLong(1000)).toMap
            val ks = (drops ++ sets.keys ++ inserts.keys).toSeq
            if (ks.nonEmpty) {
              val replaced = (drops ++ sets.keys).toSeq
              head = TxTable.commitRewriteHit(spark, root,
                ks.toDF("k"), Seq("k")) { touched =>
                val kept = if (replaced.isEmpty) touched
                  else touched.filter(!col("k").isin(replaced: _*))
                kept.unionByName(df(sets ++ inserts))
              }
              model = model -- drops ++ sets ++ inserts
            }
            s"rewriteHit ${sets.size}s+${drops.size}d+${inserts.size}i"
          case _ => // restore to a uniformly random prior version
            val target = 1L + rng.nextLong(head)
            head = TxTable.restore(spark, root, target)
            model = snapshots(target)
            s"restore v$target"
        }
        snapshots(head) = model
        assert(tableState(root) == model,
          s"seed $seed op #$op ($desc): head v$head diverged from the model")
        assert(TxTable.latestVersion(spark, root).contains(head),
          s"seed $seed op #$op ($desc): commit returned v$head but the log " +
            s"head is ${TxTable.latestVersion(spark, root)}")
      }

      // every recorded version must still read back to the exact state
      // that produced it (no vacuum ran: the whole history is retained)
      snapshots.toSeq.sortBy(_._1).foreach { case (v, want) =>
        assert(versionState(root, v) == want,
          s"seed $seed: time travel to v$v no longer matches its state")
      }

      // retention phase: after vacuum the RETAINED window must still
      // time-travel exactly (vacuum may only drop segments no retained
      // manifest references — restore's zero-copy forward commits keep
      // old-era segments live), and aged-out versions must fail loudly,
      // never read a partial snapshot
      TxTable.vacuum(spark, root, keepVersions = 3)
      val keepFrom = head - 2
      snapshots.toSeq.sortBy(_._1).foreach { case (v, want) =>
        if (v >= keepFrom)
          assert(versionState(root, v) == want,
            s"seed $seed: post-vacuum time travel to retained v$v diverged")
        else {
          val r = scala.util.Try(versionState(root, v))
          assert(r.isFailure,
            s"seed $seed: v$v aged out by vacuum but still read back ${r}")
        }
      }
      assert(tableState(root) == model,
        s"seed $seed: head diverged after vacuum")
      spark.conf.unset("spark.graft.tx.statsInlineMax")
    }
  }
}
