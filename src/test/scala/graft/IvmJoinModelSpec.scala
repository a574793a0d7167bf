package graft

import org.apache.spark.sql.functions._

import graft.engine.{Ivm, TxTable}

/** MODEL-BASED randomized stress for JOIN-VIEW incremental maintenance
  * ([[Ivm.refreshJoinSumCount]]): TWO random commit histories — a fact
  * table (keyed merge with preserved FK, append, rewrite delete, DV delete,
  * compaction, restore) and a dimension table (keyed merge that re-maps
  * groups, delete, compaction, restore) — advance independently, and at
  * random points the `(g, n, sum)` view refreshes over the JOINT window
  * `(factFrom, factHead] × (dimFrom, dimHead]` and must equal a
  * from-scratch recompute of `fact ⋈ dim` from the two in-memory models.
  * Replayed joint windows must no-op under the packed two-table horizon.
  *
  * The targeted join-view case pins single properties (group migration,
  * dim-delete retraction, replay); this suite exists for the interactions
  * no targeted case enumerates — a dim re-map and a fact delete folding
  * into ONE delta, restore on either side turning the window's feed into a
  * whole-snapshot diff, unmatched facts admitted later by a dim insert,
  * compactions interleaved on both tables mid-window.  Seeds are fixed: a
  * failure names the seed and op index and replays deterministically.
  */
class IvmJoinModelSpec extends SparkFunSuite {
  import spark.implicits._

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("ivmjoin_spec").toString + "/tbl"

  /** Fact rows: (id PK, x measure — updated, k FK — preserved on update). */
  private def factDf(rows: Iterable[(Long, (Long, Long))]) =
    rows.toSeq.map { case (id, (k, x)) => (id, x, k) }.toDF("id", "x", "k")

  private def dimDf(rows: Iterable[(Long, Long)]) =
    rows.toSeq.toDF("k", "g")

  for (seed <- FuzzSeeds.seeds(23L, 307L)) {
    test(s"random fact x dim history (seed $seed): join view always equals " +
      "the recompute; replayed joint windows no-op") {
      val rng = new scala.util.Random(seed)
      val factRoot = newRoot(); val dimRoot = newRoot(); val viewRoot = newRoot()
      var factModel = Map.empty[Long, (Long, Long)] // id -> (k, x)
      var dimModel = Map.empty[Long, Long]          // k  -> g
      var nextId = 0L
      def freshFacts(n: Int): Map[Long, (Long, Long)] = {
        val rows = (nextId until nextId + n)
          .map(id => id -> (rng.nextLong(10), rng.nextLong(1000))).toMap
        nextId += n
        rows
      }

      def expectedView(): Map[Long, (Long, Long)] =
        factModel.values.toSeq
          .flatMap { case (k, x) => dimModel.get(k).map(g => (g, x)) }
          .groupBy(_._1).view
          .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
      def actualView(): Map[Long, (Long, Long)] =
        TxTable.read(spark, viewRoot)
          .select(col("g"), col("n"), col("sum").cast("long"))
          .as[(Long, Long, Long)].collect()
          .map { case (g, n, s) => g -> (n, s) }.toMap

      val fInit = freshFacts(20)
      var fHead = TxTable.commitMerge(spark, factRoot, factDf(fInit),
        Seq("id"), Seq("x"), Seq("k"), cdf = true)
      factModel = fInit
      val dInit = (0L until 7L).map(k => k -> rng.nextLong(4)).toMap
      var dHead = TxTable.commitMerge(spark, dimRoot, dimDf(dInit),
        Seq("k"), Seq("g"), Nil, cdf = true)
      dimModel = dInit
      val fSnaps = scala.collection.mutable.Map(fHead -> factModel)
      val dSnaps = scala.collection.mutable.Map(dHead -> dimModel)
      // the view's applied-through joint horizon
      var (fFrom, dFrom) = (0L, 0L)

      for (op <- 1 to 14) {
        val desc = rng.nextInt(12) match {
          case 0 | 1 => // fact merge: update x of live ids (k preserved) + inserts
            val updates = rng.shuffle(factModel.keys.toSeq)
              .take(1 + rng.nextInt(1 + factModel.size / 3))
              .map(id => id -> (rng.nextLong(10), rng.nextLong(1000)))
            val inserts = freshFacts(rng.nextInt(4)).toSeq
            fHead = TxTable.commitMerge(spark, factRoot,
              factDf(updates ++ inserts), Seq("id"), Seq("x"), Seq("k"),
              cdf = true)
            factModel = factModel ++
              updates.map { case (id, (_, x)) => id -> (factModel(id)._1, x) } ++
              inserts
            s"fact-merge ${updates.size}u+${inserts.size}i"
          case 2 => // fact append (insert-only CDF path)
            val rows = freshFacts(1 + rng.nextInt(6))
            fHead = TxTable.commitAppend(spark, factRoot, factDf(rows))
            factModel = factModel ++ rows
            s"fact-append ${rows.size}"
          case 3 | 4 => // fact delete (rewrite or DV — same logical effect)
            val victims = rng.shuffle(factModel.keys.toSeq)
              .take(rng.nextInt(1 + (factModel.size - 1) / 2))
            if (victims.nonEmpty) {
              fHead =
                if (rng.nextBoolean()) TxTable.commitDelete(spark, factRoot,
                  victims.toDF("id"), Seq("id"), cdf = true)
                else TxTable.commitDeleteVectors(spark, factRoot,
                  victims.toDF("id"), Seq("id"), cdf = true)
              factModel = factModel -- victims
            }
            s"fact-delete ${victims.size}"
          case 5 => // fact layout-only commit: the window's CDF must skip it
            fHead = TxTable.compactTx(spark, factRoot, targetBytes = 1L << 20)
            "fact-compact"
          case 6 => // fact restore: window feed becomes delete-all+insert-all
            val target = 1L + rng.nextLong(fHead)
            fHead = TxTable.restore(spark, factRoot, target)
            factModel = fSnaps(target)
            s"fact-restore v$target"
          case 7 | 8 => // dim merge: re-map live keys' groups + admit new keys
            val updates = rng.shuffle(dimModel.keys.toSeq)
              .take(1 + rng.nextInt(1 + dimModel.size / 2))
              .map(k => k -> rng.nextLong(4))
            val inserts = (0L until 10L).filterNot(dimModel.contains)
              .take(rng.nextInt(2)).map(k => k -> rng.nextLong(4))
            dHead = TxTable.commitMerge(spark, dimRoot,
              dimDf(updates ++ inserts), Seq("k"), Seq("g"), Nil, cdf = true)
            dimModel = dimModel ++ updates ++ inserts
            s"dim-merge ${updates.size}u+${inserts.size}i"
          case 9 => // dim delete: retracts every joined fact of that key
            val victims = rng.shuffle(dimModel.keys.toSeq)
              .take(rng.nextInt(1 + (dimModel.size - 1) / 2))
            if (victims.nonEmpty) {
              dHead = TxTable.commitDelete(spark, dimRoot,
                victims.toDF("k"), Seq("k"), cdf = true)
              dimModel = dimModel -- victims
            }
            s"dim-delete ${victims.size}"
          case 10 => // dim layout-only commit
            dHead = TxTable.compactTx(spark, dimRoot, targetBytes = 1L << 20)
            "dim-compact"
          case _ => // dim restore
            val target = 1L + rng.nextLong(dHead)
            dHead = TxTable.restore(spark, dimRoot, target)
            dimModel = dSnaps(target)
            s"dim-restore v$target"
        }
        fSnaps(fHead) = factModel
        dSnaps(dHead) = dimModel

        if (rng.nextInt(2) == 0) { // refresh the joint window at random points
          val vHead = Ivm.refreshJoinSumCount(spark, factRoot, dimRoot,
            viewRoot, fFrom, fHead, dFrom, dHead, "k", "k", "g", "x")
          assert(actualView() == expectedView(),
            s"seed $seed op #$op ($desc): join view diverged after refresh " +
              s"($fFrom,$fHead]x($dFrom,$dHead]")
          if (rng.nextInt(2) == 0) { // replay the SAME joint window: no-op
            val replayed = Ivm.refreshJoinSumCount(spark, factRoot, dimRoot,
              viewRoot, fFrom, fHead, dFrom, dHead, "k", "k", "g", "x")
            assert(replayed == vHead &&
              TxTable.latestVersion(spark, viewRoot).contains(vHead),
              s"seed $seed op #$op ($desc): replayed joint window published " +
                "a new view version instead of no-opping")
            assert(actualView() == expectedView(),
              s"seed $seed op #$op ($desc): replay changed the view content")
          }
          fFrom = fHead; dFrom = dHead
        }
      }

      // final catch-up through whatever tail the random walk left behind
      Ivm.refreshJoinSumCount(spark, factRoot, dimRoot, viewRoot,
        fFrom, fHead, dFrom, dHead, "k", "k", "g", "x")
      assert(actualView() == expectedView(),
        s"seed $seed: final catch-up diverged from the recompute")
    }
  }
}
