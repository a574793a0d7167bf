package graft

import org.apache.spark.sql.functions._

import graft.engine.{Ivm, TxTable}

/** MODEL-BASED randomized stress for incremental view maintenance: a seeded
  * random sequence of fact-table commits — keyed merge (updates + inserts),
  * rewrite delete, deletion-vector delete, append, layout-only compaction,
  * and snapshot restore — runs against a real CDF-enabled TxTable while an
  * in-memory `Map[id, (grp, x)]` reference model tracks the fact state.  At
  * random points the `(grp, n, sum)` view is refreshed incrementally and
  * must equal a from-scratch recompute of the model EXACTLY (decimal
  * accumulation is exact, so bit-for-bit, including keys leaving the view
  * when their count zeroes); refreshes are sometimes REPLAYED with the same
  * window and must no-op (the exactly-once batch guard under the exact
  * call pattern a crashed `foreachBatch` produces).
  *
  * The targeted IVM cases in TxTableSpec pin single properties (zero-out,
  * crash-atomic ordering, join-view deltas); this suite exists for the
  * interactions no targeted case enumerates — a refresh window spanning a
  * restore (full delete+insert CDF), DV deletes and rewrites feeding one
  * delta, compaction commits interleaved mid-window.  Seeds are fixed: a
  * failure names the seed and op index and replays deterministically.
  */
class IvmModelSpec extends SparkFunSuite {
  import spark.implicits._

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("ivmmodel_spec").toString + "/tbl"

  /** Fact rows as a frame: (id PK, grp view-key — preserved on update, x
    * measure). */
  private def df(rows: Iterable[(Long, (Long, Long))]) =
    rows.toSeq.map { case (id, (g, x)) => (id, g, x) }.toDF("id", "grp", "x")

  for (seed <- FuzzSeeds.seeds(7L, 101L)) {
    test(s"random fact history (seed $seed): incremental view always equals " +
      "the recompute; replayed windows no-op") {
      val rng = new scala.util.Random(seed)
      val factRoot = newRoot()
      val viewRoot = newRoot()
      var model = Map.empty[Long, (Long, Long)]
      var nextId = 0L
      def freshRows(n: Int): Map[Long, (Long, Long)] = {
        val rows = (nextId until nextId + n)
          .map(id => id -> (rng.nextLong(6), rng.nextLong(1000))).toMap
        nextId += n
        rows
      }

      def expectedView(): Map[Long, (Long, Long)] =
        model.values.groupBy(_._1).view
          .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
      def actualView(): Map[Long, (Long, Long)] =
        TxTable.read(spark, viewRoot)
          .select(col("grp"), col("n"), col("sum").cast("long"))
          .as[(Long, Long, Long)].collect()
          .map { case (g, n, s) => g -> (n, s) }.toMap

      // bootstrap the fact so delete/compact/restore always have a head
      val init = freshRows(24)
      var head = TxTable.commitMerge(spark, factRoot, df(init),
        Seq("id"), Seq("x"), Seq("grp"), cdf = true)
      model = init
      val snapshots = scala.collection.mutable.Map[Long, Map[Long, (Long, Long)]](
        head -> model)
      var refreshes = 0

      for (op <- 1 to 14) {
        val desc = rng.nextInt(10) match {
          case 0 | 1 => // merge: update x of live ids (grp preserved) + inserts
            val updates = rng.shuffle(model.keys.toSeq)
              .take(1 + rng.nextInt(1 + model.size / 3))
              .map(id => id -> (rng.nextLong(6), rng.nextLong(1000)))
            val inserts = freshRows(rng.nextInt(5)).toSeq
            head = TxTable.commitMerge(spark, factRoot, df(updates ++ inserts),
              Seq("id"), Seq("x"), Seq("grp"), cdf = true)
            // the table PRESERVES grp for matched keys — mirror that
            model = model ++
              updates.map { case (id, (g, x)) => id -> (model(id)._1, x) } ++
              inserts
            s"merge ${updates.size}u+${inserts.size}i"
          case 2 | 3 => // append fresh ids (insert-only CDF path)
            val rows = freshRows(1 + rng.nextInt(8))
            head = TxTable.commitAppend(spark, factRoot, df(rows))
            model = model ++ rows
            s"append ${rows.size}"
          case 4 | 5 => // rewrite delete; never empties the fact
            val victims = rng.shuffle(model.keys.toSeq)
              .take(rng.nextInt(1 + (model.size - 1) / 2))
            if (victims.nonEmpty) {
              head = TxTable.commitDelete(spark, factRoot,
                victims.toDF("id"), Seq("id"), cdf = true)
              model = model -- victims
            }
            s"delete ${victims.size}"
          case 6 => // deletion-vector delete: same logical effect, no rewrite
            val victims = rng.shuffle(model.keys.toSeq)
              .take(rng.nextInt(1 + (model.size - 1) / 2))
            if (victims.nonEmpty) {
              head = TxTable.commitDeleteVectors(spark, factRoot,
                victims.toDF("id"), Seq("id"), cdf = true)
              model = model -- victims
            }
            s"dv-delete ${victims.size}"
          case 7 => // layout-only commit inside the window: CDF must skip it
            head = TxTable.compactTx(spark, factRoot, targetBytes = 1L << 20)
            "compact"
          case _ => // restore: the window's CDF becomes delete-all+insert-all
            val target = 1L + rng.nextLong(head)
            head = TxTable.restore(spark, factRoot, target)
            model = snapshots(target)
            s"restore v$target"
        }
        snapshots(head) = model

        if (rng.nextInt(2) == 0) { // refresh at random points, not every op
          val from = TxTable.lastCommittedBatch(spark, viewRoot).getOrElse(0L)
          val vHead = Ivm.refreshSumCount(spark, factRoot, viewRoot,
            from, head, "grp", "x")
          refreshes += 1
          assert(actualView() == expectedView(),
            s"seed $seed op #$op ($desc): view diverged from recompute " +
              s"after refresh ($from, $head]")
          if (rng.nextInt(2) == 0) { // replay the SAME window: must no-op
            val replayed = Ivm.refreshSumCount(spark, factRoot, viewRoot,
              from, head, "grp", "x")
            assert(replayed == vHead &&
              TxTable.latestVersion(spark, viewRoot).contains(vHead),
              s"seed $seed op #$op ($desc): replayed window ($from, $head] " +
                "published a new view version instead of no-opping")
            assert(actualView() == expectedView(),
              s"seed $seed op #$op ($desc): replay changed the view content")
          }
        }
      }

      // final catch-up through whatever tail the random walk left behind
      Ivm.refreshLatest(spark, factRoot, viewRoot, "grp", "x")
      assert(actualView() == expectedView(),
        s"seed $seed: final refreshLatest catch-up diverged from recompute")
      assert(refreshes > 0, s"seed $seed: degenerate run, no mid-walk refresh")
    }
  }
}
