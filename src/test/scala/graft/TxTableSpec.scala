package graft

import org.apache.spark.sql.functions._

import graft.engine.TxTable

/** Manifest-swap transactional table: commit/read/time-travel/compact/vacuum
  * protocol invariants (TxTable.scala). */
class TxTableSpec extends SparkFunSuite {
  import spark.implicits._

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("txtable_spec").toString + "/tbl"

  test("overwrite then append: versions accumulate, time travel reads each snapshot") {
    val root = newRoot()
    assert(TxTable.latestVersion(spark, root).isEmpty)
    val v1 = TxTable.commitOverwrite(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val v2 = TxTable.commitAppend(spark, root, Seq((3L, "c")).toDF("k", "v"))
    assert(v1 === 1L && v2 === 2L)
    assert(TxTable.read(spark, root).count() === 3)
    assert(TxTable.readVersion(spark, root, 1L).count() === 2,
      "version 1 must stay readable after later commits (snapshot isolation)")
    val v3 = TxTable.commitOverwrite(spark, root, Seq((9L, "z")).toDF("k", "v"))
    assert(v3 === 3L && TxTable.read(spark, root).count() === 1)
    assert(TxTable.readVersion(spark, root, 2L).count() === 3)
  }

  test("history: thin audit trail tracks ops, segment counts, batch watermark") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    TxTable.streamingAppend(root)(Seq((3L, "c")).toDF("k", "v"), 7L)
    TxTable.commitAppend(spark, root, Seq((4L, "d")).toDF("k", "v"))
    val h = TxTable.history(spark, root).orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(h.map(_.getString(1)).toSeq === Seq("overwrite", "append", "append"))
    assert(h.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L), "segment counts grow per append")
    assert(h.head.isNullAt(5), "pre-streaming commits carry no batch watermark")
    assert(h(1).getLong(5) === 7L && h(2).getLong(5) === 7L,
      "the batch watermark latches and carries forward through later commits")
  }

  test("history(limit): the newest-N suffix via the head hint, full sweep unchanged") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq((1L, "a")).toDF("k", "v"))
    for (i <- 2 to 6)
      TxTable.commitAppend(spark, root, Seq((i.toLong, "x")).toDF("k", "v"))
    val full = TxTable.history(spark, root).orderBy("version")
      .collect().map(_.toString).toSeq
    val capped = TxTable.history(spark, root, limit = 3).orderBy("version")
      .collect().map(_.toString).toSeq
    assert(capped === full.takeRight(3),
      "limit must return exactly the newest-N rows the full audit ends with")
    assert(TxTable.history(spark, root, limit = 100).count() === 6,
      "a limit past the log start returns every retained commit")
    intercept[IllegalArgumentException](TxTable.history(spark, root, limit = 0))
  }

  test("commitDelta: a non-retryable commit failure surfaces immediately, " +
    "never through the CAS-miss backoff") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq((1L, "a")).toDF("k", "s"))
    val ss = spark.newSession()
    ss.conf.set(graft.engine.PublishArbiter.ConfKey, "no_such_arbiter")
    val t0 = System.nanoTime()
    val e = intercept[IllegalArgumentException](
      TxTable.commitDelta(ss, root, Seq((2L, "b")).toDF("k", "s"),
        spark.emptyDataset[Long].toDF("k"), Seq("k")))
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(e.getMessage.contains("unregistered arbiter"),
      "the genuine failure must surface with its own message")
    // the old catch-all retry burned >= 2.75 s of sleeps before surfacing
    assert(elapsedMs < 2500,
      f"must fail fast, not retry through backoff (took $elapsedMs%.0f ms)")
  }

  test("commitAppendAudited: failed audit unwinds the staged segment entirely") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq((1L, 10.0)).toDF("k", "v"))
    def dataDirs() = {
      val d = new java.io.File(s"$root/data")
      if (d.exists()) d.listFiles().count(_.isDirectory) else 0
    }
    val before = dataDirs()
    val ex = intercept[IllegalArgumentException] {
      TxTable.commitAppendAudited(spark, root,
          Seq((2L, -5.0)).toDF("k", "v")) { staged =>
        require(staged.filter($"v" < 0).isEmpty, "negative v staged")
      }
    }
    assert(ex.getMessage.contains("negative v staged"))
    assert(TxTable.latestVersion(spark, root).contains(1L),
      "a failed audit publishes nothing")
    assert(dataDirs() === before,
      "the staged segment must be deleted, not left as an orphan")
    // the audit sees the STAGED files, not the input plan
    var seen = -1L
    TxTable.commitAppendAudited(spark, root,
        Seq((3L, 7.0)).toDF("k", "v")) { staged => seen = staged.count() }
    assert(seen === 1L && TxTable.read(spark, root).count() === 2)
  }

  test("compactTx merges segments as a commit; prior snapshots undisturbed") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, (1L to 10L).toDF("k"))
    (1 to 3).foreach(i => TxTable.commitAppend(spark, root, Seq(100L + i).toDF("k")))
    val before = TxTable.read(spark, root).as[Long].collect().sorted.toSeq
    val vc = TxTable.compactTx(spark, root)
    assert(vc === 5L)
    assert(TxTable.read(spark, root).as[Long].collect().sorted.toSeq === before,
      "compaction must be a pure re-layout")
    // the pre-compaction head still resolves to the same rows
    assert(TxTable.readVersion(spark, root, 4L).as[Long].collect().sorted.toSeq === before)
    // and the compacted snapshot is ONE segment directory
    val dataDirs = new java.io.File(root + "/data").listFiles.count(_.isDirectory)
    assert(dataDirs === 5, "4 commit segments + 1 compacted segment until vacuum")
  }

  test("vacuum drops unreferenced segments and old manifests, keeps the head readable") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, (1L to 5L).toDF("k"))
    TxTable.commitAppend(spark, root, Seq(6L).toDF("k"))
    TxTable.compactTx(spark, root)
    TxTable.vacuum(spark, root, keepVersions = 1)
    assert(TxTable.read(spark, root).count() === 6)
    val dataDirs = new java.io.File(root + "/data").listFiles.count(_.isDirectory)
    assert(dataDirs === 1, "only the compacted segment survives the vacuum")
    intercept[Exception](TxTable.readVersion(spark, root, 1L).count())
  }

  test("additive schema evolution: old segments surface NULL for new columns") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq((1L, "a")).toDF("k", "v"))
    TxTable.commitAppend(spark, root, Seq((2L, "b", 9.5)).toDF("k", "v", "score"))
    val rows = TxTable.read(spark, root).orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val scoreIdx = TxTable.read(spark, root).schema.fieldIndex("score")
    assert(rows(0).isNullAt(scoreIdx) && rows(1).getDouble(scoreIdx) === 9.5)
  }

  test("commitMerge rewrites only hit segments; untouched segments carry over") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root,
      Seq((1L, 10.0, 100L), (2L, 20.0, 200L)).toDF("k", "price", "owner"))
    TxTable.commitAppend(spark, root,
      Seq((3L, 30.0, 300L), (4L, 40.0, 400L)).toDF("k", "price", "owner"))
    // hits only segment 2 (key 3) + one pure insert (key 5)
    val incoming = Seq((3L, 33.0, -1L), (5L, 50.0, 500L)).toDF("k", "price", "owner")
    TxTable.commitMerge(spark, root, incoming, Seq("k"), Seq("price"), Seq("owner"))
    val got = TxTable.read(spark, root).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 10.0, 100L), (2L, 20.0, 200L), (3L, 33.0, 300L),
      (4L, 40.0, 400L), (5L, 50.0, 500L)),
      "price updates (EXCLUDED wins), owner preserved (existing wins), insert lands")
    // segment 1 carried over by reference: 3 data dirs (seg1, dead seg2, merged)
    assert(new java.io.File(root + "/data").listFiles.count(_.isDirectory) === 3)
    TxTable.vacuum(spark, root, keepVersions = 1)
    assert(new java.io.File(root + "/data").listFiles.count(_.isDirectory) === 2,
      "after vacuum exactly the untouched segment and the merged segment live")
    assert(TxTable.read(spark, root).count() === 5)
  }

  test("commitDelete removes tombstoned keys from hit segments only; no-op on misses") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    TxTable.commitAppend(spark, root, Seq((3L, "c"), (4L, "d")).toDF("k", "v"))
    val v = TxTable.commitDelete(spark, root, Seq(Tuple1(3L)).toDF("k"), Seq("k"))
    assert(v === 3L)
    assert(TxTable.read(spark, root).orderBy("k").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L, 4L))
    // segment 1 (keys 1,2) carried by reference; time travel still sees key 3
    assert(TxTable.readVersion(spark, root, 2L).count() === 4)
    // a miss is a pure no-op: same head version, no new commit
    assert(TxTable.commitDelete(spark, root, Seq(Tuple1(99L)).toDF("k"), Seq("k")) === 3L)
    assert(TxTable.latestVersion(spark, root) === Some(3L))
    // deleting every remaining row is refused (no readable empty head)
    intercept[IllegalArgumentException](TxTable.commitDelete(spark, root,
      Seq(1L, 2L, 4L).map(Tuple1(_)).toDF("k"), Seq("k")))
  }

  test("streamingAppend commits each batch id exactly once across replays") {
    val root = newRoot()
    val sink = TxTable.streamingAppend(root) _
    sink(Seq(1L).toDF("k"), 0L)
    sink(Seq(1L).toDF("k"), 0L) // at-least-once replay of batch 0
    sink(Seq(2L).toDF("k"), 1L)
    sink(Seq(2L).toDF("k"), 0L) // stale replay after batch 1 landed
    assert(TxTable.read(spark, root).as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(TxTable.lastCommittedBatch(spark, root) === Some(1L))
    assert(TxTable.latestVersion(spark, root) === Some(2L),
      "replayed batches must not even burn a version number")
  }

  test("commit loses the version race cleanly and retries onto the next slot") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq(1L).toDF("k"))
    // a racing committer lands v2 between our head read and our rename:
    // simulate by pre-creating the v2 manifest the competitor would write
    val log = new java.io.File(root + "/_txlog")
    val v1 = new String(java.nio.file.Files.readAllBytes(
      log.listFiles.filter(_.getName == "v0000000001.json").head.toPath))
    java.nio.file.Files.write(new java.io.File(log, "v0000000002.json").toPath,
      v1.replace("\"version\":1", "\"version\":2").getBytes)
    val v = TxTable.commitAppend(spark, root, Seq(2L).toDF("k"))
    assert(v === 3L, "loser of the v2 race must land on v3, not clobber v2")
    assert(TxTable.read(spark, root).count() === 2)
  }

  test("claim CAS: two concurrent local committers both land on distinct versions") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq(0L).toDF("k"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val gate = new java.util.concurrent.CountDownLatch(1)
    def committer(v: Long) = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { gate.await(); TxTable.commitAppend(spark, root, Seq(v).toDF("k")) }
    })
    val (fa, fb) = (committer(1L), committer(2L))
    gate.countDown()
    val (va, vb) = (fa.get(), fb.get())
    pool.shutdown()
    assert(Set(va, vb) === Set(2L, 3L),
      "the create-exclusive claim must serialize the racers: one v2, one v3")
    assert(TxTable.read(spark, root).as[Long].collect().sorted.toSeq === Seq(0L, 1L, 2L),
      "no lost rows — the claim loser must retry onto the next slot, not clobber")
  }

  test("batch id survives compact + vacuum: replay after maintenance is a no-op") {
    val root = newRoot()
    val sink = TxTable.streamingAppend(root) _
    sink(Seq(1L).toDF("k"), 0L)
    sink(Seq(2L).toDF("k"), 1L)
    TxTable.compactTx(spark, root)
    TxTable.vacuum(spark, root, keepVersions = 1)
    assert(TxTable.lastCommittedBatch(spark, root) === Some(1L),
      "compact + vacuum must carry the replay horizon forward")
    sink(Seq(2L).toDF("k"), 1L) // crash-replay of batch 1 after maintenance
    assert(TxTable.read(spark, root).as[Long].collect().sorted.toSeq === Seq(1L, 2L),
      "the replayed batch must not append twice")
    TxTable.commitOverwrite(spark, root, Seq(5L, 6L).toDF("k"))
    assert(TxTable.lastCommittedBatch(spark, root) === Some(1L),
      "overwrite must carry the batch id too — the horizon is table-lifetime max")
  }

  test("a table root containing a /data/ path component does not confuse merge/delete") {
    val root = java.nio.file.Files.createTempDirectory("txtable_spec").toString + "/data/tbl"
    TxTable.commitOverwrite(spark, root,
      Seq((1L, 1.0, 10L), (2L, 2.0, 20L)).toDF("k", "p", "o"))
    TxTable.commitAppend(spark, root, Seq((3L, 3.0, 30L)).toDF("k", "p", "o"))
    TxTable.commitMerge(spark, root, Seq((1L, 9.0, -1L)).toDF("k", "p", "o"),
      Seq("k"), Seq("p"), Seq("o"))
    val got = TxTable.read(spark, root).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 9.0, 10L), (2L, 2.0, 20L), (3L, 3.0, 30L)),
      "end-anchored __seg: no duplicated rows when the root path contains /data/")
    TxTable.commitDelete(spark, root, Seq(Tuple1(3L)).toDF("k"), Seq("k"))
    assert(TxTable.read(spark, root).count() === 2)
  }

  test("string stats flow through streamingAppend; readWhereString prunes segments") {
    val root = newRoot()
    val sink = TxTable.streamingAppend(root, statsCols = Seq("s")) _
    sink(Seq(("aa", 1L), ("am", 2L)).toDF("s", "k"), 0L)
    sink(Seq(("ba", 3L), ("bm", 4L)).toDF("s", "k"), 1L)
    sink(Seq(("ca", 5L), ("cm", 6L)).toDF("s", "k"), 2L)
    def segsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.inputFiles.map(f => f.replaceAll("/[^/]*$", "")).toSet
    val mid = TxTable.readWhereString(spark, root, "s", "b", "bz")
    assert(segsOf(mid).size === 1,
      "two of three stream-built segments must be pruned from the manifest")
    assert(mid.orderBy("k").collect().map(_.getString(0)).toSeq === Seq("ba", "bm"))
    // a non-ASCII bound is not recorded (no JSON escaper): conservative keep
    sink(Seq(("dé", 7L)).toDF("s", "k"), 3L)
    assert(TxTable.readWhereString(spark, root, "s", "a", "e").count() === 7,
      "segment with unrepresentable bounds must still be scanned, result exact")
  }

  test("readWhere prunes segments by manifest stats, stays exact, survives rewrites") {
    def bd(i: Int) = new java.math.BigDecimal(i)
    def segsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.inputFiles.map(f => f.replaceAll("/[^/]*$", "")).toSet
    val root = newRoot()
    def slice(a: Long, b: Long) = (a to b).map(i => (i, i * 10)).toDF("k", "v")
    TxTable.commitOverwrite(spark, root, slice(1, 100), statsCols = Seq("k"))
    TxTable.commitAppend(spark, root, slice(101, 200), statsCols = Seq("k"))
    TxTable.commitAppend(spark, root, slice(201, 300), statsCols = Seq("k"))
    assert(segsOf(TxTable.read(spark, root)).size === 3)

    // mid-range query: ONE segment scanned, result exact
    val mid = TxTable.readWhere(spark, root, "k", bd(150), bd(160))
    assert(segsOf(mid).size === 1, "stats must prune the two non-overlapping segments")
    assert(mid.collect().map(_.getLong(0)).sorted.toSeq === (150L to 160L))

    // untracked column: conservatively reads everything, still correct
    val untracked = TxTable.readWhere(spark, root, "v", bd(1500), bd(1600))
    assert(segsOf(untracked).size === 3, "no stats for v — nothing may be pruned")
    assert(untracked.count() === 11)

    // provably-empty range: zero rows without scanning data
    assert(TxTable.readWhere(spark, root, "k", bd(1000), bd(2000)).count() === 0)

    // a delete rewrites the middle segment; carried stats must keep pruning
    TxTable.commitDelete(spark, root, Seq(155L).toDF("k"), Seq("k"))
    val lowAfter = TxTable.readWhere(spark, root, "k", bd(1), bd(50))
    assert(segsOf(lowAfter).size === 1, "carried stats must survive the delete rewrite")
    assert(lowAfter.count() === 50)
    assert(TxTable.readWhere(spark, root, "k", bd(150), bd(160)).count() === 10,
      "rewritten segment re-measured: deleted key gone, neighbors intact")
  }

  test("bloom skipping: point lookups prune segments min/max cannot, survive rewrites") {
    val root = newRoot()
    def seg(lo: Long, hi: Long) = (lo to hi).toDF("k")
      .withColumn("h", md5(col("k").cast("string")))
    // random md5 keys: every segment's [min,max] on h spans the hex space
    TxTable.commitAppend(spark, root, seg(1, 200), bloomCols = Seq("h"))
    TxTable.commitAppend(spark, root, seg(201, 400), bloomCols = Seq("h"))
    TxTable.commitAppend(spark, root, seg(401, 600), bloomCols = Seq("h"))
    val probe = seg(350, 350).select("h").collect().head.getString(0)
    def segsOf(df: org.apache.spark.sql.DataFrame): Int =
      df.inputFiles.map(_.replaceAll("/[^/]*$", "")).toSet.size
    val hit = TxTable.readWhereEquals(spark, root, "h", probe)
    assert(hit.count() === 1 && hit.select("k").head.getLong(0) === 350L)
    assert(segsOf(hit) < 3, "bloom must prune at least one non-owning segment")
    // absent key: typically zero segments (provably absent modulo fpp)
    val miss = TxTable.readWhereEquals(spark, root, "h", "not-a-digest")
    assert(miss.count() === 0)
    assert(segsOf(miss) < 3, "an absent key must not scan every segment")
    // a delete rewrites the middle segment; carryStats must rebuild its bloom
    TxTable.commitDelete(spark, root, Seq(300L).toDF("k"), Seq("k"))
    val after = TxTable.readWhereEquals(spark, root, "h", probe)
    assert(after.count() === 1 && segsOf(after) < 3,
      "bloom skipping must survive the merge/delete rewrite")
    // long-typed column blooms dispatch on the value type
    val root2 = newRoot()
    TxTable.commitAppend(spark, root2, (1L to 100L).toDF("k"), bloomCols = Seq("k"))
    TxTable.commitAppend(spark, root2, (101L to 200L).toDF("k"), bloomCols = Seq("k"))
    val one = TxTable.readWhereEquals(spark, root2, "k", 150L)
    assert(one.count() === 1 && segsOf(one) === 1)
  }

  test("change data feed: replaying the feed reconstructs the head snapshot") {
    val root = newRoot()
    // v1 bootstrap merge, v2 update+insert merge, v3 append, v4 delete
    TxTable.commitMerge(spark, root, Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("k", "x", "tag"),
      Seq("k"), Seq("x"), Seq("tag"), cdf = true)
    TxTable.commitMerge(spark, root, Seq((2L, 99.0, "IGNORED"), (3L, 30.0, "c")).toDF("k", "x", "tag"),
      Seq("k"), Seq("x"), Seq("tag"), cdf = true)
    TxTable.commitAppend(spark, root, Seq((4L, 40.0, "d")).toDF("k", "x", "tag"))
    val head = TxTable.commitDelete(spark, root, Seq(1L).toDF("k"), Seq("k"), cdf = true)

    val ch = TxTable.readChanges(spark, root, 0L, head)
    // fold the feed key-wise: last insert/update_postimage wins, delete kills
    val lastState = ch.filter(col("_change_type").isin("insert", "update_postimage", "delete"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")
          .orderBy(col("_commit_version").desc)))
      .filter(col("__rn") === 1 && col("_change_type") =!= "delete")
      .select("k", "x", "tag")
    val replayed = lastState.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sortBy(_._1).toSeq
    val actual = TxTable.read(spark, root).select("k", "x", "tag")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sortBy(_._1).toSeq
    assert(replayed === actual, "feed fold must equal the head snapshot")
    assert(actual === Seq((2L, 99.0, "b"), (3L, 30.0, "c"), (4L, 40.0, "d")),
      "EXCLUDED-wins x, preserved tag, appended row present, deleted key gone")

    // the update recorded both images with the right values
    val images = ch.filter(col("k") === 2L && col("_commit_version") === 2L)
      .select("_change_type", "x").collect().map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
    assert(images === Seq(("update_postimage", 99.0), ("update_preimage", 20.0)))

    // a version window selects only that window's changes
    val w = TxTable.readChanges(spark, root, head - 1, head)
    assert(w.select("_change_type").collect().map(_.getString(0)).toSeq === Seq("delete"))
  }

  test("ivm: keys that zero out leave the view; updates move only their key") {
    val root = newRoot()
    val view = newRoot()
    import graft.engine.Ivm
    val v1 = TxTable.commitMerge(spark, root,
      Seq((1L, 10.0, "u1"), (2L, 5.0, "u1"), (3L, 7.0, "u2")).toDF("id", "x", "u"),
      Seq("id"), Seq("x"), Seq("u"), cdf = true)
    Ivm.refreshSumCount(spark, root, view, 0L, v1, "u", "x")
    def viewRows() = TxTable.read(spark, view)
      .select(col("u"), col("n"), col("sum").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(viewRows() === Seq(("u1", 2L, 15.0), ("u2", 1L, 7.0)))
    val v2 = TxTable.commitDelete(spark, root, Seq(1L, 2L).toDF("id"), Seq("id"), cdf = true)
    Ivm.refreshSumCount(spark, root, view, v1, v2, "u", "x")
    assert(viewRows() === Seq(("u2", 1L, 7.0)), "u1 zeroed out and must leave the view")
    val v3 = TxTable.commitMerge(spark, root, Seq((3L, 9.0, "IGNORED")).toDF("id", "x", "u"),
      Seq("id"), Seq("x"), Seq("u"), cdf = true)
    Ivm.refreshSumCount(spark, root, view, v2, v3, "u", "x")
    assert(viewRows() === Seq(("u2", 1L, 9.0)), "the update must move u2's sum only")
  }

  test("deletion vectors: no rewrite, re-insert visible, compact materializes") {
    val root = newRoot()
    def dataSegs() = new java.io.File(root + "/data").listFiles.count(_.isDirectory)
    TxTable.commitAppend(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    TxTable.commitAppend(spark, root, Seq((3L, "c"), (4L, "d")).toDF("k", "v"))
    val before = dataSegs()
    val v = TxTable.commitDeleteVectors(spark, root, Seq(2L, 3L).toDF("k"), Seq("k"))
    assert(dataSegs() === before, "a DV delete must not touch data segments")
    def rows() = TxTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(rows() === Seq((1L, "a"), (4L, "d")))
    assert(TxTable.readVersion(spark, root, v - 1)
      .count() === 4, "time travel to the pre-DV snapshot sees every row")
    // a re-inserted tombstoned key lands in a segment the DV does not
    // scope: it must be visible
    TxTable.commitAppend(spark, root, Seq((2L, "b2")).toDF("k", "v"))
    assert(rows() === Seq((1L, "a"), (2L, "b2"), (4L, "d")))
    // stacked second DV
    TxTable.commitDeleteVectors(spark, root, Seq(4L).toDF("k"), Seq("k"))
    assert(rows() === Seq((1L, "a"), (2L, "b2")))
    // compaction reads through the DVs and publishes a DV-free manifest;
    // vacuum then collects the sidecars
    TxTable.compactTx(spark, root)
    assert(rows() === Seq((1L, "a"), (2L, "b2")))
    TxTable.vacuum(spark, root, keepVersions = 1)
    assert(!new java.io.File(root + "/dv").exists() ||
      new java.io.File(root + "/dv").listFiles.isEmpty,
      "materialized DV sidecars must age out with their manifests")
    assert(rows() === Seq((1L, "a"), (2L, "b2")))
  }

  test("deletion vectors: merge carries scoping; cdf records deleted rows") {
    val root = newRoot()
    TxTable.commitMerge(spark, root, Seq((1L, 1.0), (2L, 2.0)).toDF("k", "x"),
      Seq("k"), Seq("x"), Nil)
    TxTable.commitAppend(spark, root, Seq((3L, 3.0), (4L, 4.0)).toDF("k", "x"))
    val v = TxTable.commitDeleteVectors(spark, root, Seq(2L, 4L).toDF("k"),
      Seq("k"), cdf = true)
    val ch = TxTable.readChanges(spark, root, v - 1, v)
    assert(ch.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("delete"))
    assert(ch.select("k").collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 4L))
    // a merge touching only key 3's segment rewrites that segment; the
    // DV must keep suppressing key 2 in the carried segment and key 4's
    // suppression must survive the rewrite (its segment was rewritten
    // DV-filtered, so the row is simply gone)
    TxTable.commitMerge(spark, root, Seq((3L, 30.0)).toDF("k", "x"),
      Seq("k"), Seq("x"), Nil)
    assert(TxTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      === Seq((1L, 1.0), (3L, 30.0)))
  }

  test("join-view ivm: dim updates move contributions between groups; replay no-ops") {
    val fact = newRoot(); val dim = newRoot(); val view = newRoot()
    import graft.engine.Ivm
    def refresh(ff: Long, ft: Long, df0: Long, dt: Long): Long =
      Ivm.refreshJoinSumCount(spark, fact, dim, view, ff, ft, df0, dt,
        "k", "k", "g", "x")
    def viewRows() = TxTable.read(spark, view)
      .select(col("g"), col("n"), col("sum").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val f1 = TxTable.commitMerge(spark, fact,
      Seq((1L, 10.0, 100L), (2L, 5.0, 100L), (3L, 7.0, 200L), (4L, 2.0, 999L))
        .toDF("id", "x", "k"),
      Seq("id"), Seq("x"), Seq("k"), cdf = true)
    val d1 = TxTable.commitMerge(spark, dim,
      Seq((100L, "a"), (200L, "b")).toDF("k", "g"),
      Seq("k"), Seq("g"), Nil, cdf = true)
    refresh(0L, f1, 0L, d1)
    // key 999 has no dim match: the inner-join view must not see it
    assert(viewRows() === Seq(("a", 2L, 15.0), ("b", 1L, 7.0)))
    // dim update moves key 200 from group b to group a: fact row 3's
    // contribution must migrate with NO fact change in the window
    val d2 = TxTable.commitMerge(spark, dim, Seq((200L, "a")).toDF("k", "g"),
      Seq("k"), Seq("g"), Nil, cdf = true)
    refresh(f1, f1, d1, d2)
    assert(viewRows() === Seq(("a", 3L, 22.0)), "group b zeroed out and left")
    // replaying an applied window is a no-op (exactly-once horizon)
    val head = refresh(f1, f1, d1, d2)
    assert(refresh(f1, f1, d1, d2) === head)
    assert(viewRows() === Seq(("a", 3L, 22.0)))
    // dim delete retracts every joined fact row of that key
    val d3 = TxTable.commitDelete(spark, dim, Seq(100L).toDF("k"), Seq("k"), cdf = true)
    refresh(f1, f1, d2, d3)
    assert(viewRows() === Seq(("a", 1L, 7.0)), "only key 200's row survives")
  }

  test("change data feed: un-recorded commits refuse, vacuum ages cdc out") {
    val root = newRoot()
    TxTable.commitMerge(spark, root, Seq((1L, 1.0)).toDF("k", "x"),
      Seq("k"), Seq("x"), Nil, cdf = true)
    TxTable.commitMerge(spark, root, Seq((1L, 2.0)).toDF("k", "x"),
      Seq("k"), Seq("x"), Nil) // cdf NOT requested
    val e = intercept[IllegalArgumentException](
      TxTable.readChanges(spark, root, 0L, 2L).count())
    assert(e.getMessage.contains("no change data"))

    val head = TxTable.commitMerge(spark, root, Seq((1L, 3.0)).toDF("k", "x"),
      Seq("k"), Seq("x"), Nil, cdf = true)
    // the INSERT-ONLY bootstrap records its data segment as the change set
    // (an `insert:` manifest reference) — no duplicate cdc copy on disk;
    // only the v3 update merge wrote a real cdc segment
    assert(new java.io.File(root + "/cdc").listFiles.count(_.isDirectory) === 1)
    assert(TxTable.readChanges(spark, root, 0L, 1L)
      .select("_change_type").collect().map(_.getString(0)).toSeq === Seq("insert"),
      "the referenced bootstrap change set must read back as inserts")
    TxTable.vacuum(spark, root, keepVersions = 1)
    assert(new java.io.File(root + "/cdc").listFiles.count(_.isDirectory) === 1,
      "vacuum must drop cdc segments of dropped manifests and keep the head's")
    assert(TxTable.readChanges(spark, root, head - 1, head).count() === 2,
      "head commit's change set (pre+post image) must survive its vacuum")
  }

  test("restore re-publishes an old snapshot as a forward commit, zero-copy") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    TxTable.commitMerge(spark, root, Seq((2L, "B2"), (3L, "c")).toDF("k", "v"),
      Seq("k"), Seq("v"), Nil)
    TxTable.commitDelete(spark, root, Seq(1L).toDF("k"), Seq("k"))
    def dataSegs() = new java.io.File(root + "/data").listFiles.count(_.isDirectory)
    val before = dataSegs()
    val v = TxTable.restore(spark, root, 1L)
    assert(v === 4L, "restore must be a forward commit, not history rewriting")
    assert(dataSegs() === before, "restore must not write any data segment")
    assert(TxTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      === Seq((1L, "a"), (2L, "b")), "head must equal the restored snapshot")
    // the undone versions stay time-travelable until vacuum
    assert(TxTable.readVersion(spark, root, 3L).count() === 2)
    // the change feed reports the restore like an overwrite
    val ch = TxTable.readChanges(spark, root, 3L, 4L)
    assert(ch.select("_change_type").distinct().collect()
      .map(_.getString(0)).sorted.toSeq === Seq("delete", "insert"))
    // history continues normally on top of a restore
    TxTable.commitAppend(spark, root, Seq((9L, "z")).toDF("k", "v"))
    assert(TxTable.read(spark, root).count() === 3)
    // a vacuumed version refuses to restore (no dangling segment refs)
    TxTable.vacuum(spark, root, keepVersions = 1)
    intercept[Exception](TxTable.restore(spark, root, 2L))
  }

  test("readWhereEquals applies deletion vectors: tombstoned key is invisible") {
    val root = newRoot()
    TxTable.commitAppend(spark, root, (1L to 100L).toDF("k"), bloomCols = Seq("k"))
    TxTable.commitAppend(spark, root, (101L to 200L).toDF("k"), bloomCols = Seq("k"))
    TxTable.commitDeleteVectors(spark, root, Seq(50L, 150L).toDF("k"), Seq("k"))
    assert(TxTable.readWhereEquals(spark, root, "k", 50L).count() === 0,
      "a Bloom HIT on a DV-tombstoned key must still return nothing — " +
        "readWhereEquals is contractually identical to read().filter(k === v)")
    assert(TxTable.readWhereEquals(spark, root, "k", 51L).count() === 1)
    // a re-insert of a tombstoned key lands outside the DV's segment scope
    TxTable.commitAppend(spark, root, Seq(50L).toDF("k"), bloomCols = Seq("k"))
    assert(TxTable.readWhereEquals(spark, root, "k", 50L).count() === 1,
      "DV scoping: the re-inserted row's segment predates no DV")
  }

  test("compactZOrder carries the full tracked stat set: blooms survive OPTIMIZE") {
    val root = newRoot()
    def seg(lo: Long, hi: Long) = (lo to hi).toDF("k")
      .withColumn("a", (col("k") % 7).cast("long"))
      .withColumn("b", (col("k") % 11).cast("long"))
      .withColumn("h", md5(col("k").cast("string")))
    TxTable.commitAppend(spark, root, seg(1, 300),
      statsCols = Seq("k"), bloomCols = Seq("h"))
    TxTable.commitAppend(spark, root, seg(301, 600),
      statsCols = Seq("k"), bloomCols = Seq("h"))
    TxTable.compactZOrder(spark, root, "a", "b", numSegments = 4)
    val log = new java.io.File(root + "/_txlog")
    val headManifest = new String(java.nio.file.Files.readAllBytes(
      log.listFiles.filter(_.getName.endsWith(".json"))
        .maxBy(_.getName).toPath))
    assert(headManifest.contains("h#bloom"),
      "the compacted manifest must still record the head's tracked Blooms")
    // and the point lookup still PRUNES via the rebuilt per-segment blooms
    // (pre-fix: stats only on (a, b) — no blooms — so every segment scanned)
    val probe = seg(42, 42).select("h").collect().head.getString(0)
    val hit = TxTable.readWhereEquals(spark, root, "h", probe)
    assert(hit.count() === 1)
    assert(hit.inputFiles.map(_.replaceAll("/[^/]*$", "")).toSet.size < 4,
      "Bloom point-lookup pruning must survive OPTIMIZE ZORDER")
  }

  test("commitOverwriteClustered: one-pass clustered CTAS prunes like OPTIMIZE") {
    val root = newRoot()
    val df = (1L to 400L).toDF("k")
      .withColumn("a", (col("k") % 19).cast("long"))
      .withColumn("b", (col("k") / 20).cast("long"))
    val v = TxTable.commitOverwriteClustered(spark, root, df, Seq("a", "b"),
      numSegments = 8, statsCols = Seq("k"))
    assert(v === 1L)
    // contents identical to a plain overwrite
    assert(TxTable.read(spark, root).select("k").as[Long].collect().sorted
      === (1L to 400L).toArray)
    // a narrow predicate on EITHER clustering dimension prunes segments
    // on the VERY FIRST version — no OPTIMIZE pass ever ran
    def scanned(c: String, lo: Long, hi: Long) =
      TxTable.readWhere(spark, root, c,
        new java.math.BigDecimal(lo), new java.math.BigDecimal(hi))
        .inputFiles.map(_.replaceAll("/[^/]*$", "")).toSet.size
    val total = TxTable.read(spark, root)
      .inputFiles.map(_.replaceAll("/[^/]*$", "")).toSet.size
    assert(total > 1, "clustered CTAS must produce multiple segments")
    assert(scanned("a", 2, 3) < total, "dimension a must prune")
    assert(scanned("b", 2, 3) < total, "dimension b must prune")
    // extra statsCols tracked too, and overwrite semantics hold: a second
    // clustered CTAS replaces the table as version 2
    assert(scanned("k", 1, 40) < total, "statsCols k must prune")
    val v2 = TxTable.commitOverwriteClustered(spark, root,
      df.filter(col("k") <= 100), Seq("a", "b"), numSegments = 4)
    assert(v2 === 2L && TxTable.read(spark, root).count() === 100)
    assert(TxTable.readVersion(spark, root, 1L).count() === 400,
      "snapshot isolation across clustered overwrites")
  }

  test("an orphaned claim above head is honored while fresh, reaped once stale") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq(1L).toDF("k"))
    // a committer died between claiming v2 and renaming its manifest in
    val orphan = new java.io.File(root + "/_txlog/v0000000002.claim")
    java.nio.file.Files.createFile(orphan.toPath)
    spark.conf.set("spark.graft.tx.staleClaimMs", "3600000")
    try {
      // fresh claim + single-attempt CAS path: fails cleanly, no clobber
      intercept[Exception](TxTable.compactTx(spark, root))
      assert(orphan.exists(), "a fresh claim must not be reaped")
      // stale claim: the retrying append reaps it and lands on the slot
      spark.conf.set("spark.graft.tx.staleClaimMs", "1")
      Thread.sleep(50)
      val v = TxTable.commitAppend(spark, root, Seq(2L).toDF("k"))
      assert(v === 2L, "the reaped slot must be claimable again")
      assert(TxTable.read(spark, root).as[Long].collect().sorted.toSeq === Seq(1L, 2L))
      // vacuum reaps stale orphans above head too
      val orphan9 = new java.io.File(root + "/_txlog/v0000000009.claim")
      java.nio.file.Files.createFile(orphan9.toPath)
      Thread.sleep(50)
      TxTable.vacuum(spark, root)
      assert(!orphan9.exists(), "vacuum must reap stale claims above head")
    } finally spark.conf.unset("spark.graft.tx.staleClaimMs")
  }

  test("late publish after a reap cannot overwrite the winner's manifest") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq(1L).toDF("k"))
    // the stalled committer: claimed v2, fully wrote its manifest to a temp
    // file, then paused past the stale horizon (GC stall / network hang)
    val logDir = new java.io.File(root + "/_txlog")
    java.nio.file.Files.createFile(new java.io.File(logDir, "v0000000002.claim").toPath)
    val stalledTmp = new java.io.File(logDir, ".tmp-stalled-committer")
    java.nio.file.Files.writeString(stalledTmp.toPath, """{"stalled":"manifest"}""")
    spark.conf.set("spark.graft.tx.staleClaimMs", "1")
    try {
      Thread.sleep(50)
      // a new committer reaps the stale claim and wins slot v2
      assert(TxTable.commitAppend(spark, root, Seq(2L).toDF("k")) === 2L)
      val target = new java.io.File(logDir, "v0000000002.json")
      val winner = java.nio.file.Files.readString(target.toPath)
      // the stalled committer wakes and publishes into the slot it still
      // believes it owns: POSIX rename(2) would silently OVERWRITE the
      // winner (a lost acknowledged commit); the exclusive publish must
      // refuse and leave the winner byte-identical
      val f = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
      val ok = TxTable.publishExclusive(spark, f,
        new org.apache.hadoop.fs.Path(stalledTmp.getAbsolutePath),
        new org.apache.hadoop.fs.Path(target.getAbsolutePath))
      assert(!ok, "the late publisher must lose the slot, not silently win")
      assert(java.nio.file.Files.readString(target.toPath) === winner,
        "the acknowledged winner manifest must survive the late publish")
      // This local-FS guarantee (and HDFS's rename contract) is as far as
      // filesystem APIs go: S3A rename is check-then-copy, NOT atomic —
      // PublishArbiter is the pluggable boundary an S3 deployment fills
      // with an external conditional-put arbiter (PublishArbiterSpec pins
      // the racing-publisher contract against a simulated store).
      assert(TxTable.read(spark, root).as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    } finally spark.conf.unset("spark.graft.tx.staleClaimMs")
  }

  test("vacuum retention boundary: time travel/restore to an aged-out version fails loudly") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq(1L).toDF("k"))      // v1
    TxTable.commitAppend(spark, root, Seq(2L).toDF("k"))         // v2
    TxTable.commitAppend(spark, root, Seq(3L).toDF("k"))         // v3
    TxTable.commitAppend(spark, root, Seq(4L).toDF("k"))         // v4
    TxTable.vacuum(spark, root, keepVersions = 2)                // keeps v3, v4
    // retained versions still travel
    assert(TxTable.readVersion(spark, root, 3).count() === 3)
    // aged-out version: loud, named — not an opaque FileNotFound, never a
    // half-table resurrected from whatever segments happen to survive
    val e1 = intercept[IllegalStateException](
      TxTable.readVersion(spark, root, 1).count())
    assert(e1.getMessage.contains("v1") && e1.getMessage.contains("retained"),
      s"boundary error must name the version and the horizon: ${e1.getMessage}")
    val head = TxTable.latestVersion(spark, root).get
    val e2 = intercept[IllegalStateException](TxTable.restore(spark, root, 2))
    assert(e2.getMessage.contains("v2"), s"restore must name it too: ${e2.getMessage}")
    assert(TxTable.latestVersion(spark, root).get === head,
      "a refused restore must not burn a version slot")
    // CDF across the vacuumed range fails the same named way
    val e3 = intercept[IllegalStateException](
      TxTable.readChanges(spark, root, 0, 2).count())
    assert(e3.getMessage.contains("retention"), e3.getMessage)
    // restore to a RETAINED version still works after vacuum
    val rv = TxTable.restore(spark, root, 3)
    assert(rv === head + 1)
    assert(TxTable.read(spark, root).as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("8 concurrent writers, mixed append/merge/DV-delete/compact: linearizable, no lost commits") {
    // full protocol mix under real thread contention: each thread owns its
    // key space, so the final snapshot is deterministic under ANY
    // interleaving — what a 100-node cluster needs from the commit
    // protocol.  t%4==0: appends + a compaction (materializes outstanding
    // DVs mid-run); t%4==1: appends + an insert-only MERGE; t%4==2:
    // append, then DV-DELETE of that key; t%4==3: pure appends.
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq((0L, 0L)).toDF("t", "k"))
    val nThreads = 8; val perThread = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    val gate = new java.util.concurrent.CountDownLatch(1)
    def retrying(op: () => Long): Long = {
      var out = -1L; var tries = 0
      while (out < 0) {
        // caller-level retry on the optimistic-CAS losses a real job retries
        // (head-moved / out-of-retries are IllegalArgumentException by design)
        try out = op()
        catch { case _: IllegalArgumentException =>
          tries += 1; assert(tries < 60, "livelock in commit retry"); Thread.sleep(20) }
      }
      out
    }
    val futures = (1 to nThreads).map { t =>
      pool.submit(new java.util.concurrent.Callable[Seq[Long]] {
        def call(): Seq[Long] = {
          gate.await()
          (1 to perThread).map { i =>
            (t % 4, i) match {
              case (0, 2) => retrying(() => TxTable.compactTx(spark, root))
              case (1, 2) => retrying(() => TxTable.commitMerge(spark, root,
                Seq((t.toLong, 102L)).toDF("t", "k"), Seq("t", "k"), Nil, Nil))
              case (2, 2) => retrying(() => TxTable.commitDeleteVectors(spark, root,
                Seq((t.toLong, 1L)).toDF("t", "k"), Seq("t", "k")))
              case _ => retrying(() => TxTable.commitAppend(spark, root,
                Seq((t.toLong, i.toLong)).toDF("t", "k")))
            }
          }
        }
      })
    }
    gate.countDown()
    val versions = futures.flatMap(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    // linearizable: 24 successful commits must own exactly slots v2..v25 —
    // no duplicates (two writers acknowledged for one slot = lost commit),
    // no gaps (a version burned without a surviving manifest)
    assert(versions.distinct.size === versions.size,
      s"two commits acknowledged the same version: ${versions.sorted}")
    assert(versions.sorted === (2L to (1L + versions.size)).toSeq,
      s"version sequence must be contiguous: ${versions.sorted}")
    // deterministic final state: owned inserts minus owned DV-deletes,
    // whatever the interleaving with compactions/merges
    val expected = ((0L, 0L) +: (1 to nThreads).flatMap { t =>
      t % 4 match {
        case 0 => Seq((t.toLong, 1L), (t.toLong, 3L))
        case 1 => Seq((t.toLong, 1L), (t.toLong, 3L), (t.toLong, 102L))
        case 2 => Seq((t.toLong, 3L)) // (t, 1) appended then DV-tombstoned
        case _ => Seq((t.toLong, 1L), (t.toLong, 2L), (t.toLong, 3L))
      }
    }).sorted
    val rows = TxTable.read(spark, root).as[(Long, Long)].collect().sorted.toSeq
    assert(rows === expected,
      "every acknowledged write must be in the final snapshot, every DV-delete honored")
  }

  test("restore carries the target era's deletion vectors: tombstones stay invisible") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, (1L to 6L).map(k => (k, s"v$k")).toDF("k", "v")) // v1
    TxTable.commitDeleteVectors(spark, root, Seq(2L, 4L).toDF("k"), Seq("k"))            // v2: DV
    TxTable.commitAppend(spark, root, Seq((9L, "x")).toDF("k", "v"))                     // v3
    TxTable.restore(spark, root, 2L)                                                     // v4 = v2 again
    val got = TxTable.read(spark, root).select("k").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 3L, 5L, 6L),
      "the restored head must re-apply v2's deletion vectors, not resurrect tombstoned keys")
  }

  test("merge with zero matching keys on a single-segment head still lands exactly") {
    // pins the single-segment fast path: the hit probe is skipped, so the
    // no-hit case rewrites the one segment merged with the incoming batch —
    // rows must be the exact union, the version must advance once, and a
    // second identical merge must overwrite (not duplicate) those keys
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val v2 = TxTable.commitMerge(spark, root, Seq((10L, "x"), (11L, "y")).toDF("k", "v"),
      Seq("k"), Seq("v"), Nil)
    assert(v2 === 2L)
    assert(TxTable.read(spark, root).as[(Long, String)].collect().sorted.toSeq ===
      Seq((1L, "a"), (2L, "b"), (10L, "x"), (11L, "y")))
    TxTable.commitMerge(spark, root, Seq((10L, "x2")).toDF("k", "v"), Seq("k"), Seq("v"), Nil)
    assert(TxTable.read(spark, root).as[(Long, String)].collect().sorted.toSeq ===
      Seq((1L, "a"), (2L, "b"), (10L, "x2"), (11L, "y")))
  }

  test("racing appenders with different compatible schemas both land; reads null-fill") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq((1L, "a")).toDF("k", "v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val gate = new java.util.concurrent.CountDownLatch(1)
    // one appender adds a column, the other omits one — both compatible
    // with the base (additive evolution); the final schema is the union
    // whichever order the claim race resolves in
    val fa = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { gate.await()
        TxTable.commitAppend(spark, root, Seq((2L, "b", 7.5)).toDF("k", "v", "w")) }
    })
    val fb = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { gate.await()
        TxTable.commitAppend(spark, root, Seq(3L).toDF("k")) }
    })
    gate.countDown()
    val (va, vb) = (fa.get(), fb.get()); pool.shutdown()
    assert(Set(va, vb) === Set(2L, 3L))
    val head = TxTable.read(spark, root)
    assert(head.columns.sorted.toSeq === Seq("k", "v", "w"),
      "the surviving schema must be the union of both racers'")
    val rows = head.select("k", "v", "w")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1L, Some("a"), None), (2L, Some("b"), Some(7.5)), (3L, None, None)),
      "missing columns must read NULL, present values must survive verbatim")
  }

  test("ivm refresh is crash-atomic: replay after the delete-half converges") {
    val root = newRoot(); val view = newRoot()
    import graft.engine.Ivm
    val v1 = TxTable.commitMerge(spark, root,
      Seq((1L, 10.0, "u1"), (2L, 5.0, "u1"), (3L, 7.0, "u2")).toDF("id", "x", "u"),
      Seq("id"), Seq("x"), Seq("u"), cdf = true)
    Ivm.refreshSumCount(spark, root, view, 0L, v1, "u", "x")
    val v2 = TxTable.commitDelete(spark, root, Seq(1L, 2L).toDF("id"), Seq("id"), cdf = true)
    // simulate the refresh dying AFTER its delete commit but BEFORE the
    // horizon-latching merge: apply the delete half by hand (u1 zeroes out)
    TxTable.commitDelete(spark, view, Seq("u1").toDF("u"), Seq("u"))
    assert(TxTable.lastCommittedBatch(spark, view) === Some(v1),
      "the applied-through horizon must NOT advance before the final commit")
    // the replayed window must converge to the from-scratch state
    Ivm.refreshSumCount(spark, root, view, v1, v2, "u", "x")
    val got = TxTable.read(spark, view)
      .select(col("u"), col("n"), col("sum").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(got === Seq(("u2", 1L, 7.0)),
      "replay after a half-applied refresh: no stale zeroed rows, no double-apply")
    assert(TxTable.lastCommittedBatch(spark, view) === Some(v2),
      "the horizon latches on the final merge commit")
  }

  test("versionAsOf resolves publish instants monotonically; vacuumed eras fail loudly") {
    val root = newRoot()
    def slice(a: Long, b: Long) = (a to b).map(i => (i, i * 10)).toDF("k", "v")
    def mtime(v: Long) =
      new java.io.File(f"$root%s/_txlog/v$v%010d.json").lastModified
    TxTable.commitOverwrite(spark, root, slice(1, 10))
    val t1 = mtime(1); Thread.sleep(25)
    TxTable.commitAppend(spark, root, slice(11, 20))
    val t2 = mtime(2); Thread.sleep(25)
    TxTable.commitAppend(spark, root, slice(21, 30))
    assert(TxTable.versionAsOf(spark, root, t1) === 1)
    assert(TxTable.versionAsOf(spark, root, t2) === 2)
    assert(TxTable.versionAsOf(spark, root, System.currentTimeMillis() + 1000) === 3)
    assert(TxTable.readAsOf(spark, root, t2).count() === 20,
      "TIMESTAMP AS OF must read the era's snapshot, not the head")
    intercept[IllegalArgumentException](
      TxTable.versionAsOf(spark, root, t1 - 86400000L))
    // vacuum drops v1: its publish instant is no longer resolvable — the
    // error names the retention boundary instead of resolving to v2
    TxTable.vacuum(spark, root, keepVersions = 2)
    val e = intercept[IllegalArgumentException](
      TxTable.versionAsOf(spark, root, t1))
    assert(e.getMessage.contains("earliest retained"),
      s"must name the retention boundary: ${e.getMessage}")
    assert(TxTable.versionAsOf(spark, root, t2) === 2,
      "retained eras keep resolving after vacuum")
  }

  test("stats sidecar: past the inline budget stats shard to a per-commit " +
    "file; pruning/carry/restore load it, vacuum scopes it, thin reads never touch it") {
    val root = newRoot()
    def bd(i: Int) = new java.math.BigDecimal(i)
    def segsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.inputFiles.map(f => f.replaceAll("/[^/]*$", "")).toSet
    def slice(a: Long, b: Long) = (a to b).map(i => (i, i * 10)).toDF("k", "v")
    def manifestText(v: Long) = java.nio.file.Files.readString(
      java.nio.file.Paths.get(f"$root%s/_txlog/v$v%010d.json"))
    def sidecars(): Set[String] = new java.io.File(s"$root/_txlog").listFiles
      .map(_.getName).filter(n => n.startsWith("s-") && n.endsWith(".json")).toSet
    val refRe = "\"statsRef\":\"(s-[^\"]+)\"".r
    spark.conf.set("spark.graft.tx.statsInlineMax", "0")
    try {
      TxTable.commitOverwrite(spark, root, slice(1, 100), statsCols = Seq("k"))
      TxTable.commitAppend(spark, root, slice(101, 200), statsCols = Seq("k"))
      TxTable.commitAppend(spark, root, slice(201, 300), statsCols = Seq("k"))
      assert(manifestText(3).contains("\"statsRef\":\"s-"))
      assert(!manifestText(3).contains("\"stats\":{"),
        "past the budget the manifest must stay thin — no inline stats")
      assert(sidecars().size === 3, "one sidecar per stat-carrying commit")

      // pruning fetches the sidecar; result identical to the inline path
      val mid = TxTable.readWhere(spark, root, "k", bd(150), bd(160))
      assert(segsOf(mid).size === 1, "sidecar stats must prune to one segment")
      assert(mid.count() === 11)

      // a delete rewrite CARRIES sidecar-held stats into its commit
      TxTable.commitDelete(spark, root, Seq(155L).toDF("k"), Seq("k")) // v4
      val low = TxTable.readWhere(spark, root, "k", bd(1), bd(50))
      assert(segsOf(low).size === 1 && low.count() === 50,
        "carried stats must survive a rewrite when the head held them in a sidecar")

      // restore re-publishes an old snapshot's sidecar-held stats
      TxTable.restore(spark, root, 2) // v5 ≡ v2 (rows 1..200)
      assert(segsOf(TxTable.readWhere(spark, root, "k", bd(1), bd(50))).size === 1,
        "restored head must keep pruning")

      // inline ↔ sidecar manifests interoperate within one history
      spark.conf.set("spark.graft.tx.statsInlineMax", "100000")
      TxTable.commitAppend(spark, root, slice(201, 300), statsCols = Seq("k")) // v6
      assert(manifestText(6).contains("\"stats\":{") &&
        !manifestText(6).contains("statsRef"),
        "under the budget stats inline again")
      val hi = TxTable.readWhere(spark, root, "k", bd(250), bd(260))
      assert(segsOf(hi).size === 1 && hi.count() === 11)

      // vacuum: sidecars live exactly as long as a retained manifest
      // references them; orphans (losing racers) reap once stale
      spark.conf.set("spark.graft.tx.staleClaimMs", "-1")
      val orphan = new java.io.File(s"$root/_txlog/s-orphan.json")
      java.nio.file.Files.writeString(orphan.toPath, "{\"stats\":{}}")
      TxTable.vacuum(spark, root, keepVersions = 2) // keeps v5 (sidecar), v6 (inline)
      assert(!orphan.exists, "unreferenced sidecar must reap once stale")
      val liveRefs = Seq(5L, 6L)
        .flatMap(v => refRe.findFirstMatchIn(manifestText(v)).map(_.group(1))).toSet
      assert(liveRefs.size === 1, "v5 (restore) holds the one retained sidecar")
      assert(sidecars() === liveRefs,
        "every sidecar of a vacuumed-out manifest must be gone, referenced ones kept")
      assert(segsOf(TxTable.readWhere(spark, root, "k", bd(250), bd(260))).size === 1,
        "pruning intact after vacuum")

      // damage drill: thin paths (plain read, head probes) never touch the
      // sidecar; stats consumers fail LOUDLY naming the missing file
      spark.conf.set("spark.graft.tx.statsInlineMax", "0")
      TxTable.commitAppend(spark, root, slice(301, 400), statsCols = Seq("k")) // v7
      val ref7 = refRe.findFirstMatchIn(manifestText(7)).get.group(1)
      assert(new java.io.File(s"$root/_txlog/$ref7").delete())
      assert(TxTable.read(spark, root).count() === 400,
        "a snapshot open is a thin read — it must not require the sidecar")
      assert(TxTable.lastCommittedBatch(spark, root) === None)
      val e = intercept[IllegalStateException](
        TxTable.readWhere(spark, root, "k", bd(1), bd(50)).count())
      assert(e.getMessage.contains(ref7),
        s"the damage error must name the missing sidecar: ${e.getMessage}")
    } finally {
      spark.conf.unset("spark.graft.tx.statsInlineMax")
      spark.conf.unset("spark.graft.tx.staleClaimMs")
    }
  }

  test("tags: immutable named refs that pin their snapshot against vacuum") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    TxTable.commitAppend(spark, root, Seq((3L, "c")).toDF("k", "v"))
    TxTable.commitOverwrite(spark, root, Seq((9L, "z")).toDF("k", "v"))

    intercept[Exception](TxTable.tag(spark, root, "ghost", 99L))
    intercept[IllegalArgumentException](TxTable.tag(spark, root, "bad/name", 1L))
    TxTable.tag(spark, root, "v1-cut", 1L)
    val dup = intercept[IllegalArgumentException](TxTable.tag(spark, root, "v1-cut", 2L))
    assert(dup.getMessage.contains("immutable"), "duplicate tag must lose loudly")
    assert(TxTable.tags(spark, root) === Map("v1-cut" -> 1L))
    assert(TxTable.tagVersion(spark, root, "v1-cut") === 1L)
    assert(TxTable.readTag(spark, root, "v1-cut").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "a"), (2L, "b")))

    // keepVersions=1 retains only the head — EXCEPT the tagged v1, whose
    // manifest AND data segments must survive (v3 overwrote, so v1's
    // segment is live only through the tag)
    TxTable.vacuum(spark, root, keepVersions = 1)
    assert(TxTable.readTag(spark, root, "v1-cut").count() === 2,
      "the tagged snapshot must stay fully readable past the keep window")
    intercept[Exception](TxTable.readVersion(spark, root, 2L).count())

    // dropping the tag re-enters normal retention: the next vacuum reaps
    TxTable.deleteTag(spark, root, "v1-cut")
    intercept[IllegalArgumentException](TxTable.deleteTag(spark, root, "v1-cut"))
    TxTable.vacuum(spark, root, keepVersions = 1)
    intercept[Exception](TxTable.readVersion(spark, root, 1L).count())
    assert(TxTable.read(spark, root).count() === 1, "head unaffected throughout")
  }

  test("checks: CHECK constraints gate every row-ingesting commit path") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root, Seq((1L, 10.0), (2L, 20.0)).toDF("k", "p"))

    // registration contract: bad names/expressions and already-violated
    // data are refused; a syntactically-broken expression never lands
    intercept[IllegalArgumentException](TxTable.addCheck(spark, root, "bad name", "p > 0"))
    intercept[IllegalArgumentException](TxTable.addCheck(spark, root, "q", "p > \"0\""))
    intercept[Exception](TxTable.addCheck(spark, root, "broken", "p >>> 0"))
    intercept[IllegalArgumentException](TxTable.addCheck(spark, root, "small", "k < 2"))
    TxTable.addCheck(spark, root, "pos_price", "p > 0")
    intercept[IllegalArgumentException](TxTable.addCheck(spark, root, "pos_price", "p > 1"))
    assert(TxTable.checks(spark, root) === Map("pos_price" -> "p > 0"))

    // append/overwrite/merge/clustered all refuse violating batches, and a
    // refused commit never advances the version
    val v0 = TxTable.latestVersion(spark, root).get
    val bad = Seq((3L, -1.0)).toDF("k", "p")
    val e = intercept[IllegalArgumentException](TxTable.commitAppend(spark, root, bad))
    assert(e.getMessage.contains("pos_price"), "refusal must name the constraint")
    intercept[IllegalArgumentException](TxTable.commitOverwrite(spark, root, bad))
    intercept[IllegalArgumentException](
      TxTable.commitMerge(spark, root, bad, Seq("k"), Seq("p"), Nil))
    intercept[IllegalArgumentException](
      TxTable.commitOverwriteClustered(spark, root, bad, Seq("k")))
    assert(TxTable.latestVersion(spark, root).contains(v0),
      "a refused commit must not advance the version")
    assert(TxTable.read(spark, root).count() === 2)

    // SQL CHECK semantics: NULL passes; clean batches flow through
    TxTable.commitAppend(spark, root,
      Seq((3L, Some(30.0)), (4L, None)).toDF("k", "p"))
    assert(TxTable.read(spark, root).count() === 4,
      "a NULL predicate must pass (constrain nullability explicitly)")

    // a batch that can't resolve the constraint's column fails loudly
    val noCol = intercept[IllegalArgumentException](
      TxTable.commitAppend(spark, root, Seq((5L, "x")).toDF("k", "other")))
    assert(noCol.getMessage.contains("pos_price"))

    // dropping re-opens the gate; double-drop is loud
    TxTable.dropCheck(spark, root, "pos_price")
    intercept[IllegalArgumentException](TxTable.dropCheck(spark, root, "pos_price"))
    TxTable.commitAppend(spark, root, Seq((6L, -5.0)).toDF("k", "p"))
    assert(TxTable.read(spark, root).count() === 5)
  }

  test("streamingAppendDlq: constraint routing, multi-violation tags, per-table replay") {
    val root = newRoot(); val dlq = newRoot()
    TxTable.addCheck(spark, root, "a_pos", "v > 0")
    TxTable.addCheck(spark, root, "b_cap", "v <= 10")
    val sink = TxTable.streamingAppendDlq(root, dlq) _

    // batch 0: 2 good, 1 single-violation, 1 double?? (v>0 false and v<=10
    // true for -3 — single; nothing violates both, NULL passes both)
    sink(Seq((1L, Some(5.0)), (2L, Some(7.0)), (3L, Some(-3.0)),
      (4L, Option.empty[Double])).toDF("k", "v"), 0L)
    assert(TxTable.read(spark, root).orderBy("k").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L, 4L), "NULL passes; -3 routes to the DLQ")
    val d0 = TxTable.read(spark, dlq).collect()
    assert(d0.length === 1 && d0.head.getAs[String]("dlq_checks") === "a_pos")

    // batch 1: a row violating BOTH constraints?? impossible here — use 0
    // for a_pos and 99 for b_cap; tags stay per-violation and sorted
    sink(Seq((5L, Some(0.0)), (6L, Some(99.0)), (7L, Some(1.0))).toDF("k", "v"), 1L)
    val d1 = TxTable.read(spark, dlq).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("dlq_checks")).toMap
    assert(d1 === Map(3L -> "a_pos", 5L -> "a_pos", 6L -> "b_cap"))

    // batch 2: all good — DLQ commit skipped, but its watermark gap is
    // replay-safe because the guard is >= (batch 3 then writes the DLQ)
    sink(Seq((8L, Some(2.0))).toDF("k", "v"), 2L)
    val dlqV2 = TxTable.latestVersion(spark, dlq).get
    sink(Seq((9L, Some(-9.0))).toDF("k", "v"), 3L)
    assert(TxTable.latestVersion(spark, dlq).get === dlqV2 + 1)

    // full replay of every batch with the same ids: BOTH tables no-op
    val (mv, dv) = (TxTable.latestVersion(spark, root).get,
      TxTable.latestVersion(spark, dlq).get)
    sink(Seq((1L, Some(5.0)), (3L, Some(-3.0))).toDF("k", "v"), 0L)
    sink(Seq((5L, Some(0.0))).toDF("k", "v"), 1L)
    sink(Seq((9L, Some(-9.0))).toDF("k", "v"), 3L)
    assert(TxTable.latestVersion(spark, root).contains(mv) &&
      TxTable.latestVersion(spark, dlq).contains(dv),
      "replayed batch ids must no-op both tables")
    assert(TxTable.read(spark, root).count() === 5 &&
      TxTable.read(spark, dlq).count() === 4)
  }

  test("commitDelta: insert segment + takedown DV publish as ONE version, " +
    "bit-identical to the append-then-dvdelete pair") {
    val rootA = newRoot(); val rootB = newRoot()
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    TxTable.commitOverwrite(spark, rootA, base, statsCols = Seq("k"))
    TxTable.commitOverwrite(spark, rootB, base, statsCols = Seq("k"))
    // the delta inserts 4,5 and tombstones 2 AND 5 — the takedown of a
    // key introduced by the SAME delta must land (append-then-delete)
    val ins = Seq((4L, "d"), (5L, "e")).toDF("k", "s")
    val dels = Seq(2L, 5L).toDF("k")
    val vA0 = TxTable.latestVersion(spark, rootA).get
    val vA = TxTable.commitDelta(spark, rootA, ins, dels, Seq("k"),
      statsCols = Seq("k"))
    assert(vA === vA0 + 1, "the fused apply must publish exactly ONE version")
    TxTable.commitAppend(spark, rootB, ins, statsCols = Seq("k"))
    TxTable.commitDeleteVectors(spark, rootB, dels, Seq("k"))
    def snap(r: String) = TxTable.read(spark, r).as[(Long, String)].collect().toSet
    assert(snap(rootA) === snap(rootB), "delta must equal the two-commit pair")
    assert(snap(rootA) === Set((1L, "a"), (3L, "c"), (4L, "d")))
    // the DV reaches into the delta segment: key 5 was inserted AND
    // tombstoned in the same commit, and must be invisible to pruned reads
    assert(TxTable.readWhereEquals(spark, rootA, "k", 5L).isEmpty)
    assert(TxTable.readWhereIn(spark, rootA, "k",
      Seq(2L, 4L, 5L).map(java.math.BigDecimal.valueOf))
      .as[(Long, String)].collect().toSet === Set((4L, "d")))

    // degenerate shapes: empty tombstones publish a plain append manifest
    // (readChanges derives its inserts structurally, no cdf needed);
    // both-empty is a no-op that returns the head unchanged
    val vApp = TxTable.commitDelta(spark, rootA, Seq((6L, "f")).toDF("k", "s"),
      spark.emptyDataset[Long].toDF("k"), Seq("k"))
    val ch = TxTable.readChanges(spark, rootA, vApp - 1, vApp)
    assert(ch.select("k", "_change_type").as[(Long, String)].collect().toSet
      === Set((6L, "insert")), "tombstone-less delta must read as an append")
    val vNoop = TxTable.commitDelta(spark, rootA,
      spark.emptyDataset[(Long, String)].toDF("k", "s"),
      spark.emptyDataset[Long].toDF("k"), Seq("k"))
    assert(vNoop === vApp, "an all-empty delta must not publish")

    // exactly-once: a batch id replays as a no-op
    val vB1 = TxTable.commitDelta(spark, rootA, Seq((7L, "g")).toDF("k", "s"),
      Seq(1L).toDF("k"), Seq("k"), batch = Some(42L))
    val replay = TxTable.commitDelta(spark, rootA, Seq((8L, "h")).toDF("k", "s"),
      Seq(3L).toDF("k"), Seq("k"), batch = Some(42L))
    assert(replay === -1L && TxTable.latestVersion(spark, rootA).contains(vB1),
      "a replayed batch id must publish nothing")
    assert(snap(rootA) === Set((3L, "c"), (4L, "d"), (6L, "f"), (7L, "g")))

    // cdf: the fused commit's change feed records the inserts (by segment
    // reference) AND the takedown rows, like the two-commit pair would
    val rootC = newRoot()
    TxTable.commitOverwrite(spark, rootC, base)
    val vC = TxTable.commitDelta(spark, rootC, Seq((4L, "d")).toDF("k", "s"),
      Seq(2L, 4L).toDF("k"), Seq("k"), cdf = true)
    val chC = TxTable.readChanges(spark, rootC, vC - 1, vC)
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(chC === Set((4L, "insert"), (2L, "delete"), (4L, "delete")),
      "cdf delta must record inserts and takedowns (incl. same-commit kills)")
  }

  test("compactDeltaN: O(delta) layout fold — carries clean segments, " +
    "rescopes DVs, visible rows identical") {
    val root = newRoot()
    TxTable.commitOverwriteClustered(spark, root,
      (1L to 64L).map(k => (k, k % 8, s"v$k")).toDF("k", "g", "s"),
      Seq("g"), numSegments = 8)
    val v0 = TxTable.latestVersion(spark, root).get
    // delta: inserts + takedowns hitting base segments (7, 14) AND a key
    // the same delta introduced (102 — insert-then-delete)
    TxTable.commitDelta(spark, root,
      Seq((100L, 3L, "n1"), (101L, 5L, "n2"), (102L, 7L, "dead"))
        .toDF("k", "g", "s"),
      Seq(7L, 14L, 102L).toDF("k"), Seq("k"), statsCols = Seq("g"))
    val before = TxTable.read(spark, root)
      .as[(Long, Long, String)].collect().toSet
    assert(before.exists(_._1 == 100L) && !before.exists(_._1 == 7L))
    def segsOf() = TxTable.read(spark, root).inputFiles
      .filter(_.contains("/data/")).map(_.replaceAll("/[^/]*$", "")).toSet
    val segsBefore = segsOf()
    val v2 = TxTable.compactDeltaN(spark, root, Seq("g"),
      sinceVersion = v0, numSegments = 2)
    assert(TxTable.latestVersion(spark, root).contains(v2))
    assert(TxTable.read(spark, root).as[(Long, Long, String)].collect().toSet
      === before, "incremental optimize must be layout-only")
    val segsAfter = segsOf()
    assert((segsBefore intersect segsAfter).size === 8,
      "all 8 clean base segments must carry over byte-identical")
    assert((segsAfter diff segsBefore).nonEmpty &&
      (segsBefore diff segsAfter).size === 1,
      "exactly the delta segment is rewritten into clustered segments")
    // the rescoped DV still guards the carried base segments (7, 14 dead)
    assert(TxTable.readWhereEquals(spark, root, "k", 7L).isEmpty)
    // nothing dirty ⇒ no-op, head unchanged
    assert(TxTable.compactDeltaN(spark, root, Seq("g"),
      sinceVersion = v2) === v2)
  }

  test("checks: commitMerge enforces on the MERGED output (updated + " +
    "preserved columns combined), not the raw batch") {
    val root = newRoot()
    TxTable.commitOverwrite(spark, root,
      Seq((1L, 5.0, 10.0), (2L, 8.0, 9.0)).toDF("k", "amount", "cap"))
    TxTable.addCheck(spark, root, "under_cap", "amount <= cap")
    val v0 = TxTable.latestVersion(spark, root).get
    // the batch updates amount; its OWN cap values (ignored on conflict —
    // cap is preserved) pass the check, but the merged row 2 combines
    // amount 9.5 with the PRESERVED cap 9 — only the merged output shows it
    val bad = Seq((2L, 9.5, 100.0), (1L, 9.5, 100.0)).toDF("k", "amount", "cap")
    val e = intercept[IllegalArgumentException](
      TxTable.commitMerge(spark, root, bad, Seq("k"), Seq("amount"), Seq("cap")))
    assert(e.getMessage.contains("under_cap"), "refusal must name the check")
    assert(TxTable.latestVersion(spark, root).contains(v0) &&
      TxTable.read(spark, root).count() === 2,
      "a refused merge publishes nothing and removes its staged segment")
    // a batch that satisfies the check against the PRESERVED caps lands
    TxTable.commitMerge(spark, root,
      Seq((2L, 8.5, 100.0), (1L, 9.5, 100.0)).toDF("k", "amount", "cap"),
      Seq("k"), Seq("amount"), Seq("cap"))
    assert(TxTable.read(spark, root).filter(col("amount") > col("cap")).count() === 0)

    // commitRewriteHit enforces on the rewrite callback's output too
    val v1 = TxTable.latestVersion(spark, root).get
    val e2 = intercept[IllegalArgumentException](
      TxTable.commitRewriteHit(spark, root, Seq(1L).toDF("k"), Seq("k")) { touched =>
        touched.withColumn("amount", col("cap") + 1)
      })
    assert(e2.getMessage.contains("under_cap"))
    assert(TxTable.latestVersion(spark, root).contains(v1),
      "a refused rewrite publishes nothing")
    // commitDelta's insert side is gated like any append
    intercept[IllegalArgumentException](
      TxTable.commitDelta(spark, root, Seq((9L, 99.0, 1.0)).toDF("k", "amount", "cap"),
        spark.emptyDataset[Long].toDF("k"), Seq("k")))
    assert(TxTable.latestVersion(spark, root).contains(v1))
  }
}
