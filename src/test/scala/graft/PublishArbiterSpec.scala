package graft

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.engine.{PublishArbiter, TxTable}

/** The commit protocol's pluggable arbitration boundary (PublishArbiter):
  * the S3-shaped failure it exists to close, simulated end to end.
  *
  * [[CheckThenCopyStore]] models an eventually-arbitrated object store:
  * its "rename" is EXISTENCE CHECK → pause → COPY → DELETE (exactly S3A's
  * implementation), so two racing publishers can both pass the check and
  * the second silently overwrites the first — a lost acknowledged commit.
  * The spec first DEMONSTRATES that hole with a naive arbiter that trusts
  * the store, then closes it with [[ConditionalPutArbiter]] — arbitration
  * through an external strongly-consistent table (a ConcurrentHashMap
  * standing in for DynamoDB conditional puts / an Iceberg catalog CAS),
  * with the copy running only on the winner — and pins the contract the
  * trait demands: exactly one winner, the loser told loudly, the winner's
  * bytes untouched.  A full TxTable multi-writer history then runs with
  * the conditional-put arbiter selected via `spark.graft.tx.arbiter`,
  * proving the protocol is linearizable when every claim and publish
  * routes through an external arbiter (the S3 deployment shape). */
class PublishArbiterSpec extends SparkFunSuite {
  import spark.implicits._

  /** A non-atomic "rename": check, yield the race window, copy-overwrite,
    * delete the source.  Returns what a naive caller would believe:
    * "the target did not exist when I looked". */
  private object CheckThenCopyStore {
    def rename(f: FileSystem, tmp: Path, target: Path, pauseMs: Long): Boolean = {
      val existed = f.exists(target)
      Thread.sleep(pauseMs) // the S3A race window, widened to be reliable
      if (!existed) {
        // the final PUT is per-object atomic (S3 never exposes a partial
        // object) but silently REPLACES — only the existence CHECK races
        val staged = java.nio.file.Files.createTempFile(
          java.nio.file.Paths.get(target.getParent.toUri.getPath), ".put-", "")
        java.nio.file.Files.copy(java.nio.file.Paths.get(tmp.toUri.getPath),
          staged, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.move(staged,
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        f.delete(tmp, false)
        true
      } else false
    }
  }

  /** The broken shape: trust the store's check-then-copy. */
  private final class NaiveArbiter(pauseMs: Long) extends PublishArbiter {
    def claimExclusive(f: FileSystem, path: Path): Boolean =
      CheckThenCopyStore.rename(f, writeTmp(f, path), path, pauseMs)
    def publishExclusive(f: FileSystem, tmp: Path, target: Path): Boolean =
      CheckThenCopyStore.rename(f, tmp, target, pauseMs)
    private def writeTmp(f: FileSystem, near: Path): Path = {
      val t = new Path(near.getParent, s".tmp-claim-${java.util.UUID.randomUUID()}")
      f.create(t, false).close(); t
    }
  }

  /** The correct shape (Delta S3DynamoDBLogStore / Iceberg catalog CAS):
    * an external strongly-consistent table decides exclusivity with a
    * conditional put; only the winner touches the store, so the store's
    * non-atomic copy can never race.  releaseClaim clears BOTH the table
    * entry and the file — an external arbiter that forgot its entry would
    * wedge the slot forever. */
  private final class ConditionalPutArbiter(
      table: ConcurrentHashMap[String, String], pauseMs: Long)
    extends PublishArbiter {
    // table keys are SCHEME-NORMALIZED paths: claim-time paths arrive bare
    // and vacuum's listStatus paths arrive file:-qualified — a real
    // external store must key on one canonical form or releases leak
    private def key(p: Path): String = p.toUri.getPath
    def claimExclusive(f: FileSystem, path: Path): Boolean =
      table.putIfAbsent(key(path), "claimed") == null && {
        f.create(path, true).close(); true
      }
    override def releaseClaim(f: FileSystem, path: Path): Unit = {
      table.remove(key(path))
      f.delete(path, false); ()
    }
    def publishExclusive(f: FileSystem, tmp: Path, target: Path): Boolean =
      (table.putIfAbsent(key(target), "published") == null) && {
        CheckThenCopyStore.rename(f, tmp, target, pauseMs); true
      }
  }

  private def localFs: FileSystem = FileSystem.get(
    new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)

  private def race(arb: PublishArbiter, dir: java.io.File): (Int, String) = {
    val f = localFs
    val target = new Path(new java.io.File(dir, "v0000000001.json").getAbsolutePath)
    val gate = new CountDownLatch(1)
    val results = new java.util.concurrent.CopyOnWriteArrayList[Boolean]()
    val threads = Seq("A", "B").map { who =>
      val tmp = new Path(new java.io.File(dir, s".tmp-$who").getAbsolutePath)
      val out = f.create(tmp, false)
      out.write(s"""{"writer":"$who"}""".getBytes("UTF-8")); out.close()
      new Thread(() => {
        gate.await(5, TimeUnit.SECONDS)
        results.add(arb.publishExclusive(f, tmp, target))
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join(10000))
    val winners = results.toArray.count(_ == java.lang.Boolean.TRUE)
    val bytes = java.nio.file.Files.readString(
      java.nio.file.Paths.get(target.toUri.getPath))
    (winners, bytes)
  }

  test("the check-then-copy store WITHOUT an external arbiter loses a " +
    "commit: both racers believe they won (the S3A hole)") {
    val dir = java.nio.file.Files.createTempDirectory("arb_naive").toFile
    val (winners, _) = race(new NaiveArbiter(pauseMs = 150), dir)
    assert(winners === 2,
      "the naive check-then-copy race must show the double-win hole " +
        s"(got $winners winners) — if this starts failing the simulated " +
        "store stopped modeling S3A and the spec needs a wider window")
  }

  test("conditional-put arbiter: two racing publishes produce exactly one " +
    "winner; the loser is told; the winner's bytes survive") {
    val dir = java.nio.file.Files.createTempDirectory("arb_condput").toFile
    val table = new ConcurrentHashMap[String, String]()
    val (winners, bytes) = race(new ConditionalPutArbiter(table, pauseMs = 150), dir)
    assert(winners === 1, s"exactly one publisher may win, got $winners")
    // the surviving manifest is the winner's, complete and uncorrupted
    assert(bytes == """{"writer":"A"}""" || bytes == """{"writer":"B"}""",
      s"the slot must hold one complete manifest, got: $bytes")
    assert(table.size() === 1, "the external table records the one decision")
  }

  test("TxTable end-to-end under the conditional-put arbiter: racing " +
    "appenders all land, loud loser on a stolen slot, reap releases the " +
    "external entry") {
    val table = new ConcurrentHashMap[String, String]()
    PublishArbiter.register("condput-test", new ConditionalPutArbiter(table, pauseMs = 2))
    val ss = spark.newSession()
    ss.conf.set(PublishArbiter.ConfKey, "condput-test")
    val ssi = ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import ssi.implicits.{localSeqToDatasetHolder, newLongEncoder}
    val root = java.nio.file.Files.createTempDirectory("arb_tx").toString + "/tbl"
    TxTable.commitOverwrite(ss, root, Seq(0L).toDF("k"))

    // 4 concurrent appenders: every one must land on a distinct version
    // (the arbiter's claims serialize them), none may lose rows
    val gate = new CountDownLatch(1)
    val errs = new java.util.concurrent.CopyOnWriteArrayList[Throwable]()
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        gate.await(5, TimeUnit.SECONDS)
        try TxTable.commitAppend(ss, root, Seq(i.toLong).toDF("k"))
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join(60000))
    assert(errs.isEmpty, s"concurrent appends must all land: ${errs.toArray.toSeq}")
    assert(TxTable.read(ss, root).as[Long].collect().sorted.toSeq
      === (0L to 4L), "no lost commits under the external arbiter")
    assert(TxTable.latestVersion(ss, root).contains(5L))

    // unknown arbiter names fail loudly, never fall back silently
    val bad = ss.newSession()
    bad.conf.set(PublishArbiter.ConfKey, "not-registered")
    val e = intercept[IllegalArgumentException](
      TxTable.commitAppend(bad, root, Seq(99L).toDF("k")))
    assert(e.getMessage.contains("not-registered"))

    // vacuum releases published slots' claims through the arbiter: the
    // external entries for claimed slots clear too (a wedged entry would
    // block slot reuse in a real external store)
    val claimsBefore = table.keySet().toArray.count(_.toString.endsWith(".claim"))
    assert(claimsBefore >= 5, "the external table saw every claim")
    TxTable.vacuum(ss, root, keepVersions = 2)
    val claimsAfter = table.keySet().toArray.count(_.toString.endsWith(".claim"))
    assert(claimsAfter === 0,
      s"vacuum must release claim entries via the arbiter, $claimsAfter left")
  }
}
