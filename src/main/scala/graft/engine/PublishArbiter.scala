package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The TxTable commit protocol's ARBITRATION BOUNDARY, as a pluggable
  * interface — the two decisions no amount of uniquely-named-file writing
  * can make for you:
  *
  *  1. [[claimExclusive]]: "did THIS committer create the version-slot
  *     claim?" (the commit CAS), plus its [[releaseClaim]] inverse for the
  *     stale-claim reaper and vacuum;
  *  2. [[publishExclusive]]: "did THIS fully-written manifest land in the
  *     slot, refusing if the slot is already published?" (the visibility
  *     flip readers see as one atomic metadata op).
  *
  * Everything else in the commit protocol is plain writes of uniquely-named
  * files (segments, DV sidecars, stats sidecars, temp manifests) that need
  * no arbitration at all.
  *
  * WHY A TRAIT — the object-store boundary: on local filesystems the
  * default [[PublishArbiter.Filesystem]] is airtight (`O_CREAT|O_EXCL`
  * claims, `link(2)` publishes — both kernel-atomic, EEXIST on an occupied
  * slot) and on HDFS the `FileSystem.create(overwrite = false)` / `rename`
  * contracts arbitrate atomically in the NameNode.  But S3A's `rename` is
  * implemented as check-then-copy-then-delete: two racing publishers can
  * BOTH pass the existence check and the second silently OVERWRITES the
  * first — a lost acknowledged commit, the one failure a log-structured
  * table format can never admit.  Every production lakehouse on S3 solves
  * this with an EXTERNAL strongly-consistent arbiter: Delta's
  * S3DynamoDBLogStore routes "create this log entry exclusively" through a
  * DynamoDB conditional put, and Iceberg requires a catalog (Glue / Hive /
  * REST) whose compare-and-swap commits the snapshot pointer.  An S3
  * deployment of TxTable implements this trait the same way — a
  * conditional put on an external store keyed by the manifest path decides
  * the winner, and only the winner copies bytes — registers it under a
  * name, and selects it with the session conf
  * `spark.graft.tx.arbiter = <name>`.  The racing-publisher contract
  * (exactly one winner, the loser told loudly) is pinned by
  * PublishArbiterSpec against a simulated check-then-copy store.
  */
trait PublishArbiter {

  /** Create-exclusive claim of `path`: true iff THIS caller created it,
    * false iff it already existed (a lost race).  Any other failure
    * (permissions, network, quota) must THROW — conflating infrastructure
    * errors with contention masks real outages as retries. */
  def claimExclusive(f: FileSystem, path: Path): Boolean

  /** Release a claim the protocol has decided is dead (the stale-claim
    * reaper; vacuum's sweep of claims at or below the published head).
    * Implementations backed by an external store must release BOTH the
    * external entry and the file, or the slot wedges forever. */
  def releaseClaim(f: FileSystem, path: Path): Unit = { f.delete(path, false); () }

  /** Move the fully-written `tmp` into `target`, REFUSING if the target is
    * already published: true = this manifest is the slot's one winner,
    * false = another publisher holds it (the caller surfaces that as a
    * loud loser error, never a silent overwrite or retry into the same
    * slot).  The false path must leave the winner's bytes untouched. */
  def publishExclusive(f: FileSystem, tmp: Path, target: Path): Boolean
}

object PublishArbiter {

  /** Session conf selecting the arbiter by registered name. */
  val ConfKey = "spark.graft.tx.arbiter"

  /** Default arbiter: the filesystem IS the arbiter.  Local filesystems
    * claim via nio `Files.createFile` (`O_CREAT|O_EXCL`) and publish via
    * `link(2)` (atomic, complete-content-only, EEXIST on an occupied
    * slot — POSIX `rename(2)` would silently OVERWRITE, exactly the
    * lost-commit hole when a reaped-but-live committer publishes after a
    * new winner).  Other filesystems use the Hadoop `create(overwrite =
    * false)` / `rename` contracts, which HDFS and consistent stores
    * arbitrate atomically.  Correct everywhere EXCEPT eventually-arbitrated
    * object stores (S3A) — see the trait scaladoc. */
  object Filesystem extends PublishArbiter {

    def claimExclusive(f: FileSystem, path: Path): Boolean = f match {
      case _: org.apache.hadoop.fs.LocalFileSystem | _: org.apache.hadoop.fs.RawLocalFileSystem =>
        try { java.nio.file.Files.createFile(java.nio.file.Paths.get(path.toUri.getPath)); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      case _ =>
        try { f.create(path, false).close(); true }
        catch {
          // ONLY refuse-on-exist is a lost race; any other IOException is a
          // real failure that must surface
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.nio.file.FileAlreadyExistsException => false
        }
    }

    def publishExclusive(f: FileSystem, tmp: Path, target: Path): Boolean = f match {
      case _: org.apache.hadoop.fs.LocalFileSystem | _: org.apache.hadoop.fs.RawLocalFileSystem =>
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          f.delete(tmp, false)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      case _ => f.rename(tmp, target)
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, PublishArbiter]()
  registry.put("filesystem", Filesystem)

  /** Register an arbiter under `name` for `spark.graft.tx.arbiter`
    * selection (an S3 deployment registers its conditional-put
    * implementation here at session setup). */
  def register(name: String, arbiter: PublishArbiter): Unit =
    registry.put(name, arbiter)

  /** The session's arbiter — `spark.graft.tx.arbiter` when set (unknown
    * names fail LOUDLY: silently falling back to the filesystem arbiter on
    * S3 would reopen the lost-commit hole the conf exists to close),
    * [[Filesystem]] otherwise. */
  def resolve(spark: SparkSession): PublishArbiter = {
    val name = spark.conf.getOption(ConfKey).getOrElse("filesystem")
    Option(registry.get(name)).getOrElse(throw new IllegalArgumentException(
      s"PublishArbiter: $ConfKey names unregistered arbiter '$name' " +
        s"(registered: ${java.util.Collections.list(registry.keys())
          .toArray.mkString(", ")})"))
  }
}
