package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal TRANSACTIONAL table format — the missing piece `Tables.compact`
  * documents (a racing lister can catch the gap between its two renames):
  * the Delta/Iceberg idea with zero dependencies.  One table =
  *
  * {{{
  *   <root>/data/<uuid>/part-*.parquet   immutable data segments
  *   <root>/_txlog/v<NNNNNNNNNN>.json    manifest: the segment list of version N
  * }}}
  *
  * Every commit writes its data into a FRESH uuid segment directory, then
  * publishes a manifest listing the segments that make up the new snapshot
  * via write-temp + rename — ONE metadata operation, so a reader resolving
  * the log sees either version N or N+1, never a half-swapped directory.
  * Old segments are untouched until [[vacuum]], so a reader that resolved
  * version N keeps reading a consistent snapshot while N+1..N+k land
  * (snapshot isolation, and time travel for free via [[readVersion]]).
  *
  * Commit concurrency: the manifest rename targets `v<next>.json`; HDFS and
  * object stores with atomic rename refuse an existing destination, so two
  * racing committers conflict cleanly and the loser retries against the new
  * head (optimistic concurrency, ref Delta's protocol).  POSIX local
  * rename(2) overwrites, so on local filesystems the existence check before
  * rename is best-effort — fine for tests, not a correctness claim.
  *
  * At 100 TB: manifests hold segment DIRECTORIES, not files, so a manifest
  * stays KBs regardless of data size; readers list only the segments of
  * their snapshot (no full-lake listing); compaction is a normal commit
  * that swaps many small segments for few large ones with readers never
  * blocked.
  */
object TxTable {

  private val LogDir = "_txlog"
  private case class Manifest(version: Long, op: String, segments: Seq[String],
                              batch: Option[Long] = None)

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Long): Path =
    new Path(s"${root.stripSuffix("/")}/$LogDir/v${"%010d".format(v)}.json")

  private def writeJson(m: Manifest): String =
    s"""{"version":${m.version},"op":"${m.op}",""" +
      m.batch.map(b => s""""batch":$b,""").getOrElse("") +
      """"segments":[""" +
      m.segments.map(s => "\"" + s + "\"").mkString(",") + "]}"

  private def parseJson(s: String): Manifest = {
    // segments are uuid dir names (no quotes/escapes inside), so a
    // dependency-free extraction is exact
    val version = """"version":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
    val op = """"op":"([^"]*)"""".r.findFirstMatchIn(s).get.group(1)
    val batch = """"batch":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
    val segs = """"segments":\[([^\]]*)\]""".r.findFirstMatchIn(s).get.group(1)
    val segments =
      if (segs.trim.isEmpty) Seq.empty
      else segs.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
    Manifest(version, op, segments, batch)
  }

  /** Latest committed version, or None for an uninitialized table. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val dir = new Path(s"${root.stripSuffix("/")}/$LogDir")
    val f = fs(spark, root)
    if (!f.exists(dir)) None
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .reduceOption(_ max _)
  }

  private def readManifest(spark: SparkSession, root: String, v: Long): Manifest = {
    val f = fs(spark, root)
    val in = f.open(manifestPath(root, v))
    try {
      val bytes = new Array[Byte](f.getFileStatus(manifestPath(root, v)).getLen.toInt)
      in.readFully(bytes)
      parseJson(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    } finally in.close()
  }

  /** Write `df` as a fresh segment directory; returns the segment name. */
  private def writeSegment(df: DataFrame, root: String): String = {
    val seg = "data/" + java.util.UUID.randomUUID().toString
    df.write.parquet(s"${root.stripSuffix("/")}/$seg")
    seg
  }

  /** Publish `segments` as the next version: write-temp + rename — the one
    * atomic metadata op.  Retries on version conflict (another committer
    * won the rename) with the standard optimistic re-read. */
  private def commit(spark: SparkSession, root: String, op: String,
                     segments: Seq[String], maxRetries: Int = 10,
                     batch: Option[Long] = None): Long = {
    val f = fs(spark, root)
    var attempt = 0
    while (true) {
      val next = latestVersion(spark, root).map(_ + 1).getOrElse(1L)
      val target = manifestPath(root, next)
      val tmp = new Path(target.getParent, s".tmp-${java.util.UUID.randomUUID()}")
      f.mkdirs(target.getParent)
      val os = f.create(tmp, false)
      try os.write(writeJson(Manifest(next, op, segments, batch))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
      val won = !f.exists(target) && f.rename(tmp, target)
      if (won) return next
      f.delete(tmp, false)
      attempt += 1
      require(attempt <= maxRetries,
        s"TxTable.commit: lost the version race $maxRetries times under $root")
    }
    -1L // unreachable
  }

  /** Replace the table contents with `df` (full-refresh as a commit). */
  def commitOverwrite(spark: SparkSession, root: String, df: DataFrame): Long =
    commit(spark, root, "overwrite", Seq(writeSegment(df, root)))

  /** Append `df` as a new segment alongside the current snapshot's. */
  def commitAppend(spark: SparkSession, root: String, df: DataFrame): Long =
    appendWith(spark, root, df, None)

  private def appendWith(spark: SparkSession, root: String, df: DataFrame,
                         batch: Option[Long]): Long = {
    val seg = writeSegment(df, root)
    // re-resolve the head inside commit's retry loop is not needed for the
    // SEGMENT (it is ours alone); only the base list can go stale — rebuild
    // it per attempt via the conflict retry
    var v = -1L
    var attempt = 0
    while (v < 0) {
      val base = latestVersion(spark, root)
        .map(readManifest(spark, root, _).segments).getOrElse(Seq.empty)
      try v = commit(spark, root, "append", base :+ seg, maxRetries = 0, batch)
      catch { case _: IllegalArgumentException if attempt < 10 => attempt += 1 }
    }
    v
  }

  /** Highest micro-batch id recorded by [[streamingAppend]] among the
    * still-retained manifests (vacuum retention must exceed the replay
    * horizon — trivially true: foreachBatch replays at most the one batch
    * after the last checkpoint, and vacuum always keeps the head). */
  def lastCommittedBatch(spark: SparkSession, root: String): Option[Long] =
    latestVersion(spark, root).flatMap { head =>
      (1L to head).flatMap { v =>
        try readManifest(spark, root, v).batch
        catch { case _: java.io.FileNotFoundException => None }
      }.reduceOption(_ max _)
    }

  /** EXACTLY-ONCE streaming sink: `stream.writeStream.foreachBatch(
    * TxTable.streamingAppend(root) _)`.  Each micro-batch commits as one
    * table version whose manifest records the batch id; after a crash the
    * checkpoint replays the in-flight batch and the duplicate id makes the
    * commit a no-op — the append lands exactly once even though the batch
    * runs at-least-once (the transactional-sink idiom Structured Streaming
    * expects of a real table format). */
  def streamingAppend(root: String)(df: DataFrame, batchId: Long): Unit = {
    val spark = df.sparkSession
    if (lastCommittedBatch(spark, root).exists(_ >= batchId)) return
    appendWith(spark, root, df, Some(batchId))
  }

  /** SEGMENT-PRUNED ACID upsert (the Delta-style MERGE shape): only the
    * segments that CONTAIN a hit key are rewritten — every other segment
    * carries over into the new manifest by reference, so a merge touching
    * 0.1% of keys rewrites ~0.1% of the table, transactionally.  Hit
    * segments are found by a broadcast semi-join of the incoming key set
    * against the head snapshot tagged with its source segment
    * (`input_file_name()` above the scan); their rows plus the incoming
    * batch go through [[Upsert.upsert]] (EXCLUDED-wins updateCols,
    * existing-wins preserveCols) into one replacement segment.
    *
    * The table's column set must be exactly `keys ++ updateCols ++
    * preserveCols` (parquet reads align by name, so column ORDER may vary
    * across segments but the SET must not).  Writer serialization is the
    * caller's contract for merge: a concurrent commit between head-read and
    * publish fails the version CAS and this method throws rather than
    * silently re-merging against a moved head. */
  def commitMerge(spark: SparkSession, root: String, incoming: DataFrame,
                  keys: Seq[String], updateCols: Seq[String],
                  preserveCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions._
    val cols = keys ++ updateCols ++ preserveCols
    latestVersion(spark, root) match {
      case None => // bootstrap: the incoming batch IS the table
        commit(spark, root, "merge",
          Seq(writeSegment(incoming.select(cols.map(col): _*), root)))
      case Some(headV) =>
        val segs = readManifest(spark, root, headV).segments
        val cur = readVersion(spark, root, headV)
          .withColumn("__seg", regexp_extract(input_file_name(), "/(data/[^/]+)/", 1))
        val inKeys = broadcast(incoming.select(keys.map(col): _*).distinct())
        val hitSegs = cur
          .join(inKeys, keys.map(k => cur(k) <=> inKeys(k)).reduce(_ && _), "left_semi")
          .select("__seg").distinct().collect().map(_.getString(0)).toSet
        val touched = cur.filter(col("__seg").isin(hitSegs.toSeq: _*)).drop("__seg")
        val merged = Upsert.upsert(touched, incoming, keys, updateCols, preserveCols)
        val newSeg = writeSegment(merged, root)
        commit(spark, root, "merge",
          segs.filterNot(hitSegs.contains) :+ newSeg, maxRetries = 0)
    }
  }

  /** Segment-pruned ACID DELETE — the transactional form of
    * [[Upsert.purgeKeys]] (right-to-be-forgotten without the partition
    * rename dance): segments containing tombstoned keys are rewritten
    * WITHOUT those rows; every other segment carries over by reference.
    * NULL-safe key matching, so NULL tombstone keys delete NULL-keyed rows.
    * Note: deleted rows leave older versions only at [[vacuum]] time — run
    * vacuum after the retention window when the deletion must be physical. */
  def commitDelete(spark: SparkSession, root: String, tombstones: DataFrame,
                   keys: Seq[String]): Long = {
    import org.apache.spark.sql.functions._
    val headV = latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"TxTable.commitDelete: no commits under $root"))
    val segs = readManifest(spark, root, headV).segments
    val tomb = broadcast(tombstones.select(keys.map(col): _*).distinct())
    val cur = readVersion(spark, root, headV)
      .withColumn("__seg", regexp_extract(input_file_name(), "/(data/[^/]+)/", 1))
    def keyCond(df: DataFrame) = keys.map(k => df(k) <=> tomb(k)).reduce(_ && _)
    val hitSegs = cur.join(tomb, keyCond(cur), "left_semi")
      .select("__seg").distinct().collect().map(_.getString(0)).toSet
    if (hitSegs.isEmpty) return headV // nothing to delete: head unchanged
    val touched = cur.filter(col("__seg").isin(hitSegs.toSeq: _*))
    val kept = touched.join(tomb, keyCond(touched), "left_anti").drop("__seg")
    val carried = segs.filterNot(hitSegs.contains)
    // a fully-emptied table still needs a readable head: only write the
    // replacement segment when rows survive
    val newSegs = if (kept.isEmpty) Seq.empty else Seq(writeSegment(kept, root))
    require(carried.nonEmpty || newSegs.nonEmpty,
      s"TxTable.commitDelete: delete would empty the table under $root — " +
        "commitOverwrite an explicit empty state instead")
    commit(spark, root, "delete", carried ++ newSegs, maxRetries = 0)
  }

  /** Compact the CURRENT snapshot into ≈ceil(bytes/targetBytes) files as a
    * normal commit — readers of any already-resolved version are never
    * disturbed (their segments stay on disk until [[vacuum]]). */
  def compactTx(spark: SparkSession, root: String,
                targetBytes: Long = 128L * 1024 * 1024): Long = {
    val snapshot = read(spark, root)
    val f = fs(spark, root)
    val cur = latestVersion(spark, root).get
    val segs = readManifest(spark, root, cur).segments
    val bytes = segs.map(s => f.getContentSummary(
      new Path(s"${root.stripSuffix("/")}/$s")).getLength).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val seg = writeSegment(snapshot.repartition(n), root)
    commit(spark, root, "compact", Seq(seg))
  }

  /** The latest snapshot as a DataFrame. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root,
      latestVersion(spark, root).getOrElse(
        throw new IllegalArgumentException(s"TxTable.read: no commits under $root")))

  /** Time travel: the table exactly as of version `v`.  Reads with
    * mergeSchema: segments written before a column existed surface NULL for
    * it (additive schema evolution — the same drift contract as the lake's
    * multi-generation glob scan). */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val m = readManifest(spark, root, v)
    require(m.segments.nonEmpty, s"TxTable: version $v of $root is empty")
    spark.read.option("mergeSchema", "true")
      .parquet(m.segments.map(s => s"${root.stripSuffix("/")}/$s"): _*)
  }

  /** Drop data segments referenced by NO manifest among the newest
    * `keepVersions` (and drop older manifests) — the retention boundary for
    * snapshot isolation: readers older than it lose their snapshot. */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2): Unit = {
    val f = fs(spark, root)
    val head = latestVersion(spark, root).getOrElse(return)
    val keepFrom = math.max(1L, head - keepVersions + 1)
    val live = (keepFrom to head)
      .flatMap(v => readManifest(spark, root, v).segments).toSet
    val dataDir = new Path(s"${root.stripSuffix("/")}/data")
    if (f.exists(dataDir)) f.listStatus(dataDir).foreach { st =>
      if (!live.contains("data/" + st.getPath.getName))
        f.delete(st.getPath, true)
    }
    (1L until keepFrom).foreach(v => f.delete(manifestPath(root, v), false))
  }
}
