package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.engine.{Relational, Tables}

class IoSpec extends SparkFunSuite {
  import spark.implicits._

  test("bucketed tables join with no shuffle exchange (co-located join)") {
    val left = (1L to 200L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 200L).map(i => (i, i * 2)).toDF("k2", "rv")
    Tables.writeBucketed(left, "spec_left_b", "k", 4)
    Tables.writeBucketed(right, "spec_right_b", "k2", 4)
    // AQE must be OFF for the assert to be real: with it on, executedPlan
    // is an AdaptiveSparkPlanExec wrapper whose inner plan collect() cannot
    // see, and the isEmpty assert passes vacuously
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    val joined = ss.table("spec_left_b")
      .join(ss.table("spec_right_b"), col("k") === col("k2"))
    assert(joined.count() === 200)
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(joined.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.nonEmpty, "expected the sort-merge path (guards assert from vacuity)")
    assert(shuffles.isEmpty, "bucketed join must not shuffle either side")
  }

  test("saltedSum equals the direct aggregation") {
    val df = (1L to 5000L).map(i => (if (i % 100 == 0) "cold" else "hot", i))
      .toDF("key", "v")
    val direct = df.groupBy("key").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val salted = Relational.saltedSum(df, Seq("key"), col("v"), col("v"), 16, "s")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(salted === direct)
  }

  test("probeSchema reads only the footer and returns field names") {
    val dir = java.nio.file.Files.createTempDirectory("probe").toString + "/t"
    Seq((1, "x")).toDF("a", "b").write.parquet(dir)
    assert(Tables.probeSchema(spark, dir).fieldNames.toSet === Set("a", "b"))
  }

  test("a filter on a partition column prunes the scan to one of four partitions") {
    val root = java.nio.file.Files.createTempDirectory("prune").toString
    val df = (1 to 1000).map(i => (i, 2020 + i % 4, s"v$i")).toDF("id", "year", "v")
    Tables.writePartitioned(df, root, Seq("year"))
    val q = Tables.globScan(spark, root).filter(col("year") === 2021).select("id")
    val scan = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, "partition filter was not pushed to the scan")
    // Hive-style pruning: the year=2021 directory is the ONLY one listed.
    val dirs = scan.relation.location.listFiles(scan.partitionFilters, Nil)
    assert(dirs.length === 1, s"expected 1 pruned partition, scanned ${dirs.length}")
    assert(q.count() === 250)
  }

  test("dynamic partition pruning injects a runtime filter from the dim side") {
    // the 100 TB shape: fact partitioned by the join key's functional
    // dependent; a selective dim filter prunes fact PARTITIONS at runtime
    // (the static test above needs the literal on the fact — DPP covers the
    // star-join case where selectivity lives on the dimension).
    val root = java.nio.file.Files.createTempDirectory("dpp").toString
    val fact = (1 to 1000).map(i => (i, i % 4, s"v$i")).toDF("id", "part_k", "v")
    Tables.writePartitioned(fact, root, Seq("part_k"))
    val dim = Seq((0, "keep"), (1, "drop"), (2, "drop"), (3, "drop"))
      .toDF("part_k", "tag")
    // stats-based benefit estimation vetoes DPP on KB-sized fixtures (the
    // ratio is derived from distinct counts it doesn't have); disable it on
    // an isolated child session — at real scale the stats path fires on its
    // own.  The dim is NOT hint-broadcast: it must be broadcast by SIZE for
    // the DPP subquery to reuse the exchange.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    val factSs = Tables.globScan(ss, root)
    dim.write.mode("overwrite").parquet(s"$root-dim") // DPP wants file scans
    val dimSs = ss.read.parquet(s"$root-dim")
    val q = factSs.join(dimSs.filter(col("tag") === "keep"), Seq("part_k"))
      .select("id")
    val planStr = q.queryExecution.sparkPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in the fact scan:\n$planStr")
    assert(q.count() === 250)
  }

  test("AQE splits a skewed join partition at runtime (OptimizeSkewedJoin)") {
    // The runtime half of the skew story (saltedSum is the static half):
    // one key owning most of a side must not pin the join to one straggler
    // task — AQE re-plans the oversized partition into parallel splits.
    // Thresholds assume production sizes; scale them down so the KB fixture
    // crosses them, on an isolated child session.
    val root = java.nio.file.Files.createTempDirectory("skew").toString
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    ss.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    // 50k rows on ONE hot key + a sprinkle of others, vs a small right side
    (1 to 50000).map(i => (if (i % 50 == 0) i.toLong % 7 else 0L, s"pad-$i-${"x" * 40}"))
      .toDF("k", "v").write.parquet(s"$root/fact")
    (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "tag")
      .write.parquet(s"$root/dim")
    // max(v) keeps the fat pad column flowing through the join shuffle —
    // column pruning would otherwise shrink the skewed partition below the
    // size threshold
    val q = ss.read.parquet(s"$root/fact")
      .join(ss.read.parquet(s"$root/dim"), Seq("k"))
      .groupBy("tag").agg(count(lit(1)).as("n"), max("v"))
    q.collect() // AQE decides while executing
    val finalPlan = q.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"expected the sort-merge join to be marked skew=true after AQE:\n$finalPlan")
  }

  test("runtime bloom filter prunes the fact scan when the join key is not a partition key") {
    // DPP's sibling for NON-partition join keys: a selective dim filter
    // builds a bloom filter at runtime and pushes might_contain onto the
    // fact scan — at 100 TB this is row-group/page skipping on arbitrary
    // keys, the shuffle-side complement of writeSorted's file skipping.
    val root = java.nio.file.Files.createTempDirectory("bloom").toString
    (1 to 100000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .write.parquet(s"$root/fact")
    (1 to 1000).map(i => (i.toLong, if (i % 100 == 0) "keep" else "drop"))
      .toDF("k", "tag").write.parquet(s"$root/dim")
    // size thresholds assume production-scale inputs; lower them on an
    // isolated child session so the KB-sized fixture qualifies
    val ss = spark.newSession()
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // the rule only fires for (probable) shuffle joins — a broadcast join
    // gets no bloom filter; at fixture scale force the shuffle path the
    // production-sized fact⋈fact join would take anyway
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fact = ss.read.parquet(s"$root/fact")
    val dim = ss.read.parquet(s"$root/dim").filter(col("tag") === "keep")
    val q = fact.join(dim, Seq("k")).select("v")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("bloom_filter_agg") || opt.contains("might_contain"),
      s"expected a runtime bloom filter in the optimized plan:\n$opt")
    assert(q.count() === 10)
  }

  test("compact rewrites a many-file dataset preserving contents") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = (1L to 10000L).map(i => (i, s"v$i")).toDF("id", "v")
    df.repartition(40).write.parquet(dir)
    def parts = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts === 40)
    val n = Tables.compact(spark, dir, targetBytes = 1024L * 1024 * 1024)
    assert(n === 1 && parts === 1)
    val back = spark.read.parquet(dir)
    assert(back.count() === 10000)
    assert(back.agg(sum("id")).head().getLong(0) === 10000L * 10001 / 2)
    // rename-aside swap cleans up after itself: no staging or backup dirs
    val leftovers = new java.io.File(dir).getParentFile.listFiles()
      .map(_.getName).filter(n => n.contains("__compact_") || n.contains("__precompact_"))
    assert(leftovers.isEmpty, s"leftover swap dirs: ${leftovers.mkString(", ")}")
  }

  test("writeSorted produces files with pairwise-disjoint sort-key ranges (stat skipping)") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.format.converter.ParquetMetadataConverter
    import org.apache.parquet.hadoop.ParquetFileReader
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("sorted").toString + "/t"
    // shuffled key order on the way in: the writer must impose the layout
    val df = (1L to 20000L).map(i => (i * 7919 % 20000, s"v$i")).toDF("k", "v")
    Tables.writeSorted(df, dir, nFiles = 4, sortCols = Seq("k"))
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length === 4)
    val conf = spark.sparkContext.hadoopConfiguration
    val ranges = files.toSeq.map { f =>
      val footer = ParquetFileReader.readFooter(conf, new Path(f.toString),
        ParquetMetadataConverter.NO_FILTER)
      val stats = footer.getBlocks.asScala.map(_.getColumns.asScala
        .find(_.getPath.toDotString == "k").get.getStatistics)
      (stats.map(_.genericGetMin.asInstanceOf[Long]).min,
        stats.map(_.genericGetMax.asInstanceOf[Long]).max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"file key ranges overlap: $ranges")
      case _ =>
    }
    assert(spark.read.parquet(dir).count() === 20000)
  }

  test("writeZOrder: a 2-D box query overlaps fewer files than the 1-D sorted layout") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.format.converter.ParquetMetadataConverter
    import org.apache.parquet.hadoop.ParquetFileReader
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    // full 128×128 grid, shuffled in: the writers must impose the layout
    val df = (0L until 16384L).map(i => (i * 6037 % 16384))
      .map(z => (z % 128, z / 128)).toDF("a", "b")
    // 32 files: the 1-D layout must overlap ~8 on an a-box while z-order
    // stays at a few even under repartitionByRange's sampling variance
    // (range boundaries depend on a per-RDD sample, so exact counts drift)
    Tables.writeZOrder(df, s"$base/z", nFiles = 32, "a", "b", bits = 7)
    Tables.writeSorted(df, s"$base/s", nFiles = 32, sortCols = Seq("a"))
    val conf = spark.sparkContext.hadoopConfiguration
    // files whose (a, b) bounding box meets the box a,b ∈ [0, 31]²
    def overlapping(dir: String): Int =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .count { f =>
          val footer = ParquetFileReader.readFooter(conf, new Path(f.toString),
            ParquetMetadataConverter.NO_FILTER)
          def range(name: String): (Long, Long) = {
            val st = footer.getBlocks.asScala.map(_.getColumns.asScala
              .find(_.getPath.toDotString == name).get.getStatistics)
            (st.map(_.genericGetMin.asInstanceOf[Long]).min,
              st.map(_.genericGetMax.asInstanceOf[Long]).max)
          }
          val (aMin, aMax) = range("a"); val (bMin, bMax) = range("b")
          aMin <= 31 && aMax >= 0 && bMin <= 31 && bMax >= 0
        }
    val zHit = overlapping(s"$base/z"); val sHit = overlapping(s"$base/s")
    // 1-D sort on `a`: files are a-narrow but b-FULL-WIDTH -> every file
    // whose a-range meets [0,31] matches (~8 of 32).  Z-order: the box is
    // one Morton quadrant -> a couple of z-contiguous files.
    assert(zHit < sHit, s"z-order ($zHit files) should beat 1-D sort ($sHit)")
    assert(zHit <= 6, s"box should live in a few z-contiguous files, hit $zHit")
    assert(spark.read.parquet(s"$base/z").count() === 16384)
  }

  test("generation lake: pinned as-of reads stay stable while publishing continues") {
    val root = java.nio.file.Files.createTempDirectory("genlake").toString + "/lake"
    assert(Tables.writeGeneration(Seq((1L, "a")).toDF("k", "v"), root) === 1)
    assert(Tables.writeGeneration(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), root) === 2)
    assert(Tables.listGenerations(spark, root) === Seq(1, 2))
    assert(Tables.readGeneration(spark, root, Some(1)).count() === 1,
      "as-of 1 must still see the first snapshot")
    assert(Tables.readGeneration(spark, root).count() === 2, "latest wins by default")
    assert(Tables.readGeneration(spark, root, Some(99)).count() === 2,
      "as-of beyond the newest resolves to the newest")
    intercept[IllegalArgumentException](Tables.readGeneration(spark, root, Some(0)))
    intercept[IllegalArgumentException](Tables.readGeneration(spark, s"$root-absent"))
  }

  test("parquet aggregate pushdown answers COUNT/MIN/MAX from footers") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("aggpush").toString + "/t"
    (1L to 5000L).map(i => (i, i % 97)).toDF("a", "b").write.parquet(dir)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    // pushdown exists only on the DSv2 scan; parquet defaults to v1
    ss.conf.set("spark.sql.sources.useV1SourceList", "")
    val agg = ss.read.parquet(dir)
      .agg(count(lit(1)).as("n"), min("a").as("mn"), max("a").as("mx"))
    assert(agg.queryExecution.sparkPlan.toString.contains("PushedAggregation"),
      "scan must carry the pushed aggregates (footer-stat answer, no data read)")
    val r = agg.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((5000L, 1L, 5000L)))
  }

  test("GraftSession recommends AQE + skew handling + extensions") {
    val conf = GraftSession.recommendedConf.toMap
    assert(conf("spark.sql.adaptive.enabled") === "true")
    assert(conf("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(conf("spark.sql.extensions") === "graft.functions.GraftExtensions")
    assert(conf("spark.sql.files.maxPartitionBytes").toLong === 128L * 1024 * 1024)
    // builder applies them without erroring (shared test session stays live)
    assert(GraftSession.builder("local[1]", 4) != null)
  }

  test("S11 withS3A sets fs.s3a credentials on the hadoop conf") {
    Tables.withS3A(spark, "AKIDEXAMPLE", "secretEXAMPLE",
      endpoint = Some("http://localhost:9000"), region = Some("us-west-2"))
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.access.key") === "AKIDEXAMPLE")
    assert(hc.get("fs.s3a.secret.key") === "secretEXAMPLE")
    assert(hc.get("fs.s3a.endpoint") === "http://localhost:9000")
    assert(hc.get("fs.s3a.endpoint.region") === "us-west-2")
  }
}
