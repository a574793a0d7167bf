package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Graph, Text, TxTable, Vector}

/** Empirical scaling probe for the dedup/ANN/TxTable families: the 100 TB
  * claims elsewhere in this repo are BY CONSTRUCTION (bucketed equi-joins,
  * broadcast-bounded sides, segment pruning); this main buys data.  It
  * generates synthetic documents/embeddings at 1×/3×/10× the sf0.1 fixture
  * size (driver fixtures stop at sf0.1), runs each family, and prints
  * per-probe seconds plus the fitted scaling exponent
  * `ln(t_max/t_min)/ln(scale_max/scale_min)` — anything super-linear beyond
  * log factors is a bug report.  Results are recorded in COVERAGE.md.
  *
  * The generator preserves the RATE structure that matters for candidate
  * joins: every 10-doc group shares one near-duplicate pair (members 0/1
  * differ in the final word), all other docs are unique — so the duplicate
  * fraction, band-collision rate and edge density are scale-invariant and
  * the probe measures engine scaling, not workload drift.  Queries for the
  * ANN probes are a FIXED batch (the production shape: corpus grows, a
  * query batch does not).
  *
  * Usage: `runMain graft.ScaleProbe [multipliers...]` (default 1 3 10). */
object ScaleProbe {

  private def genDocs(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(39)), i =>
        substring(md5(concat(
          when(col("id") % 10 < 2 && !(col("id") % 10 === 1 && i === 39),
            col("id") - col("id") % 10).otherwise(col("id")).cast("string"),
          lit("_"), i.cast("string"))), 1, 6))).as("text"))

  private def genEmbeddings(spark: SparkSession, n: Long,
                            from: Long = 0L): DataFrame =
    spark.range(from, from + n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        (pmod(hash(col("id"), i), lit(2001)) - 1000).cast("double") / 1000.0)
        .as("embedding"))

  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val baseDocs = 5000L // the sf0.1 documents row count
    val baseVecs = 2000L // the sf0.1 embeddings row count
    val out = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.ArrayBuffer[(Int, Double)]]
    var warmup = true
    def time(probe: String, m: Int)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val dt = (System.nanoTime() - t0) / 1e9
      if (!warmup) {
        out.getOrElseUpdate(probe, scala.collection.mutable.ArrayBuffer.empty)
          .append((m, dt))
        println(f"""{"probe":"$probe","scale":$m,"rows":$rows,"sec":$dt%.2f}""")
      }
    }

    // WARMUP: run every probe once at the smallest scale untimed, so the
    // first timed pass doesn't absorb JVM/codegen/classloading costs (the
    // first uncorrected run showed NEGATIVE exponents — scale 1 paying ~3 s
    // of one-time Janino compilation the larger scales inherited for free)
    val passes = mults.min +: mults
    for (m <- passes) {
      val base = java.nio.file.Files.createTempDirectory(s"scaleprobe_$m").toString
      // materialize inputs as parquet (untimed) so every probe pays a
      // realistic scan, not a range-expression re-evaluation
      genDocs(spark, baseDocs * m).write.parquet(s"$base/documents")
      genEmbeddings(spark, baseVecs * m).write.parquet(s"$base/embeddings")
      val docs = spark.read.parquet(s"$base/documents")
      val emb = spark.read.parquet(s"$base/embeddings")

      // 1) MinHash pipeline: shingle → signature → bands → candidate
      //    equi-join → exact-Jaccard verify
      time("minhash_pipeline", m) {
        Text.verifiedPairs(docs, "text", "doc_id",
          Text.minhashCandidates(Text.minhashBands(docs, "text", "doc_id")), 0.5)
          .count()
      }
      // 1b) the CCNet line layer + perplexity filter: one line-key shuffle
      //     (boilerplate cut) and a char-bigram model join whose model side
      //     is |alphabet|²-bounded — both must stay ~linear in the corpus
      time("line_boilerplate", m) {
        Text.lineBoilerplate(docs, "text", "doc_id", 10, 2).count()
      }
      time("bigram_lm", m) {
        Text.bigramLmScore(docs, "doc_id", "text", col("doc_id") % 2 === 0)
          .count()
      }
      // 2) connected components over the candidate edges (pre-materialized,
      //    untimed, so the probe times the graph iteration alone)
      Text.minhashCandidates(Text.minhashBands(docs, "text", "doc_id"))
        .write.parquet(s"$base/edges")
      val edges = spark.read.parquet(s"$base/edges")
      time("connected_components", m) {
        Graph.connectedComponents(edges, "doc_a", "doc_b").count()
      }
      // 3/4) ANN over a FIXED 50-query batch as the corpus grows
      val queries = emb.filter(col("vec_id") < 50)
      time("lsh_topk", m) { Vector.lshTopK(queries, emb, 10).count() }
      time("ivf_topk", m) { Vector.ivfTopK(queries, emb, 10, 64, 8).count() }
      // IVF-PQ: 64×64 coarse terms AND 64×64 codebook terms — both argmins
      // take the row path past the codegen budget (the ScaleProbe finding
      // that motivated it), so this probes the 100 TB index shape end-to-end
      time("ivf_pq_topk", m) {
        Vector.ivfPqTopK(queries, emb, 10, nlist = 64, nprobe = 8,
          m = 8, kCode = 64).count()
      }
      // 5) TxTable: segment-pruned merge of a 10% update batch into a
      //    3-segment table (append cost untimed)
      val root = s"$base/tx"
      val fact = emb.select(col("vec_id").as("k"),
        element_at(col("embedding"), 1).as("v"))
      (0 until 3).foreach(i =>
        TxTable.commitAppend(spark, root, fact.filter(col("k") % 3 === i)))
      time("tx_merge", m) {
        TxTable.commitMerge(spark, root,
          fact.filter(col("k") % 10 === 0).select(col("k"), (col("v") + 1.0).as("v")),
          Seq("k"), Seq("v"), Nil)
      }
      // 6) ANN index maintenance: the incremental delta apply
      //    (q_tx_ann_incremental's shape — assign a FIXED 200-vector batch
      //    under the frozen quantizer, append one stats-tracked segment,
      //    deletion-vector a FIXED 100-key takedown) must cost O(delta),
      //    while a rebuild (re-assign + overwrite + re-cluster) costs
      //    O(corpus).  The CONTRAST of the two exponents is the 100 TB
      //    argument: at a growing corpus the incremental curve stays flat.
      //    The takedown key list is generated directly (a real takedown
      //    arrives as a list, not a corpus scan).
      val cents = Vector.coarseCentroids(emb, 16)
      def toIdx(rows: DataFrame) = Vector.coarseAssignWith(rows, cents)
        .select(col("c_id").as("vec_id"),
          col("list_id").cast("long").as("list_id"), col("cv"))
      val idxRoot = s"$base/annidx"
      TxTable.commitOverwriteClustered(spark, idxRoot, toIdx(emb),
        Seq("list_id"), numSegments = 16)
      genEmbeddings(spark, 200, from = baseVecs * m)
        .write.parquet(s"$base/delta")
      val delta = spark.read.parquet(s"$base/delta")
      val tombs = spark.range(100)
        .select((col("id") * 20 + 7).as("vec_id"))
      time("ann_incremental", m) {
        TxTable.commitAppend(spark, idxRoot, toIdx(delta),
          statsCols = Seq("list_id"))
        TxTable.commitDeleteVectors(spark, idxRoot, tombs, Seq("vec_id"))
        200L
      }
      time("ann_rebuild", m) {
        val all = emb.unionByName(delta)
        TxTable.commitOverwriteClustered(spark, idxRoot, toIdx(all),
          Seq("list_id"), numSegments = 16)
        baseVecs * m + 200L
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
      warmup = false
    }

    for ((probe, ts) <- out.toSeq.sortBy(_._1); if ts.size >= 2) {
      val (m0, t0) = ts.minBy(_._1); val (m1, t1) = ts.maxBy(_._1)
      val exp = math.log(t1 / t0) / math.log(m1.toDouble / m0)
      println(f"""{"probe":"$probe","exponent":$exp%.2f}""")
    }
    spark.stop()
  }
}
