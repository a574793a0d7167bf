package graft

import org.apache.spark.sql.functions._

import graft.engine.Multimodal

/** REAL image codec (engine/Multimodal.scala): javax.imageio PNG
  * encode→decode roundtrip, genuine-bytes checks, loud failure on
  * undecodable payloads, and the scan-pruning property of the typed
  * mapPartitions boundary. */
class MultimodalSpec extends SparkFunSuite {
  import spark.implicits._

  test("encodePng emits genuine PNG bytes; decodeImage recovers exact pixels") {
    // odd sizes exercise the quadrant-boundary rounding
    val df = Seq((1L, 9, 7), (2L, 8, 8), (3L, 16, 11)).toDF("doc_id", "w", "h")
    val enc = Multimodal.encodePng(df, "doc_id", col("w"), col("h"))
      .orderBy("doc_id").collect()
    assert(enc.length === 3)
    enc.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("png")
      // the 8-byte PNG signature: a real codec wrote these, not byte math
      assert(bytes.take(8).toSeq ===
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
        s"doc ${r.getLong(0)}: payload is not a PNG stream")
    }
    val dec = Multimodal.decodeImage(
        Multimodal.encodePng(df, "doc_id", col("w"), col("h")), "doc_id", "png")
      .orderBy("doc_id").collect()
    for ((r, (id, w, h)) <- dec.zip(Seq((1L, 9, 7), (2L, 8, 8), (3L, 16, 11)))) {
      assert(r.getAs[Int]("width") === w && r.getAs[Int]("height") === h,
        s"doc $id: decoded dimensions must come from the actual image header")
      val px = for (x <- 0 until w; y <- 0 until h)
        yield Multimodal.pixelValue(id, x, y)
      assert(r.getAs[Long]("px_sum") === px.map(_.toLong).sum, s"doc $id px_sum")
      assert(r.getAs[Int]("px_min") === px.min, s"doc $id px_min")
      assert(r.getAs[Int]("px_max") === px.max, s"doc $id px_max")
      // quadrant means against a reference split at 2x >= w / 2y >= h
      val ref = (0 until 4).map { q =>
        val cells = for {
          x <- 0 until w; y <- 0 until h
          if ((if (2 * x >= w) 2 else 0) + (if (2 * y >= h) 1 else 0)) == q
        } yield Multimodal.pixelValue(id, x, y).toLong
        cells.sum.toDouble / cells.size
      }
      assert(r.getAs[Seq[Double]]("features") === ref, s"doc $id features")
    }
  }

  test("resizeImage resamples by exact floor arithmetic: down, up, identity") {
    // 6x4 source; targets: downscale 3x2, upscale 12x8 (pixel duplication),
    // identity 6x4 — expected pixel p'(x,y) = pixelValue(id, x*6/dw, y*4/dh)
    val cases = Seq((1L, 3, 2), (2L, 12, 8), (3L, 6, 4))
    val df = cases.toDF("doc_id", "dw", "dh")
    val enc = Multimodal.encodePng(df, "doc_id", lit(6), lit(4))
      .join(df, "doc_id")
    val rsz = Multimodal.resizeImage(enc, "doc_id", "png", col("dw"), col("dh"))
      .orderBy("doc_id").collect()
    for ((r, (id, dw, dh)) <- rsz.zip(cases)) {
      assert(r.getInt(2) === dw && r.getInt(3) === dh,
        s"doc $id: resized dims ${r.getInt(2)}x${r.getInt(3)} != ${dw}x$dh")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("png")))
      assert(img.getWidth === dw && img.getHeight === dh)
      for (x <- 0 until dw; y <- 0 until dh)
        assert(img.getRaster.getSample(x, y, 0) ===
          Multimodal.pixelValue(id, x * 6 / dw, y * 4 / dh),
          s"doc $id pixel ($x,$y): wrong source sample")
    }
    // decoding the resized payload reports the resized geometry
    val dec = Multimodal.decodeImage(
        Multimodal.resizeImage(enc, "doc_id", "png", col("dw"), col("dh")),
        "doc_id", "png")
      .orderBy("doc_id").collect()
    for ((r, (id, dw, dh)) <- dec.zip(cases))
      assert(r.getInt(1) === dw && r.getInt(2) === dh,
        s"doc $id: decoded resized dims diverge")
  }

  test("encodeWav emits genuine RIFF/WAVE bytes; decodeWav recovers exact samples") {
    val df = Seq((1L, 5), (2L, 300), (3L, 64)).toDF("doc_id", "n")
    val enc = Multimodal.encodeWav(df, "doc_id", col("n")).orderBy("doc_id").collect()
    enc.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("wav")
      assert(new String(bytes.take(4), "US-ASCII") === "RIFF" &&
        new String(bytes.slice(8, 12), "US-ASCII") === "WAVE",
        s"doc ${r.getLong(0)}: payload is not a RIFF/WAVE stream")
    }
    val dec = Multimodal.decodeWav(
        Multimodal.encodeWav(df, "doc_id", col("n")), "doc_id", "wav")
      .orderBy("doc_id").collect()
    for ((r, (id, n)) <- dec.zip(Seq((1L, 5), (2L, 300), (3L, 64)))) {
      val ss = (0 until n).map(Multimodal.sampleValue(id, _))
      assert(r.getAs[Long]("n_samples") === n.toLong, s"doc $id frame count")
      assert(r.getAs[Int]("sample_rate") === 8000 && r.getAs[Int]("bits") === 8 &&
        r.getAs[Int]("channels") === 1,
        s"doc $id: header fields must come from the actual RIFF chunk")
      assert(r.getAs[Long]("s_sum") === ss.map(_.toLong).sum, s"doc $id s_sum")
      assert(r.getAs[Int]("s_min") === ss.min && r.getAs[Int]("s_max") === ss.max,
        s"doc $id extrema")
    }
  }

  test("decodeWav fails loudly on undecodable bytes") {
    val junk = Seq((9L, "not audio at all".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val e = intercept[Exception](
      Multimodal.decodeWav(junk, "doc_id", "payload").collect())
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("not a decodable audio stream"))
  }

  test("decodeImage fails loudly on undecodable bytes (quarantine, not fake)") {
    val junk = Seq((9L, "definitely not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val e = intercept[Exception](
      Multimodal.decodeImage(junk, "doc_id", "payload").collect())
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("not a decodable image"))
  }

  test("codec input select prunes the source scan to the consumed columns") {
    // a parquet-backed 'documents' slice with a fat text column: the
    // encode path consumes only (doc_id, n_chars), so the parquet
    // ReadSchema must not include text — at 100 TB the payload-free
    // branch must never lift the fat column off disk.
    val dir = java.nio.file.Files.createTempDirectory("mm_prune").toString
    Seq((1L, 20L, "x" * 1000), (2L, 9L, "y" * 1000))
      .toDF("doc_id", "n_chars", "text").write.parquet(dir + "/docs")
    val docs = spark.read.parquet(dir + "/docs").select("doc_id", "n_chars")
    val enc = Multimodal.encodePng(docs, "doc_id",
      lit(8) + col("doc_id") % 16, lit(8) + col("n_chars") % 16)
    val plan = enc.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("n_chars"),
      s"expected pruned scan, plan read: $readSchema")
    assert(!readSchema.contains("text"),
      s"the fat text column must be pruned from the scan: $readSchema")
    assert(Multimodal.decodeImage(enc, "doc_id", "png").count() === 2)
  }
}
