package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns — LLM-data north-star component (BASELINE.json).
  *
  * Images/audio/video travel as opaque `BINARY` columns plus typed metadata
  * structs.  The codec boundary here is REAL: [[encodePng]] renders
  * deterministic grayscale images and encodes genuine PNG bytes through the
  * JDK's `javax.imageio` (zero new dependencies), and [[decodeImage]]
  * decodes those bytes back — actual PNG parsing, actual width/height,
  * actual pixel statistics — mirroring the reference's one opaque-bytes →
  * structured-rows operator (the Textract extraction boundary,
  * `src/etl/ingest_harvest_data.py:132-174`).  [[decodeStub]] remains as
  * the declared deterministic FALLBACK for payloads with no registered
  * codec (e.g. the fixtures' utf-8 text payloads).
  *
  * Scale notes: codec work is per-row CPU with no shuffle — typed
  * `Dataset.mapPartitions` over the binary column keeps it embarrassingly
  * parallel AND keeps Catalyst in charge of the plan above and below (the
  * input `select` prunes the scan to exactly the consumed columns, unlike
  * an RDD drop-out, which would defeat column pruning).  Metadata-only
  * operations stay in column expressions so Parquet scans prune the (large)
  * binary column away entirely when only metadata is referenced.
  */
object Multimodal {

  /** One encoded image: `png` is a genuine PNG byte stream. */
  final case class EncodedImage(doc_id: Long, png: Array[Byte])

  /** One decoded image: real dimensions + pixel statistics from the
    * decoded raster, plus a 4-dim feature vector (quadrant mean
    * luminances) — the tiny-but-real embedding a downstream ANN stage
    * consumes. */
  final case class DecodedImage(doc_id: Long, width: Int, height: Int,
      px_sum: Long, px_min: Int, px_max: Int, features: Array[Double])

  private case class StubDecoded(doc_id: Long, width: Int, height: Int,
      n_frames: Int, features: Seq[Double])

  /** Attach a binary payload column (fixtures carry no real media, so the
    * utf-8 bytes of a text column stand in as the opaque payload). */
  def withBinaryPayload(df: DataFrame, from: String, as: String = "payload"): DataFrame =
    df.withColumn(as, col(from).cast(BinaryType))

  /** Metadata extraction as pure column expressions (codegen'd, prunable):
    * byte length, leading-byte "magic", a coarse format guess. */
  def payloadMeta(df: DataFrame, payload: String): DataFrame =
    df.withColumn("n_bytes", length(col(payload)).cast(LongType))
      .withColumn("magic", ascii(substring(col(payload).cast(StringType), 1, 1)).cast(LongType))
      .withColumn("format",
        when(col("n_bytes") % 3 === 0, "jpeg-like")
          .when(col("n_bytes") % 3 === 1, "png-like")
          .otherwise("wav-like"))

  /** The deterministic pixel formula behind [[encodePng]]: grayscale value
    * of pixel (x, y) of document `id`.  Closed-form so an external oracle
    * can recompute every decoded statistic without an image library —
    * which is what makes the REAL decode verifiable end-to-end. */
  @inline def pixelValue(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** Render a `w×h` grayscale image per row from [[pixelValue]] and encode
    * it as REAL PNG bytes via the JDK's `javax.imageio` — no external
    * libraries, genuinely decodable by any PNG reader.  Typed
    * `mapPartitions`: the input select prunes the source scan to
    * `(id, w, h)`; encode is per-row CPU, shuffle-free, embarrassingly
    * parallel across executors. */
  def encodePng(df: DataFrame, idCol: String, wCol: Column, hCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), wCol.cast(IntegerType), hCol.cast(IntegerType))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
        it.map { case (id, w, h) =>
          require(w >= 1 && h >= 1, s"encodePng: degenerate ${w}x$h image for doc $id")
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var x = 0
          while (x < w) {
            var y = 0
            while (y < h) { raster.setSample(x, y, 0, pixelValue(id, x, y)); y += 1 }
            x += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(img, "png", bos),
            "encodePng: this JRE has no PNG writer")
          EncodedImage(id, bos.toByteArray)
        }
      }.toDF()
  }

  /** REAL image decode: parse the payload bytes with `javax.imageio`
    * (PNG/JPEG/BMP/GIF — whatever the JRE's readers handle), then walk the
    * decoded raster for genuine width/height, pixel sum/min/max, and the
    * 4-dim quadrant-mean feature vector.  Fails loudly on undecodable
    * bytes — a corrupt payload is data to quarantine upstream, not to
    * fake.  Same typed-`mapPartitions` shape as [[encodePng]]: pruned
    * input, per-row CPU, no shuffle, no driver involvement.  Quadrant
    * split: x-halves at `2x >= w`, y-halves at `2y >= h` (the low half
    * gets the extra row/column on odd sizes). */
  def decodeImage(df: DataFrame, idCol: String, payload: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payload).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          require(bytes != null && bytes.nonEmpty, s"decodeImage: empty payload for doc $id")
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"decodeImage: payload of doc $id is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
          val qSum = new Array[Long](4); val qCnt = new Array[Long](4)
          var x = 0
          while (x < w) {
            var y = 0
            while (y < h) {
              val p = raster.getSample(x, y, 0)
              sum += p; if (p < mn) mn = p; if (p > mx) mx = p
              val q = (if (2 * x >= w) 2 else 0) + (if (2 * y >= h) 1 else 0)
              qSum(q) += p; qCnt(q) += 1
              y += 1
            }
            x += 1
          }
          DecodedImage(id, w, h, sum, mn, mx,
            Array.tabulate(4)(i => if (qCnt(i) == 0) 0.0 else qSum(i).toDouble / qCnt(i)))
        }
      }.toDF()
  }

  /** One resized image: re-encoded REAL PNG bytes of the resampled raster,
    * plus the target dimensions actually written. */
  final case class ResizedImage(doc_id: Long, png: Array[Byte],
      width: Int, height: Int)

  /** REAL image resize: decode the payload with `javax.imageio`, resample
    * the raster to `dstW × dstH`, re-encode genuine PNG bytes.  The
    * resample is EXACT nearest-neighbor in integer arithmetic —
    * `src = (dst * srcDim) / dstDim` with floor division — deliberately
    * NOT `Graphics2D` interpolation, whose rounding is implementation
    * detail of the JRE's rendering pipeline: this way the resampled pixel
    * grid is closed-form (`p'(x,y) = p(x·w/w', y·h/h')`), so an external
    * oracle can recompute the resized image's statistics exactly, and the
    * op behaves identically on every executor JVM.  Handles up- and
    * down-scaling (upscale duplicates source pixels).  Same typed
    * `mapPartitions` scale shape as [[encodePng]]: pruned input, per-row
    * CPU, no shuffle. */
  def resizeImage(df: DataFrame, idCol: String, payload: String,
                  dstW: Column, dstH: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payload).cast(BinaryType),
        dstW.cast(IntegerType), dstH.cast(IntegerType))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes, dw, dh) =>
          require(dw >= 1 && dh >= 1, s"resizeImage: degenerate ${dw}x$dh target for doc $id")
          require(bytes != null && bytes.nonEmpty, s"resizeImage: empty payload for doc $id")
          val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(src != null, s"resizeImage: payload of doc $id is not a decodable image")
          val (sw, sh) = (src.getWidth, src.getHeight)
          val srcRaster = src.getRaster
          val out = new java.awt.image.BufferedImage(
            dw, dh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = out.getRaster
          var x = 0
          while (x < dw) {
            val sx = x * sw / dw
            var y = 0
            while (y < dh) {
              raster.setSample(x, y, 0, srcRaster.getSample(sx, y * sh / dh, 0))
              y += 1
            }
            x += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(out, "png", bos),
            "resizeImage: this JRE has no PNG writer")
          ResizedImage(id, bos.toByteArray, dw, dh)
        }
      }.toDF()
  }

  /** CONSTANT-tile PNG encode: one `w×h` image per row, every pixel equal
    * to `valueCol` (0-255).  Exists for oracle-checking interpolating
    * resamplers ([[resizeImageBilinear]]): any convex-combination filter
    * maps a constant image to the same constant, so the resized statistics
    * are closed-form regardless of the JRE's interpolation rounding.  Same
    * typed-`mapPartitions` shape as [[encodePng]]. */
  def encodeConstPng(df: DataFrame, idCol: String, valueCol: Column,
                     wCol: Column, hCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), valueCol.cast(IntegerType),
        wCol.cast(IntegerType), hCol.cast(IntegerType))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, v, w, h) =>
          require(w >= 1 && h >= 1, s"encodeConstPng: degenerate ${w}x$h image for doc $id")
          require(v >= 0 && v <= 255, s"encodeConstPng: value $v outside [0,255] for doc $id")
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var x = 0
          while (x < w) {
            var y = 0
            while (y < h) { raster.setSample(x, y, 0, v); y += 1 }
            x += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(img, "png", bos),
            "encodeConstPng: this JRE has no PNG writer")
          EncodedImage(id, bos.toByteArray)
        }
      }.toDF()
  }

  /** BILINEAR image resize — the interpolating sibling of [[resizeImage]]
    * for training pipelines that want smooth downscales rather than
    * nearest-neighbor aliasing: decode, resample via `Graphics2D` with the
    * bilinear `RenderingHints` set EXPLICITLY (never the platform default,
    * which varies), re-encode real PNG bytes.  Interpolated pixel values
    * are a convex combination of source pixels, so they are NOT
    * closed-form across JREs — the oracle strategy is constant tiles
    * ([[encodeConstPng]]), which every convex filter must map to the same
    * constant.  Same typed-`mapPartitions` scale shape: pruned input,
    * per-row CPU, no shuffle. */
  def resizeImageBilinear(df: DataFrame, idCol: String, payload: String,
                          dstW: Column, dstH: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payload).cast(BinaryType),
        dstW.cast(IntegerType), dstH.cast(IntegerType))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes, dw, dh) =>
          require(dw >= 1 && dh >= 1,
            s"resizeImageBilinear: degenerate ${dw}x$dh target for doc $id")
          require(bytes != null && bytes.nonEmpty,
            s"resizeImageBilinear: empty payload for doc $id")
          val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(src != null,
            s"resizeImageBilinear: payload of doc $id is not a decodable image")
          val out = new java.awt.image.BufferedImage(
            dw, dh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val g = out.createGraphics()
          try {
            import java.awt.RenderingHints._
            g.setRenderingHint(KEY_INTERPOLATION, VALUE_INTERPOLATION_BILINEAR)
            g.setRenderingHint(KEY_RENDERING, VALUE_RENDER_QUALITY)
            g.setRenderingHint(KEY_ANTIALIASING, VALUE_ANTIALIAS_OFF)
            g.drawImage(src, 0, 0, dw, dh, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(out, "png", bos),
            "resizeImageBilinear: this JRE has no PNG writer")
          ResizedImage(id, bos.toByteArray, dw, dh)
        }
      }.toDF()
  }

  /** One encoded audio clip: `wav` is a genuine RIFF/WAVE byte stream. */
  final case class EncodedAudio(doc_id: Long, wav: Array[Byte])

  /** One decoded clip: real header fields (sample rate / bit depth /
    * channels parsed from the RIFF chunk) + PCM sample statistics. */
  final case class DecodedAudio(doc_id: Long, n_samples: Long, sample_rate: Int,
      bits: Int, channels: Int, s_sum: Long, s_min: Int, s_max: Int)

  /** The deterministic PCM formula behind [[encodeWav]]: unsigned 8-bit
    * sample `i` of document `id` — closed-form for the oracle, like
    * [[pixelValue]]. */
  @inline def sampleValue(id: Long, i: Int): Int = ((id * 31 + i * 7) % 256).toInt

  /** Render `n` samples of [[sampleValue]] per row as REAL WAV bytes via
    * the JDK's `javax.sound.sampled` (8 kHz, 8-bit unsigned PCM, mono) —
    * the audio sibling of [[encodePng]]: genuine RIFF container written by
    * an actual codec, no external libraries, decodable by any WAV
    * reader.  Same typed-`mapPartitions` scale shape. */
  def encodeWav(df: DataFrame, idCol: String, nCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), nCol.cast(IntegerType))
      .as[(Long, Int)]
      .mapPartitions { it =>
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
        it.map { case (id, n) =>
          require(n >= 1, s"encodeWav: degenerate $n-sample clip for doc $id")
          val raw = Array.tabulate(n)(i => sampleValue(id, i).toByte)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          EncodedAudio(id, bos.toByteArray)
        }
      }.toDF()
  }

  /** REAL audio decode: parse the payload with `javax.sound.sampled`
    * (whatever containers the JRE's readers handle — WAV/AIFF/AU), read
    * the genuine header fields and the PCM frames, and emit sample
    * statistics.  Fails loudly on undecodable bytes, same contract as
    * [[decodeImage]].  8-bit unsigned PCM samples are the stored bytes
    * (`b & 0xff`). */
  def decodeWav(df: DataFrame, idCol: String, payload: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payload).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          require(bytes != null && bytes.nonEmpty, s"decodeWav: empty payload for doc $id")
          val ais =
            try javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            catch {
              case e: javax.sound.sampled.UnsupportedAudioFileException =>
                throw new IllegalArgumentException(
                  s"decodeWav: payload of doc $id is not a decodable audio stream", e)
            }
          val fmt = ais.getFormat
          val data = ais.readAllBytes()
          var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
          var i = 0
          while (i < data.length) {
            val s = data(i) & 0xff
            sum += s; if (s < mn) mn = s; if (s > mx) mx = s
            i += 1
          }
          DecodedAudio(id, data.length.toLong, fmt.getSampleRate.toInt,
            fmt.getSampleSizeInBits, fmt.getChannels, sum, mn, mx)
        }
      }.toDF()
  }

  /** Decoded-media schema of the FALLBACK stub decoder. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, false),
    StructField("width", IntegerType, false),
    StructField("height", IntegerType, false),
    StructField("n_frames", IntegerType, false),
    StructField("features", ArrayType(DoubleType, false), false)))

  /** FALLBACK decoder for payloads with no registered codec (the fixtures'
    * utf-8 text payloads are not images): deterministic byte math standing
    * in for decode→resize→embed, loudly labeled.  The REAL path is
    * [[decodeImage]].  Typed `mapPartitions` (not an RDD drop-out), so the
    * payload scan prunes to exactly `(id, payload)` and the plan stays
    * under Catalyst above and below the codec boundary. */
  def decodeStub(df: DataFrame, idCol: String, payload: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payload).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, raw) =>
          val bytes = if (raw == null) Array.emptyByteArray else raw
          // FAKE: dimensions/frames derived from byte stats, features from a
          // strided byte sample — stands in for decode→resize→embed.
          val w = 64 + (bytes.length % 64)
          val h = 64 + (bytes.headOption.map(_.toInt & 0x7f).getOrElse(0) % 64)
          val frames = 1 + bytes.length % 8
          val feats = bytes.indices.by(math.max(1, bytes.length / 8)).take(8)
            .map(i => (bytes(i).toInt & 0xff) / 255.0)
          StubDecoded(id, w, h, frames, feats)
        }
      }.toDF()
  }

  /** Frame sampling: every `stride`-th byte of the payload (stands in for
    * every-nth-frame extraction) — pure expressions, fully pushed down.
    * Empty/null text guard: `sequence(1, 0)` DESCENDS rather than producing
    * an empty range (the same hazard Text.shingles guards), so short inputs
    * take an explicit zero branch. */
  def sampleChecksum(df: DataFrame, textCol: String, stride: Int): DataFrame =
    df.withColumn("sample_checksum",
      when(length(col(textCol)) >= 1,
        aggregate(sequence(lit(1), length(col(textCol)), lit(stride)), lit(0L),
          (acc, i) => acc + ascii(col(textCol).substr(i, lit(1)))))
        .otherwise(lit(0L)))

  /** Every-`stride`-th-frame explode: one output ROW per sampled frame with
    * a per-frame signature — the batch shape a video pipeline hands to the
    * embedding stage (decode is the stub; the row-per-frame plumbing,
    * explode fanout, and downstream schema are the real thing).  Frame
    * count mirrors [[decodeStub]]'s fake (1 + len % 8); the signature
    * probes a deterministic byte per frame.  Pure column expressions —
    * shuffle-free, prunable, and empty payloads take the explicit
    * zero-frame guard rather than feeding `pmod(_, 0)`. */
  def sampleFrames(df: DataFrame, idCol: String, textCol: String,
                   stride: Int): DataFrame = {
    val len = length(col(textCol))
    df.withColumn("n_frames", (lit(1) + len % 8).cast(IntegerType))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumn("frame_sig",
        when(len >= 1,
          ascii(col(textCol).substr(pmod(col("frame_idx") * 7, len) + 1, lit(1))))
          .otherwise(lit(0)).cast(LongType))
      .select(col(idCol), col("n_frames"), col("frame_idx"), col("frame_sig"))
  }
}
