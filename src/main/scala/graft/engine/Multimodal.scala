package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns — LLM-data north-star component (BASELINE.json).
  *
  * Images/audio/video travel as opaque `BINARY` columns plus typed metadata
  * structs; the Spark-side plumbing (schema, partitioning, batch iteration)
  * is real, while the codec itself is STUBBED (no image/audio libraries in
  * this container) behind `FakeCodec` — a deterministic fake that derives
  * "features" from the raw bytes, clearly marked for replacement.
  *
  * Scale notes: decode work is per-row CPU with no shuffle — `mapPartitions`
  * over the binary column keeps it embarrassingly parallel; metadata-only
  * operations stay in column expressions so Parquet scans prune the (large)
  * binary column away entirely when only metadata is referenced.
  */
object Multimodal {

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

  /** Decoded-media schema: what a real decoder would emit per payload. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, false),
    StructField("width", IntegerType, false),
    StructField("height", IntegerType, false),
    StructField("n_frames", IntegerType, false),
    StructField("features", ArrayType(DoubleType, false), false)))

  /** STUB decoder — deterministic fake in place of a real codec (***replace
    * with an actual image/audio decoder when libraries are available***).
    * Runs via `mapPartitions` so a real decoder drops in with zero plan
    * changes: per-partition batch iteration, no driver involvement. */
  def decodeStub(df: DataFrame, idCol: String, payload: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast(LongType), col(payload)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // FAKE: dimensions/frames derived from byte stats, features from a
        // strided byte sample — stands in for decode→resize→embed.
        val w = 64 + (bytes.length % 64)
        val h = 64 + (bytes.headOption.map(_.toInt & 0x7f).getOrElse(0) % 64)
        val frames = 1 + bytes.length % 8
        val feats = bytes.indices.by(math.max(1, bytes.length / 8)).take(8)
          .map(i => (bytes(i).toInt & 0xff) / 255.0).toArray
        Row(id, w, h, frames, feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
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
