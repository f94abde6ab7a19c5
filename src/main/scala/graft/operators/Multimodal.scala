package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.functions.TextFunctions

/** Multimodal-column plumbing for the training-data pipeline: media payloads
  * as opaque `binary` columns with typed metadata, decode / feature-extract /
  * frame-sample stages.
  *
  * The image/audio codecs are NOT available in this environment, so the
  * decode kernels are STUBS — deterministic functions of the payload bytes,
  * clearly marked below. Everything around them is real Spark plumbing and is
  * what matters at 100 TB: binary columns ride through parquet scans
  * untouched, the decode stage is a typed `mapPartitions` (one JVM-side batch
  * iterator per partition — swap the stub for JNI/FFmpeg/ImageIO without
  * changing the plan shape), features are fixed-width arrays, and frame
  * sampling explodes bounded per-row sequences. No shuffle anywhere until a
  * consumer aggregates.
  *
  * The media table is derived deterministically from `documents` (payload =
  * UTF-8 bytes of the text; kind cycles image/audio/video by doc_id) because
  * the driver testdata has no native binary table.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  case class MetaRow(media_id: Long, kind: String, n_bytes: Long,
                     width: Long, height: Long, channels: Long)
  case class FeatureRow(media_id: Long, features: Array[Double])

  private implicit val mediaEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  private implicit val frameEnc: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  private implicit val metaEnc: Encoder[MetaRow] = Encoders.product[MetaRow]
  private implicit val featEnc: Encoder[FeatureRow] = Encoders.product[FeatureRow]

  val Kinds = Seq("image", "audio", "video")

  /** documents → media table: (media_id, kind, content binary). */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      element_at(lit(Kinds.toArray), (col("doc_id") % Kinds.size).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("content"))

  /** Polynomial hash of a byte slice — the deterministic stand-in for a real
    * decoded-pixel digest. Mirrors TextFunctions.charHash exactly so the
    * DuckDB oracle can replay it. */
  private def sliceHash(bytes: Array[Byte], from: Int, len: Int): Long = {
    var acc = 0L
    var i = from
    val end = math.min(from + len, bytes.length)
    while (i < end) { acc = (acc * 31L + (bytes(i) & 0xffL)) % TextFunctions.HashMod; i += 1 }
    acc
  }

  /** Decode stage: binary → typed metadata via `mapPartitions`.
    *
    * STUB CODEC: a real implementation would parse image headers / audio
    * containers here; this one derives deterministic fake dimensions from the
    * payload (width = 64 + len % 640, height = 64 + hash % 480, channels = 3)
    * so the pipeline is testable end-to-end without codec libraries. */
  def decodeMeta(spark: SparkSession, sfDir: String): Dataset[MetaRow] =
    mediaTable(spark, sfDir).as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val n = m.content.length.toLong
        val h = sliceHash(m.content, 0, m.content.length)
        MetaRow(m.media_id, m.kind, n, 64L + n % 640L, 64L + h % 480L, 3L)
      }
    }

  /** Feature-extraction stage: binary → fixed-width Array[Double] via
    * `mapPartitions` (the embedding-model stand-in; batch shape = one
    * partition iterator, exactly where a real model would run batched
    * inference). STUB KERNEL: feature j = normalized polynomial hash of the
    * j-th of `dim` equal byte slices. */
  def extractFeatures(spark: SparkSession, sfDir: String, dim: Int = 8): Dataset[FeatureRow] =
    mediaTable(spark, sfDir).as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val slice = m.content.length / dim
        val fs = Array.tabulate(dim) { j =>
          if (slice == 0) 0.0
          else (sliceHash(m.content, j * slice, slice) % 1000L).toDouble / 1000.0
        }
        FeatureRow(m.media_id, fs)
      }
    }

  case class ResizedRow(media_id: Long, orig_bytes: Long, resized_bytes: Long,
                        resized: Array[Byte])
  private implicit val resizedEnc: Encoder[ResizedRow] = Encoders.product[ResizedRow]

  /** Resize stage: deterministic `factor`-fold downsample keeping every
    * factor-th byte starting at offset 0 (STUB for a real image resampler —
    * the batch shape, binary-in/binary-out via `mapPartitions`, is what a
    * JNI-backed implementation would keep). */
  def resize(spark: SparkSession, sfDir: String, factor: Int = 3): Dataset[ResizedRow] =
    mediaTable(spark, sfDir).as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val out = new Array[Byte]((m.content.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = m.content(i * factor); i += 1 }
        ResizedRow(m.media_id, m.content.length.toLong, out.length.toLong, out)
      }
    }

  /** Frame-sampling stage for video payloads: every 256-byte block is a
    * "frame" (STUB for real frame decode); sample the first `maxFrames`,
    * emit (media_id, frame_idx, frame_hash). Bounded explode per row. */
  def sampleFrames(spark: SparkSession, sfDir: String,
                   frameBytes: Int = 256, maxFrames: Int = 8): DataFrame = {
    val video = mediaTable(spark, sfDir).filter(col("kind") === "video").as[MediaRow]
    val frames = video.flatMap { m =>
      val n = math.min(m.content.length / frameBytes, maxFrames)
      (0 until n).map(i => (m.media_id, i.toLong, sliceHash(m.content, i * frameBytes, frameBytes)))
    }
    frames.toDF("media_id", "frame_idx", "frame_hash")
  }

  /** The three stages as registered queries (metadata join keeps it one
    * narrow scan; ordering fixed for the oracle). */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    decodeMeta(spark, sfDir).toDF().orderBy(col("media_id"))

  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(spark, sfDir).toDF()
      .select(col("media_id"), posexplode(col("features")))
      .withColumnRenamed("pos", "feature_idx").withColumnRenamed("col", "feature")
      .withColumn("feature_idx", col("feature_idx").cast("long"))
      .orderBy(col("media_id"), col("feature_idx"))

  def videoFrames(spark: SparkSession, sfDir: String): DataFrame =
    sampleFrames(spark, sfDir).orderBy(col("media_id"), col("frame_idx"))

  def mediaResized(spark: SparkSession, sfDir: String): DataFrame =
    resize(spark, sfDir).toDF()
      .select(col("media_id"), col("orig_bytes"), col("resized_bytes"),
              md5(col("resized")).as("resized_md5"))
      .orderBy(col("media_id"))
}
