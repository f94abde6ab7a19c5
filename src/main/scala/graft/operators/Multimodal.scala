package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{MediaCodecs, Tables}
import graft.io.MediaCodecs.{PngCodec, VideoContainer, WavCodec}
import graft.functions.TextFunctions

/** Multimodal-column pipeline for training data: media payloads as opaque
  * `binary` columns with typed metadata, and decode / feature-extract /
  * resize / frame-sample stages over them.
  *
  * The payloads are REAL media files and the decode stages parse the ACTUAL
  * bytes: images are valid PNGs (decoded by chunk walk + CRC check + inflate
  * + defilter — [[graft.io.MediaCodecs.PngCodec]], which also parses
  * foreign-encoded PNGs such as javax.imageio's), audio is RIFF/WAVE 16-bit
  * PCM, video is a container of independently decodable PNG frames. The
  * driver testdata has no native binary table, so payloads are SYNTHESIZED
  * deterministically: every dimension/sample-count/pixel value is a known
  * closed-form function of doc_id, which is what keeps the DuckDB oracle
  * closed-form while the Spark side round-trips genuine files.
  *
  * What matters at 100 TB is unchanged: binary columns ride through parquet
  * scans untouched, every decode stage is a typed `mapPartitions` (one
  * JVM-side iterator per partition — swap the JVM codec for JNI/FFmpeg
  * without changing the plan shape), features are fixed-width arrays, frame
  * sampling explodes bounded per-row sequences, and nothing shuffles until a
  * consumer aggregates.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  /** width/height are the two primary axes of each modality: image/video →
    * pixel dimensions (parsed from the PNG IHDR), audio → (sample count,
    * sample rate) (parsed from the RIFF data/fmt chunks). */
  case class MetaRow(media_id: Long, kind: String, n_bytes: Long,
                     width: Long, height: Long, channels: Long)
  case class FeatureRow(media_id: Long, features: Array[Double])

  private implicit val mediaEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  private implicit val frameEnc: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  private implicit val metaEnc: Encoder[MetaRow] = Encoders.product[MetaRow]
  private implicit val featEnc: Encoder[FeatureRow] = Encoders.product[FeatureRow]
  private implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  val Kinds = Seq("image", "audio", "video")
  def kindOf(id: Long): String = Kinds((id % 3).toInt)

  // ---- synthesis parameters: closed-form in doc_id, mirrored verbatim in
  // ---- the oracle SQL (SparkEntry.mmOracle) ----
  private val ByteMod = 1000003L
  val AudioRate = 8000
  /** Content byte `i` of frame `f` (f=0 for image/audio). */
  def byteAt(id: Long, f: Int, i: Int): Int =
    (((id % ByteMod) * 31 + f.toLong * 97 + i) % 256).toInt
  def imageW(id: Long): Int = 16 + (id % 32).toInt
  def imageH(id: Long): Int = 8 + (id % 16).toInt
  def audioSamples(id: Long): Int = 64 + (id % 512).toInt
  def videoW(id: Long): Int = 8 + (id % 8).toInt
  def videoH(id: Long): Int = 8 + (id % 4).toInt
  def videoFrames(id: Long): Int = 2 + (id % 7).toInt

  private def framePixels(id: Long, f: Int, len: Int): Array[Byte] =
    Array.tabulate(len)(i => byteAt(id, f, i).toByte)

  /** The real encoded payload for one document id. */
  def payload(id: Long): Array[Byte] = kindOf(id) match {
    case "image" =>
      PngCodec.encode(imageW(id), imageH(id),
        framePixels(id, 0, imageW(id) * imageH(id) * 3))
    case "audio" =>
      WavCodec.encode(AudioRate,
        Array.tabulate(audioSamples(id))(t => byteAt(id, 0, t).toShort))
    case _ =>
      VideoContainer.encode((0 until videoFrames(id)).map(f =>
        PngCodec.encode(videoW(id), videoH(id),
          framePixels(id, f, videoW(id) * videoH(id) * 3))))
  }

  /** documents → media table: (media_id, kind, content binary), the content
    * a genuine PNG / WAV / PNG-frame container per id. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .mapPartitions(ids => ids.map(id => MediaRow(id, kindOf(id), payload(id))))
      .toDF()

  /** Polynomial hash over decoded sample values — mirrors
    * TextFunctions-style hashing so the oracle replays it with
    * list_reduce. */
  private def valueHash(vs: Array[Int], from: Int, len: Int): Long = {
    var acc = 0L
    var i = from
    val end = math.min(from + len, vs.length)
    while (i < end) { acc = (acc * 31L + vs(i)) % TextFunctions.HashMod; i += 1 }
    acc
  }

  /** The decoded PRIMARY sample array of a payload: image → defiltered RGB
    * pixel bytes, audio → PCM sample values, video → frame 0's pixels.
    * This is a REAL decode (inflate + defilter / RIFF walk), not a byte
    * passthrough. */
  private def primaryValues(m: MediaRow): Array[Int] = m.kind match {
    case "image" => PngCodec.decode(m.content).pixels.map(_ & 0xff)
    case "audio" => WavCodec.decode(m.content).samples
    case _       => PngCodec.decode(VideoContainer.decode(m.content).head).pixels.map(_ & 0xff)
  }

  /** Decode stage: binary → typed metadata via `mapPartitions`, parsing the
    * actual container bytes (PNG IHDR dimensions + color type; WAV fmt/data
    * chunks; GRFV first-frame header). */
  def decodeMeta(spark: SparkSession, sfDir: String): Dataset[MetaRow] =
    mediaTable(spark, sfDir).as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val n = m.content.length.toLong
        m.kind match {
          case "image" =>
            val img = PngCodec.decode(m.content)
            MetaRow(m.media_id, m.kind, n, img.width, img.height, img.channels)
          case "audio" =>
            val a = WavCodec.decode(m.content)
            MetaRow(m.media_id, m.kind, n, a.samples.length, a.rate, a.channels)
          case _ =>
            val f0 = PngCodec.decode(VideoContainer.decode(m.content).head)
            MetaRow(m.media_id, m.kind, n, f0.width, f0.height, f0.channels)
        }
      }
    }

  /** Feature-extraction stage: decoded samples → fixed-width Array[Double]
    * via `mapPartitions` (the embedding-model stand-in; batch shape = one
    * partition iterator, exactly where a real model would run batched
    * inference). Feature j = normalized polynomial hash of the j-th of
    * `dim` equal slices of the DECODED primary samples. */
  def extractFeatures(spark: SparkSession, sfDir: String, dim: Int = 8): Dataset[FeatureRow] =
    mediaTable(spark, sfDir).as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val vs = primaryValues(m)
        val slice = vs.length / dim
        val fs = Array.tabulate(dim) { j =>
          if (slice == 0) 0.0
          else (valueHash(vs, j * slice, slice) % 1000L).toDouble / 1000.0
        }
        FeatureRow(m.media_id, fs)
      }
    }

  case class ResizedRow(media_id: Long, n_in: Long, n_out: Long, out_hash: Long)
  private implicit val resizedEnc: Encoder[ResizedRow] = Encoders.product[ResizedRow]

  /** Resize stage: a real 2× decimation on the DECODED sample grid — every
    * 2nd RGB pixel (whole 3-byte pixels, not raw bytes) for image/video,
    * every 2nd PCM sample for audio — summarized as (sizes, polynomial hash
    * of the resized samples) so the gate artifact stays narrow. Binary-in /
    * decode / resample via `mapPartitions` is the batch shape a JNI-backed
    * resampler would keep. */
  def resize(spark: SparkSession, sfDir: String): Dataset[ResizedRow] =
    mediaTable(spark, sfDir).as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val vs = primaryValues(m)
        val out: Array[Int] = m.kind match {
          case "audio" =>
            Array.tabulate((vs.length + 1) / 2)(j => vs(2 * j))
          case _ =>
            val nPix = vs.length / 3
            val keep = (nPix + 1) / 2
            Array.tabulate(keep * 3)(j => vs((j / 3) * 6 + j % 3))
        }
        ResizedRow(m.media_id, vs.length.toLong, out.length.toLong,
          valueHash(out, 0, out.length))
      }
    }

  /** Frame-sampling stage for video payloads: decode up to `maxFrames` REAL
    * PNG frames from the container, emit (media_id, frame_idx, frame_hash)
    * with the hash over the frame's decoded pixels. Bounded explode per
    * row. */
  def sampleFrames(spark: SparkSession, sfDir: String, maxFrames: Int = 8): DataFrame = {
    val video = mediaTable(spark, sfDir).filter(col("kind") === "video").as[MediaRow]
    val frames = video.flatMap { m =>
      VideoContainer.decode(m.content).take(maxFrames).zipWithIndex.map {
        case (png, f) =>
          val px = PngCodec.decode(png).pixels.map(_ & 0xff)
          (m.media_id, f.toLong, valueHash(px, 0, px.length))
      }
    }
    frames.toDF("media_id", "frame_idx", "frame_hash")
  }

  /** STRIDED frame sampling: every `stride`-th frame (0, stride, 2·stride,
    * …) up to `maxFrames` — the form real pipelines use (sample at a fixed
    * temporal rate, not "the first k"). The container decode only SPLITS
    * frames (cheap length-prefix walk); the expensive PNG decode runs
    * solely on the selected frames — skipping unsampled frames must skip
    * their decode, not just drop their output, or the stage pays full
    * decode cost for a fraction of the data. `frame_idx` is the ORIGINAL
    * container index, so downstream timing math survives the sampling. */
  def sampleFramesStrided(spark: SparkSession, sfDir: String, stride: Int = 2,
                          maxFrames: Int = 8): DataFrame = {
    val video = mediaTable(spark, sfDir).filter(col("kind") === "video").as[MediaRow]
    video.flatMap { m =>
      VideoContainer.decode(m.content).zipWithIndex
        .collect { case (png, f) if f % stride == 0 => (png, f) }
        .take(maxFrames)
        .map { case (png, f) =>
          val px = PngCodec.decode(png).pixels.map(_ & 0xff)
          (m.media_id, f.toLong, valueHash(px, 0, px.length))
        }
    }.toDF("media_id", "frame_idx", "frame_hash")
  }

  case class ResampledRow(media_id: Long, rate_in: Long, rate_out: Long,
                          n_in: Long, n_out: Long, out_hash: Long)
  private implicit val resampledEnc: Encoder[ResampledRow] = Encoders.product[ResampledRow]

  /** Audio RESAMPLE-TO-RATE: the decoded PCM stream re-sampled from the
    * container's native rate (parsed from the RIFF fmt chunk, not assumed)
    * to `targetRate` by nearest-floor index mapping — out[j] =
    * in[(j·rateIn) div rateOut], n_out = (n·rateOut) div rateIn — the
    * integer-exact skeleton of a rational-ratio resampler (a production
    * polyphase filter would interpolate the same index grid; the mapping,
    * not the filter kernel, is what the Spark plumbing has to get right).
    * Summarized as (sizes, rates, polynomial hash of the resampled
    * samples) so the gate artifact stays narrow. */
  def resampleAudio(spark: SparkSession, sfDir: String,
                    targetRate: Int = 6000): Dataset[ResampledRow] =
    mediaTable(spark, sfDir).filter(col("kind") === "audio").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { m =>
          val a = WavCodec.decode(m.content)
          val n = a.samples.length
          val nOut = (n.toLong * targetRate / a.rate).toInt
          val out = Array.tabulate(nOut)(j => a.samples((j.toLong * a.rate / targetRate).toInt))
          ResampledRow(m.media_id, a.rate.toLong, targetRate.toLong,
            n.toLong, nOut.toLong, valueHash(out, 0, out.length))
        }
      }

  case class AudioEnergyRow(media_id: Long, win_idx: Long, sum_v: Long,
                            energy: Long, peak: Long)
  private implicit val audioEnergyEnc: Encoder[AudioEnergyRow] =
    Encoders.product[AudioEnergyRow]

  /** Windowed AUDIO ENERGY features over the decoded PCM stream — the
    * voice-activity-detection / silence-trim stand-in every audio curation
    * pipeline runs before anything expensive: per fixed `win`-sample frame,
    * the exact integer sample sum, energy (Σv²), and peak. A real VAD
    * thresholds these; keeping the moments integer-exact (not a float RMS)
    * is what lets the closed-form oracle hash the whole table. The partial
    * tail frame is dropped (standard framing). Decode + frame via
    * `mapPartitions` — the batched shape a vectorized DSP kernel keeps. */
  def audioEnergyWindows(spark: SparkSession, sfDir: String,
                         win: Int = 32): Dataset[AudioEnergyRow] =
    mediaTable(spark, sfDir).filter(col("kind") === "audio").as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { m =>
          val vs = WavCodec.decode(m.content).samples
          (0 until vs.length / win).iterator.map { w =>
            // peak seeds at MinValue, not 0: real 16-bit PCM is signed and
            // an all-negative frame's peak is its (negative) maximum
            var s = 0L; var e = 0L; var p = Long.MinValue
            var j = 0
            while (j < win) {
              val v = vs(w * win + j).toLong
              s += v; e += v * v; if (v > p) p = v; j += 1
            }
            AudioEnergyRow(m.media_id, w.toLong, s, e, p)
          }
        }
      }

  /** SILENCE-TRIM spans composed over [[audioEnergyWindows]] — the
    * decision stage a VAD feeds: per audio clip, the first/last window
    * whose energy clears `threshold` and the resulting lead/tail trim
    * counts (all-silent clips trim everything: first/last = −1, lead =
    * n_windows). One media-keyed aggregate over the window features — the
    * conditional-extrema shape, no sort, no self-join; at 100 TB the
    * feature stream never re-materializes per decision. */
  def audioTrimSpans(spark: SparkSession, sfDir: String,
                     win: Int = 32, threshold: Long = 300000L): DataFrame = {
    val voicedIdx = when(col("energy") >= threshold, col("win_idx"))
    audioEnergyWindows(spark, sfDir, win).toDF()
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_windows"),
        coalesce(min(voicedIdx), lit(-1L)).as("first_voiced"),
        coalesce(max(voicedIdx), lit(-1L)).as("last_voiced"))
      .select(col("media_id"), col("n_windows"),
        col("first_voiced"), col("last_voiced"),
        when(col("first_voiced") === -1L, col("n_windows"))
          .otherwise(col("first_voiced")).as("n_lead_trim"),
        when(col("last_voiced") === -1L, lit(0L))
          .otherwise(col("n_windows") - 1L - col("last_voiced")).as("n_tail_trim"))
      .orderBy(col("media_id"))
  }

  case class SceneCutRow(media_id: Long, frame_idx: Long, n_pixels: Long,
                         sad: Long, is_cut: Long)
  private implicit val sceneCutEnc: Encoder[SceneCutRow] =
    Encoders.product[SceneCutRow]

  /** SCENE-CHANGE detection over the video containers: per adjacent frame
    * pair, the exact integer sum of absolute pixel differences (SAD — the
    * standard shot-boundary statistic), flagged as a cut when it exceeds
    * `perPixelThreshold` per pixel. Real pipelines run exactly this pass to
    * pick representative frames and split shots before captioning; keeping
    * the statistic integer-exact (not a float MSE) is what lets the
    * closed-form oracle hash the whole table.
    *
    * `frame_idx` is the SECOND frame of the pair (the frame where the cut
    * lands), so downstream splitting can cut before it. Per-row work is
    * bounded by the container (frames × pixels); decode via
    * `mapPartitions` — consecutive frames must be decoded together, which
    * is precisely what a per-frame UDF cannot see. */
  def sceneChanges(spark: SparkSession, sfDir: String,
                   perPixelThreshold: Long = 120L): Dataset[SceneCutRow] =
    mediaTable(spark, sfDir).filter(col("kind") === "video").as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { m =>
          val frames = VideoContainer.decode(m.content)
            .map(png => PngCodec.decode(png).pixels.map(_ & 0xff))
          frames.iterator.sliding(2).withPartial(false).zipWithIndex.map {
            case (pair, i) =>
              val (a, b) = (pair(0), pair(1))
              var sad = 0L
              var j = 0
              while (j < a.length) { sad += math.abs(b(j) - a(j)); j += 1 }
              SceneCutRow(m.media_id, (i + 1).toLong, a.length.toLong, sad,
                if (sad > a.length.toLong * perPixelThreshold) 1L else 0L)
          }
        }
      }

  /** The stages as registered queries (ordering fixed for the oracle). */
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
    resize(spark, sfDir).toDF().orderBy(col("media_id"))

  def videoFramesStrided(spark: SparkSession, sfDir: String): DataFrame =
    sampleFramesStrided(spark, sfDir).orderBy(col("media_id"), col("frame_idx"))

  def audioResampled(spark: SparkSession, sfDir: String): DataFrame =
    resampleAudio(spark, sfDir).toDF().orderBy(col("media_id"))

  def audioEnergy(spark: SparkSession, sfDir: String): DataFrame =
    audioEnergyWindows(spark, sfDir).toDF()
      .orderBy(col("media_id"), col("win_idx"))

  def videoSceneChanges(spark: SparkSession, sfDir: String): DataFrame =
    sceneChanges(spark, sfDir).toDF()
      .orderBy(col("media_id"), col("frame_idx"))
}
