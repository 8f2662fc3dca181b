package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{PpmCodec, WavCodec}
import graft.sources.Tables

/** Multimodal-column handling: media payloads as opaque `binary`
  * columns with typed metadata alongside. The image decode step is a
  * REAL codec since round 10 — binary PPM (P6) via
  * [[graft.functions.PpmCodec]], full header grammar + maxval
  * rescale, no external libraries. Payloads that don't parse as P6
  * fall back to the documented deterministic stub (no image/audio
  * libraries exist in this environment for JPEG/WAV/MP4; a real
  * deployment swaps the codec object, the mapPartitions plumbing is
  * unchanged). Resize/frame-sampling remain stubs shape-wise.
  */
object Multimodal {

  /** Typed metadata extraction over a binary payload column — byte
    * length and magic-prefix, the schema a real media table carries.
    * `documents.text` (UTF-8 encoded) stands in for the media bytes.
    * Only the 4-char prefix is encoded to binary; round 2 encoded the
    * full payload twice (once per derived column) for 7.6 s at sf0.1. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        octet_length(col("text")).as("byte_len"),
        hex(encode(substring(col("text"), 1, 4), "UTF-8")).as("prefix_hex"),
        col("n_chars"))
      .orderBy("doc_id")

  /** The feature-extraction pipeline as a registered query: each doc's
    * UTF-8 bytes become a deterministic near-square P6 image (the
    * stand-in for reading real media files — this environment ships
    * none), which the REAL [[graft.functions.PpmCodec]] parser then
    * decodes back to dimensions + pixels for mean/std-RGB features.
    * Encode→decode through the actual byte format exercises the
    * parser on every row (pinned-frame oracle; the features aren't
    * SQL-expressible). The float[] features column is projected as an
    * xxhash64 fingerprint — the raw array isn't hashable by the
    * driver's rows-compare, and the fingerprint still pins the exact
    * feature values across runs. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          val npix = math.max(1, (b.length + 2) / 3)
          val w = math.max(1, math.sqrt(npix.toDouble).toInt)
          val h = (npix + w - 1) / w
          (id, PpmCodec.encodeP6(w, h, java.util.Arrays.copyOf(b, 3 * w * h)))
        }
      }
      .toDF("doc_id", "payload")
    extractFeatures(spark, payloads)
      .select(col("doc_id"), col("width"), col("height"), col("n_bytes"),
        xxhash64(col("features")).as("features_fp"))
      .orderBy("doc_id")
  }

  /** Resize plumbing: binary-in/binary-out media transform with typed
    * target metadata. The resampler is a deterministic STUB (byte
    * stride-sampling — a real deployment plugs in an image codec); the
    * schema contract (payload + target dims in, payload + actual dims
    * out) and the map-only, no-shuffle shape are production-real. */
  def resizeStub(spark: SparkSession, payloads: DataFrame,
                 targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0,
      s"target dims must be positive, got ${targetW}x$targetH")
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val target = targetW * targetH
        it.map { case (id, bytes) =>
          // Invariant: emitted width*height == payload length, so
          // downstream consumers can index by the typed dims. A
          // passed-through payload reports ITS dims, not the target's.
          if (bytes.length <= target) (id, bytes.length, 1, bytes)
          else {
            // STUB: stride-sample down to the target byte budget
            val stride = bytes.length.toDouble / target
            (id, targetW, targetH, Array.tabulate(target)(i => bytes((i * stride).toInt)))
          }
        }
      }
      .toDF("doc_id", "width", "height", "payload")
  }

  /** Frame-sampling plumbing: one media payload → every n-th "frame",
    * emitted one row per frame (the explode shape a video pipeline
    * feeds to per-frame feature extraction). Frame boundaries are a
    * deterministic STUB (fixed-size byte windows standing in for
    * decoded frames); the row-explosion contract and ordering column
    * are real. */
  def sampleFrames(spark: SparkSession, payloads: DataFrame,
                   frameBytes: Int, everyNth: Int): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = math.max(1, bytes.length / frameBytes)
        (0 until nFrames by everyNth).map { f =>
          val start = f * frameBytes
          val end = math.min(bytes.length, start + frameBytes)
          (id, f, java.util.Arrays.copyOfRange(bytes, start, end))
        }
      }
      .toDF("doc_id", "frame_idx", "frame_payload")
  }

  /** Feature extraction: batch-parallel decode over binary payloads
    * via mapPartitions (map-only, no shuffle — the partitioning,
    * batch shape, and output schema are what a production media
    * pipeline runs). P6 payloads decode through the REAL
    * [[PpmCodec]] parser into per-channel mean/std + luma + aspect
    * features; anything else (wrong magic, malformed header, short
    * pixel area) falls back to the legacy deterministic stub so
    * arbitrary binary still flows with the same schema.
    */
  def extractFeatures(spark: SparkSession, payloads: DataFrame): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          PpmCodec.decodeP6(bytes) match {
            case Some(img) =>
              (id, img.width, img.height, bytes.length, PpmCodec.features(img))
            case None =>
              // Fallback stub for non-PPM payloads: width/height from
              // leading bytes, a fixed-length "embedding" from a
              // rolling byte hash. Deterministic, schema-identical.
              val w = if (bytes.length > 0) (bytes(0) & 0xff) + 1 else 0
              val h = if (bytes.length > 1) (bytes(1) & 0xff) + 1 else 0
              val feat = new Array[Float](8)
              var acc = 17L
              var i = 0
              while (i < bytes.length) {
                acc = acc * 31 + (bytes(i) & 0xff)
                feat(i % 8) += ((acc % 1000) / 1000.0f)
                i += 1
              }
              (id, w, h, bytes.length, feat)
          }
        }
      }
      .toDF("doc_id", "width", "height", "n_bytes", "features")
  }

  /** Audio feature extraction as a registered query — the WAV twin of
    * [[multimodalFeatures]]: each doc's UTF-8 bytes become a
    * deterministic PCM16 signal (byte → centered 16-bit sample, the
    * stand-in for reading real recordings), encoded as a conforming
    * RIFF/WAVE file and decoded back through the REAL
    * [[graft.functions.WavCodec]] chunk walker, so every row
    * round-trips the actual byte format. Features are all-integer
    * (duration ms, peak amplitude, centi-RMS with one
    * correctly-rounded sqrt, zero crossings) — deterministic, hence a
    * pinned-frame oracle (byte-level WAV parsing is not
    * SQL-expressible). Map-only, no shuffle. */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          // Magnitude from the byte value (128·b + 64 ≤ 32704, inside
          // PCM16), sign from its parity — peak, RMS, and the
          // zero-crossing count all vary with content.
          val pcm = Array.tabulate[Short](b.length) { i =>
            val v = ((b(i) & 0xff) << 7) + 64
            (if ((b(i) & 1) == 1) -v else v).toShort
          }
          val wav = WavCodec.encodeWav(8000, 1, pcm)
          WavCodec.decodeWav(wav) match {
            case Some(a) =>
              val (durMs, peak, rmsQ, zc) = WavCodec.features(a)
              (id, a.sampleRate, a.samples.length, durMs, peak, rmsQ, zc)
            case None => (id, 0, 0, 0L, 0, 0L, 0L) // unreachable: own output
          }
        }
      }
      .toDF("doc_id", "sample_rate", "n_samples", "duration_ms", "peak",
        "rms_q", "zero_crossings")
      .orderBy("doc_id")
  }
}
