package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media payload. */
final case class MediaMeta(width: Int, height: Int, channels: Int, format: String)

/** One media record: id + raw bytes (image/audio/video are all opaque
  * `binary` at the engine level; only the codec interprets them). */
final case class MediaRecord(id: Long, data: Array[Byte])

final case class MediaWithMeta(
    id: Long,
    n_bytes: Int,
    width: Int,
    height: Int,
    channels: Int,
    format: String)

final case class FrameSample(id: Long, frame_idx: Int, frame_hash: Long)

/**
 * STUB codec. The container has no image/audio libraries, so decode is a
 * deterministic fake derived only from the payload size — but everything
 * around it (binary column handling, partition-batch iteration, typed
 * schema, the mapPartitions boundary where an Arrow/JNI decoder would sit)
 * is the real Spark plumbing a multimodal pipeline needs.
 *
 * A production implementation replaces `decodeImageMeta`'s body with e.g.
 * `javax.imageio.ImageIO` / ffmpeg-over-JNI and keeps every signature.
 */
object MediaCodec {
  def decodeImageMeta(bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    // STUB: dims derived deterministically from payload size.
    MediaMeta(64 + n % 576, 64 + (n * 7) % 1016, 3, s"fmt${n % 4}")
  }

  /** STUB: "sample" `count` frames; a real codec seeks/decodes keyframes.
    * The fake emits one deterministic 32-bit value per frame index. */
  def sampleFrames(bytes: Array[Byte], count: Int): Seq[Long] = {
    val n = bytes.length.toLong
    (0 until count).map(i => (n * 2654435761L + i * 40503L) & 0xffffffffL)
  }

  /** STUB resize: a real codec returns re-encoded bytes; the fake truncates
    * (keeps the byte-level contract: binary in, binary out). */
  def resize(bytes: Array[Byte], maxBytes: Int): Array[Byte] =
    bytes.take(maxBytes)

  /** STUB feature extraction ("embed the image"): `dim` floats in [0, 1),
    * deterministically derived from the payload CONTENT (not just its
    * length): f_d = xhash32(md5hex(bytes) + "_" + d) / 2^32. A real
    * implementation replaces this with a vision/audio model invocation and
    * keeps the signature; content-dependence means tests exercise the
    * actual byte path, and the md5 construction keeps a DuckDB oracle
    * possible. */
  def extractFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val hex = graft.expressions.TextKernels.md5Hex(bytes)
    Array.tabulate(dim) { d =>
      val h = graft.expressions.TextKernels.xhash32(
        org.apache.spark.unsafe.types.UTF8String.fromString(hex + "_" + d))
      (h / 4294967296.0).toFloat
    }
  }
}

/**
 * Multimodal column operators. Decode runs inside `mapPartitions` — the
 * executor-side batch boundary (the Scala analogue of `mapInPandas`): one
 * iterator per partition, so a real codec can amortize per-batch setup
 * (model load, JNI context) across the partition. Narrow transformation —
 * no shuffle; partitioning of the input is preserved.
 */
object Multimodal {

  /** Decode image metadata for a binary column. Input: any DataFrame with
    * (idCol: long, binCol: binary). Output columns: id, n_bytes, width,
    * height, channels, format. */
  def withImageMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val m = MediaCodec.decodeImageMeta(r.data)
          MediaWithMeta(r.id, r.data.length, m.width, m.height, m.channels, m.format)
        }
      }
      .toDF()
  }

  /** Sample `count` frames per media record (video-style fan-out: one row
    * per frame). */
  def sampledFrames(df: DataFrame, idCol: String, binCol: String, count: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
      .as[MediaRecord]
      .flatMap { r =>
        MediaCodec.sampleFrames(r.data, count).zipWithIndex.map { case (h, i) =>
          FrameSample(r.id, i, h)
        }
      }
      .toDF()
  }

  /** Resize/re-encode payloads, keeping the column binary. */
  def resized(ds: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(r => MediaRecord(r.id, MediaCodec.resize(r.data, maxBytes))))
  }

  /** Extract a feature vector per record (the "embed every image" stage of
    * a multimodal pipeline). Output: (id, features: array<float>) — feeds
    * directly into the Similarity operators (ann_topk / emb_pairs). */
  def withFeatures(df: DataFrame, idCol: String, binCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("data"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // A real model would be loaded HERE, once per partition.
        it.map(r => (r.id, MediaCodec.extractFeatures(r.data, dim)))
      }
      .toDF("id", "features")
  }
}
