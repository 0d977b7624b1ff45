package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side
  * mechanics — schema, partition-preserving batch processing, the
  * decode seam — are real; the codec itself is STUBBED (this container
  * has no image/audio libraries) with a deterministic fake so the
  * pipeline is testable end-to-end.
  *
  * Scale design: decode runs via `mapPartitions`, so each partition is
  * one codec batch (amortized init, no per-row overhead), metadata-only
  * queries never touch the binary column (parquet column pruning), and
  * nothing here shuffles.
  */
object Multimodal {

  final case class MediaRecord(id: Long, media: Array[Byte], mime: String)
  final case class MediaMeta(
      id: Long, mime: String, nBytes: Long, contentHash: String,
      width: Int, height: Int)

  implicit val mediaRecordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val mediaMetaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]

  /** STUB — a real deployment plugs the codec in here (e.g. javax
    * ImageIO / ffmpeg bindings). Deterministic fake: dimensions derived
    * from the byte length, so tests and oracles can verify the
    * surrounding plumbing exactly. */
  def decodeStub(bytes: Array[Byte]): (Int, Int) =
    (64 + (bytes.length % 512), 64 + (bytes.length % 384))

  private def hexMd5(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"$b%02x").mkString
  }

  /** Batch decode: one codec invocation context per partition. */
  def decodeBatch(records: Dataset[MediaRecord]): Dataset[MediaMeta] =
    records.mapPartitions { it =>
      // per-partition codec init would go here
      it.map { r =>
        val (w, h) = decodeStub(r.media)
        MediaMeta(r.id, r.mime, r.media.length.toLong, hexMd5(r.media), w, h)
      }
    }

  final case class MediaFeatures(
      id: Long, f0: Double, f1: Double, f2: Double, f3: Double)
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  final case class FrameMeta(id: Long, frameIdx: Int, frameOffset: Long, frameHash: String)
  implicit val frameMetaEnc: Encoder[FrameMeta] = Encoders.product[FrameMeta]

  /** STUB feature extractor (a real deployment runs the vision/audio
    * model here): 4 doubles from the content digest's 16-bit chunks,
    * normalized to [0,1] — deterministic, so the oracle replays it. */
  def featureStub(bytes: Array[Byte]): Array[Double] = {
    val hx = hexMd5(bytes)
    Array.tabulate(4) { j =>
      val chunk = java.lang.Integer.parseInt(hx.substring(j * 4, j * 4 + 4), 16)
      // floor half-up, the engine-portable rounding used everywhere
      math.floor(chunk / 65535.0 * 1e6 + 0.5) / 1e6
    }
  }

  /** Batch feature extraction — same partition-batched seam as
    * [[decodeBatch]] (model weights load once per partition, not per
    * row). */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    records.mapPartitions { it =>
      // per-partition model init would go here
      it.map { r =>
        val f = featureStub(r.media)
        MediaFeatures(r.id, f(0), f(1), f(2), f(3))
      }
    }

  final case class ResizedMeta(
      id: Long, width: Int, height: Int, outWidth: Int, outHeight: Int)
  implicit val resizedMetaEnc: Encoder[ResizedMeta] = Encoders.product[ResizedMeta]

  /** Aspect-preserving fit into a `target`×`target` box — the resize
    * planning every image pipeline runs before the (stubbed) pixel
    * work. Pure arithmetic on decoded dimensions; floor keeps the
    * result inside the box and deterministic across engines. */
  def resizeFit(w: Int, h: Int, target: Int): (Int, Int) = {
    val scale = math.min(target.toDouble / w, target.toDouble / h)
    (math.floor(w * scale).toInt, math.floor(h * scale).toInt)
  }

  /** Batch resize planning over decoded metadata. */
  def resizeBatch(records: Dataset[MediaRecord], target: Int): Dataset[ResizedMeta] =
    records.mapPartitions { it =>
      it.map { r =>
        val (w, h) = decodeStub(r.media)
        val (ow, oh) = resizeFit(w, h, target)
        ResizedMeta(r.id, w, h, ow, oh)
      }
    }

  /** STUB frame sampler (a real deployment seeks the container's
    * keyframes): 1-3 frames by byte length, evenly-spaced offsets, a
    * per-frame content hash. The 1→N explode is the real mechanics —
    * video rows fan out to frame rows inside the partition, no
    * shuffle. */
  def sampleFrames(records: Dataset[MediaRecord]): Dataset[FrameMeta] =
    records.mapPartitions { it =>
      it.flatMap { r =>
        val k = 1 + (r.media.length % 3)
        val stride = r.media.length.toLong / k
        (0 until k).map { i =>
          val tag = s":$i".getBytes("UTF-8")
          FrameMeta(r.id, i, i * stride, hexMd5(r.media ++ tag))
        }
      }
    }

  /** Wrap the documents table as a fake media table (text bytes as the
    * opaque blob) — the testdata has no true binary column, so this is
    * the stand-in used by tests and the verify query. */
  def documentsAsMedia(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id").as("id"),
      col("text").cast("binary").as("media"),
      lit("text/plain").as("mime")).as[MediaRecord]
  }
}
