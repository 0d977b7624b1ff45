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
