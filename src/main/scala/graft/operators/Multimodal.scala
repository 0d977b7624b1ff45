package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side
  * mechanics — schema, partition-preserving batch processing, the
  * decode seam — are real. Since round 7 the codecs behind the seam
  * are REAL too for every format that needs no external library
  * ([[Codecs]]: RIFF/WAV PCM, G.711 µ-law, 24-bit BMP, PNG via the
  * JVM's zlib/CRC32, GIF via a genuine LZW decompressor; [[Jpeg]]: a
  * from-scratch T.81 baseline codec; [[Video]]: an AVI demuxer over
  * Motion-JPEG frames — all round 8; [[Mpeg1]]: an 11172-2 intra
  * decoder, round 12); only inter-frame MOTION RECONSTRUCTION
  * (H.264-class prediction against reference frames) remains STUBBED
  * here with a deterministic fake so its plumbing stays testable end
  * to end. Since round 8 the
  * containers live in a materialized parquet `binary` column
  * ([[MediaArtifact]]) instead of being synthesized inside each
  * query.
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

  /** STUB for formats without a real codec in this repo (video
    * frames; arbitrary blobs) — a real deployment plugs ffmpeg
    * bindings in here. Image formats do NOT go through this: BMP,
    * PNG, GIF ([[Codecs]]) and JPEG ([[Jpeg]]) have genuine decoders.
    * Deterministic fake: dimensions derived from the byte length, so
    * tests and oracles can verify the surrounding plumbing exactly. */
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

  /** STUB frame sampler for opaque/inter-frame-coded blobs (a real
    * deployment seeks the container's keyframes): 1-3 frames by byte
    * length, evenly-spaced offsets, a per-frame content hash. The 1→N
    * explode is the real mechanics — video rows fan out to frame rows
    * inside the partition, no shuffle. The REAL path for MJPG-in-AVI
    * is [[Video.decodeFramesBatch]] (genuine demux + JPEG decode). */
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

  /** Deterministic media CONTAINERS with REAL format headers: the
    * payload bytes are wrapped in a genuine PNG signature + IHDR
    * (big-endian dims), GIF89a logical-screen descriptor
    * (little-endian dims), or JPEG SOI/APP0 JFIF marker, chosen by
    * id mod 3 — so a header parser exercises true byte-level format
    * structure, not a stub. The DECLARED mime is deliberately wrong
    * for id % 7 == 0 rows (always claims image/png): the mislabeled
    * upload every real ingest has to catch. Dimensions use the same
    * length-derived recipe as [[decodeStub]] so oracles replay them
    * arithmetically. */
  def wrapWithHeader(id: Long, payload: Array[Byte]): (Array[Byte], String) = {
    val w = 64 + (payload.length % 512)
    val h = 64 + (payload.length % 384)
    val (bytes, trueMime) = (id % 3) match {
      case 0 =>
        val bb = java.nio.ByteBuffer.allocate(24 + payload.length)
        bb.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
        bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
        bb.putInt(w).putInt(h)
        bb.put(payload)
        (bb.array(), "image/png")
      case 1 =>
        val bb = java.nio.ByteBuffer.allocate(10 + payload.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("GIF89a".getBytes("US-ASCII"))
        bb.putShort((w & 0xffff).toShort).putShort((h & 0xffff).toShort)
        bb.put(payload)
        (bb.array(), "image/gif")
      case _ =>
        val bb = java.nio.ByteBuffer.allocate(11 + payload.length)
        bb.put(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte,
          0x00, 0x10))
        bb.put("JFIF".getBytes("US-ASCII")).put(0x00.toByte)
        bb.put(payload)
        (bb.array(), "image/jpeg")
    }
    (bytes, if (id % 7 == 0) "image/png" else trueMime)
  }

  /** REAL content sniffing over the raw bytes — magic-byte format
    * detection plus format-specific dimension extraction (PNG IHDR
    * big-endian ints at offsets 16/20, GIF little-endian shorts at
    * 6/8; JPEG dims need a segment scan, reported -1). This is the
    * ingest-QA primitive that catches mislabeled uploads before a
    * codec ever runs; unknown signatures degrade to octet-stream,
    * never throw. */
  def sniff(bytes: Array[Byte]): (String, Int, Int) = {
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    def le16(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    if (bytes.length >= 24 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G' && bytes(12) == 'I' && bytes(13) == 'H' &&
      bytes(14) == 'D' && bytes(15) == 'R')
      ("image/png", be32(16), be32(20))
    else if (bytes.length >= 10 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8')
      ("image/gif", le16(6), le16(8))
    else if (bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff)
      ("image/jpeg", -1, -1)
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F') {
      val kind = new String(bytes, 8, 4, "US-ASCII")
      if (kind == "AVI ") {
        // header-only walk to the avih chunk for the frame dimensions
        // (dwWidth/dwHeight at body offsets 32/36) — no frame bytes read
        def le32(o: Int): Int =
          (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
            ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
        var off = 12
        var w = -1; var h = -1
        var guard = 0
        while (w < 0 && off + 8 <= bytes.length && guard < 64) {
          val tag4 = new String(bytes, off, 4, "US-ASCII")
          val size = le32(off + 4)
          if (size < 0 || off + 8 + size > bytes.length) { off = bytes.length }
          else if (tag4 == "LIST") off += 12 // descend into the list body
          else {
            if (tag4 == "avih" && size >= 40) {
              w = le32(off + 8 + 32); h = le32(off + 8 + 36)
            }
            off += 8 + size + (size & 1)
          }
          guard += 1
        }
        ("video/x-msvideo", w, h)
      } else if (kind == "WAVE") ("audio/wav", -1, -1)
      else ("application/octet-stream", -1, -1)
    } else ("application/octet-stream", -1, -1)
  }

  final case class SniffResult(
      id: Long, declared: String, sniffed: String, width: Int, height: Int)
  implicit val sniffResultEnc: Encoder[SniffResult] = Encoders.product[SniffResult]

  /** Partition-batched sniff pass (same seam as [[decodeBatch]]). */
  def sniffBatch(records: Dataset[MediaRecord]): Dataset[SniffResult] =
    records.mapPartitions { it =>
      it.map { r =>
        val (fmt, w, h) = sniff(r.media)
        SniffResult(r.id, r.mime, fmt, w, h)
      }
    }
}
