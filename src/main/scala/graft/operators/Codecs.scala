package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** REAL pure-JVM media codecs behind the [[Multimodal]] decode seam.
  *
  * The container has no image/audio libraries, so every codec here is
  * written from its public spec in pure JVM byte arithmetic. PNG
  * (round 7, CRC-verified inflate) lives below; baseline JPEG
  * (round 8, ITU T.81) lives in [[Jpeg]]; AVI/MJPEG and AVI/MS-RLE8
  * video in [[Video]]. Only codecs that genuinely require native
  * decoders (H.264-class inter-frame video) remain behind
  * [[Multimodal.decodeStub]]. The two formats that started the family
  * need NOTHING beyond byte arithmetic, so their decode path has been
  * genuine end to end since round 6:
  *
  *  - RIFF/WAVE PCM: chunk-walking parser (magic validation, little-
  *    endian chunk sizes, `fmt ` field extraction, int16 sample
  *    decode) over canonically synthesized containers.
  *  - BMP (24-bit uncompressed): BITMAPFILEHEADER + BITMAPINFOHEADER
  *    parsing plus the three quirks every real BMP reader must get
  *    right — BGR byte order, 4-byte row padding, bottom-up row
  *    storage. The verify query's order-WEIGHTED channel sums catch a
  *    parser that misreads any of the three (plain channel sums are
  *    permutation-invariant; the weighted ones are not).
  *
  * The synthesized payloads are deterministic integer functions of
  * (doc_id, utf8-byte-length), so the DuckDB oracle replays the
  * expected statistics arithmetically — if the parser misreads an
  * offset, an endianness, or the row order, the stats diverge and the
  * parity gate fails. Decode runs in the same partition-batched
  * `mapPartitions` seam as the stubbed codecs (one codec context per
  * partition, metadata-sized output, no shuffle).
  */
object Codecs {

  // ---------------------------------------------------------------
  // WAV: synthesis
  // ---------------------------------------------------------------

  /** Deterministic PCM sample i of document `id`: a full-range int16
    * from a Weyl-style integer sequence (2654435761 = Knuth's 2³²/φ). */
  def wavSample(id: Long, i: Long): Int =
    (Math.floorMod(id * 31L + i * 2654435761L, 65536L) - 32768L).toInt

  /** Sample count derives from the payload byte length, sample rate
    * from the id — both replayable in SQL. */
  def wavSampleCount(nBytes: Int): Int = 32 + nBytes % 64
  def wavSampleRate(id: Long): Int = (8000L * (1L + id % 3L)).toInt

  /** A canonical 44-byte-header mono 16-bit PCM WAVE file. */
  def synthesizeWav(id: Long, nBytes: Int): Array[Byte] = {
    val n = wavSampleCount(nBytes)
    val sr = wavSampleRate(id)
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sr)
    bb.putInt(sr * 2) // byte rate
    bb.putShort(2)    // block align
    bb.putShort(16)   // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
    var i = 0
    while (i < n) { bb.putShort(wavSample(id, i.toLong).toShort); i += 1 }
    bb.array()
  }

  // ---------------------------------------------------------------
  // WAV: the real parser
  // ---------------------------------------------------------------

  final case class AudioMeta(
      id: Long, sampleRate: Int, nSamples: Long, durationMs: Long,
      peak: Long, sumAbs: Long, nClipped: Long, ok: Boolean)

  implicit val audioMetaEnc: Encoder[AudioMeta] = Encoders.product[AudioMeta]

  /** Chunk-walking RIFF/WAVE parser: validates the RIFF/WAVE magic,
    * walks sub-chunks by little-endian declared size (so an unknown
    * chunk between `fmt ` and `data` is skipped, as the spec
    * requires), extracts the format fields, and decodes int16
    * little-endian samples. A malformed container degrades to
    * `ok = false` with zeroed stats — ingest-QA semantics, never a
    * throw. */
  def parseWav(id: Long, bytes: Array[Byte]): AudioMeta = {
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String =
      new String(bytes, o, 4, "US-ASCII")
    val bad = AudioMeta(id, 0, 0L, 0L, 0L, 0L, 0L, ok = false)
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return bad
    var off = 12
    var sampleRate = 0
    var blockAlign = 0
    var bits = 0
    var fmtSeen = false
    while (off + 8 <= bytes.length) {
      val name = tag(off)
      val size = le32(off + 4).toInt
      // A declared size >= 2^31 sign-extends negative; advancing by it
      // would stall or move the walk backwards — an infinite loop on
      // crafted input. Malformed degrades to ok=false, never a hang.
      if (size < 0) return bad
      val body = off + 8
      if (name == "fmt ") {
        if (size < 16 || body + 16 > bytes.length) return bad
        val audioFormat = le16(body)
        val channels = le16(body + 2)
        sampleRate = le32(body + 4).toInt
        blockAlign = le16(body + 12)
        bits = le16(body + 14)
        if (audioFormat != 1 || channels != 1 || bits != 16 ||
          blockAlign != 2 || sampleRate <= 0) return bad
        fmtSeen = true
      } else if (name == "data") {
        if (!fmtSeen || body + size > bytes.length) return bad
        val n = size / blockAlign
        var i = 0
        var peak = 0L
        var sumAbs = 0L
        var clipped = 0L
        while (i < n) {
          val raw = le16(body + 2 * i)
          val s = if (raw >= 32768) raw - 65536 else raw // sign-extend
          val a = math.abs(s).toLong
          if (a > peak) peak = a
          sumAbs += a
          if (a >= 32000L) clipped += 1
          i += 1
        }
        return AudioMeta(id, sampleRate, n.toLong,
          n.toLong * 1000L / sampleRate, peak, sumAbs, clipped, ok = true)
      }
      off = body + size + (size & 1) // RIFF chunks are 2-byte aligned
    }
    bad
  }

  final case class AudioRuns(
      id: Long, sampleRate: Int, nRuns: Long, longestRun: Long,
      nSilent: Long, ok: Boolean)

  implicit val audioRunsEnc: Encoder[AudioRuns] = Encoders.product[AudioRuns]

  /** Silence-run segmentation — the order-SENSITIVE decode statistic
    * (a maximal run of samples with |s| < `thr`): run count, longest
    * run, silent-sample mass. Sequential by nature, which is exactly
    * why it belongs in the per-document decode pass (PCM is scanned
    * once, in order, inside the partition) rather than in a
    * corpus-wide window. The oracle replays it with a gaps-and-islands
    * window over the synthesized samples — a decoder that reorders or
    * drops samples diverges even when the permutation-invariant stats
    * of [[parseWav]] would not. */
  def wavSilenceRuns(id: Long, bytes: Array[Byte], thr: Int): AudioRuns = {
    val m = parseWav(id, bytes)
    if (!m.ok) return AudioRuns(id, 0, 0L, 0L, 0L, ok = false)
    // re-walk to the data chunk (parseWav validated the layout)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    var off = 12
    var runs = 0L; var longest = 0L; var silent = 0L
    while (off + 8 <= bytes.length) {
      val name = new String(bytes, off, 4, "US-ASCII")
      val size = le32(off + 4).toInt
      if (size < 0) return AudioRuns(id, 0, 0L, 0L, 0L, ok = false)
      val body = off + 8
      if (name == "data") {
        val n = size / 2
        var i = 0
        var cur = 0L
        while (i < n) {
          val raw = le16(body + 2 * i)
          val s = if (raw >= 32768) raw - 65536 else raw
          if (math.abs(s) < thr) {
            cur += 1; silent += 1
            if (cur > longest) longest = cur
          } else {
            if (cur > 0) runs += 1
            cur = 0
          }
          i += 1
        }
        if (cur > 0) runs += 1
        return AudioRuns(id, m.sampleRate, runs, longest, silent, ok = true)
      }
      off = body + size + (size & 1)
    }
    AudioRuns(id, 0, 0L, 0L, 0L, ok = false)
  }

  /** Partition-batched silence segmentation. */
  def wavRunsBatch(records: Dataset[Multimodal.MediaRecord],
      thr: Int): Dataset[AudioRuns] =
    records.mapPartitions { it =>
      it.map(r => wavSilenceRuns(r.id, r.media, thr))
    }

  // ---------------------------------------------------------------
  // µ-law (G.711) WAV: companded 8-bit telephony audio
  // ---------------------------------------------------------------

  /** Deterministic encoded µ-law byte i of document `id`. */
  def ulawByte(id: Long, i: Long): Int =
    Math.floorMod(id * 7L + i * 131L, 256L).toInt

  def ulawSampleCount(nBytes: Int): Int = 24 + nBytes % 40

  /** Canonical G.711 µ-law expansion (the telephony standard's
    * segment/mantissa decode): `u = ~b`, magnitude
    * `((mantissa·8)+132) << segment`, bias 132, sign from the top
    * bit. Pure integer arithmetic — the oracle replays it with
    * mod/shift SQL. */
  def ulawToLinear(b: Int): Int = {
    val u = (~b) & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A canonical µ-law WAVE file: audioFormat 7, 8 bits, mono,
    * blockAlign 1 — the second REAL audio profile beside PCM. */
  def synthesizeUlawWav(id: Long, nBytes: Int): Array[Byte] = {
    val n = ulawSampleCount(nBytes)
    val sr = wavSampleRate(id)
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(7) // µ-law
    bb.putShort(1) // mono
    bb.putInt(sr)
    bb.putInt(sr)  // byte rate = sr · blockAlign
    bb.putShort(1) // block align
    bb.putShort(8) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(n)
    var i = 0
    while (i < n) { bb.put(ulawByte(id, i.toLong).toByte); i += 1 }
    bb.array()
  }

  final case class UlawMeta(
      id: Long, sampleRate: Int, nSamples: Long, peak: Long,
      sumAbs: Long, sumSigned: Long, nLoud: Long, ok: Boolean)

  implicit val ulawMetaEnc: Encoder[UlawMeta] = Encoders.product[UlawMeta]

  /** µ-law WAV parser: the same chunk walk as [[parseWav]] but
    * validating the G.711 format fields (audioFormat 7, 8 bits,
    * blockAlign 1) and EXPANDING each companded byte through
    * [[ulawToLinear]]. `sumSigned` is the sign-sensitive statistic —
    * an expansion that drops the sign bit or mis-biases still gets
    * `sumAbs` nearly right but never the signed sum. */
  def parseUlawWav(id: Long, bytes: Array[Byte]): UlawMeta = {
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    val bad = UlawMeta(id, 0, 0L, 0L, 0L, 0L, 0L, ok = false)
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return bad
    var off = 12
    var sampleRate = 0
    var fmtSeen = false
    while (off + 8 <= bytes.length) {
      val name = tag(off)
      val size = le32(off + 4).toInt
      if (size < 0) return bad // see parseWav: sign-extended size = hang
      val body = off + 8
      if (name == "fmt ") {
        if (size < 16 || body + 16 > bytes.length) return bad
        if (le16(body) != 7 || le16(body + 2) != 1 ||
          le16(body + 12) != 1 || le16(body + 14) != 8) return bad
        sampleRate = le32(body + 4).toInt
        if (sampleRate <= 0) return bad
        fmtSeen = true
      } else if (name == "data") {
        if (!fmtSeen || body + size > bytes.length) return bad
        var i = 0
        var peak = 0L; var sumAbs = 0L; var sumSigned = 0L; var loud = 0L
        while (i < size) {
          val s = ulawToLinear(bytes(body + i) & 0xff)
          val a = math.abs(s).toLong
          if (a > peak) peak = a
          sumAbs += a
          sumSigned += s
          if (a >= 4096L) loud += 1
          i += 1
        }
        return UlawMeta(id, sampleRate, size.toLong, peak, sumAbs,
          sumSigned, loud, ok = true)
      }
      off = body + size + (size & 1)
    }
    bad
  }

  /** Partition-batched µ-law decode. */
  def decodeUlawBatch(
      records: Dataset[Multimodal.MediaRecord]): Dataset[UlawMeta] =
    records.mapPartitions { it =>
      it.map(r => parseUlawWav(r.id, r.media))
    }

  /** Partition-batched audio decode (the [[Multimodal.decodeBatch]]
    * seam, real codec). */
  def decodeWavBatch(records: Dataset[Multimodal.MediaRecord]): Dataset[AudioMeta] =
    records.mapPartitions { it =>
      it.map(r => parseWav(r.id, r.media))
    }

  // ---------------------------------------------------------------
  // BMP: synthesis
  // ---------------------------------------------------------------

  /** Deterministic channel value at (x, y) of document `id`;
    * c = 0 (red), 1 (green), 2 (blue) — each channel a DIFFERENT
    * function so a BGR/RGB mixup is caught. */
  def bmpChannel(id: Long, x: Int, y: Int, c: Int): Int =
    Math.floorMod(id + 7L * x + 13L * y + 37L * c, 256L).toInt

  def bmpWidth(id: Long): Int = (4L + id % 5L).toInt
  def bmpHeight(nBytes: Int): Int = 3 + nBytes % 4

  /** A genuine 24-bit uncompressed BMP: 14-byte file header, 40-byte
    * BITMAPINFOHEADER, BGR pixel order, rows padded to 4 bytes and
    * stored BOTTOM-UP (positive biHeight). */
  def synthesizeBmp(id: Long, nBytes: Int): Array[Byte] = {
    val w = bmpWidth(id)
    val h = bmpHeight(nBytes)
    val rowBytes = (w * 3 + 3) / 4 * 4
    val imageSize = rowBytes * h
    val bb = java.nio.ByteBuffer.allocate(54 + imageSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + imageSize)
    bb.putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h) // positive height = bottom-up
    bb.putShort(1).putShort(24).putInt(0).putInt(imageSize)
    bb.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = h - 1 // bottom-up: last image row first in the file
    while (row >= 0) {
      var x = 0
      while (x < w) {
        bb.put(bmpChannel(id, x, row, 2).toByte) // B
        bb.put(bmpChannel(id, x, row, 1).toByte) // G
        bb.put(bmpChannel(id, x, row, 0).toByte) // R
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      row -= 1
    }
    bb.array()
  }

  // ---------------------------------------------------------------
  // BMP: the real parser
  // ---------------------------------------------------------------

  final case class PixelMeta(
      id: Long, width: Int, height: Int,
      rSum: Long, gSum: Long, bSum: Long,
      rWsum: Long, gWsum: Long, bWsum: Long, ok: Boolean)

  implicit val pixelMetaEnc: Encoder[PixelMeta] = Encoders.product[PixelMeta]

  /** 24-bit BMP decoder: parses both headers (little-endian), honors
    * the pixel-array offset field, un-pads rows, flips the bottom-up
    * row order, and splits BGR. Reports per-channel sums plus
    * raster-order WEIGHTED sums Σ v(x,y)·(y·W+x+1) — the statistic
    * that exposes a mis-decoded row order, padding slip, or channel
    * swap, which plain sums cannot. */
  def parseBmp(id: Long, bytes: Array[Byte]): PixelMeta = {
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    val bad = PixelMeta(id, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L, ok = false)
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return bad
    val pixelOffset = le32(10)
    val w = le32(18)
    val h = le32(22)
    val bpp = le16(28)
    val compression = le32(30)
    // pixelOffset is a sign-extending le32 (crafted input can point it
    // before the headers or negative), and w near 2^31/3 overflows
    // `w * 3 + 3` into a negative rowBytes that defeats the length
    // check — so bound both and size rows in Long before touching the
    // pixel array. 2^20 px per side is far past any honest 24-bit BMP.
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0 ||
      w > (1 << 20) || h > (1 << 20) || pixelOffset < 54) return bad
    val rowBytes = ((w.toLong * 3 + 3) / 4 * 4).toInt
    if (pixelOffset.toLong + rowBytes.toLong * h > bytes.length) return bad
    var rS, gS, bS, rW, gW, bW = 0L
    var y = 0
    while (y < h) {
      // bottom-up: image row y lives at file row (h - 1 - y)
      val base = pixelOffset + (h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val b = bytes(base + 3 * x) & 0xff
        val g = bytes(base + 3 * x + 1) & 0xff
        val r = bytes(base + 3 * x + 2) & 0xff
        val wgt = (y.toLong * w + x + 1)
        rS += r; gS += g; bS += b
        rW += r * wgt; gW += g * wgt; bW += b * wgt
        x += 1
      }
      y += 1
    }
    PixelMeta(id, w, h, rS, gS, bS, rW, gW, bW, ok = true)
  }

  /** Partition-batched pixel decode (the real-codec seam). */
  def decodeBmpBatch(records: Dataset[Multimodal.MediaRecord]): Dataset[PixelMeta] =
    records.mapPartitions { it =>
      it.map(r => parseBmp(r.id, r.media))
    }

  // ---------------------------------------------------------------
  // PNG: synthesis (a REAL encoder — zlib + CRC32 are JVM built-ins)
  // ---------------------------------------------------------------

  /** Deterministic channel value at (x, y); c = 0 (R), 1 (G), 2 (B) —
    * a different recipe from the BMP one so the two decoders can never
    * satisfy each other's oracle by accident. */
  def pngChannel(id: Long, x: Int, y: Int, c: Int): Int =
    Math.floorMod(id * 3L + 11L * x + 17L * y + 29L * c, 256L).toInt

  def pngWidth(id: Long): Int = (3L + id % 4L).toInt
  def pngHeight(nBytes: Int): Int = 2 + nBytes % 3

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32()
    parts.foreach(p => c.update(p))
    c.getValue.toInt
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(name: String, body: Array[Byte]): Array[Byte] = {
    val tag = name.getBytes("US-ASCII")
    be32(body.length) ++ tag ++ body ++ be32(crc32(tag, body))
  }

  /** The Paeth predictor (PNG spec §9.4) — shared by encoder and
    * decoder. */
  def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** A genuine 8-bit truecolor non-interlaced PNG: signature, IHDR +
    * CRC, one zlib-deflated IDAT whose scanlines cycle through ALL
    * FIVE filter types (`(id + y) % 5`), IEND. The filters are applied
    * FORWARD here; [[parsePng]] must invert them exactly. */
  def synthesizePng(id: Long, nBytes: Int): Array[Byte] =
    encodePng(id, pngWidth(id), pngHeight(nBytes), pngChannel(id, _, _, _))

  /** General PNG encoder for ANY pixel function — also the transcode
    * target: re-encoding decoded BMP pixels through this and decoding
    * back must reproduce the pixels bit-for-bit
    * (`q_multimodal_transcode`). */
  def encodePng(id: Long, w: Int, h: Int,
      chan: (Int, Int, Int) => Int): Array[Byte] = {
    val bpp = 3 // bytes per pixel (8-bit RGB)
    val raw = Array.ofDim[Byte](h * (1 + w * bpp))
    var prev: Array[Int] = Array.fill(w * bpp)(0)
    var y = 0
    var o = 0
    while (y < h) {
      val cur = Array.tabulate(w * bpp)(k => chan(k / bpp, y, k % bpp))
      val f = ((id + y) % 5L).toInt
      raw(o) = f.toByte; o += 1
      var k = 0
      while (k < w * bpp) {
        val left = if (k >= bpp) cur(k - bpp) else 0
        val up = prev(k)
        val ul = if (k >= bpp) prev(k - bpp) else 0
        val filtered = f match {
          case 0 => cur(k)
          case 1 => cur(k) - left
          case 2 => cur(k) - up
          case 3 => cur(k) - (left + up) / 2
          case _ => cur(k) - paeth(left, up, ul)
        }
        raw(o) = (filtered & 0xff).toByte; o += 1
        k += 1
      }
      prev = cur
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zlen = {
      var total = 0
      while (!deflater.finished()) total += deflater.deflate(buf, total, buf.length - total)
      total
    }
    deflater.end()
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(zlen)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  // ---------------------------------------------------------------
  // PNG: the real decoder
  // ---------------------------------------------------------------

  /** Full PNG decode for the 8-bit RGB non-interlaced profile: chunk
    * walk with per-chunk CRC32 VERIFICATION (a single flipped IDAT
    * byte fails integrity before any pixel math), multi-IDAT zlib
    * inflate, and scanline reconstruction inverting all five filter
    * types — Sub, Up, Average (floor of the sum), and the Paeth
    * predictor. Ancillary chunks are skipped by declared length, as
    * the spec requires. Malformed input degrades to `ok = false`. */
  def parsePng(id: Long, bytes: Array[Byte]): PixelMeta = {
    val bad = PixelMeta(id, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L, ok = false)
    if (bytes.length < 8 || (bytes(0) & 0xff) != 0x89 || bytes(1) != 'P' ||
      bytes(2) != 'N' || bytes(3) != 'G') return bad
    def rd32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    var off = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended && off + 12 <= bytes.length) {
      val len = rd32(off)
      if (len < 0 || off + 12 + len > bytes.length) return bad
      val name = new String(bytes, off + 4, 4, "US-ASCII")
      // CRC check over tag + body — real integrity, not a skip
      val c = new java.util.zip.CRC32()
      c.update(bytes, off + 4, 4 + len)
      if (c.getValue.toInt != rd32(off + 8 + len)) return bad
      name match {
        case "IHDR" =>
          if (len != 13) return bad
          w = rd32(off + 8); h = rd32(off + 12)
          val bitDepth = bytes(off + 16)
          val colorType = bytes(off + 17)
          val interlace = bytes(off + 20)
          if (bitDepth != 8 || colorType != 2 || interlace != 0 ||
            w <= 0 || h <= 0) return bad
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => ended = true
        case _ => () // ancillary chunk: skip by length
      }
      off += 12 + len
    }
    if (w <= 0 || h <= 0 || idat.size() == 0) return bad
    val bpp = 3
    // size the scanline buffer in Long and bound it by the deflate
    // stream's maximum expansion (~1032:1) — a crafted IHDR with a
    // valid CRC must not allocate gigabytes before inflate fails
    val rawLen = h.toLong * (1L + w.toLong * bpp)
    if (rawLen > Int.MaxValue ||
      rawLen > idat.size().toLong * 1040L + 65536L) return bad
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val got =
      try {
        var total = 0
        while (!inflater.finished() && total < raw.length)
          total += inflater.inflate(raw, total, raw.length - total)
        total
      } catch { case _: java.util.zip.DataFormatException => -1 }
      finally inflater.end()
    if (got != raw.length) return bad
    var rS, gS, bS, rW, gW, bW = 0L
    val prev = new Array[Int](w * bpp)
    val cur = new Array[Int](w * bpp)
    var y = 0
    while (y < h) {
      val base = y * (1 + w * bpp)
      val f = raw(base) & 0xff
      if (f > 4) return bad
      var k = 0
      while (k < w * bpp) {
        val x = raw(base + 1 + k) & 0xff
        val left = if (k >= bpp) cur(k - bpp) else 0
        val up = prev(k)
        val ul = if (k >= bpp) prev(k - bpp) else 0
        cur(k) = f match {
          case 0 => x
          case 1 => (x + left) & 0xff
          case 2 => (x + up) & 0xff
          case 3 => (x + (left + up) / 2) & 0xff
          case 4 => (x + paeth(left, up, ul)) & 0xff
        }
        k += 1
      }
      var px = 0
      while (px < w) {
        val wgt = (y.toLong * w + px + 1)
        val r = cur(px * bpp); val g = cur(px * bpp + 1); val b = cur(px * bpp + 2)
        rS += r; gS += g; bS += b
        rW += r * wgt; gW += g * wgt; bW += b * wgt
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, w * bpp)
      y += 1
    }
    PixelMeta(id, w, h, rS, gS, bS, rW, gW, bW, ok = true)
  }

  /** Partition-batched PNG decode (the real-codec seam). */
  def decodePngBatch(records: Dataset[Multimodal.MediaRecord]): Dataset[PixelMeta] =
    records.mapPartitions { it =>
      it.map(r => parsePng(r.id, r.media))
    }

  // ---------------------------------------------------------------
  // GIF89a: a REAL LZW codec (variable-width codes, clear/EOI,
  // LSB-first bit packing, 16-color palette)
  // ---------------------------------------------------------------

  /** 16-color palette entry c∈{0,1,2} of slot j for document `id`. */
  def gifPalette(id: Long, j: Int, c: Int): Int =
    Math.floorMod(id * 5L + 17L * j + 41L * c, 256L).toInt

  /** Palette index of pixel (x, y). */
  def gifIndex(id: Long, x: Int, y: Int): Int =
    Math.floorMod(id + 3L * x + 5L * y, 16L).toInt

  def gifWidth(id: Long): Int = (5L + id % 4L).toInt
  def gifHeight(nBytes: Int): Int = 4 + nBytes % 3

  private final val GifMinCode = 4 // 16-color images

  /** GIF-variant LZW compressor over a palette-index stream:
    * dictionary of strings → codes, CLEAR emitted first, code width
    * grows from 5 as the dictionary fills (the `next == 1<<width`
    * rule, capped at 12), EOI last, LSB-first bit packing. */
  def lzwCompress(indices: Array[Int]): Array[Byte] = {
    val clear = 1 << GifMinCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var width = GifMinCode + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap.empty[List[Int], Int]
    var next = eoi + 1
    emit(clear)
    var cur: List[Int] = Nil
    indices.foreach { p =>
      val ext = p :: cur // reversed-prefix key (cheap prepend)
      if (cur.isEmpty) cur = ext
      else if (dict.contains(ext)) cur = ext
      else {
        emit(if (cur.tail.isEmpty) cur.head else dict(cur))
        if (next == 4096) {
          // dictionary full: a 13-bit code must never be squeezed into
          // a 12-bit field — emit CLEAR and restart, the standard
          // GIF-LZW reset every real encoder performs
          emit(clear)
          dict.clear()
          next = eoi + 1
          width = GifMinCode + 1
        } else {
          dict(ext) = next; next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        cur = List(p)
      }
    }
    if (cur.nonEmpty) emit(if (cur.tail.isEmpty) cur.head else dict(cur))
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-variant LZW decompressor: CLEAR resets, the KwKwK case
    * (`code == next`) reconstructs prev + prev.head, width grows in
    * lockstep with the compressor. Returns null on a malformed
    * stream. */
  def lzwDecompress(data: Array[Byte], nExpected: Int): Array[Int] = {
    val clear = 1 << GifMinCode
    val eoi = clear + 1
    var width = GifMinCode + 1
    var bitPos = 0
    def read(): Int = {
      if ((bitPos + width + 7) / 8 > data.length) return -1
      var v = 0; var i = 0
      while (i < width) {
        val bit = bitPos + i
        if ((data(bit / 8) & (1 << (bit % 8))) != 0) v |= 1 << i
        i += 1
      }
      bitPos += width
      v
    }
    val out = new Array[Int](nExpected)
    var outN = 0
    var dict = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    def reset(): Unit = {
      width = GifMinCode + 1
      dict = scala.collection.mutable.ArrayBuffer.tabulate(eoi + 1)(j =>
        if (j < clear) Array(j) else Array.emptyIntArray)
    }
    reset()
    var prev: Array[Int] = null
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return null
      if (code == clear) { reset(); prev = null }
      else if (code == eoi) done = true
      else {
        val entry: Array[Int] =
          if (code < dict.length && (code < clear || dict(code).nonEmpty))
            dict(code)
          else if (code == dict.length && prev != null) prev :+ prev(0)
          else return null
        if (outN + entry.length > nExpected) return null
        System.arraycopy(entry, 0, out, outN, entry.length); outN += entry.length
        if (prev != null && dict.length < 4096) {
          // freeze at 4096 entries (the encoder either CLEARs there —
          // ours does — or keeps emitting existing codes; both sides
          // must stop growing in lockstep)
          dict += (prev :+ entry(0))
          // the decoder's dictionary trails the encoder's by one entry,
          // so it must widen at 2^n - 1 where the encoder widens at 2^n
          // (the classic GIF-LZW sync rule)
          if (dict.length == (1 << width) - 1 && width < 12) width += 1
        }
        prev = entry
      }
    }
    if (outN != nExpected) return null
    out
  }

  /** A genuine GIF89a: header, logical screen descriptor, 16-entry
    * global color table, image descriptor, LZW-compressed index
    * stream in ≤255-byte sub-blocks, trailer. */
  def synthesizeGif(id: Long, nBytes: Int): Array[Byte] = {
    val w = gifWidth(id)
    val h = gifHeight(nBytes)
    val idx = Array.tabulate(w * h)(p => gifIndex(id, p % w, p / w))
    val lzw = lzwCompress(idx)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0xf3) // GCT present, 8-bit resolution, 16-entry table
    out.write(0); out.write(0)
    for (j <- 0 until 16; c <- 0 until 3) out.write(gifPalette(id, j, c))
    out.write(0x2c) // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0) // no local table, not interlaced
    out.write(GifMinCode)
    var o = 0
    while (o < lzw.length) {
      val n = math.min(255, lzw.length - o)
      out.write(n)
      out.write(lzw, o, n)
      o += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF89a decoder: validates the signature, reads the screen
    * descriptor and global color table, walks to the image
    * descriptor, reassembles the LZW sub-blocks, LZW-decompresses the
    * index stream, and maps indices through the palette. Uses the
    * same [[PixelMeta]] signature as BMP/PNG so the three image
    * decoders are interchangeable downstream. */
  def parseGif(id: Long, bytes: Array[Byte]): PixelMeta = {
    val bad = PixelMeta(id, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L, ok = false)
    gifDecodeCore(bytes) match {
      case None => bad
      case Some((w, h, idx, palette)) =>
        var rS, gS, bS, rW, gW, bW = 0L
        var p = 0
        while (p < w * h) {
          val j = idx(p)
          val wgt = ((p / w).toLong * w + (p % w) + 1)
          rS += palette(j)(0); gS += palette(j)(1); bS += palette(j)(2)
          rW += palette(j)(0) * wgt; gW += palette(j)(1) * wgt
          bW += palette(j)(2) * wgt
          p += 1
        }
        PixelMeta(id, w, h, rS, gS, bS, rW, gW, bW, ok = true)
    }
  }

  /** The shared GIF decode core: header/GCT/descriptor parsing,
    * sub-block reassembly, LZW decompression, palette validation.
    * Returns (w, h, indices, palette) or None on malformed input. */
  private def gifDecodeCore(
      bytes: Array[Byte]): Option[(Int, Int, Array[Int], Array[Array[Int]])] = {
    if (bytes.length < 13 ||
      new String(bytes, 0, 6, "US-ASCII") != "GIF89a") return None
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val w = le16(6)
    val h = le16(8)
    // bound the index buffer: w*h near 65535^2 overflows Int (a
    // negative-size allocation throw), and no honest stream is larger
    // than its LZW payload can express
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return None
    val packed = bytes(10) & 0xff
    if ((packed & 0x80) == 0) return None // need a global color table
    val gctSize = 2 << (packed & 7)
    var off = 13
    if (off + gctSize * 3 > bytes.length) return None
    val palette = Array.tabulate(gctSize, 3)((j, c) => bytes(13 + j * 3 + c) & 0xff)
    off += gctSize * 3
    // walk to the image descriptor (skip extensions: 0x21 label size-blocks)
    while (off < bytes.length && (bytes(off) & 0xff) == 0x21) {
      off += 2 // introducer + label
      while (off < bytes.length && bytes(off) != 0) off += 1 + (bytes(off) & 0xff)
      off += 1
    }
    if (off + 10 > bytes.length || (bytes(off) & 0xff) != 0x2c) return None
    val iw = le16(off + 5); val ih = le16(off + 7)
    if (iw != w || ih != h || (bytes(off + 9) & 0x80) != 0) return None
    off += 10
    if (off >= bytes.length || (bytes(off) & 0xff) != GifMinCode) return None
    off += 1
    val lzw = new java.io.ByteArrayOutputStream()
    while (off < bytes.length && bytes(off) != 0) {
      val n = bytes(off) & 0xff
      if (off + 1 + n > bytes.length) return None
      lzw.write(bytes, off + 1, n)
      off += 1 + n
    }
    val idx = lzwDecompress(lzw.toByteArray, w * h)
    if (idx == null || idx.exists(_ >= gctSize)) return None
    Some((w, h, idx, palette))
  }

  /** A perturbed twin of [[synthesizeGif]]: identical except pixel
    * (0, 0)'s palette index is bumped by one — the "same image,
    * one-pixel edit" near-duplicate every perceptual-hash dedup must
    * catch. */
  def synthesizeGifVariant(id: Long, nBytes: Int): Array[Byte] = {
    val w = gifWidth(id)
    val h = gifHeight(nBytes)
    val idx = Array.tabulate(w * h) { p =>
      val j = gifIndex(id, p % w, p / w)
      if (p == 0) (j + 1) % 16 else j
    }
    val lzw = lzwCompress(idx)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0xf3); out.write(0); out.write(0)
    for (j <- 0 until 16; c <- 0 until 3) out.write(gifPalette(id, j, c))
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0)
    out.write(GifMinCode)
    var o = 0
    while (o < lzw.length) {
      val n = math.min(255, lzw.length - o)
      out.write(n); out.write(lzw, o, n); o += n
    }
    out.write(0); out.write(0x3b)
    out.toByteArray
  }

  final case class GifHash(id: Long, variant: Int, hash: Long, ok: Boolean)
  implicit val gifHashEnc: Encoder[GifHash] = Encoders.product[GifHash]

  /** Difference hash (dHash) over the DECODED pixel grid: bit k set
    * iff luminance(x, y) > luminance(x+1, y), scanned row-major over
    * horizontally adjacent pairs (≤ 42 bits for these dims; the
    * production shape resamples to a fixed 9×8 grid first, which
    * these tiny fixtures skip). Luminance is the exact integer
    * r + 2g + b. Computed INSIDE the codec pass — a perceptual-dedup
    * job hashes at decode time, never re-decoding per comparison. */
  def gifDHash(id: Long, variant: Int, bytes: Array[Byte]): GifHash =
    gifDecodeCore(bytes) match {
      case None => GifHash(id, variant, 0L, ok = false)
      case Some((w, h, idx, palette)) =>
        def lum(p: Int): Int = {
          val c = palette(idx(p))
          c(0) + 2 * c(1) + c(2)
        }
        var hash = 0L
        var k = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w - 1) {
            if (lum(y * w + x) > lum(y * w + x + 1)) hash |= 1L << k
            k += 1
            x += 1
          }
          y += 1
        }
        GifHash(id, variant, hash, ok = true)
    }

  // ---------------------------------------------------------------
  // Animated GIF: multi-frame decode + scene-cut detection
  // ---------------------------------------------------------------

  def gifFrameCount(id: Long): Int = (2L + id % 3L).toInt

  /** Scene of frame f: one hard cut per document at frame
    * `1 + id % (k-1)` — the ground truth the detector must recover. */
  def gifSceneOf(id: Long, f: Int): Int = {
    val k = gifFrameCount(id)
    if (f < 1 + (id % (k - 1).toLong).toInt) 0 else 1
  }

  /** Pixel index of frame f: the base recipe shifted by 100·scene, so
    * frames within a scene are identical and frames across the cut
    * differ everywhere. */
  def gifFrameIndex(id: Long, f: Int, x: Int, y: Int): Int =
    Math.floorMod(id + 100L * gifSceneOf(id, f) + 3L * x + 5L * y, 16L).toInt

  /** A genuine ANIMATED GIF89a: one global color table, then per frame
    * a Graphic Control Extension (0x21 0xF9, 4-byte body, delay set)
    * followed by a full-size image descriptor and its own
    * LZW-compressed index stream. */
  def synthesizeAnimatedGif(id: Long, nBytes: Int): Array[Byte] = {
    val w = gifWidth(id)
    val h = gifHeight(nBytes)
    val k = gifFrameCount(id)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0xf3); out.write(0); out.write(0)
    for (j <- 0 until 16; c <- 0 until 3) out.write(gifPalette(id, j, c))
    for (f <- 0 until k) {
      // Graphic Control Extension (10 cs delay, no transparency)
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); out.write(10); out.write(0); out.write(0); out.write(0)
      out.write(0x2c)
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(w & 0xff); out.write(w >> 8)
      out.write(h & 0xff); out.write(h >> 8)
      out.write(0)
      out.write(GifMinCode)
      val idx = Array.tabulate(w * h)(p => gifFrameIndex(id, f, p % w, p / w))
      val lzw = lzwCompress(idx)
      var o = 0
      while (o < lzw.length) {
        val n = math.min(255, lzw.length - o)
        out.write(n); out.write(lzw, o, n); o += n
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  final case class FrameHash(id: Long, frame: Int, hash: Long, ok: Boolean)
  implicit val frameHashEnc: Encoder[FrameHash] = Encoders.product[FrameHash]

  /** Multi-frame GIF decoder: walks GCE + image-descriptor blocks to
    * the trailer, LZW-decodes EVERY frame, and dHashes each at decode
    * time — the real shape of video frame sampling (decode once,
    * hash in-pass, ship metadata). Returns one row per frame; a
    * malformed container yields a single `ok = false` row. */
  def parseAnimatedGif(id: Long, bytes: Array[Byte]): Seq[FrameHash] = {
    val bad = Seq(FrameHash(id, -1, 0L, ok = false))
    if (bytes.length < 13 ||
      new String(bytes, 0, 6, "US-ASCII") != "GIF89a") return bad
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val w = le16(6)
    val h = le16(8)
    // same index-buffer bound as the single-frame decoder
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return bad
    val packed = bytes(10) & 0xff
    if ((packed & 0x80) == 0) return bad
    val gctSize = 2 << (packed & 7)
    var off = 13
    if (off + gctSize * 3 > bytes.length) return bad
    val palette = Array.tabulate(gctSize, 3)((j, c) => bytes(13 + j * 3 + c) & 0xff)
    off += gctSize * 3
    val frames = scala.collection.mutable.ArrayBuffer.empty[FrameHash]
    var frame = 0
    while (off < bytes.length && (bytes(off) & 0xff) != 0x3b) {
      if ((bytes(off) & 0xff) == 0x21) {
        off += 2
        while (off < bytes.length && bytes(off) != 0) off += 1 + (bytes(off) & 0xff)
        off += 1
      } else if ((bytes(off) & 0xff) == 0x2c) {
        if (off + 10 > bytes.length) return bad
        val iw = le16(off + 5); val ih = le16(off + 7)
        if (iw != w || ih != h || (bytes(off + 9) & 0x80) != 0) return bad
        off += 10
        if (off >= bytes.length || (bytes(off) & 0xff) != GifMinCode) return bad
        off += 1
        val lzw = new java.io.ByteArrayOutputStream()
        while (off < bytes.length && bytes(off) != 0) {
          val n = bytes(off) & 0xff
          if (off + 1 + n > bytes.length) return bad
          lzw.write(bytes, off + 1, n)
          off += 1 + n
        }
        off += 1 // block terminator
        val idx = lzwDecompress(lzw.toByteArray, w * h)
        if (idx == null || idx.exists(_ >= gctSize)) return bad
        def lum(p: Int): Int = {
          val c = palette(idx(p)); c(0) + 2 * c(1) + c(2)
        }
        var hash = 0L
        var bit = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w - 1) {
            if (lum(y * w + x) > lum(y * w + x + 1)) hash |= 1L << bit
            bit += 1
            x += 1
          }
          y += 1
        }
        frames += FrameHash(id, frame, hash, ok = true)
        frame += 1
      } else return bad
    }
    if (frames.isEmpty) bad else frames.toSeq
  }

  /** Partition-batched GIF decode. */
  def decodeGifBatch(
      records: Dataset[Multimodal.MediaRecord]): Dataset[PixelMeta] =
    records.mapPartitions { it =>
      it.map(r => parseGif(r.id, r.media))
    }

  /** Partition-batched decode-time dHash over stored GIF containers
    * ([[MediaArtifact]] formats `gif` / `gif_variant`) — a perceptual-
    * dedup job hashes at decode time, never re-decoding per
    * comparison. */
  def dHashBatch(records: Dataset[Multimodal.MediaRecord],
      variant: Int): Dataset[GifHash] =
    records.mapPartitions { it =>
      it.map(r => gifDHash(r.id, variant, r.media))
    }

  /** Partition-batched multi-frame decode + per-frame dHash over
    * stored animated GIFs (1→N frame fan-out in-partition). */
  def frameHashBatch(
      records: Dataset[Multimodal.MediaRecord]): Dataset[FrameHash] =
    records.mapPartitions { it =>
      it.flatMap(r => parseAnimatedGif(r.id, r.media))
    }

  // ---------------------------------------------------------------
  // TIFF (baseline, little-endian, uncompressed RGB8)
  // ---------------------------------------------------------------
  // The data-lake image container BMP/PNG don't cover: tag-directory
  // metadata (an IFD of typed entries addressed by offset) instead of
  // fixed headers. A baseline reader must get the IFD walk right —
  // little-endian entry layout, value-vs-offset packing for entries
  // whose payload exceeds 4 bytes (BitsPerSample), strip addressing —
  // which is exactly what the parser below exercises.

  /** Deterministic channel value at (x, y); distinct constants per
    * channel so an RGB order slip is caught. */
  def tiffChannel(id: Long, x: Int, y: Int, c: Int): Int =
    Math.floorMod(id * 3L + 11L * x + 5L * y + 41L * c, 256L).toInt

  def tiffWidth(id: Long): Int = (5L + id % 4L).toInt
  def tiffHeight(nBytes: Int): Int = 3 + nBytes % 5

  /** A canonical single-strip baseline TIFF: `II*\0`, one IFD with the
    * nine baseline tags of an uncompressed RGB image, pixel data RGB
    * interleaved, rows unpadded (TIFF strips have no row padding —
    * one of the quirks that differ from BMP). */
  def synthesizeTiff(id: Long, nBytes: Int): Array[Byte] = {
    val w = tiffWidth(id)
    val h = tiffHeight(nBytes)
    val nEntries = 9
    // layout: 8-byte header | IFD (2 + 12*n + 4) | bps array (6) | pixels
    val ifdOff = 8
    val bpsOff = ifdOff + 2 + 12 * nEntries + 4
    val pixOff = bpsOff + 6
    val bb = java.nio.ByteBuffer.allocate(pixOff + 3 * w * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    bb.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3 && count == 1) bb.putShort(value.toShort).putShort(0)
      else bb.putInt(value)
    }
    entry(256, 3, 1, w)        // ImageWidth, SHORT
    entry(257, 3, 1, h)        // ImageLength
    entry(258, 3, 3, bpsOff)   // BitsPerSample -> offset (3 shorts > 4B)
    entry(259, 3, 1, 1)        // Compression = none
    entry(262, 3, 1, 2)        // Photometric = RGB
    entry(273, 4, 1, pixOff)   // StripOffsets, LONG
    entry(277, 3, 1, 3)        // SamplesPerPixel
    entry(278, 3, 1, h)        // RowsPerStrip = whole image
    entry(279, 4, 1, 3 * w * h) // StripByteCounts
    bb.putInt(0)               // next-IFD pointer: none
    bb.putShort(8).putShort(8).putShort(8) // the bps array
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) { bb.put(tiffChannel(id, x, y, c).toByte); c += 1 }
        x += 1
      }
      y += 1
    }
    bb.array()
  }

  /** Baseline TIFF decoder: validates the `II*\0` magic, walks the IFD
    * entries by their little-endian layout, honors the value-vs-offset
    * packing (a SHORT[3] BitsPerSample lives behind an offset), reads
    * the single strip, and reports the [[PixelMeta]] channel sums and
    * raster-weighted sums. Malformed structure (wrong magic, offsets
    * out of bounds, unsupported compression/photometric/bps, strip
    * shorter than w·h·3) degrades to `ok = false`, never a throw. */
  def parseTiff(id: Long, bytes: Array[Byte]): PixelMeta = {
    val bad = PixelMeta(id, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L, ok = false)
    def u16(o: Int): Int =
      if (o + 2 > bytes.length) -1
      else (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      if (o + 4 > bytes.length) -1L
      else (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (bytes.length < 8 || bytes(0) != 'I' || bytes(1) != 'I' ||
      u16(2) != 42) return bad
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return bad
    val n = u16(ifd.toInt)
    if (n <= 0 || ifd + 2 + 12L * n > bytes.length) return bad
    var (w, h, comp, photo, spp) = (0, 0, -1, -1, 0)
    var bpsOk = false
    var stripOff = -1L
    var stripLen = -1L
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + 12 * i
      val tag = u16(e)
      val typ = u16(e + 2)
      val count = u32(e + 4)
      def shortOrLong: Int =
        if (typ == 3) u16(e + 8) else u32(e + 8).toInt
      tag match {
        case 256 => w = shortOrLong
        case 257 => h = shortOrLong
        case 258 =>
          if (count == 3 && typ == 3) {
            val off = u32(e + 8)
            bpsOk = off >= 0 && off + 6 <= bytes.length &&
              u16(off.toInt) == 8 && u16(off.toInt + 2) == 8 &&
              u16(off.toInt + 4) == 8
          } else if (count == 1) bpsOk = shortOrLong == 8
        case 259 => comp = shortOrLong
        case 262 => photo = shortOrLong
        case 273 => stripOff = if (typ == 4) u32(e + 8) else u16(e + 8).toLong
        case 277 => spp = shortOrLong
        case 279 => stripLen = if (typ == 4) u32(e + 8) else u16(e + 8).toLong
        case _ => ()
      }
      i += 1
    }
    if (w <= 0 || h <= 0 || comp != 1 || photo != 2 || spp != 3 ||
      !bpsOk || stripOff < 0 || stripLen < 3L * w * h ||
      stripOff + 3L * w * h > bytes.length) return bad
    // dimension cap: a crafted IFD must not drive allocation/looping
    if (w.toLong * h > (1L << 24)) return bad
    var (rs, gs, bs, rw, gw, bw) = (0L, 0L, 0L, 0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = stripOff.toInt + 3 * (y * w + x)
        val wgt = y.toLong * w + x + 1
        val r = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val b = bytes(o + 2) & 0xff
        rs += r; gs += g; bs += b
        rw += r * wgt; gw += g * wgt; bw += b * wgt
        x += 1
      }
      y += 1
    }
    PixelMeta(id, w, h, rs, gs, bs, rw, gw, bw, ok = true)
  }

  /** Partition-batched TIFF decode (the [[Multimodal.decodeBatch]]
    * seam, real codec). */
  def decodeTiffBatch(
      records: Dataset[Multimodal.MediaRecord]): Dataset[PixelMeta] =
    records.mapPartitions { it =>
      it.map(r => parseTiff(r.id, r.media))
    }

  // ---------------------------------------------------------------
  // MP3 (MPEG-1 Audio Layer III): frame-header metadata
  // ---------------------------------------------------------------
  // A duration/bitrate audit never decodes audio: MPEG audio streams
  // self-describe through their 4-byte frame headers (ISO/IEC 11172-3)
  // — sync word, version/layer bits, bitrate and samplerate table
  // indices, padding bit — and the frame length follows as
  // 144 * bitrate / samplerate + padding, so a pure-JVM header walk
  // yields frame count, CBR/VBR, duration, and bitrate stats over
  // stored blobs. Full PCM decode (hybrid filterbank + Huffman) is
  // what stays behind [[Multimodal.decodeStub]]; the frame walk below
  // is a REAL parser of the real container framing.

  /** MPEG-1 Layer III bitrate table, kbit/s, index 1..14 (0 = free,
    * 15 = reserved — both rejected by the walk). */
  private val Mp3BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 samplerate table, Hz, index 0..2 (3 = reserved). */
  private val Mp3SampleRate: Array[Int] = Array(44100, 48000, 32000)

  /** Samples per MPEG-1 Layer III frame. */
  val Mp3SamplesPerFrame = 1152

  // Synthesis recipe — deterministic integer functions of
  // (doc_id, payload length), replayed arithmetically by the oracle.
  def mp3FrameCount(nBytes: Int): Int = 4 + nBytes % 8
  def mp3SampleRateIdx(id: Long): Int = (id % 3L).toInt
  def mp3IsVbr(id: Long): Boolean = id % 2L == 1L

  /** Bitrate table index of frame `f`: fixed for CBR documents,
    * cycling (guaranteed ≥2 distinct values from frame 0→1) for VBR. */
  def mp3BitrateIdx(id: Long, f: Int): Int =
    if (mp3IsVbr(id)) 1 + Math.floorMod(id + 7L * f, 14L).toInt
    else 1 + Math.floorMod(id, 14L).toInt

  private def mp3PaddingBit(id: Long, f: Int): Int =
    Math.floorMod(3L * id + f, 2L).toInt

  /** Frame byte length per the spec: `144 * bitrate / samplerate +
    * padding` (integer division), bitrate in bit/s. */
  private def mp3FrameLen(bitrateIdx: Int, srIdx: Int, pad: Int): Int =
    144 * (Mp3BitrateKbps(bitrateIdx) * 1000) / Mp3SampleRate(srIdx) + pad

  /** A canonical MPEG-1 Layer III stream: `mp3FrameCount` back-to-back
    * frames, each a genuine 4-byte header (sync 0x7FF, version 11 =
    * MPEG-1, layer 01 = III, no CRC, mono, no emphasis) followed by
    * deterministic filler to its spec frame length. */
  def synthesizeMp3(id: Long, nBytes: Int): Array[Byte] = {
    val frames = mp3FrameCount(nBytes)
    val srIdx = mp3SampleRateIdx(id)
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      val bi = mp3BitrateIdx(id, f)
      val pad = mp3PaddingBit(id, f)
      val len = mp3FrameLen(bi, srIdx, pad)
      // header: AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM
      // A=sync, B=version(11), C=layer(01), D=protection(1=no CRC),
      // E=bitrate idx, F=samplerate idx, G=padding, H=private,
      // I=channel mode (11=mono), rest zero
      out.write(0xFF)
      out.write(0xFB) // 111 11 01 1
      out.write((bi << 4) | (srIdx << 2) | (pad << 1))
      out.write(0xC0) // mono
      var j = 4
      while (j < len) {
        out.write(Math.floorMod(id + 131L * f + j, 251L).toInt)
        j += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Frame-walk result: `ok=false` on any malformed framing (lost
    * sync, reserved bitrate/samplerate index, truncated final frame,
    * non-MPEG-1-Layer-III header) — corrupt blobs surface as audit
    * rows, never as exceptions. */
  final case class Mp3Meta(
      id: Long, sampleRate: Int, nFrames: Long, durationMs: Long,
      isCbr: Boolean, minKbps: Int, maxKbps: Int, ok: Boolean)

  implicit val mp3MetaEnc: Encoder[Mp3Meta] = Encoders.product[Mp3Meta]

  /** Walk the frame headers of an MPEG-1 Layer III stream. */
  def parseMp3(id: Long, bytes: Array[Byte]): Mp3Meta = {
    def bad = Mp3Meta(id, 0, 0L, 0L, isCbr = false, 0, 0, ok = false)
    var off = 0
    var frames = 0L
    var sr = -1
    var minK = Int.MaxValue
    var maxK = Int.MinValue
    while (off < bytes.length) {
      if (off + 4 > bytes.length) return bad // truncated header
      val b0 = bytes(off) & 0xFF
      val b1 = bytes(off + 1) & 0xFF
      val b2 = bytes(off + 2) & 0xFF
      // sync (11 bits) + MPEG-1 (version bits 11) + Layer III (01)
      if (b0 != 0xFF || (b1 & 0xE0) != 0xE0) return bad
      if ((b1 & 0x18) != 0x18 || (b1 & 0x06) != 0x02) return bad
      val bi = (b2 >> 4) & 0x0F
      val srIdx = (b2 >> 2) & 0x03
      val pad = (b2 >> 1) & 0x01
      if (bi == 0 || bi == 15 || srIdx == 3) return bad // reserved
      val thisSr = Mp3SampleRate(srIdx)
      if (sr < 0) sr = thisSr
      else if (sr != thisSr) return bad // samplerate must not change
      val kbps = Mp3BitrateKbps(bi)
      minK = math.min(minK, kbps)
      maxK = math.max(maxK, kbps)
      val len = mp3FrameLen(bi, srIdx, pad)
      if (off + len > bytes.length) return bad // truncated frame body
      off += len
      frames += 1
    }
    if (frames == 0L) bad
    else Mp3Meta(id, sr, frames,
      frames * Mp3SamplesPerFrame * 1000L / sr,
      isCbr = minK == maxK, minK, maxK, ok = true)
  }

  /** Partition-batched MP3 frame-header walk (the
    * [[Multimodal.decodeBatch]] seam, real container framing). */
  def decodeMp3Batch(
      records: Dataset[Multimodal.MediaRecord]): Dataset[Mp3Meta] =
    records.mapPartitions { it =>
      it.map(r => parseMp3(r.id, r.media))
    }
}
