package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** A from-scratch baseline-sequential JPEG codec (ITU-T T.81) — the
  * last image format behind the [[Multimodal]] decode seam that was
  * still stubbed. Pure JVM arithmetic, same as the PNG/GIF/BMP/WAV
  * codecs: no ImageIO, no native libraries.
  *
  * Profile: baseline DCT, 8-bit samples, 1 (grayscale) or 3 (YCbCr
  * 4:4:4) components, standard Annex K quantization and Huffman
  * tables, no restart markers, no progressive scans. The encoder
  * emits SOI / DQT / SOF0 / DHT×4 / SOS / EOI with entropy-coded
  * byte stuffing (0xFF → 0xFF 0x00); the decoder walks markers by
  * declared segment length, builds canonical Huffman trees from the
  * DHT bit-length counts, entropy-decodes DC-diff + AC run/size
  * pairs through the zigzag order, dequantizes, inverse-DCTs, and
  * converts YCbCr back to RGB. Malformed input degrades to a null
  * decode (`ok = false` rows downstream), never a throw or a hang.
  *
  * Exactness contract for the registry oracle: JPEG is lossy, but a
  * block that is FLAT (all 64 samples equal) has only a DC
  * coefficient, and when the level-shifted value is EVEN the
  * quantize→dequantize→IDCT chain reproduces it exactly (DC = 8s,
  * Q(0,0) = 16, so the quantized value is the exact integer s/2 and
  * every float error stays orders of magnitude below the final
  * round). The synthesized fixtures use even-valued flat gray
  * blocks, so DuckDB replays the DECODED pixels arithmetically —
  * while the entropy coding, DC prediction, and IDCT the decode runs
  * are the real thing (and the textured-image paths are pinned in
  * JpegCodecSpec against the JDK's independent ImageIO codec).
  */
object Jpeg {

  // ------------------------------------------------------------------
  // Tables (ITU-T T.81 Annex K)
  // ------------------------------------------------------------------

  /** K.1 luminance quantization table, natural (row-major) order. */
  private[operators] val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** K.2 chrominance quantization table, natural order. */
  private[operators] val QChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zigzag order: zigzag(k) = natural index of the k-th coefficient. */
  private[operators] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K Huffman specs: (bits[1..16] counts, values)
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChromBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChromBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Canonical Huffman code assignment (T.81 C.2): codes ordered by
    * length then by the order values appear. Returns value →
    * (code, length). */
  private def buildCodes(bits: Array[Int], vals: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.HashMap.empty[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) {
        out(vals(k) & 0xff) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.toMap
  }

  private lazy val DcLumEnc = buildCodes(DcLumBits, DcLumVals)
  private lazy val AcLumEnc = buildCodes(AcLumBits, AcLumVals)
  private lazy val DcChromEnc = buildCodes(DcChromBits, DcChromVals)
  private lazy val AcChromEnc = buildCodes(AcChromBits, AcChromVals)

  // ------------------------------------------------------------------
  // DCT (naive double-precision — blocks are 8×8, images are small;
  // Java 17+ floating point is strict, so results are deterministic)
  // ------------------------------------------------------------------

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Forward 8×8 DCT-II over level-shifted samples. */
  private def fdct(s: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            acc += s(y * 8 + x) * CosTable(x * 8 + u) * CosTable(y * 8 + v)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        out(v * 8 + u) = 0.25 * cu * cv * acc
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse 8×8 DCT over dequantized coefficients. */
  private def idct(f: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val cu = if (u == 0) InvSqrt2 else 1.0
            val cv = if (v == 0) InvSqrt2 else 1.0
            acc += cu * cv * f(v * 8 + u) * CosTable(x * 8 + u) * CosTable(y * 8 + v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = 0.25 * acc
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // Encoder
  // ------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >>> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (cnt > 0) {
      buf = (buf << (8 - cnt)) | ((1 << (8 - cnt)) - 1)
      out.write(buf)
      if (buf == 0xff) out.write(0x00)
      buf = 0; cnt = 0
    }
  }

  /** Magnitude category of a coefficient (number of bits). */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** One's-complement magnitude bits for a coefficient (T.81 F.1.2.1). */
  private def magBits(v: Int, cat: Int): Int =
    if (v >= 0) v else v + (1 << cat) - 1

  private def round(x: Double): Int =
    if (x >= 0) (x + 0.5).toInt else -((-x + 0.5).toInt)

  private def clamp(x: Int): Int = if (x < 0) 0 else if (x > 255) 255 else x

  private def writeSegment(out: java.io.ByteArrayOutputStream, marker: Int,
      body: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = body.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(body, 0, body.length)
  }

  /** Encode an image as baseline JPEG. `rgb(x, y)` returns packed
    * 0xRRGGBB. `gray = true` emits a single-component scan. */
  def encode(w: Int, h: Int, rgb: (Int, Int) => Int, gray: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0)
    val nComp = if (gray) 1 else 3
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // DQT (two tables in one segment; table 1 only when color)
    val dqtBody = new java.io.ByteArrayOutputStream()
    dqtBody.write(0x00) // precision 0, id 0
    for (k <- 0 until 64) dqtBody.write(QLum(Zigzag(k)))
    if (!gray) {
      dqtBody.write(0x01)
      for (k <- 0 until 64) dqtBody.write(QChrom(Zigzag(k)))
    }
    writeSegment(out, 0xdb, dqtBody.toByteArray)
    // SOF0
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8) // precision
    sof.write((h >> 8) & 0xff); sof.write(h & 0xff)
    sof.write((w >> 8) & 0xff); sof.write(w & 0xff)
    sof.write(nComp)
    for (c <- 0 until nComp) {
      sof.write(c + 1)  // component id
      sof.write(0x11)   // 1×1 sampling (4:4:4)
      sof.write(if (c == 0) 0 else 1) // quant table id
    }
    writeSegment(out, 0xc0, sof.toByteArray)
    // DHT (all four Annex K tables; chrominance ones only when color)
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      b.write((cls << 4) | id)
      for (l <- 1 to 16) b.write(bits(l))
      b.write(vals, 0, vals.length)
      writeSegment(out, 0xc4, b.toByteArray)
    }
    dht(0, 0, DcLumBits, DcLumVals)
    dht(1, 0, AcLumBits, AcLumVals)
    if (!gray) {
      dht(0, 1, DcChromBits, DcChromVals)
      dht(1, 1, AcChromBits, AcChromVals)
    }
    // SOS
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(nComp)
    for (c <- 0 until nComp) {
      sos.write(c + 1)
      sos.write(if (c == 0) 0x00 else 0x11) // DC/AC table ids
    }
    sos.write(0); sos.write(63); sos.write(0) // spectral selection
    writeSegment(out, 0xda, sos.toByteArray)
    // entropy-coded data: MCU = one 8×8 block per component (4:4:4)
    val bw = new BitWriter(out)
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    val dcPred = new Array[Int](nComp)
    val samples = new Array[Double](64)
    for (by <- 0 until blocksY; bx <- 0 until blocksX; c <- 0 until nComp) {
      // gather level-shifted component samples, replicating edges
      var k = 0
      while (k < 64) {
        val x = math.min(bx * 8 + k % 8, w - 1)
        val y = math.min(by * 8 + k / 8, h - 1)
        val p = rgb(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        val s =
          if (gray || c == 0) round(0.299 * r + 0.587 * g + 0.114 * b)
          else if (c == 1) round(-0.168736 * r - 0.331264 * g + 0.5 * b) + 128
          else round(0.5 * r - 0.418688 * g - 0.081312 * b) + 128
        samples(k) = clamp(s) - 128.0
        k += 1
      }
      val coef = fdct(samples)
      val qt = if (c == 0) QLum else QChrom
      val q = Array.tabulate(64)(i => round(coef(i) / qt(i)))
      val (dcEnc, acEnc) =
        if (c == 0) (DcLumEnc, AcLumEnc) else (DcChromEnc, AcChromEnc)
      // DC: category + magnitude bits of the prediction difference
      val diff = q(0) - dcPred(c)
      dcPred(c) = q(0)
      val dcCat = category(diff)
      val (dcCode, dcLen) = dcEnc(dcCat)
      bw.write(dcCode, dcLen)
      if (dcCat > 0) bw.write(magBits(diff, dcCat), dcCat)
      // AC: run/size through the zigzag order, ZRL for 16-zero runs
      var run = 0
      var zz = 1
      while (zz < 64) {
        val v = q(Zigzag(zz))
        if (v == 0) run += 1
        else {
          while (run > 15) {
            val (zc, zl) = acEnc(0xf0); bw.write(zc, zl); run -= 16
          }
          val cat = category(v)
          val (code, len) = acEnc((run << 4) | cat)
          bw.write(code, len)
          bw.write(magBits(v, cat), cat)
          run = 0
        }
        zz += 1
      }
      if (run > 0) { val (ec, el) = acEnc(0x00); bw.write(ec, el) } // EOB
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  /** Canonical Huffman decoding table: minCode/maxCode/valPtr per
    * length (T.81 F.2.2.3). */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (l <- 1 to 16) {
        if (bits(l) == 0) { minCode(l) = 0; maxCode(l) = -1; valPtr(l) = k }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len)) & 0xff
  }

  /** Entropy-coded-segment bit reader honoring byte stuffing; returns
    * -1 past the segment end (a marker byte not followed by 0x00). */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    var bad = false
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= bytes.length) { bad = true; return -1 }
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) { bad = true; return -1 }
          val next = bytes(pos) & 0xff
          if (next == 0x00) pos += 1 // stuffed 0xFF data byte
          else { bad = true; return -1 } // a real marker ends the scan
          b = 0xff
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = bit(); if (b < 0) return -1
        v = (v << 1) | b; i += 1
      }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val b = bit(); if (b < 0) return -1
        code = (code << 1) | b
        len += 1
        if (t.maxCode(len) >= t.minCode(len) && code <= t.maxCode(len) &&
          code >= t.minCode(len)) return t.value(len, code)
      }
      bad = true
      -1
    }
  }

  /** Extend magnitude bits to a signed coefficient (T.81 F.2.2.1). */
  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0 else if (v < (1 << (cat - 1))) v - (1 << cat) + 1 else v

  final case class Decoded(width: Int, height: Int, rgb: Array[Int])

  /** Decode a baseline JPEG within the supported profile. Returns
    * null on anything malformed or out of profile. */
  def decode(bytes: Array[Byte]): Decoded = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
      (bytes(1) & 0xff) != 0xd8) return null
    var pos = 2
    val qtabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var w = -1; var h = -1
    var nComp = 0
    // per component: (quant id, dc id, ac id)
    val compQ = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    var scanStart = -1

    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)

    while (scanStart < 0) {
      if (pos + 4 > bytes.length) return null
      if ((bytes(pos) & 0xff) != 0xff) return null
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd9) return null // EOI before any scan
      val len = u16(pos + 2)
      if (len < 2 || pos + 2 + len > bytes.length) return null
      val body = pos + 4
      val bodyLen = len - 2
      marker match {
        case 0xdb => // DQT: one or more (precision|id, 64 entries)
          var o = body
          while (o < body + bodyLen) {
            val pq = (bytes(o) & 0xff) >> 4
            val id = bytes(o) & 0x0f
            if (pq != 0 || id > 3 || o + 65 > body + bodyLen) return null
            val t = new Array[Int](64)
            for (k <- 0 until 64) t(Zigzag(k)) = bytes(o + 1 + k) & 0xff
            qtabs(id) = t
            o += 65
          }
        case 0xc0 => // SOF0 baseline
          if (bodyLen < 6) return null
          if ((bytes(body) & 0xff) != 8) return null
          h = u16(body + 1); w = u16(body + 3)
          nComp = bytes(body + 5) & 0xff
          // Cap total pixels (like the GIF/BMP decoders): a crafted
          // SOF0 with w=h=65536 would pass per-axis checks but make
          // blocksX*blocksY*64 overflow Int to a 0-length plane (AIOOBE
          // on the first MCU), and w=h=32768 would attempt an ~8.6 GB
          // allocation — both violate the never-throw decode contract.
          if (w <= 0 || h <= 0 || w > (1 << 16) || h > (1 << 16) ||
            w.toLong * h > (1L << 24) ||
            (nComp != 1 && nComp != 3) ||
            bodyLen < 6 + 3 * nComp) return null
          for (c <- 0 until nComp) {
            val o = body + 6 + 3 * c
            val sampling = bytes(o + 1) & 0xff
            if (sampling != 0x11) return null // profile: 4:4:4 only
            compQ(c) = bytes(o + 2) & 0x0f
            if (compQ(c) > 3) return null // table slots are 0..3
          }
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
             0xcb | 0xcd | 0xce | 0xcf =>
          return null // non-baseline SOF: out of profile
        case 0xc4 => // DHT: one or more tables
          var o = body
          while (o < body + bodyLen) {
            if (o + 17 > body + bodyLen) return null
            val cls = (bytes(o) & 0xff) >> 4
            val id = bytes(o) & 0x0f
            if (cls > 1 || id > 3) return null
            val bits = new Array[Int](17)
            var total = 0
            for (l <- 1 to 16) { bits(l) = bytes(o + l) & 0xff; total += bits(l) }
            if (o + 17 + total > body + bodyLen || total > 256) return null
            val vals = new Array[Byte](total)
            System.arraycopy(bytes, o + 17, vals, 0, total)
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTabs(id) = t else acTabs(id) = t
            o += 17 + total
          }
        case 0xda => // SOS
          if (w < 0) return null
          val ns = bytes(body) & 0xff
          if (ns != nComp || bodyLen < 1 + 2 * ns + 3) return null
          for (c <- 0 until ns) {
            compDc(c) = (bytes(body + 2 + 2 * c) & 0xff) >> 4
            compAc(c) = bytes(body + 2 + 2 * c) & 0x0f
            if (compDc(c) > 3 || compAc(c) > 3) return null
          }
          scanStart = pos + 2 + len
        case 0xdd => return null // DRI: restart intervals out of profile
        case _ => () // APPn / COM / others: skip by length
      }
      pos += 2 + len
    }

    for (c <- 0 until nComp) {
      if (qtabs(compQ(c)) == null || dcTabs(compDc(c)) == null ||
        acTabs(compAc(c)) == null) return null
    }

    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    // a baseline scan costs >= ~6 bits per block per component (DC
    // category code + EOB), so a container too small to hold its
    // declared dimensions is malformed — reject BEFORE allocating
    // block planes (a 300-byte file claiming 65536x65536 would
    // otherwise allocate gigabytes). The 2-bits-per-block bound is
    // loose enough to never reject a legitimate stream.
    val entropyBytes = (bytes.length - scanStart).toLong
    if (blocksX.toLong * blocksY * nComp > entropyBytes * 4L) return null
    val br = new BitReader(bytes, scanStart)
    val dcPred = new Array[Int](nComp)
    // decoded component planes at block resolution
    val planes = Array.ofDim[Double](nComp, blocksX * blocksY * 64)
    val coef = new Array[Double](64)
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        var c = 0
        while (c < nComp) {
          java.util.Arrays.fill(coef, 0.0)
          val qt = qtabs(compQ(c))
          val dcCat = br.decode(dcTabs(compDc(c)))
          if (dcCat < 0 || dcCat > 11) return null
          val dcBits = if (dcCat == 0) 0 else br.bits(dcCat)
          if (dcBits < 0) return null
          dcPred(c) += extend(dcBits, dcCat)
          coef(0) = dcPred(c).toDouble * qt(0)
          var zz = 1
          while (zz < 64) {
            val rs = br.decode(acTabs(compAc(c)))
            if (rs < 0) return null
            if (rs == 0x00) zz = 64 // EOB
            else if (rs == 0xf0) zz += 16 // ZRL
            else {
              val run = rs >> 4
              val cat = rs & 0x0f
              zz += run
              if (zz > 63) return null
              val mb = br.bits(cat)
              if (mb < 0) return null
              coef(Zigzag(zz)) = extend(mb, cat).toDouble * qt(Zigzag(zz))
              zz += 1
            }
          }
          val px = idct(coef)
          val base = (by * blocksX + bx) * 64
          System.arraycopy(px, 0, planes(c), base, 64)
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    if (br.bad) return null

    val rgb = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = ((y / 8) * blocksX + (x / 8)) * 64 + (y % 8) * 8 + (x % 8)
        val out =
          if (nComp == 1) {
            val g = clamp(round(planes(0)(base) + 128.0))
            (g << 16) | (g << 8) | g
          } else {
            val yv = planes(0)(base) + 128.0
            val cb = planes(1)(base) // chroma planes are already centered
            val cr = planes(2)(base)
            val r = clamp(round(yv + 1.402 * cr))
            val g = clamp(round(yv - 0.344136 * cb - 0.714136 * cr))
            val b = clamp(round(yv + 1.772 * cb))
            (r << 16) | (g << 8) | b
          }
        rgb(y * w + x) = out
        x += 1
      }
      y += 1
    }
    Decoded(w, h, rgb)
  }

  // ------------------------------------------------------------------
  // Registry fixtures: even-valued flat gray blocks (exact decode)
  // ------------------------------------------------------------------

  def jpegBlocksX(id: Long): Int = (1L + id % 3L).toInt
  def jpegBlocksY(nBytes: Int): Int = 1 + nBytes % 2

  /** Flat gray value of block (bx, by): even by construction, so the
    * quantize→dequantize→IDCT chain reproduces it exactly (see the
    * object Scaladoc). */
  def jpegBlockValue(id: Long, bx: Int, by: Int): Int =
    2 * Math.floorMod(id * 5L + 11L * bx + 23L * by, 128L).toInt

  /** Synthesized grayscale baseline JPEG of `8·blocksX × 8·blocksY`
    * even-valued flat blocks. */
  def synthesizeJpeg(id: Long, nBytes: Int): Array[Byte] = {
    val w = 8 * jpegBlocksX(id)
    val h = 8 * jpegBlocksY(nBytes)
    encode(w, h, (x, y) => {
      val v = jpegBlockValue(id, x / 8, y / 8)
      (v << 16) | (v << 8) | v
    }, gray = true)
  }

  /** Decode to the same [[Codecs.PixelMeta]] signature as the other
    * image codecs (channel sums + raster-weighted sums). */
  def parseJpeg(id: Long, bytes: Array[Byte]): Codecs.PixelMeta = {
    val bad = Codecs.PixelMeta(id, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L, ok = false)
    val d = decode(bytes)
    if (d == null) return bad
    var rS, gS, bS, rW, gW, bW = 0L
    var p = 0
    while (p < d.rgb.length) {
      val v = d.rgb(p)
      val r = (v >> 16) & 0xff; val g = (v >> 8) & 0xff; val b = v & 0xff
      val wgt = (p + 1).toLong
      rS += r; gS += g; bS += b
      rW += r * wgt; gW += g * wgt; bW += b * wgt
      p += 1
    }
    Codecs.PixelMeta(id, d.width, d.height, rS, gS, bS, rW, gW, bW, ok = true)
  }

  implicit val pixelMetaEnc: Encoder[Codecs.PixelMeta] =
    Encoders.product[Codecs.PixelMeta]

  /** Partition-batched JPEG decode (the [[Multimodal]] seam). */
  def decodeJpegBatch(
      records: Dataset[Multimodal.MediaRecord]): Dataset[Codecs.PixelMeta] =
    records.mapPartitions { it =>
      it.map(r => parseJpeg(r.id, r.media))
    }
}
