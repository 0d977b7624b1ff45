package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the MPEG-1 video intra decoder ([[Mpeg1]]). The container
  * has no independent JDK decoder (unlike JPEG/ImageIO), so the
  * cross-checks are DOUBLE-ENTRY: the tests hand-assemble bitstreams
  * from the published 11172-2 bit layouts (spelled out here as
  * string literals, independently of the implementation's tables) and
  * compare the decode against coefficient math computed in the test.
  *  - golden header bytes: the synthesized sequence header matches a
  *    hand-computed byte layout;
  *  - round trip: synthesize → parse reproduces the recipe exactly
  *    (frame counts, flat-block luma sums);
  *  - AC path: a hand-built stream with a Table-B.5 coefficient, an
  *    escape-coded coefficient, and the default-matrix dequant +
  *    oddification decodes to the reference IDCT of the expected
  *    coefficient block;
  *  - custom intra matrix: load_intra_quant_matrix = 1 changes the
  *    AC reconstruction exactly as the matrix says;
  *  - intra DC prediction chains across macroblocks and resets per
  *    slice (two-macroblock stream). */
class Mpeg1CodecSpec extends AnyFunSuite {

  // ---- hand assembly (independent of Mpeg1's internal tables) ----

  private final class Bits {
    private val sb = new StringBuilder
    def put(s: String): Bits = { sb.append(s); this }
    def putN(v: Long, n: Int): Bits = {
      (n - 1 to 0 by -1).foreach(i => sb.append((v >> i) & 1L))
      this
    }
    def align(): Bits = { while (sb.length % 8 != 0) sb.append('0'); this }
    def start(code: Int): Bits = { align(); putN(0x000001L, 24); putN(code, 8) }
    def bytes(): Array[Byte] = {
      align()
      sb.toString.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    }
  }

  /** Sequence header for w×h, default matrices (aspect 1.0, 25 Hz,
    * variable bit rate) — the exact field layout of 11172-2 §2.4.2.3. */
  private def seqHeader(b: Bits, w: Int, h: Int): Bits =
    b.start(0xB3).putN(w, 12).putN(h, 12).putN(1, 4).putN(3, 4)
      .putN(0x3FFFF, 18).put("1").putN(0, 10).put("0").put("0").put("0")

  private def gop(b: Bits): Bits =
    b.start(0xB8).putN(0, 25).put("1").put("0")

  private def pictureI(b: Bits, tref: Int): Bits =
    b.start(0x00).putN(tref, 10).putN(1, 3).putN(0xFFFF, 16)

  /** DC differential: size VLC (published code passed in by the
    * caller) + signed-magnitude bits. */
  private def dcBits(diff: Int): (Int, String) = {
    val size =
      if (diff == 0) 0
      else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    val bits =
      if (size == 0) ""
      else {
        val v = if (diff >= 0) diff else diff + (1 << size) - 1
        (size - 1 to 0 by -1).map(i => (v >> i) & 1).mkString
      }
    (size, bits)
  }
  private val LumSize = Map(0 -> "100", 1 -> "00", 2 -> "01", 3 -> "101",
    4 -> "110", 5 -> "1110", 6 -> "11110", 7 -> "111110", 8 -> "1111110")
  private val ChrSize = Map(0 -> "00", 1 -> "01", 2 -> "10", 3 -> "110",
    4 -> "1110", 5 -> "11110", 6 -> "111110", 7 -> "1111110",
    8 -> "11111110")

  private def putLumDc(b: Bits, diff: Int): Bits = {
    val (size, bits) = dcBits(diff)
    b.put(LumSize(size)).put(bits)
  }
  private def putChrDc(b: Bits, diff: Int): Bits = {
    val (size, bits) = dcBits(diff)
    b.put(ChrSize(size)).put(bits)
  }

  test("golden bytes: synthesized sequence header matches hand layout") {
    val got = Mpeg1.synthesizeMpeg1(id = 2L, nBytes = 0)
    val want = seqHeader(new Bits, 16, 16).bytes()
    assert(got.take(want.length).toSeq == want.toSeq,
      s"header mismatch:\n got ${got.take(12).map(b => f"${b & 0xff}%02x").mkString(" ")}" +
        s"\nwant ${want.map(b => f"${b & 0xff}%02x").mkString(" ")}")
  }

  test("round trip reproduces the recipe exactly") {
    for (id <- 0L to 9L; n <- Seq(0, 7, 23)) {
      val m = Mpeg1.parseMpeg1(id, Mpeg1.synthesizeMpeg1(id, n))
      assert(m.ok, s"id=$id n=$n not ok")
      val w = Mpeg1.mpgWidth(id)
      val k = Mpeg1.mpgFrameCount(n)
      assert(m.width == w && m.height == 16 && m.nFrames == k)
      val iFrames = (0 until k).filter(Mpeg1.mpgIsIntra)
      assert(m.nIFrames == iFrames.size && m.nPFrames == k - iFrames.size)
      var s = 0L; var sw = 0L
      for (f <- iFrames; by <- 0 until 2; bx <- 0 until w / 8) {
        val lum = Mpeg1.mpgBlockLum(id, f, bx, by).toLong
        s += 64L * lum
        sw += 64L * lum * (by * (w / 8) + bx + 1)
      }
      assert(m.lumSum == s, s"id=$id n=$n lumSum ${m.lumSum} != $s")
      assert(m.lumWsum == sw)
    }
  }

  /** One-macroblock I-frame stream builder with caller-provided block
    * bit bodies (4 luma + 2 chroma, each already including its EOB). */
  private def oneMbStream(w: Int, blockBits: Seq[String],
      loadIntraMatrix: Option[Array[Int]] = None): Array[Byte] = {
    val b = new Bits
    b.start(0xB3).putN(w, 12).putN(16, 12).putN(1, 4).putN(3, 4)
      .putN(0x3FFFF, 18).put("1").putN(0, 10).put("0")
    loadIntraMatrix match {
      case Some(m) =>
        b.put("1"); m.foreach(v => b.putN(v, 8)) // zigzag order
      case None => b.put("0")
    }
    b.put("0") // non-intra matrix default
    gop(b)
    pictureI(b, 0)
    b.start(0x01).putN(8, 5).put("0") // slice, qscale 8
    b.put("1") // addr increment 1
    b.put("1") // mb type intra
    blockBits.foreach(b.put)
    b.start(0xB7)
    b.bytes()
  }

  test("AC path: B.5 code + escape + default matrix + oddification") {
    // luma block 0: DC 100 (diff -28), AC (run 0, level 2) via the
    // published '0100' code with sign 0, then an escape-coded
    // (run 3, level 40), then EOB '10'.
    val (s0, bits0) = dcBits(-28)
    val blk0 = LumSize(s0) + bits0 +
      "0100" + "0" + // (0,2) positive
      "000001" + "000011" + "00101000" + // escape run=3 level=40
      "10"
    val flat = LumSize(0) + "10" // DC diff 0, EOB
    val chr = ChrSize(0) + "10"
    val stream = oneMbStream(16, Seq(blk0, flat, flat, flat, chr, chr))
    val m = Mpeg1.parseMpeg1(99L, stream)
    assert(m.ok && m.nIFrames == 1 && m.nFrames == 1)
    // expected coefficient block (natural order): DC = 1024 - 28*8 =
    // 800; scan 1 -> natural (0,1): (2*2*8*Q)/16 with Q=16 -> 32,
    // even -> 31; scan 5 (1 + 3 + 1) -> natural index Zigzag(5):
    // (2*40*8*Q)/16 with the default matrix value there.
    val coef = new Array[Int](64)
    coef(0) = 800
    coef(Mpeg1.Zigzag(1)) = 31 // 32 oddified
    val natIdx = Mpeg1.Zigzag(5)
    var v = (2 * 40 * 8 * Mpeg1.DefaultIntraQuant(natIdx)) / 16
    if ((v & 1) == 0) v -= 1
    coef(natIdx) = math.max(-2048, math.min(2047, v))
    val px = Mpeg1.idctBlock(coef)
    val expectedBlock0 = px.map(_.toLong).sum
    // remaining three luma blocks are flat at the chained DC (100)
    val expected = expectedBlock0 + 3 * 64L * 100L
    assert(m.lumSum == expected,
      s"lumSum ${m.lumSum} != $expected (block0 $expectedBlock0)")
  }

  test("custom intra quantizer matrix changes AC reconstruction") {
    // A pure AC basis function is orthogonal to DC, so with mid-range
    // pixels its IDCT sums to zero and a matrix change would cancel
    // in lumSum. Drive the block into the [0,255] CLAMP instead
    // (DC 240, a big escape-coded AC): clamping is asymmetric, so the
    // reconstruction level — and therefore the quantizer — shows up
    // in the sum.
    def streamWith(matrix: Option[Array[Int]]): Long = {
      val (s0, bits0) = dcBits(240 - 128)
      val blk0 = LumSize(s0) + bits0 +
        "000001" + "000000" + "01100100" + // escape run=0 level=100
        "10"
      val flat = LumSize(0) + "10"
      val chr = ChrSize(0) + "10"
      val m = Mpeg1.parseMpeg1(5L,
        oneMbStream(16, Seq(blk0, flat, flat, flat, chr, chr), matrix))
      assert(m.ok)
      m.lumSum
    }
    val allQ = Array.fill(64)(32) // doubles the default value 16 at scan 1
    val defSum = streamWith(None)
    val custSum = streamWith(Some(allQ))
    def sumFor(ac: Int): Long = {
      val coef = new Array[Int](64)
      coef(0) = 240 * 8; coef(Mpeg1.Zigzag(1)) = ac
      Mpeg1.idctBlock(coef).map(_.toLong).sum + 3 * 64L * 240L
    }
    // default Q=16: (2*100*8*16)/16 = 1600 -> 1599 (oddified);
    // custom Q=32: 3200 -> 3199 -> saturated to 2047
    assert(defSum == sumFor(1599), s"default-matrix sum $defSum")
    assert(custSum == sumFor(2047), s"custom-matrix sum $custSum")
    assert(defSum != custSum, "custom matrix had no effect")
  }

  test("DC prediction chains across macroblocks within a slice") {
    // two macroblocks (w = 32): block luma DCs 100,100,100,100 then
    // 50,50,50,50 — the second MB's first diff is 50-100 = -50
    val (sA, bitsA) = dcBits(100 - 128)
    val (sB, bitsB) = dcBits(50 - 100)
    val flat = LumSize(0) + "10"
    val chr = ChrSize(0) + "10"
    val b = new Bits
    seqHeader(b, 32, 16); gop(b); pictureI(b, 0)
    b.start(0x01).putN(8, 5).put("0")
    b.put("1").put("1") // mb 0: inc 1, intra
    b.put(LumSize(sA) + bitsA + "10").put(flat).put(flat).put(flat)
      .put(chr).put(chr)
    b.put("1").put("1") // mb 1: inc 1, intra
    b.put(LumSize(sB) + bitsB + "10").put(flat).put(flat).put(flat)
      .put(chr).put(chr)
    b.start(0xB7)
    val m = Mpeg1.parseMpeg1(4L, b.bytes())
    assert(m.ok && m.width == 32)
    // mb0: 4 blocks of 100; mb1: 4 blocks of 50
    assert(m.lumSum == 4 * 64L * 100 + 4 * 64L * 50)
    // weighted: mb0 blocks (bx 0,1 × by 0,1), mb1 blocks (bx 2,3)
    val w8 = 4
    val wsum =
      (for (by <- 0 until 2; bx <- 0 until 2)
        yield 64L * 100 * (by * w8 + bx + 1)).sum +
      (for (by <- 0 until 2; bx <- 2 until 4)
        yield 64L * 50 * (by * w8 + bx + 1)).sum
    assert(m.lumWsum == wsum)
  }

  test("truncated and garbage inputs degrade to ok=false") {
    val good = Mpeg1.synthesizeMpeg1(3L, 11)
    assert(!Mpeg1.parseMpeg1(3L, Array.empty[Byte]).ok)
    assert(!Mpeg1.parseMpeg1(3L, Array.fill(64)(0x55.toByte)).ok)
    assert(!Mpeg1.parseMpeg1(3L, good.take(6)).ok)
  }
}
