package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The JPEG codec must implement real T.81 baseline coding — these
  * tests pin the exact-decode contract on flat even-valued blocks,
  * cross-check BOTH directions against the JDK's independent ImageIO
  * JPEG codec (decode parity on identical compressed bits; decoding
  * ImageIO-written files), and corrupt specific markers. A stub keyed
  * off id or length could pass none of them.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def gray(v: Int): Int = (v << 16) | (v << 8) | v

  test("flat even-valued blocks decode EXACTLY (the registry oracle contract)") {
    for (id <- 0L to 8L; nBytes <- Seq(0, 1)) {
      val bytes = Jpeg.synthesizeJpeg(id, nBytes)
      val d = Jpeg.decode(bytes)
      assert(d != null, s"id=$id must decode")
      val w = 8 * Jpeg.jpegBlocksX(id)
      val h = 8 * Jpeg.jpegBlocksY(nBytes)
      assert(d.width == w && d.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = Jpeg.jpegBlockValue(id, x / 8, y / 8)
        assert(d.rgb(y * w + x) == gray(v),
          s"id=$id ($x,$y): flat even block must survive the DCT chain exactly")
      }
    }
  }

  test("decode parity with ImageIO on identical compressed bits (gray)") {
    // textured content exercises the AC run/size path; both decoders
    // read the SAME entropy-coded stream, so differences can only be
    // IDCT rounding — bounded by the T.81 conformance slack
    val w = 24; val h = 16
    val img = (x: Int, y: Int) => gray((x * 13 + y * 29 + (x * y) % 31) % 256)
    val bytes = Jpeg.encode(w, h, img, gray = true)
    val mine = Jpeg.decode(bytes)
    assert(mine != null)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "ImageIO must accept our baseline stream")
    assert(ref.getWidth == w && ref.getHeight == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val a = mine.rgb(y * w + x) & 0xff
      // raw raster sample — getRGB would run the gray->sRGB transform
      val b = ref.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(a - b))
    }
    assert(maxDiff <= 1,
      s"same bits, two IDCTs: per-sample difference must be <= 1 (got $maxDiff)")
  }

  test("decode parity with ImageIO on identical compressed bits (color 4:4:4)") {
    val w = 16; val h = 16
    val img = (x: Int, y: Int) =>
      (((x * 17 + y * 3) % 256) << 16) | (((x * 5 + y * 23) % 256) << 8) |
        ((x * 11 + y * 7) % 256)
    val bytes = Jpeg.encode(w, h, img)
    val mine = Jpeg.decode(bytes)
    assert(mine != null)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; shift <- Seq(16, 8, 0)) {
      val a = (mine.rgb(y * w + x) >> shift) & 0xff
      val b = (ref.getRGB(x, y) >> shift) & 0xff
      maxDiff = math.max(maxDiff, math.abs(a - b))
    }
    assert(maxDiff <= 2,
      s"IDCT + YCbCr rounding slack only (got $maxDiff)")
  }

  test("an ImageIO-written JPEG decodes within rounding slack") {
    val w = 32; val h = 24
    val src = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 19 + (x + y) % 13) % 256
      // raw raster write — setRGB would run the sRGB->gray transform
      src.getRaster.setSample(x, y, 0, v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", buf))
    val bytes = buf.toByteArray
    val mine = Jpeg.decode(bytes)
    assert(mine != null, "a foreign baseline gray JPEG must be in profile")
    assert(mine.width == w && mine.height == h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val a = mine.rgb(y * w + x) & 0xff
      val b = ref.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(a - b))
    }
    assert(maxDiff <= 1, s"foreign file, two IDCTs (got $maxDiff)")
  }

  test("non-multiple-of-8 dimensions round-trip (edge-replicated padding)") {
    val w = 13; val h = 11
    val img = (x: Int, y: Int) => gray(2 * ((x * 3 + y * 5) % 100) + 20)
    val bytes = Jpeg.encode(w, h, img, gray = true)
    val mine = Jpeg.decode(bytes)
    assert(mine != null && mine.width == w && mine.height == h)
    // smooth ramp: decoded values stay close to the source
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val a = mine.rgb(y * w + x) & 0xff
      val b = img(x, y) & 0xff
      maxDiff = math.max(maxDiff, math.abs(a - b))
    }
    assert(maxDiff <= 24, s"lossy but bounded on smooth content (got $maxDiff)")
  }

  test("corrupted or out-of-profile streams degrade to null, never throw") {
    val good = Jpeg.synthesizeJpeg(3L, 1)
    assert(Jpeg.decode(good) != null)
    // missing SOI
    assert(Jpeg.decode(good.drop(2)) == null)
    // truncated mid-entropy-stream
    assert(Jpeg.decode(good.take(good.length - 12)) == null)
    // empty / tiny
    assert(Jpeg.decode(Array[Byte]()) == null)
    assert(Jpeg.decode(Array[Byte](0xff.toByte, 0xd8.toByte)) == null)
    // SOF0 -> SOF2 (progressive): out of profile, must reject not garble
    val sofAt = {
      var i = 2; var at = -1
      while (at < 0 && i + 1 < good.length) {
        if ((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0) at = i
        else i += 1
      }
      at
    }
    assert(sofAt > 0)
    val progressive = good.clone(); progressive(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decode(progressive) == null)
    // a DRI segment (restart intervals) is out of profile
    val dri = Array[Byte](0xff.toByte, 0xdd.toByte, 0x00, 0x04, 0x00, 0x08)
    val withDri = good.take(sofAt) ++ dri ++ good.drop(sofAt)
    assert(Jpeg.decode(withDri) == null)
    // a lying DHT: declared value count overruns the segment
    val dhtAt = {
      var i = 2; var at = -1
      while (at < 0 && i + 1 < good.length) {
        if ((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc4) at = i
        else i += 1
      }
      at
    }
    assert(dhtAt > 0)
    val badDht = good.clone(); badDht(dhtAt + 5) = 60.toByte // bits[1] = 60
    assert(Jpeg.decode(badDht) == null)
  }

  test("parseJpeg reports the exact channel and weighted sums") {
    val id = 4L; val nBytes = 1
    val m = Jpeg.parseJpeg(id, Jpeg.synthesizeJpeg(id, nBytes))
    assert(m.ok)
    val w = 8 * Jpeg.jpegBlocksX(id)
    val h = 8 * Jpeg.jpegBlocksY(nBytes)
    val expR = (for (p <- 0 until w * h) yield
      Jpeg.jpegBlockValue(id, (p % w) / 8, (p / w) / 8).toLong).sum
    val expRW = (for (p <- 0 until w * h) yield
      Jpeg.jpegBlockValue(id, (p % w) / 8, (p / w) / 8).toLong * (p + 1)).sum
    assert(m.width == w && m.height == h)
    assert(m.rSum == expR && m.gSum == expR && m.bSum == expR)
    assert(m.rWsum == expRW)
    // corrupt container surfaces as ok=false
    assert(!Jpeg.parseJpeg(id, Array[Byte](1, 2, 3)).ok)
  }
}
