package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the baseline TIFF codec ([[Codecs.synthesizeTiff]] /
  * [[Codecs.parseTiff]]):
  *  - the decoder recovers dimensions and the exact per-channel and
  *    raster-weighted sums the synthesis recipe predicts (weighted
  *    sums catch a row-order or channel-order slip that plain sums
  *    cannot);
  *  - the value-vs-offset IFD packing is really honored (BitsPerSample
  *    SHORT[3] behind an offset — corrupting that offset must degrade,
  *    not mis-decode);
  *  - a cross-check against ImageIO's own TIFF reader on the same
  *    bytes (the JDK 9+ built-in), pinning that our container is a
  *    format real readers accept and pixels agree byte-for-byte;
  *  - malformed structure degrades to ok=false, never a throw. */
class TiffCodecSpec extends AnyFunSuite {

  test("decode recovers the synthesis recipe exactly") {
    for (id <- 0L to 7L; n <- Seq(0, 7, 23)) {
      val m = Codecs.parseTiff(id, Codecs.synthesizeTiff(id, n))
      assert(m.ok, s"id=$id n=$n")
      val (w, h) = (Codecs.tiffWidth(id), Codecs.tiffHeight(n))
      assert((m.width, m.height) == (w, h))
      var (rs, gs, bs, rw, gw, bw) = (0L, 0L, 0L, 0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val wgt = y.toLong * w + x + 1
        val (r, g, b) = (Codecs.tiffChannel(id, x, y, 0),
          Codecs.tiffChannel(id, x, y, 1), Codecs.tiffChannel(id, x, y, 2))
        rs += r; gs += g; bs += b
        rw += r * wgt; gw += g * wgt; bw += b * wgt
      }
      assert((m.rSum, m.gSum, m.bSum) == (rs, gs, bs))
      assert((m.rWsum, m.gWsum, m.bWsum) == (rw, gw, bw))
    }
  }

  test("ImageIO's TIFF reader accepts the container and pixels agree") {
    val id = 5L
    val bytes = Codecs.synthesizeTiff(id, 23)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO must decode the synthesized TIFF")
    assert((img.getWidth, img.getHeight) ==
      (Codecs.tiffWidth(id), Codecs.tiffHeight(23)))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == Codecs.tiffChannel(id, x, y, 0))
      assert(((rgb >> 8) & 0xff) == Codecs.tiffChannel(id, x, y, 1))
      assert((rgb & 0xff) == Codecs.tiffChannel(id, x, y, 2))
    }
  }

  test("malformed structure degrades to ok=false, never throws") {
    val good = Codecs.synthesizeTiff(3L, 23)
    def bad(what: String)(b: => Array[Byte]): Unit =
      assert(!Codecs.parseTiff(3L, b).ok, s"$what should not parse")
    bad("empty")(Array.empty[Byte])
    bad("magic")(("MM" + new String(good.drop(2), "ISO-8859-1"))
      .getBytes("ISO-8859-1"))
    bad("truncated strip")(good.dropRight(1))
    // BitsPerSample offset pointed past the file: must degrade
    bad("bps offset out of bounds") {
      val b = good.clone()
      // entry 3 (tag 258) value field = ifd(8) + 2 + 12*2 + 8
      val o = 8 + 2 + 12 * 2 + 8
      b(o) = 0xff.toByte; b(o + 1) = 0xff.toByte; b
    }
    // compression flipped to LZW: unsupported, must degrade
    bad("lzw") {
      val b = good.clone()
      val o = 8 + 2 + 12 * 3 + 8 // entry 4 = tag 259 value
      b(o) = 5; b
    }
    // huge declared dimensions must not drive allocation
    bad("crafted dimensions") {
      val b = good.clone()
      val o = 8 + 2 + 12 * 0 + 8 // tag 256 value
      b(o) = 0xff.toByte; b(o + 1) = 0x7f.toByte; b
    }
  }
}
