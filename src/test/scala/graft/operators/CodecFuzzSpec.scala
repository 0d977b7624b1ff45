package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Seeded corruption fuzz over EVERY codec in the repo: random byte
  * flips, truncations, and splices against well-formed containers
  * must always terminate promptly and either decode or degrade
  * (ok = false / null / None) — never throw, never hang. This
  * generalizes the targeted crafted-input regressions (negative RIFF
  * sizes, BMP offset overflow, LZW dictionary overflow) into a
  * property over thousands of corruptions per format. */
class CodecFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260815L)

  /** Corrupt `bytes`: flip 1-4 random bytes, or truncate, or splice a
    * random block at a random offset. */
  private def corrupt(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.isEmpty) return bytes
    rnd.nextInt(3) match {
      case 0 =>
        val out = bytes.clone()
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          out(rnd.nextInt(out.length)) = rnd.nextInt(256).toByte
        }
        out
      case 1 => bytes.take(rnd.nextInt(bytes.length))
      case _ =>
        val blob = Array.fill(1 + rnd.nextInt(16))(rnd.nextInt(256).toByte)
        val at = rnd.nextInt(bytes.length)
        bytes.take(at) ++ blob ++ bytes.drop(at)
    }
  }

  /** Run `decode` over N corruptions of `good`, requiring termination
    * within a wall-clock budget and no throw. */
  private def fuzz(name: String, good: Array[Byte], n: Int)(
      decode: Array[Byte] => Unit): Unit = {
    val t0 = System.nanoTime()
    (0 until n).foreach { i =>
      val b = corrupt(good)
      try decode(b)
      catch {
        case e: Throwable =>
          fail(s"$name: corruption #$i threw ${e.getClass.getSimpleName}: " +
            s"${e.getMessage} (len=${b.length})")
      }
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30.0, s"$name: $n corruptions took ${sec}s — a hang regressed")
  }

  test("wav/ulaw parsers survive 3000 corruptions each") {
    fuzz("wav", Codecs.synthesizeWav(7L, 23), 3000)(b => Codecs.parseWav(7L, b))
    fuzz("wav-runs", Codecs.synthesizeWav(7L, 23), 3000)(
      b => Codecs.wavSilenceRuns(7L, b, 8192))
    fuzz("ulaw", Codecs.synthesizeUlawWav(7L, 23), 3000)(
      b => Codecs.parseUlawWav(7L, b))
  }

  test("bmp/png/gif parsers survive 3000 corruptions each") {
    fuzz("bmp", Codecs.synthesizeBmp(7L, 23), 3000)(b => Codecs.parseBmp(7L, b))
    fuzz("png", Codecs.synthesizePng(7L, 23), 3000)(b => Codecs.parsePng(7L, b))
    fuzz("gif", Codecs.synthesizeGif(7L, 23), 3000)(b => Codecs.parseGif(7L, b))
    fuzz("gif-anim", Codecs.synthesizeAnimatedGif(7L, 23), 3000)(
      b => Codecs.parseAnimatedGif(7L, b))
  }

  test("jpeg decoder survives 3000 corruptions") {
    fuzz("jpeg", Jpeg.synthesizeJpeg(7L, 23), 3000)(b => Jpeg.decode(b))
  }

  test("mp3 frame walk survives 3000 corruptions") {
    fuzz("mp3", Codecs.synthesizeMp3(7L, 23), 3000)(
      b => Codecs.parseMp3(7L, b))
  }

  test("tiff ifd walk + strip decode survives 3000 corruptions") {
    fuzz("tiff", Codecs.synthesizeTiff(7L, 23), 3000)(
      b => Codecs.parseTiff(7L, b))
  }

  test("avi demux + frame decode survives 3000 corruptions") {
    fuzz("avi", Video.synthesizeMjpegAvi(7L, 23), 3000)(
      b => Video.decodeFrames(7L, b))
  }

  test("rle8 avi demux + inter-frame decode survives 3000 corruptions") {
    fuzz("avi-rle", Video.synthesizeRle8Avi(7L, 23), 3000)(
      b => Video.decodeRleFrames(7L, b))
  }

  test("mpeg-1 video start-code walk + intra decode survives 3000 corruptions") {
    fuzz("mpg", Mpeg1.synthesizeMpeg1(7L, 23), 3000)(
      b => Mpeg1.parseMpeg1(7L, b))
  }

  test("sniff survives 3000 corruptions of every container kind") {
    val goods = Seq(
      Multimodal.wrapWithHeader(0L, "payload bytes".getBytes("UTF-8"))._1,
      Multimodal.wrapWithHeader(1L, "payload bytes".getBytes("UTF-8"))._1,
      Multimodal.wrapWithHeader(2L, "payload bytes".getBytes("UTF-8"))._1,
      Video.synthesizeMjpegAvi(3L, 9),
      Codecs.synthesizeWav(3L, 9))
    goods.zipWithIndex.foreach { case (g, i) =>
      fuzz(s"sniff-$i", g, 3000)(b => Multimodal.sniff(b))
    }
  }
}
