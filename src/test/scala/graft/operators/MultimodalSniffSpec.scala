package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The sniffing path must READ the actual bytes — these tests corrupt
  * specific header bytes and assert detection and dimensions respond
  * exactly as the format layout dictates (endianness included), which
  * a stub keyed off length or id could not do. */
class MultimodalSniffSpec extends AnyFunSuite {

  private val payload = "hello media payload".getBytes("UTF-8")

  test("well-formed containers sniff to their true format and dimensions") {
    val (png, _) = Multimodal.wrapWithHeader(0L, payload) // id%3==0 -> png
    val (gif, _) = Multimodal.wrapWithHeader(1L, payload)
    val (jpg, _) = Multimodal.wrapWithHeader(2L, payload)
    val w = 64 + (payload.length % 512)
    val h = 64 + (payload.length % 384)
    assert(Multimodal.sniff(png) == (("image/png", w, h)))
    assert(Multimodal.sniff(gif) == (("image/gif", w, h)))
    assert(Multimodal.sniff(jpg) == (("image/jpeg", -1, -1)))
  }

  test("RIFF containers sniff to AVI (with avih dimensions) or WAVE") {
    val avi = Video.synthesizeMjpegAvi(4L, payload.length)
    assert(Multimodal.sniff(avi) ==
      (("video/x-msvideo", Video.aviWidth(4L), Video.aviHeight(payload.length))))
    val wav = Codecs.synthesizeWav(4L, payload.length)
    assert(Multimodal.sniff(wav) == (("audio/wav", -1, -1)))
    // a RIFF with an unknown form type degrades to octet-stream
    val alien = avi.clone(); alien(8) = 'X'.toByte
    assert(Multimodal.sniff(alien)._1 == "application/octet-stream")
    // a crafted negative chunk size inside the header walk must not
    // hang or read out of bounds — dims degrade, format stays AVI
    val evil = avi.clone()
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte // hdrl LIST size = -1
    assert(Multimodal.sniff(evil)._1 == "video/x-msvideo")
  }

  test("a corrupted magic byte degrades to octet-stream, never throws") {
    val (png, _) = Multimodal.wrapWithHeader(0L, payload)
    val broken = png.clone(); broken(1) = 'Q'.toByte
    assert(Multimodal.sniff(broken)._1 == "application/octet-stream")
    assert(Multimodal.sniff(Array[Byte]()) ==
      (("application/octet-stream", -1, -1)))
    assert(Multimodal.sniff(Array[Byte](0x47)) ==
      (("application/octet-stream", -1, -1)))
  }

  test("flipping dimension bytes moves the parsed dimensions per the format's endianness") {
    val (png, _) = Multimodal.wrapWithHeader(0L, payload)
    val w0 = Multimodal.sniff(png)._2
    val bumped = png.clone()
    bumped(19) = (bumped(19) + 1).toByte // PNG width low byte (big-endian int at 16)
    assert(Multimodal.sniff(bumped)._2 == w0 + 1)

    val (gif, _) = Multimodal.wrapWithHeader(1L, payload)
    val g0 = Multimodal.sniff(gif)._2
    val gifBumped = gif.clone()
    gifBumped(7) = (gifBumped(7) + 1).toByte // GIF width HIGH byte (little-endian at 6)
    assert(Multimodal.sniff(gifBumped)._2 == g0 + 256)
  }

  test("the declared-mime lie is injected on every 7th id and only there") {
    val lies = (0L until 42L).map { id =>
      val (bytes, declared) = Multimodal.wrapWithHeader(id, payload)
      val sniffed = Multimodal.sniff(bytes)._1
      (id, declared != sniffed)
    }
    // id%7==0 rows whose true format is not png are mislabeled; all others honest
    lies.foreach { case (id, lied) =>
      val expectLie = id % 7 == 0 && id % 3 != 0
      assert(lied == expectLie, s"id=$id lied=$lied")
    }
  }
}
