package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the MPEG-1 Layer III frame-header walk
  * ([[Codecs.synthesizeMp3]] / [[Codecs.parseMp3]]):
  *  - the walk recovers frame count, samplerate, CBR/VBR, bitrate
  *    extremes and duration exactly as the synthesis recipe predicts,
  *    across ids covering every samplerate index and both rate modes;
  *  - frame lengths are genuinely consumed (a walk that ignores the
  *    padding bit or misreads the bitrate table loses sync — pinned
  *    by corrupting a single header's bitrate nibble);
  *  - malformed framing degrades to ok=false, never a throw: lost
  *    sync, truncated final frame, reserved bitrate/samplerate index,
  *    non-Layer-III header, empty input. */
class Mp3CodecSpec extends AnyFunSuite {

  test("walk recovers the synthesis recipe exactly") {
    for (id <- 0L to 11L; n <- Seq(0, 5, 23, 63)) {
      val bytes = Codecs.synthesizeMp3(id, n)
      val m = Codecs.parseMp3(id, bytes)
      assert(m.ok, s"id=$id n=$n")
      val frames = Codecs.mp3FrameCount(n)
      val sr = Seq(44100, 48000, 32000)(Codecs.mp3SampleRateIdx(id))
      val kbps = (0 until frames)
        .map(f => Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
          224, 256, 320)(Codecs.mp3BitrateIdx(id, f)))
      assert(m.nFrames == frames.toLong)
      assert(m.sampleRate == sr)
      assert(m.isCbr == !Codecs.mp3IsVbr(id))
      assert(m.minKbps == kbps.min && m.maxKbps == kbps.max)
      assert(m.durationMs ==
        frames.toLong * Codecs.Mp3SamplesPerFrame * 1000L / sr)
    }
  }

  test("vbr streams really vary; cbr streams really do not") {
    val cbr = Codecs.parseMp3(2L, Codecs.synthesizeMp3(2L, 17))
    val vbr = Codecs.parseMp3(3L, Codecs.synthesizeMp3(3L, 17))
    assert(cbr.ok && cbr.isCbr && cbr.minKbps == cbr.maxKbps)
    assert(vbr.ok && !vbr.isCbr && vbr.minKbps < vbr.maxKbps)
  }

  test("malformed framing degrades to ok=false, never throws") {
    val good = Codecs.synthesizeMp3(5L, 23)
    def expectBad(what: String)(b: => Array[Byte]): Unit = {
      val m = Codecs.parseMp3(5L, b)
      assert(!m.ok, s"$what should not parse")
    }
    expectBad("empty")(Array.empty[Byte])
    expectBad("truncated header")(good.take(2))
    expectBad("truncated final frame")(good.dropRight(1))
    // kill the first sync word
    expectBad("lost sync") { val b = good.clone(); b(0) = 0x00.toByte; b }
    // reserved bitrate index (1111) in the first header
    expectBad("reserved bitrate") {
      val b = good.clone(); b(2) = (b(2) | 0xF0).toByte; b }
    // free-format bitrate index (0000)
    expectBad("free bitrate") {
      val b = good.clone(); b(2) = (b(2) & 0x0F).toByte; b }
    // reserved samplerate index (11)
    expectBad("reserved samplerate") {
      val b = good.clone(); b(2) = (b(2) | 0x0C).toByte; b }
    // Layer I instead of III
    expectBad("wrong layer") { val b = good.clone(); b(1) = 0xFF.toByte; b }
    // flip the padding bit of frame 0: its length changes, so the walk
    // lands mid-frame and must lose sync (proves lengths are consumed)
    expectBad("padding desync") {
      val b = good.clone(); b(2) = (b(2) ^ 0x02).toByte; b }
  }

  test("a corrupted mid-stream header surfaces, not just the first") {
    val good = Codecs.synthesizeMp3(4L, 23) // ≥4 frames
    // compute frame 0's length from the recipe to hit frame 1's header
    val bi = Codecs.mp3BitrateIdx(4L, 0)
    val sr = Seq(44100, 48000, 32000)(Codecs.mp3SampleRateIdx(4L))
    val kbps = Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)(bi)
    val pad = (good(2) >> 1) & 0x01
    val f0len = 144 * (kbps * 1000) / sr + pad
    val b = good.clone()
    b(f0len) = 0x00.toByte // destroy frame 1's sync byte
    val m = Codecs.parseMp3(4L, b)
    assert(!m.ok)
  }
}
