package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The AVI/MJPEG path must demux real RIFF structure and decode real
  * JPEG frames — these tests pin exact frame reconstruction, the
  * scene structure, header-field sensitivity, and crafted-input
  * degradation. A stub keyed off id or length could pass none. */
class VideoCodecSpec extends AnyFunSuite {

  test("demux + decode reproduces every frame's recipe exactly") {
    for (id <- 0L to 6L; nBytes <- Seq(0, 1)) {
      val bytes = Video.synthesizeMjpegAvi(id, nBytes)
      val frames = Video.decodeFrames(id, bytes)
      val k = Video.aviFrameCount(id)
      val w = Video.aviWidth(id)
      val h = Video.aviHeight(nBytes)
      assert(frames.length == k && frames.forall(_.ok), s"id=$id")
      assert(frames.map(_.frame) == (0 until k))
      frames.foreach { fr =>
        assert(fr.width == w && fr.height == h)
        val exp = (for (p <- 0 until w * h) yield
          Video.aviBlockValue(id, fr.frame, (p % w) / 8, (p / w) / 8).toLong)
        assert(fr.ySum == exp.sum,
          s"id=$id frame=${fr.frame}: decoded sum must match the recipe")
        assert(fr.yWsum == exp.zipWithIndex.map { case (v, p) => v * (p + 1) }.sum)
      }
    }
  }

  test("scene structure: within-scene frames identical, exactly one cut") {
    for (id <- 0L to 6L) {
      val frames = Video.decodeFrames(id, Video.synthesizeMjpegAvi(id, 1))
      val byScene = frames.groupBy(f => Video.aviSceneOf(id, f.frame))
      assert(byScene.size == 2, s"id=$id: each clip contains one cut")
      byScene.values.foreach { fs =>
        assert(fs.map(f => (f.ySum, f.yWsum)).distinct.length == 1,
          s"id=$id: within-scene frames must decode identically")
      }
      val sceneSigs = byScene.view.mapValues(
        fs => (fs.head.ySum, fs.head.yWsum)).toMap
      assert(sceneSigs(0) != sceneSigs(1),
        s"id=$id: the cut must be visible in decoded pixels")
    }
  }

  test("the demuxer reads the declared header fields, not conventions") {
    val id = 3L
    val bytes = Video.synthesizeMjpegAvi(id, 0)
    val d = Video.demuxMjpegAvi(bytes)
    assert(d.isDefined)
    val (w, h, declared, frames) = d.get
    assert(w == Video.aviWidth(id) && h == Video.aviHeight(0))
    assert(declared == Video.aviFrameCount(id) && frames.length == declared)
    // a non-MJPG stream handler must be rejected (we only decode MJPG)
    val strhAt = {
      var i = 12; var at = -1
      while (at < 0 && i + 12 < bytes.length) {
        if (new String(bytes, i, 4, "US-ASCII") == "strh") at = i
        else i += 1
      }
      at
    }
    assert(strhAt > 0)
    val alien = bytes.clone()
    alien(strhAt + 12) = 'X'.toByte // fccHandler MJPG -> XJPG
    assert(Video.demuxMjpegAvi(alien).isEmpty)
    // a corrupted frame dimension in the avih header breaks the
    // frame-vs-header consistency check at decode time
    val avihAt = {
      var i = 12; var at = -1
      while (at < 0 && i + 12 < bytes.length) {
        if (new String(bytes, i, 4, "US-ASCII") == "avih") at = i
        else i += 1
      }
      at
    }
    val lying = bytes.clone()
    lying(avihAt + 8 + 32) = (lying(avihAt + 8 + 32) + 8).toByte // dwWidth
    val frames2 = Video.decodeFrames(id, lying)
    assert(frames2 == Seq(Video.VideoFrame(id, -1, 0, 0, 0L, 0L, ok = false)),
      "a header/frame dimension mismatch must surface as a bad row")
  }

  test("crafted input degrades cleanly: truncation, negative sizes, junk") {
    val good = Video.synthesizeMjpegAvi(2L, 1)
    assert(Video.demuxMjpegAvi(good).isDefined)
    assert(Video.demuxMjpegAvi(good.take(40)).isEmpty)
    assert(Video.demuxMjpegAvi(Array[Byte]()).isEmpty)
    val badMagic = good.clone(); badMagic(9) = 'X'.toByte // 'AVI ' -> 'AXI '
    assert(Video.demuxMjpegAvi(badMagic).isEmpty)
    // a 0xFFFFFFFF chunk size after the header tree: the walk must
    // reject, not loop forever or read out of bounds
    val evil = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("JUNK".getBytes("US-ASCII")).putInt(0xffffffff)
    // splice right after the RIFF header (offset 12), then fix the
    // RIFF size so the outer bound still covers the spliced bytes
    val spliced = good.take(12) ++ evil.array() ++ good.drop(12)
    val fixed = spliced.clone()
    val newSize = spliced.length - 8
    fixed(4) = (newSize & 0xff).toByte
    fixed(5) = ((newSize >> 8) & 0xff).toByte
    fixed(6) = ((newSize >> 16) & 0xff).toByte
    fixed(7) = ((newSize >> 24) & 0xff).toByte
    assert(Video.demuxMjpegAvi(fixed).isEmpty)
    // truncating inside the movi payload loses frame bytes -> bad row
    val cut = Video.decodeFrames(2L, good.take(good.length - 10))
    assert(cut.forall(!_.ok))
  }

  test("spark batch: 1-to-N frame fan-out over stored artifact blobs") {
    val spark = graft.TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val frames = Video
      .decodeFramesBatch(MediaArtifact.records(spark, dir, "avi"))
      .collect()
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(frames.forall(_.ok))
    assert(frames.map(_.id).distinct.length == nDocs)
    // per-clip frame counts follow the recipe
    frames.groupBy(_.id).foreach { case (id, fs) =>
      assert(fs.length == Video.aviFrameCount(id))
    }
  }
}
