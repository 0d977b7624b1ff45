package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The WAV/BMP codecs must DECODE the actual bytes — these tests pin
  * hand-computed tiny cases, corrupt specific header fields, and
  * assert the parsed stats respond exactly as the binary layout
  * dictates (little-endian fields, sign extension, BGR order, row
  * padding, bottom-up storage). A stub keyed off id or length could
  * not pass them. */
class CodecsSpec extends AnyFunSuite {

  // ---------------- WAV ----------------

  test("wav: round-trip of a synthesized container reproduces the recipe") {
    val id = 5L
    val nBytes = 17
    val m = Codecs.parseWav(id, Codecs.synthesizeWav(id, nBytes))
    assert(m.ok)
    val n = Codecs.wavSampleCount(nBytes)
    assert(m.nSamples == n.toLong)
    assert(m.sampleRate == Codecs.wavSampleRate(id))
    assert(m.durationMs == n.toLong * 1000L / m.sampleRate)
    val samples = (0 until n).map(i => Codecs.wavSample(id, i.toLong))
    assert(m.peak == samples.map(s => math.abs(s).toLong).max)
    assert(m.sumAbs == samples.map(s => math.abs(s).toLong).sum)
    assert(m.nClipped == samples.count(s => math.abs(s) >= 32000))
  }

  test("wav: int16 samples are sign-extended (negative values decode negative)") {
    // find an id with a negative sample among the first few
    val id = 1L
    val n = Codecs.wavSampleCount(0)
    val samples = (0 until n).map(i => Codecs.wavSample(id, i.toLong))
    assert(samples.exists(_ < 0), "recipe must produce negative samples")
    val m = Codecs.parseWav(id, Codecs.synthesizeWav(id, 0))
    // a parser that reads uint16 would inflate sumAbs far past this
    assert(m.sumAbs == samples.map(s => math.abs(s).toLong).sum)
  }

  test("wav: corrupting magic or fmt fields degrades to ok=false, never throws") {
    val good = Codecs.synthesizeWav(3L, 9)
    val badMagic = good.clone(); badMagic(9) = 'X'.toByte // 'WAVE' -> 'WXVE'
    assert(!Codecs.parseWav(3L, badMagic).ok)
    val badFmt = good.clone(); badFmt(20) = 3 // audioFormat: PCM -> IEEE float
    assert(!Codecs.parseWav(3L, badFmt).ok)
    val truncated = good.take(50)
    assert(!Codecs.parseWav(3L, truncated).ok)
    assert(!Codecs.parseWav(3L, Array[Byte]()).ok)
  }

  test("wav: sample-rate field is read little-endian from the header") {
    val good = Codecs.synthesizeWav(0L, 0) // sr = 8000 = 0x1F40
    val bumped = good.clone()
    bumped(25) = (bumped(25) + 1).toByte // second byte of LE int32 at 24
    val m = Codecs.parseWav(0L, bumped)
    assert(m.ok && m.sampleRate == 8000 + 256)
  }

  test("wav: an unknown chunk between fmt and data is walked over by size") {
    val id = 2L
    val base = Codecs.synthesizeWav(id, 4)
    // splice a 6-byte 'LIST' chunk (padded to even 6) before 'data'
    val dataOff = 36 // 12 RIFF + 24 fmt
    val extra = java.nio.ByteBuffer.allocate(8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put("LIST".getBytes("US-ASCII")).putInt(6)
      .put(Array[Byte](1, 2, 3, 4, 5, 6))
    val spliced = base.take(dataOff) ++ extra.array() ++ base.drop(dataOff)
    val m = Codecs.parseWav(id, spliced)
    assert(m.ok && m.nSamples == Codecs.wavSampleCount(4).toLong,
      "chunk walking must skip unknown chunks by declared size")
  }

  // ---------------- BMP ----------------

  test("bmp: hand-computed 2-pixel-high image pins BGR + bottom-up + padding") {
    // id=1 -> w=5 (rowBytes = 16, one pad byte); nBytes=0 -> h=3
    val id = 1L
    val bytes = Codecs.synthesizeBmp(id, 0)
    val w = Codecs.bmpWidth(id)
    val h = Codecs.bmpHeight(0)
    assert(w == 5 && h == 3)
    val m = Codecs.parseBmp(id, bytes)
    assert(m.ok && m.width == w && m.height == h)
    def ch(x: Int, y: Int, c: Int) = Codecs.bmpChannel(id, x, y, c)
    val expectedRSum = (for { y <- 0 until h; x <- 0 until w } yield
      ch(x, y, 0).toLong).sum
    val expectedRW = (for { y <- 0 until h; x <- 0 until w } yield
      ch(x, y, 0).toLong * (y * w + x + 1)).sum
    assert(m.rSum == expectedRSum)
    assert(m.rWsum == expectedRW)
    // file layout: FIRST stored row must be image row h-1 (bottom-up),
    // FIRST byte of a pixel must be the BLUE channel
    val firstStored = bytes(54) & 0xff
    assert(firstStored == ch(0, h - 1, 2),
      "first pixel byte in the file is B of the bottom image row")
  }

  test("bmp: swapping two stored rows changes ONLY the weighted sums") {
    val id = 2L // w=6, rowBytes=20 (2 pad bytes)
    val bytes = Codecs.synthesizeBmp(id, 1) // h=4
    val w = Codecs.bmpWidth(id)
    val rowBytes = (w * 3 + 3) / 4 * 4
    val m0 = Codecs.parseBmp(id, bytes)
    val swapped = bytes.clone()
    // swap stored rows 0 and 1
    for (k <- 0 until rowBytes) {
      val t = swapped(54 + k)
      swapped(54 + k) = swapped(54 + rowBytes + k)
      swapped(54 + rowBytes + k) = t
    }
    val m1 = Codecs.parseBmp(id, swapped)
    assert(m1.ok)
    assert(m1.rSum == m0.rSum && m1.gSum == m0.gSum && m1.bSum == m0.bSum,
      "plain channel sums are permutation-invariant")
    assert(m1.rWsum != m0.rWsum,
      "raster-weighted sums must detect a row-order slip")
  }

  test("bmp: malformed headers degrade to ok=false, never throw") {
    val good = Codecs.synthesizeBmp(3L, 2)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(!Codecs.parseBmp(3L, badMagic).ok)
    val badBpp = good.clone(); badBpp(28) = 8 // 8-bit palette BMP
    assert(!Codecs.parseBmp(3L, badBpp).ok)
    val badComp = good.clone(); badComp(30) = 1 // RLE8 compression
    assert(!Codecs.parseBmp(3L, badComp).ok)
    assert(!Codecs.parseBmp(3L, good.take(40)).ok)
    // a lying width that overruns the pixel array must be rejected
    val badW = good.clone(); badW(18) = 100
    assert(!Codecs.parseBmp(3L, badW).ok)
  }

  test("wav runs: hand-built sample pattern pins the run segmentation") {
    // samples: 0, 100, 9000, 0, 0  (thr 8192) -> silent T T F T T
    // runs = 2, longest = 2, silent = 4
    val samples = Seq(0, 100, 9000, 0, 0)
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(1).putInt(8000).putInt(16000)
    bb.putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
    samples.foreach(s => bb.putShort(s.toShort))
    val m = Codecs.wavSilenceRuns(9L, bb.array(), thr = 8192)
    assert(m.ok)
    assert(m.nRuns == 2L && m.longestRun == 2L && m.nSilent == 4L)
  }

  test("wav runs: agree with a reference recompute on synthesized docs") {
    for (id <- 0L to 5L) {
      val m = Codecs.wavSilenceRuns(id, Codecs.synthesizeWav(id, 3), 8192)
      assert(m.ok)
      val n = Codecs.wavSampleCount(3)
      val silent = (0 until n)
        .map(i => math.abs(Codecs.wavSample(id, i.toLong)) < 8192)
      val runs = silent.foldLeft((0L, 0L, 0L)) { // (runs, cur, longest)
        case ((r, c, l), true) => (r, c + 1, math.max(l, c + 1))
        case ((r, c, l), false) => (if (c > 0) r + 1 else r, 0L, l)
      }
      val totalRuns = if (runs._2 > 0) runs._1 + 1 else runs._1
      assert(m.nRuns == totalRuns && m.longestRun == runs._3)
      assert(m.nSilent == silent.count(identity).toLong)
    }
  }

  test("wav runs: corrupt container degrades to ok=false") {
    val good = Codecs.synthesizeWav(1L, 1)
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(!Codecs.wavSilenceRuns(1L, bad, 8192).ok)
  }

  // ---------------- µ-law ----------------

  test("ulaw: expansion matches the CCITT reference at the pinned codes") {
    assert(Codecs.ulawToLinear(0xff) == 0)     // positive zero
    assert(Codecs.ulawToLinear(0x7f) == 0)     // negative zero
    assert(Codecs.ulawToLinear(0x00) == -32124) // most negative
    assert(Codecs.ulawToLinear(0x80) == 32124)  // most positive
    // sign symmetry: b and b^0x80 decode to negatives of each other
    for (b <- 0 until 128)
      assert(Codecs.ulawToLinear(b) == -Codecs.ulawToLinear(b | 0x80))
    // monotone within the positive half: higher code = smaller magnitude
    val pos = (0x80 to 0xff).map(Codecs.ulawToLinear)
    assert(pos.sliding(2).forall(w => w.head >= w.last))
  }

  test("ulaw: container round-trip and PCM-format rejection") {
    val m = Codecs.parseUlawWav(4L, Codecs.synthesizeUlawWav(4L, 5))
    assert(m.ok && m.nSamples == Codecs.ulawSampleCount(5).toLong)
    val expected = (0 until Codecs.ulawSampleCount(5))
      .map(i => Codecs.ulawToLinear(Codecs.ulawByte(4L, i.toLong)))
    assert(m.sumSigned == expected.map(_.toLong).sum)
    assert(m.peak == expected.map(s => math.abs(s).toLong).max)
    // a PCM container must be rejected by the µ-law parser and
    // vice versa — the format field is load-bearing
    assert(!Codecs.parseUlawWav(4L, Codecs.synthesizeWav(4L, 5)).ok)
    assert(!Codecs.parseWav(4L, Codecs.synthesizeUlawWav(4L, 5)).ok)
  }

  // ---------------- GIF / LZW ----------------

  test("lzw: round-trips streams long enough to force code-width growth") {
    // 600 pseudo-random indices drive the dictionary past 32 and 64
    // entries, so the 5->6->7 bit width transitions are exercised on
    // both sides of the classic one-entry-lag sync rule
    val idx = Array.tabulate(600)(i => ((i * 7919 + i * i * 31) % 16).abs)
    val back = Codecs.lzwDecompress(Codecs.lzwCompress(idx), idx.length)
    assert(back != null && back.sameElements(idx))
  }

  test("lzw: the KwKwK self-referential case round-trips") {
    // a constant run emits code==next repeatedly (cScSc pattern)
    val idx = Array.fill(64)(7)
    val back = Codecs.lzwDecompress(Codecs.lzwCompress(idx), idx.length)
    assert(back != null && back.sameElements(idx))
    // and mixed runs
    val idx2 = Array.tabulate(100)(i => if (i % 10 < 7) 3 else i % 16)
    val back2 = Codecs.lzwDecompress(Codecs.lzwCompress(idx2), idx2.length)
    assert(back2 != null && back2.sameElements(idx2))
  }

  test("gif: container round-trip reproduces palette-mapped pixels") {
    for (id <- 0L to 5L; nBytes <- Seq(0, 1, 2)) {
      val m = Codecs.parseGif(id, Codecs.synthesizeGif(id, nBytes))
      assert(m.ok, s"id=$id must decode")
      val w = Codecs.gifWidth(id); val h = Codecs.gifHeight(nBytes)
      assert(m.width == w && m.height == h)
      val expR = (for (p <- 0 until w * h) yield
        Codecs.gifPalette(id, Codecs.gifIndex(id, p % w, p / w), 0).toLong).sum
      val expGW = (for (p <- 0 until w * h) yield
        Codecs.gifPalette(id, Codecs.gifIndex(id, p % w, p / w), 1).toLong
          * (p + 1)).sum
      assert(m.rSum == expR && m.gWsum == expGW,
        s"id=$id: LZW + palette reconstruction must be exact")
    }
  }

  test("gif: an extension block before the image descriptor is skipped") {
    val good = Codecs.synthesizeGif(2L, 1)
    val m0 = Codecs.parseGif(2L, good)
    // splice a Graphic Control Extension after the GCT (offset 13+48)
    val gce = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val cut = 13 + 48
    val spliced = good.take(cut) ++ gce ++ good.drop(cut)
    val m1 = Codecs.parseGif(2L, spliced)
    assert(m1.ok && m1.rWsum == m0.rWsum && m1.width == m0.width)
  }

  test("gif: corrupted signature or truncated stream degrades to ok=false") {
    val good = Codecs.synthesizeGif(3L, 2)
    val badSig = good.clone(); badSig(4) = '7'.toByte // GIF87a rejected here
    assert(!Codecs.parseGif(3L, badSig).ok)
    assert(!Codecs.parseGif(3L, good.take(20)).ok)
    assert(!Codecs.parseGif(3L, Array[Byte]()).ok)
    // truncating the LZW data (drop the last sub-block bytes) must fail
    // cleanly: the decoded index count will not reach w*h
    val trunc = good.take(good.length - 6) ++ Array[Byte](0, 0x3b)
    assert(!Codecs.parseGif(3L, trunc).ok)
  }

  test("gif dhash: one-pixel edit flips at most one bit; hash is content-stable") {
    for (id <- 0L to 7L) {
      val h0 = Codecs.gifDHash(id, 0, Codecs.synthesizeGif(id, 1))
      val h0again = Codecs.gifDHash(id, 0, Codecs.synthesizeGif(id, 1))
      val h1 = Codecs.gifDHash(id, 1, Codecs.synthesizeGifVariant(id, 1))
      assert(h0.ok && h1.ok)
      assert(h0.hash == h0again.hash, "same content => same dHash")
      val hamming = java.lang.Long.bitCount(h0.hash ^ h1.hash)
      assert(hamming <= 1,
        s"id=$id: a (0,0) pixel edit touches only the bit-0 comparison")
    }
    // but the CONTAINERS differ byte-wise (LZW recompression of a
    // different index stream)
    val a = Codecs.synthesizeGif(3L, 1)
    val b = Codecs.synthesizeGifVariant(3L, 1)
    assert(!java.util.Arrays.equals(a, b))
  }

  test("animated gif: every frame decodes; scenes partition the frames") {
    for (id <- 0L to 6L) {
      val frames = Codecs.parseAnimatedGif(
        id, Codecs.synthesizeAnimatedGif(id, 1))
      val k = Codecs.gifFrameCount(id)
      assert(frames.length == k && frames.forall(_.ok))
      assert(frames.map(_.frame) == (0 until k))
      // frames within a scene are pixel-identical => equal hashes
      val byScene = frames.groupBy(f => Codecs.gifSceneOf(id, f.frame))
      byScene.values.foreach { fs =>
        assert(fs.map(_.hash).distinct.length == 1,
          s"id=$id: within-scene frames must hash identically")
      }
      assert(byScene.size == 2, "each clip contains exactly one cut")
    }
  }

  test("animated gif: truncation and bad signature degrade to a bad row") {
    val good = Codecs.synthesizeAnimatedGif(2L, 0)
    assert(Codecs.parseAnimatedGif(2L, good.take(30)) ==
      Seq(Codecs.FrameHash(2L, -1, 0L, ok = false)))
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(!Codecs.parseAnimatedGif(2L, bad).head.ok)
  }

  // ---------------- PNG ----------------

  test("png: round-trip through deflate + all five filters reproduces the recipe") {
    // h up to 4 rows cycles filters (id+y)%5; sweep ids to hit all five
    for (id <- 0L to 6L; nBytes <- Seq(0, 1, 2)) {
      val m = Codecs.parsePng(id, Codecs.synthesizePng(id, nBytes))
      assert(m.ok, s"id=$id nBytes=$nBytes must decode")
      val w = Codecs.pngWidth(id); val h = Codecs.pngHeight(nBytes)
      assert(m.width == w && m.height == h)
      def ch(x: Int, y: Int, c: Int) = Codecs.pngChannel(id, x, y, c)
      val exp = (for { y <- 0 until h; x <- 0 until w } yield
        ch(x, y, 0).toLong).sum
      val expW = (for { y <- 0 until h; x <- 0 until w } yield
        ch(x, y, 2).toLong * (y * w + x + 1)).sum
      assert(m.rSum == exp, s"id=$id: Sub/Up/Average/Paeth inversion must be exact")
      assert(m.bWsum == expW)
    }
  }

  test("png: paeth predictor picks the nearest of left/up/upper-left") {
    assert(Codecs.paeth(10, 20, 30) == 10) // p=0, pa=10<pb=20<pc=30... p=a+b-c=0
    assert(Codecs.paeth(100, 2, 3) == 100) // p=99: pa=1 smallest
    assert(Codecs.paeth(2, 100, 3) == 100) // p=99: pb=1 smallest
    assert(Codecs.paeth(50, 60, 10) == 60) // p=100: pb=40 smallest
    // tie-break order: a before b before c (spec §9.4)
    assert(Codecs.paeth(5, 5, 5) == 5)
  }

  test("png: a single flipped IDAT byte fails the CRC integrity check") {
    val good = Codecs.synthesizePng(1L, 1)
    assert(Codecs.parsePng(1L, good).ok)
    // IDAT body starts after signature(8) + IHDR chunk(12+13); flip a
    // byte inside the compressed stream
    val idatBody = 8 + 25 + 8 + 2
    val broken = good.clone()
    broken(idatBody) = (broken(idatBody) ^ 0x40).toByte
    assert(!Codecs.parsePng(1L, broken).ok,
      "CRC32 verification must reject corrupted chunk bodies")
  }

  test("png: ancillary chunks are skipped by declared length") {
    val good = Codecs.synthesizePng(2L, 0)
    val m0 = Codecs.parsePng(2L, good)
    // splice a valid tEXt chunk (with correct CRC) before IDAT
    val body = "comment".getBytes("US-ASCII")
    val tag = "tEXt".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tag); crc.update(body)
    val v = crc.getValue.toInt
    val tchunk = Array(
      ((body.length >>> 24) & 0xff).toByte, ((body.length >>> 16) & 0xff).toByte,
      ((body.length >>> 8) & 0xff).toByte, (body.length & 0xff).toByte) ++
      tag ++ body ++ Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val cut = 8 + 25 // after IHDR chunk
    val spliced = good.take(cut) ++ tchunk ++ good.drop(cut)
    val m1 = Codecs.parsePng(2L, spliced)
    assert(m1.ok && m1.rWsum == m0.rWsum && m1.width == m0.width)
  }

  test("png: transcoding BMP pixels through encodePng round-trips exactly") {
    for (id <- 0L to 4L; nBytes <- Seq(0, 2)) {
      val viaBmp = Codecs.parseBmp(id, Codecs.synthesizeBmp(id, nBytes))
      val png = Codecs.encodePng(id, Codecs.bmpWidth(id),
        Codecs.bmpHeight(nBytes), Codecs.bmpChannel(id, _, _, _))
      val viaPng = Codecs.parsePng(id, png)
      assert(viaBmp.ok && viaPng.ok)
      assert(viaPng.copy(ok = viaBmp.ok) == viaBmp,
        s"id=$id: decoded pixel stats must survive the BMP->PNG transcode")
    }
  }

  test("png: malformed headers and truncation degrade to ok=false") {
    val good = Codecs.synthesizePng(3L, 2)
    val badSig = good.clone(); badSig(0) = 0x88.toByte
    assert(!Codecs.parsePng(3L, badSig).ok)
    assert(!Codecs.parsePng(3L, good.take(30)).ok)
    assert(!Codecs.parsePng(3L, Array[Byte]()).ok)
    // interlaced flag rejected (profile not supported)
    val interlaced = good.clone()
    interlaced(8 + 8 + 12) = 1 // IHDR interlace byte
    assert(!Codecs.parsePng(3L, interlaced).ok,
      "CRC now mismatches OR profile rejects — either way not ok")
  }

  test("wav: a sign-extending (>= 2^31) chunk size rejects instead of hanging") {
    // craft an unknown chunk whose declared LE32 size is 0xFFFFFFFF:
    // size.toInt = -1, so 'off = body + size + (size & 1)' would move
    // the walk BACKWARDS forever without the negative-size guard
    val good = Codecs.synthesizeWav(2L, 4)
    val evil = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("LIST".getBytes("US-ASCII")).putInt(0xffffffff)
    val dataOff = 36 // 12 RIFF + 24 fmt
    val spliced = good.take(dataOff) ++ evil.array() ++ good.drop(dataOff)
    assert(!Codecs.parseWav(2L, spliced).ok)
    assert(!Codecs.wavSilenceRuns(2L, spliced, 8192).ok)
    val ugood = Codecs.synthesizeUlawWav(2L, 4)
    val uspliced = ugood.take(dataOff) ++ evil.array() ++ ugood.drop(dataOff)
    assert(!Codecs.parseUlawWav(2L, uspliced).ok)
  }

  test("bmp: negative pixel offset and overflowing width reject cleanly") {
    val good = Codecs.synthesizeBmp(1L, 0)
    // pixelOffset = 0x80000000 (sign-extends negative)
    val negOff = good.clone()
    negOff(10) = 0; negOff(11) = 0; negOff(12) = 0; negOff(13) = 0x80.toByte
    assert(!Codecs.parseBmp(1L, negOff).ok)
    // pixelOffset pointing before the headers
    val lowOff = good.clone(); lowOff(10) = 2
    assert(!Codecs.parseBmp(1L, lowOff).ok)
    // width = 0x2AAAAAAB: w * 3 + 3 overflows Int into a negative
    // rowBytes that would defeat an Int-arithmetic length check
    val hugeW = good.clone()
    hugeW(18) = 0xab.toByte; hugeW(19) = 0xaa.toByte
    hugeW(20) = 0xaa.toByte; hugeW(21) = 0x2a.toByte
    assert(!Codecs.parseBmp(1L, hugeW).ok)
    // negative height (top-down BMPs are out of profile) still rejects
    val negH = good.clone()
    negH(22) = 0xfd.toByte; negH(23) = 0xff.toByte
    negH(24) = 0xff.toByte; negH(25) = 0xff.toByte
    assert(!Codecs.parseBmp(1L, negH).ok)
  }

  test("lzw: a stream that fills the 4096-entry dictionary round-trips") {
    // ~40k low-repetition indices drive 'next' past 4096, forcing the
    // encoder's CLEAR-and-reset; without it, codes >= 4096 would be
    // truncated into 12-bit fields and the decode would fail
    val rnd = new scala.util.Random(42)
    val idx = Array.fill(40000)(rnd.nextInt(16))
    val compressed = Codecs.lzwCompress(idx)
    val back = Codecs.lzwDecompress(compressed, idx.length)
    assert(back != null, "decode must survive a dictionary-full stream")
    assert(back.sameElements(idx))
  }

  test("bmp: width field is read little-endian at offset 18") {
    // choose an id whose width bump keeps pixel data in range: shrink
    // instead — w=8 (id=4), patch to w=4: rowBytes shrinks, stays valid
    val id = 4L
    val good = Codecs.synthesizeBmp(id, 0)
    assert(Codecs.bmpWidth(id) == 8)
    val patched = good.clone(); patched(18) = 4
    val m = Codecs.parseBmp(id, patched)
    assert(m.ok && m.width == 4, "LE32 width at 18 drives the decode")
  }
}
