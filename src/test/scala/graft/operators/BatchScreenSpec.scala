package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the incremental exact-substring screen
  * ([[SuffixArray.batchScreen]]) — batch suffixes ranked against the
  * STORED corpus rank table, no rebuild:
  *  - per batch position, the reported lcp equals the brute-force
  *    longest common extension against the corpus whenever that
  *    extension fits the guaranteed lookahead (≤ window − stride);
  *  - a planted corpus substring inside a batch doc (and past the
  *    plain 128-char window) is found at its exact length;
  *  - positions with no corpus repeat report their true (small) lcp,
  *    never a fabricated match;
  *  - determinism: two runs produce identical rows. */
class BatchScreenSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val W = 128
  private val S = 64

  private def screen(docs: Seq[(Long, String)],
      batch: Long => Boolean): Map[(Long, Long), Long] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = docs.toDF("doc_id", "text")
    val blk = SuffixArray.blocks(df, W, S)
    val last = SuffixArray.rankLevels(blk, W).last
    SuffixArray.batchScreen(last, blk, S,
        gdoc => gdoc.isin(docs.map(_._1).filter(batch): _*))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  /** Brute-force longest common extension of batch suffix (doc, pos)
    * against every corpus suffix, capped at the window. */
  private def brute(docs: Seq[(Long, String)], batch: Long => Boolean,
      doc: Long, pos: Int): Int = {
    val t = docs.toMap.apply(doc)
    val cap = math.min(W, t.length - pos)
    def common(a: String, ai: Int, b: String, bi: Int): Int = {
      var n = 0
      while (ai + n < a.length && bi + n < b.length &&
        a.charAt(ai + n) == b.charAt(bi + n)) n += 1
      n
    }
    val best = (for {
      (cd, ct) <- docs if !batch(cd)
      cp <- 0 until ct.length
    } yield common(t, pos, ct, cp)).maxOption.getOrElse(0)
    math.min(best, cap)
  }

  private def filler(from: Int, n: Int): String =
    (from until from + n).map(_.toChar).mkString

  private val Marker = "EXACTSUBSTRINGSCREENMARKERTEXT40CHARSxyz"
  require(Marker.length == 40)

  test("planted corpus substring found at exact length, past the plain window") {
    val docs = Seq(
      0L -> (filler(1000, 150) + Marker + filler(1200, 30)), // corpus
      1L -> (filler(2000, 180) + Marker + filler(3000, 20)), // batch
      2L -> filler(4000, 120)) // corpus, repeat-free
    val got = screen(docs, _ == 1L)
    // marker starts at batch global pos 180 — past the plain window
    assert(got((1L, 180L)) == 40L,
      s"expected exact 40-char hit at (1,180), got ${got.get((1L, 180L))}")
    // shadow positions inside the marker report the remaining length
    assert(got((1L, 190L)) == 30L)
    // a filler position has no corpus repeat of meaningful length
    assert(got((1L, 10L)) <= 1L)
  }

  test("per-position lcp equals brute force within guaranteed lookahead") {
    val docs = Seq(
      0L -> ("the quick brown fox jumps over the lazy dog " * 4), // corpus
      1L -> filler(5000, 90), // corpus, unique
      2L -> ("over the lazy dog and the quick brown fox again " +
        filler(6000, 40) + " quick brown fox")) // batch
    val got = screen(docs, _ == 2L)
    val t2 = docs.toMap.apply(2L)
    (0 until t2.length).foreach { p =>
      val exact = brute(docs, (_: Long) == 2L, 2L, p)
      val reported = got.getOrElse((2L, p.toLong), 0L)
      if (exact <= W - S)
        assert(reported == exact,
          s"pos $p: reported $reported, brute-force $exact")
      else
        assert(reported >= (W - S) && reported <= exact,
          s"pos $p: reported $reported outside [${W - S}, $exact]")
    }
  }

  test("determinism: two runs produce identical rows") {
    val docs = Seq(
      0L -> ("shared prefix text block " + filler(1000, 60)),
      1L -> ("shared prefix text block " + filler(2000, 60)),
      2L -> (filler(3000, 40) + "shared prefix text block"))
    val a = screen(docs, d => d == 1L)
    val b = screen(docs, d => d == 1L)
    assert(a == b)
    assert(a.nonEmpty)
  }
}
