package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[SuffixArray]] — prefix-doubling suffix-array
  * construction and rank-adjacency LCP:
  *  - the computed rank order equals a brute-force lexicographic sort
  *    of the truncated suffixes (ties iff identical truncations);
  *  - every emitted repeated-substring pair carries its EXACT
  *    brute-force LCP, including the padding edge (a suffix that is a
  *    proper prefix of another) and the truncation cap;
  *  - the maximum emitted lcp equals the brute-force longest repeated
  *    substring over all position pairs;
  *  - determinism: two runs produce identical rows. */
class SuffixArraySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // crafted corpus: doc 2 duplicates doc 0's prefix; "abra" repeats
  // inside doc 3 (self-repeat); doc 4 is a proper prefix of doc 5's
  // suffix content (padding edge); doc 6 = doc 7 exactly (equal-rank
  // group at every position).
  private val docs = Seq(
    (0L, "the quick brown fox jumps"),
    (1L, "lazy dogs sleep all day"),
    (2L, "the quick brown cat naps"),
    (3L, "abracadabra abracadabra"),
    (4L, "zebra"),
    (5L, "xyzebra stripes"),
    (6L, "identical twin documents"),
    (7L, "identical twin documents")
  ).toDF("doc_id", "text")

  private val MaxLen = 16

  /** The SA is over each doc's first-MaxLen-char WINDOW: the suffix at
    * pos p is window.substring(p) — window-truncated, not
    * 16-chars-from-p (mirrors [[SuffixArray.positions]]). */
  private def suffix(text: String, p: Int): String =
    text.take(MaxLen).substring(p)

  /** All window suffixes as (suffix, doc, pos). */
  private def allSuffixes: Seq[(String, Long, Long)] = for {
    (id, text) <- Seq(0L -> "the quick brown fox jumps",
      1L -> "lazy dogs sleep all day", 2L -> "the quick brown cat naps",
      3L -> "abracadabra abracadabra", 4L -> "zebra",
      5L -> "xyzebra stripes", 6L -> "identical twin documents",
      7L -> "identical twin documents")
    p <- 0 until math.min(text.length, MaxLen)
  } yield (suffix(text, p), id, p.toLong)

  private def lcpOf(a: String, b: String): Int =
    a.zip(b).takeWhile { case (x, y) => x == y }.size

  test("rank order equals brute-force lexicographic suffix order") {
    val got = SuffixArray.suffixArray(docs, MaxLen)
      .select("doc_id", "pos", "rank").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val bySuffix = allSuffixes.groupBy(_._1)
    val ordered = bySuffix.keys.toSeq.sorted
    // dense rank: position of the suffix string in the sorted distinct
    // list; every (doc,pos) of an identical truncation shares it
    ordered.zipWithIndex.foreach { case (s, expectRank) =>
      bySuffix(s).foreach { case (_, d, p) =>
        assert(got((d, p)) == expectRank.toLong,
          s"suffix '$s' at ($d,$p): got ${got((d, p))}, want $expectRank")
      }
    }
    assert(got.size == allSuffixes.size)
  }

  test("every emitted pair carries its exact brute-force LCP") {
    val pairs = SuffixArray.longestRepeated(docs, MaxLen).collect()
    val text = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case Row(da: Long, pa: Long, db: Long, pb: Long,
        lcp: Long) =>
      val sa = suffix(text(da), pa.toInt)
      val sb = suffix(text(db), pb.toInt)
      assert(lcp == lcpOf(sa, sb).toLong,
        s"pair ($da,$pa)x($db,$pb): got $lcp, want ${lcpOf(sa, sb)}")
    }
  }

  test("padding edge: a proper-prefix suffix ranks first and LCPs exactly") {
    // 'zebra' (doc 4 whole) vs 'zebra stripes' tail of doc 5 (pos 2):
    // brute LCP = 5; the greedy walk must not overshoot into padding.
    val pairs = SuffixArray.longestRepeated(docs, MaxLen).collect()
      .map { case Row(da: Long, pa: Long, db: Long, pb: Long, l: Long) =>
        ((da, pa, db, pb), l) }.toMap
    val z = pairs.collect {
      case ((da, _, db, _), l) if Set(da, db) == Set(4L, 5L) => l }
    assert(z.nonEmpty && z.max == 5L, s"zebra pair lcps: ${z.toSeq}")
    // prefix-sorts-first: rank('zebra') < rank('zebra stripes')
    val ranks = SuffixArray.suffixArray(docs, MaxLen)
      .select("doc_id", "pos", "rank").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(ranks((4L, 0L)) < ranks((5L, 2L)))
  }

  test("max emitted lcp equals the brute-force longest repeated substring") {
    val emitted = SuffixArray.longestRepeated(docs, MaxLen).collect()
      .map(_.getLong(4)).max
    val all = allSuffixes
    val brute = (for {
      i <- all.indices; j <- (i + 1) until all.size
    } yield lcpOf(all(i)._1, all(j)._1)).max
    assert(emitted == brute.toLong, s"emitted $emitted, brute $brute")
  }

  test("equal-rank groups surface exact duplicate docs") {
    val pairs = SuffixArray.longestRepeated(docs, MaxLen).collect()
    val dupPair = pairs.find(r =>
      Set(r.getLong(0), r.getLong(2)) == Set(6L, 7L) &&
        r.getLong(1) == 0L && r.getLong(3) == 0L)
    assert(dupPair.isDefined, "doc 6 == doc 7 full-prefix pair missing")
    assert(dupPair.get.getLong(4) == MaxLen.toLong)
  }

  test("determinism: two runs produce identical rows") {
    def run() = SuffixArray.longestRepeated(docs, MaxLen).collect()
      .map(_.toSeq).sortBy(_.toString)
    assert(run().sameElements(run()))
  }

  test("commonPrefixLen equals brute force on every edge shape") {
    // the round-12 in-row replacement for the greedy rank-table walk:
    // empty sides, identical strings, one a prefix of the other,
    // first-char mismatch, mid mismatch, non-ASCII code points
    import org.apache.spark.sql.functions.col
    val cases = Seq(("", ""), ("a", ""), ("", "b"), ("abc", "abc"),
      ("abc", "abd"), ("abc", "abcdef"), ("abcdef", "abc"),
      ("xyz", "abc"), ("ab", "a"), ("café x", "café y"),
      ("a" * 128, "a" * 128), ("a" * 128, "a" * 127 + "b"))
    val got = cases.toDF("a", "b")
      .withColumn("got", SuffixArray.commonPrefixLen(col("a"), col("b")))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val want = a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
      assert(r.getLong(2) == want, s"'$a' vs '$b': got ${r.getLong(2)}, want $want")
    }
  }
}
