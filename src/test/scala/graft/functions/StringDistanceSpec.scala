package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native unrestricted Damerau-Levenshtein expression to
  * DuckDB's `damerau_levenshtein` — the vectors below were generated
  * with DuckDB (the driver's oracle engine), so the registry query's
  * hash parity is decided by exactly these semantics. Includes the
  * canonical OSA-vs-DL discriminator ("ca" → "abc" = 2, not 3). */
class StringDistanceSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val duckdbVectors: Seq[(String, String, Int)] = Seq(
    (" delta alpha", "delta", 7),
    ("bac", "alpha cat", 7),
    ("gama", "alpha act  tac", 12),
    ("act", "alpha gama act beta", 16),
    ("beta beta gamma acb", "beta act", 12),
    ("delta act", "act", 6),
    ("cat act", "cat  delta", 5),
    ("acb abc", "alpha gamma", 8),
    ("bac abc gamma ", "act", 12),
    ("acb beta", "cat  alpha act", 11),
    ("delta delta cat", "alpha beta gamma abc", 14),
    ("alpha", "tac  acb", 6),
    ("abc bac delta", "delta tac cat gama", 13),
    ("beta gama delta", "alpha cat act bac", 12),
    ("bac gamma delta delta", " beta gama gama", 14),
    ("alpha acb", "gamma alpha", 8),
    ("act tac gamma beta", "cat", 15),
    ("delta delta cat delta", "alpha gama", 16),
    ("ca", "abc", 2), // unrestricted DL; OSA would say 3
    ("abcdef", "abcfad", 3),
    ("a cat", "an act", 2),
    ("", "abc", 3),
    ("same", "same", 0),
    ("ab", "ba", 1),
    ("abcd", "acbd", 1),
    ("xabcy", "xbacy", 1))

  test("compute matches DuckDB damerau_levenshtein on pinned vectors") {
    duckdbVectors.foreach { case (a, b, want) =>
      val got = DamerauLevenshtein.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == want, s"dl('$a','$b') = $got, duckdb says $want")
      // symmetry — DL is a metric
      val rev = DamerauLevenshtein.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(rev == want, s"dl('$b','$a') = $rev, expected symmetric $want")
    }
  }

  test("expression evaluates under codegen and never exceeds levenshtein") {
    import spark.implicits._
    val df = duckdbVectors.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(
        DamerauLevenshtein(col("a"), col("b")).as("dl"),
        levenshtein(col("a"), col("b")).as("lev"))
    df.collect().foreach { r =>
      assert(r.getInt(0) <= r.getInt(1), s"dl ${r.getInt(0)} > lev ${r.getInt(1)}")
    }
    // and the column results agree with the pinned vectors end-to-end
    val dls = df.select(col("dl")).as[Int].collect().toSeq
    assert(dls == duckdbVectors.map(_._3))
  }

  /** Bit-exact doubles generated with DuckDB's
    * `jaro_winkler_similarity` — the registry query's hash parity is
    * decided by exactly these values (floor'd to micro-units), so the
    * comparison is `==` on the raw double, no tolerance. Covers the
    * Winkler boost branch (sim > 0.7), the no-boost branch, zero-match
    * pairs, and the both-empty → 0.0 convention. */
  private val jwVectors: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("abc", "", 0.0),
    ("", "", 0.0),
    ("a", "b", 0.0),
    ("crate", "trace", 0.7333333333333334),
    ("dwayne", "duane", 0.8400000000000001),
    ("arnab", "raanb", 0.8666666666666667),
    ("hello world", "hello word", 0.9818181818181818),
    ("eddeebbe", " ebadcba", 0.5833333333333334),
    ("  aedd  e", "beaeaaabbea", 0.42424242424242414),
    ("cdebeb c", "a ad cde", 0.5833333333333334),
    (" c", "becaae", 0.5555555555555555),
    ("da", "daa a", 0.84),
    ("badd", "ddae b ccacc", 0.611111111111111),
    ("d", "bb", 0.0),
    ("aaaddb ebdeb", "bd daddbacec", 0.6527777777777778),
    ("b", "de ", 0.0),
    ("aabbdcaecc", "aaabe b", 0.8107936507936507),
    ("e", "cedbed", 0.7222222222222223),
    ("bdb bcbeb ", "b  e", 0.6833333333333332))

  test("jaro-winkler compute matches DuckDB bit-for-bit on pinned vectors") {
    jwVectors.foreach { case (a, b, want) =>
      val got = JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == want, s"jw('$a','$b') = $got, duckdb says $want")
    }
  }

  // DuckDB's string metrics edit UTF-8 BYTES (dl('café','cafe') = 2:
  // one substituted + one deleted byte of the two-byte 'é'); both
  // native expressions must follow or they silently diverge from the
  // oracle on any non-ASCII text. Values generated with DuckDB.
  private val nonAsciiVectors: Seq[(String, String, Double, Int)] = Seq(
    ("café x", "cafe x", 0.8944444444444445, 2),
    ("naïve", "naive", 0.8577777777777779, 2),
    ("日本語", "日本話", 0.9111111111111111, 2),
    ("größe", "grosse", 0.6428571428571429, 4),
    ("café", "éfac", 0.4666666666666666, 4),
    ("über", "uber ", 0.7333333333333334, 3),
    ("résumé", "resume", 0.75, 4))

  test("both metrics match DuckDB byte-level semantics on non-ASCII text") {
    nonAsciiVectors.foreach { case (a, b, wantJw, wantDl) =>
      val ua = org.apache.spark.unsafe.types.UTF8String.fromString(a)
      val ub = org.apache.spark.unsafe.types.UTF8String.fromString(b)
      assert(JaroWinkler.compute(ua, ub) == wantJw,
        s"jw('$a','$b') diverges from DuckDB byte semantics")
      assert(DamerauLevenshtein.compute(ua, ub) == wantDl,
        s"dl('$a','$b') diverges from DuckDB byte semantics")
    }
  }

  test("jaro-winkler metric properties hold under seeded fuzz") {
    val rnd = new scala.util.Random(20260814L)
    def s(): String =
      (0 until rnd.nextInt(15)).map(_ => "abcde ".charAt(rnd.nextInt(6))).mkString
    (0 until 2000).foreach { _ =>
      val (a, b) = (s(), s())
      val ab = JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      val ba = JaroWinkler.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(b),
        org.apache.spark.unsafe.types.UTF8String.fromString(a))
      assert(ab == ba, s"asymmetric on ('$a','$b'): $ab vs $ba")
      assert(ab >= 0.0 && ab <= 1.0, s"out of range on ('$a','$b'): $ab")
      if (a.nonEmpty) {
        val aa = JaroWinkler.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(a),
          org.apache.spark.unsafe.types.UTF8String.fromString(a))
        assert(aa == 1.0, s"self-similarity != 1 on '$a': $aa")
      }
    }
  }

  test("jaro-winkler expression under codegen: pinned values, bounds, self-identity") {
    import spark.implicits._
    val df = jwVectors.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b")).as("jw"))
    val got = df.as[Double].collect().toSeq
    assert(got == jwVectors.map(_._3))
    got.foreach(v => assert(v >= 0.0 && v <= 1.0))
    // non-empty self-comparison is exactly 1.0
    val self = Seq("alpha", "x", "hello world").toDF("s")
      .select(JaroWinkler(col("s"), col("s")).as("jw")).as[Double].collect()
    assert(self.forall(_ == 1.0))
  }
}
