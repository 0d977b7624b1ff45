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
}
