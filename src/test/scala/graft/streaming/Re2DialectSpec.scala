package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The P5 dialect guard: patterns must stay in the RE2 ∩ Java subset
  * so they run identically in this engine (java.util.regex) and the
  * reference's WASM transform (RE2). */
class Re2DialectSpec extends AnyFunSuite {

  test("portable patterns pass") {
    val ok = Seq(
      EcosystemStreams.EduPattern,
      "^abc$", "a|b", "a{2,5}", "(foo)+bar?", "[a-z]+\\d*",
      "(?i)hello", "(?:non|capturing)", "[*+?]", "[]a]", "[^]]",
      "a\\+b", "\\(\\)", "colou?r")
    ok.foreach(p => assert(Re2Dialect.check(p).isEmpty, s"should pass: $p"))
  }

  test("Java-only constructs are rejected") {
    val bad = Seq(
      "(a)\\1",          // backreference
      "(?<g>a)\\k<g>",   // named backreference
      "(?=x)y",          // lookahead
      "a(?!b)",          // negative lookahead
      "(?<=x)y",         // lookbehind
      "(?<!x)y",         // negative lookbehind
      "(?>ab)c",         // atomic group
      "a*+b", "a++", "x?+", "a{2,3}+b", "a{2}+") // possessive quantifiers
    bad.foreach(p => assert(Re2Dialect.check(p).isDefined, s"should reject: $p"))
  }

  test("literal brace followed by + is portable, not possessive") {
    // `}` here closes no {m,n} quantifier — valid in both dialects
    Seq("a}+", "x}+y").foreach(p =>
      assert(Re2Dialect.check(p).isEmpty, s"should pass: $p"))
  }

  test("RE2-only syntax is rejected via the Java compile check") {
    assert(Re2Dialect.check("(?P<name>a)").isDefined)
  }

  test("validated throws with the violation reason") {
    val e = intercept[IllegalArgumentException](Re2Dialect.validated("(a)\\1"))
    assert(e.getMessage.contains("backreference"))
  }

  test("regexFilter rejects a non-portable pattern up front") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq(("a@x.edu", "v", "logins", 0L))
      .toDF("key", "value", "topic", "seq")
    intercept[IllegalArgumentException](
      EcosystemStreams.regexFilter(df, "(?=x)y"))
  }
}
