package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for UNRESTRICTED Damerau-Levenshtein
  * distance (Lowrance-Wagner): edits = insert / delete / substitute /
  * transpose-adjacent, where a transposed pair may be edited again
  * later — unlike the common "optimal string alignment" restriction.
  * `dl("ca","abc") = 2` (OSA gives 3), matching DuckDB's
  * `damerau_levenshtein`, which the oracle uses.
  *
  * Spark ships only plain `levenshtein`; transposition-aware distance
  * is the right metric for typo-class fuzzy matching (swapped
  * characters are the most common human typo). Codegen'd via a static
  * compute call; cost is O(|a|·|b|) ints per pair, so callers must
  * block candidates first (never all-pairs) and cap operand length —
  * the registry query runs it on 40-char heads of blocked pairs.
  *
  * Semantics follow the reference's fuzzy-dedup intent (near-dup
  * detection, `/root/reference/` has no string-distance op — this is
  * part of the training-data-pipeline extension surface). */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DamerauLevenshtein.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for Jaro-Winkler similarity in [0,1] —
  * the record-linkage metric that rewards matching characters inside a
  * length-scaled window plus a shared prefix (up to 4 chars, weight
  * 0.1, boost only above 0.7 Jaro). Complements [[DamerauLevenshtein]]
  * (typo edits) with a length-normalized score that tolerates
  * tail divergence.
  *
  * The arithmetic replays DuckDB's `jaro_winkler_similarity`
  * bit-for-bit (verified exhaustively over random pairs, including
  * the both-empty → 0.0 convention), so oracle SQL can use the
  * built-in and still hash-match on floor'd micro-units. Cost is
  * O(|a|·|b|) over the match window — callers must block candidates
  * first and cap operand length, same contract as
  * [[DamerauLevenshtein]]. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def apply(a: Column, b: Column): Column =
    ColumnShim.column(JaroWinkler(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Standard Jaro with the greedy left-to-right match window, then
    * the Winkler prefix boost. Operation order matches the C++
    * implementation DuckDB ships: (m/l1 + m/l2 + (m-t)/m) / 3, then
    * sim + l·0.1·(1−sim) when sim > 0.7. Either operand empty
    * (including both) scores 0.0.
    *
    * Operates on UTF-8 BYTES, not UTF-16 code units: DuckDB's
    * jaro_winkler_similarity treats the string as a byte sequence, so
    * 'café' is a 5-unit operand there — computing over charAt would
    * silently diverge from the oracle on any non-ASCII text (0.9222
    * vs 0.8944 for 'café x'/'cafe x'). Bytewise comparison is also
    * exact for codepoint equality since UTF-8 is self-synchronizing. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    var sim = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3
    if (sim > 0.7) {
      var l = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (l < maxP && a(l) == b(l)) l += 1
      sim = sim + l * 0.1 * (1 - sim)
    }
    sim
  }
}

object DamerauLevenshtein {

  def apply(a: Column, b: Column): Column =
    ColumnShim.column(DamerauLevenshtein(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Lowrance-Wagner full DL over UTF-8 BYTES — the unit DuckDB's
    * `damerau_levenshtein` edits (probe: dl('café','cafe') = 2 there,
    * one substituted + one deleted byte of the two-byte 'é'), so the
    * oracle and the engine agree on every input, not just ASCII.
    * `da` maps each byte to the last row of `a` where it occurred —
    * a flat 256-entry table, no boxed map anywhere; the (maxDist)
    * sentinel border rows make the transposition recurrence uniform. */
  def compute(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.getBytes
    val b = ub.getBytes
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val maxDist = n + m
    // d is (n+2) x (m+2), flattened row-major
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = maxDist
    var j = 0
    while (j <= m) {
      d(j + 1) = maxDist // d[0][j+1]
      d(w + j + 1) = j // d[1][j+1]
      j += 1
    }
    var i = 0
    while (i <= n) {
      d((i + 1) * w) = maxDist // d[i+1][0]
      d((i + 1) * w + 1) = i // d[i+1][1]
      i += 1
    }
    val daLow = new Array[Int](256)
    def lastOcc(c: Byte): Int = daLow(c & 0xFF)
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a(i - 1)
      j = 1
      while (j <= m) {
        val bj = b(j - 1)
        val k = lastOcc(bj)
        val l = db
        val cost = if (ai == bj) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trn = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trn < best) best = trn
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      daLow(ai & 0xFF) = i
      i += 1
    }
    d((n + 1) * w + m + 1)
  }
}
