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

object DamerauLevenshtein {

  def apply(a: Column, b: Column): Column =
    ColumnShim.column(DamerauLevenshtein(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Lowrance-Wagner full DL over UTF-16 code units (identical to code
    * points for the BMP text in every table here). `da` maps each code
    * unit to the last row of `a` where it occurred; the (maxDist)
    * sentinel border rows make the transposition recurrence uniform. */
  def compute(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
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
    // last-occurrence table: flat array for Latin-1 code units (all
    // data here), spillover map for anything higher — no boxed
    // HashMap on the hot path
    val daLow = new Array[Int](256)
    var daHigh: java.util.HashMap[Character, Integer] = null
    def lastOcc(c: Char): Int =
      if (c < 256) daLow(c)
      else if (daHigh == null) 0
      else { val v = daHigh.get(c); if (v == null) 0 else v.intValue() }
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a.charAt(i - 1)
      j = 1
      while (j <= m) {
        val bj = b.charAt(j - 1)
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
      if (ai < 256) daLow(ai) = i
      else {
        if (daHigh == null) daHigh = new java.util.HashMap[Character, Integer]()
        daHigh.put(ai, i)
      }
      i += 1
    }
    d((n + 1) * w + m + 1)
  }
}
