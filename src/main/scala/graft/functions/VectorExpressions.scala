package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the embedding hot path: a fused
  * float-array dot product with whole-stage codegen (`doGenCode`
  * emits a tight primitive loop; no intermediate arrays, no lambda
  * dispatch — unlike the `zip_with` + `aggregate` formulation, which
  * allocates a product array per row pair).
  *
  * Accumulation order is the same sequential left-to-right fold as
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, so results are
  * bit-identical to the built-in formulation (and to the DuckDB
  * oracle's list_sum over an index comprehension). */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed names: several FloatDotProduct instances
      // can land in ONE generated projection (cosine = three dots),
      // and a shared `i`/`n`/`acc` would collide — janino rejects the
      // class and the whole projection silently drops to the
      // interpreter, exactly the hot path this expression exists to
      // keep compiled.
      val n = ctx.freshName("fdpN")
      val acc = ctx.freshName("fdpAcc")
      val i = ctx.freshName("fdpI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance over float arrays — the PQ-family hot
  * path (codebook refinement argmin, corpus encode, ADC lookup tables
  * all score O(vectors × codes) subspace pairs). Same contract as
  * [[FloatDotProduct]]: the accumulation is the sequential
  * left-to-right fold `acc += (a_i - b_i)²` with per-element
  * float→double widening, bit-identical to the
  * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0.0, _+_)`
  * formulation it replaces (differential-spec-pinned) and to the
  * DuckDB oracle's `list_sum` over an index comprehension — swapping
  * it in cannot move a single argmin tie. */
case class FloatL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("flsN")
      val acc = ctx.freshName("flsAcc")
      val i = ctx.freshName("flsI")
      val d = ctx.freshName("flsD")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Deterministic integer power iteration for the dominant eigenvector
  * of a small symmetric integer matrix (the d×d embedding covariance):
  * v₀ = all-10⁶; each step is the exact BIGINT matvec
  * uᵢ = Σⱼ c[i·d+j]·vⱼ followed by renormalization to ±10⁶ through the
  * one shared double expression `floor(u·10⁶ / max(1, max|u|))` —
  * bit-identical to the SQL formulation the DuckDB oracle unrolls
  * (same IEEE ops in the same order), so the converged direction is
  * engine-exact.
  *
  * Evaluates ONCE on the single aggregated covariance row (the
  * distributed work — [[graft.functions.VectorCoMomentAgg]] — has
  * already collapsed the corpus by the time this runs), so it is
  * eval-only (CodegenFallback), deliberately outside whole-stage
  * codegen: O(T·d²) scalar ops on one row. The expression replaces an
  * 8-step chain of one-row DataFrame projections whose collapsed
  * lambda trees the optimizer could not hold (and whose per-step
  * persist barriers cost 16 scheduler round-trips).
  *
  * Input: row-major FULL symmetric d² BIGINT cell array; overflow
  * bound: |c|≤10¹² (unit-norm micro-quantized corpora) gives
  * |u|≤8·10¹⁸ < 2⁶³. */
case class PowerIterationTop(child: Expression, d: Int, iters: Int)
    extends UnaryExpression with CodegenFallback {

  require(d >= 1 && iters >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "power_iteration_top"

  override protected def nullSafeEval(input: Any): Any = {
    val cells = input.asInstanceOf[ArrayData].toLongArray()
    val v = Array.fill(d)(1000000L)
    val u = new Array[Long](d)
    var t = 0
    while (t < iters) {
      var i = 0
      while (i < d) {
        val base = i * d
        var acc = 0L
        var j = 0
        while (j < d) { acc += cells(base + j) * v(j); j += 1 }
        u(i) = acc
        i += 1
      }
      var mx = 1L
      i = 0
      while (i < d) { val a = math.abs(u(i)); if (a > mx) mx = a; i += 1 }
      i = 0
      while (i < d) {
        v(i) = math.floor(u(i).toDouble * 1000000.0 / mx.toDouble).toLong
        i += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(v)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column API for [[FloatDotProduct]]. */
  def floatDot(a: Column, b: Column): Column =
    ColumnShim.column(
      FloatDotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column API for [[FloatL2Sq]]. */
  def floatL2Sq(a: Column, b: Column): Column =
    ColumnShim.column(
      FloatL2Sq(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column API for [[PowerIterationTop]]. */
  def powerIterationTop(cells: Column, d: Int, iters: Int): Column =
    ColumnShim.column(
      PowerIterationTop(ColumnShim.expression(cells), d, iters))
}
