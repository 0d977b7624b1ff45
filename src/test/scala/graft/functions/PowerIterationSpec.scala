package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the native one-row power-iteration expression: exact
  * equivalence to a plain Scala replay of the documented integer/double
  * step, convergence to a known dominant eigenvector, and the ±10⁶
  * renormalization invariant. */
class PowerIterationSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  /** Plain-Scala replay of the documented step — the independent
    * reference the expression must match bit-for-bit. */
  private def reference(cells: Array[Long], d: Int, iters: Int): Array[Long] = {
    val v = Array.fill(d)(1000000L)
    for (_ <- 1 to iters) {
      val u = Array.tabulate(d)(i =>
        (0 until d).map(j => cells(i * d + j) * v(j)).sum)
      val mx = math.max(1L, u.map(math.abs).max)
      for (i <- 0 until d)
        v(i) = math.floor(u(i).toDouble * 1000000.0 / mx.toDouble).toLong
    }
    v
  }

  private def run(cells: Array[Long], d: Int, iters: Int): Array[Long] = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(cells.toSeq)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = false)))))
    df.select(VectorExpressions.powerIterationTop(col("c"), d, iters).as("v"))
      .head().getSeq[Long](0).toArray
  }

  test("matches the plain-Scala replay on an arbitrary symmetric matrix") {
    val d = 5
    // symmetric, mixed-sign cells
    val m = Array.ofDim[Long](d * d)
    val seed = Array(3L, -7L, 11L, 2L, -5L)
    for (i <- 0 until d; j <- 0 until d)
      m(i * d + j) = seed(i) * seed(j) + (if (i == j) 40 else 0) * 1000
    for (it <- Seq(1, 3, 8))
      assert(run(m, d, it).toSeq == reference(m, d, it).toSeq)
  }

  test("converges to the dominant axis of a diagonal matrix") {
    val d = 4
    val m = Array.ofDim[Long](d * d)
    m(0) = 1000000L // dominant
    for (i <- 1 until d) m(i * d + i) = 10000L
    val v = run(m, d, 8)
    assert(v(0) == 1000000L)
    assert((1 until d).forall(i => math.abs(v(i)) < 100L),
      s"off-axis loadings must decay: ${v.toSeq}")
  }

  test("renormalization invariant: max |component| is exactly 1e6") {
    val d = 3
    val m = Array[Long](5, 2, 1, 2, 9, -3, 1, -3, 7).map(_ * 100000L)
    for (it <- 1 to 6) {
      val v = run(m, d, it)
      assert(v.map(math.abs).max == 1000000L)
    }
  }
}
