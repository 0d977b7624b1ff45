package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused co-moment aggregate must agree cell-for-cell with the
  * compositional formulation (explode dimension pairs, hash-aggregate)
  * — including under repartitioning, which exercises partial
  * aggregation + buffer serialization. */
class VectorCoMomentAggSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val d = 4

  private def explodedCells(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(expr(
        """flatten(transform(sequence(0, size(qv) - 1),
          |  i -> transform(sequence(i, size(qv) - 1),
          |    j -> struct(i AS i, j AS j, qv[i] * qv[j] AS xy))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(sum(col("p.xy")).as("s_ij"))
      .orderBy(col("i"), col("j"))

  private def fusedCells(df: org.apache.spark.sql.DataFrame) =
    df.agg(VectorCoMomentAgg(col("qv"), d).as("cm"))
      .select(explode(col("cm.pairs")).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        col("p.s_ij").as("s_ij"))
      .orderBy(col("i"), col("j"))

  test("fused == exploded co-moments, across partitionings") {
    import spark.implicits._
    val rows = (0 until 57).map { r =>
      Tuple1((0 until d).map(i => ((r * 31 + i * 17) % 23 - 11).toLong))
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("qv").repartition(parts)
      assert(fusedCells(df).collect().toSeq ==
        explodedCells(df).collect().toSeq, s"parts=$parts")
    }
  }

  test("first moments and count ride the same buffer") {
    import spark.implicits._
    val rows = (0 until 19).map { r =>
      Tuple1((0 until d).map(i => (r * 7 + i).toLong))
    }
    val df = rows.toDF("qv").repartition(3)
    val got = df.agg(VectorCoMomentAgg(col("qv"), d).as("cm"))
      .select(col("cm.n"), col("cm.s")).as[(Long, Seq[Long])].head()
    val wantS = (0 until d).map(i => (0 until 19).map(r => r * 7L + i).sum)
    assert(got == ((19L, wantS)))
  }

  test("null and wrong-length vectors are skipped") {
    import spark.implicits._
    val df = Seq(
      Some(Seq(1L, 2L, 3L, 4L)),
      None,
      Some(Seq(1L, 2L)), // wrong length
      Some(Seq(5L, 6L, 7L, 8L))).toDF("qv")
    val n = df.agg(VectorCoMomentAgg(col("qv"), d).as("cm"))
      .select(col("cm.n")).as[Long].head()
    assert(n == 2L)
  }
}
