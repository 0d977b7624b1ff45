package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused Poisson-bootstrap aggregate must agree replicate-for-
  * replicate with the compositional explode/hash/aggregate
  * formulation (the shape the DuckDB oracle still replays) —
  * including under repartitioning, which exercises partial
  * aggregation + buffer serialization. */
class PoissonBootstrapAggSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val B = 40

  private def exploded(df: org.apache.spark.sql.DataFrame) =
    df.select(col("g"), col("cents"), col("event_id"),
        explode(sequence(lit(0), lit(B / 4 - 1))).as("slot"))
      .withColumn("hx", md5(
        concat(col("event_id").cast("string"), lit(":"),
          col("slot").cast("string"))))
      .select(col("g"), col("cents"),
        explode(sequence(lit(0), lit(3))).as("chunk"),
        col("slot"), col("hx"))
      .withColumn("b", col("slot") * 4 + col("chunk"))
      .withColumn("bp",
        pmod(expr("conv(substring(hx, chunk * 8 + 1, 8), 16, 10)")
          .cast("long"), lit(10000L)))
      .withColumn("m",
        when(col("bp") < 3679, 0L).when(col("bp") < 7358, 1L)
          .when(col("bp") < 9197, 2L).when(col("bp") < 9810, 3L)
          .when(col("bp") < 9963, 4L).when(col("bp") < 9994, 5L)
          .otherwise(6L))
      .groupBy(col("g"), col("b"))
      .agg(sum(col("m")).as("n_b"), sum(col("m") * col("cents")).as("sc_b"))
      .filter(col("n_b") > 0)
      .orderBy(col("g"), col("b"))

  private def fused(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g"))
      .agg(PoissonBootstrapAgg(col("event_id"), col("cents"), B).as("r"))
      .select(col("g"), explode(col("r")).as("e"))
      .filter(col("e.n_b") > 0)
      .select(col("g"), col("e.b").cast("int").as("b"),
        col("e.n_b").as("n_b"), col("e.sc_b").as("sc_b"))
      .orderBy(col("g"), col("b"))

  test("fused == exploded replicates, across partitionings") {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      (s"t${i % 3}", ((i * 37) % 1000).toLong, (i * 13 + 7).toLong)
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "cents", "event_id").repartition(parts)
      assert(fused(df).collect().toSeq == exploded(df).collect().toSeq,
        s"parts=$parts")
    }
  }

  test("null ids and values are skipped") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Some(10L), Some(1L)),
      (Some("a"), None, Some(2L)),
      (Some("a"), Some(20L), None))
      .toDF("g", "cents", "event_id")
    val total = df.groupBy(col("g"))
      .agg(PoissonBootstrapAgg(col("event_id"), col("cents"), B).as("r"))
      .select(explode(col("r")).as("e"))
      .agg(sum(col("e.sc_b"))).as[Long].head()
    // only the (10, id=1) row contributes; Σ m·cents over 40 replicates
    // of one row = 10 · Σ m, where Σ m is that row's total multiplicity
    assert(total % 10 == 0)
  }
}
