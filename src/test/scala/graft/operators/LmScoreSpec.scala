package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the per-document bigram-LM quality score. */
class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.Registry.all.find(_.name == name).get

  test("q_text_lm_score: scores bounded, below-mean counts consistent") {
    import spark.implicits._
    val rows = q("q_text_lm_score").run(spark, dir)
      .select(col("source"), col("n_docs"), col("avg_nanos"),
        col("min_nanos"), col("max_nanos"), col("n_below_mean"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, avg, lo, hi, below) =>
      // a conditional probability lives in (0, 1e9]
      assert(lo > 0 && hi <= 1000000000L)
      assert(lo <= avg && avg <= hi)
      assert(below >= 0 && below <= n)
    }
    // every source's docs are accounted for (docs with >= 2 tokens)
    val total = rows.map(_._2).sum
    val eligible = graft.Tables.documents(spark, dir)
      .filter(size(split(col("text"), "\\s+")) >= 2).count()
    assert(total == eligible)
  }
}
