package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed pins for [[Similarity.marginPairs]]: the density-
  * corrected margin arithmetic on a 4-vector cell, plus shape
  * invariants on the real corpus. */
class MarginPairsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("margin arithmetic matches the hand computation exactly") {
    import spark.implicits._
    // one cell; A = {0, 2} (even), B = {1, 3} (odd); unit-ish 2D vecs
    val inv = Seq(
      (0L, 0L, Array(1f, 0f)), (2L, 0L, Array(0f, 1f)),
      (1L, 0L, Array(1f, 0f)), (3L, 0L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "cell", "embedding")
      .withColumn("nrm", org.apache.spark.sql.functions.lit(1.0))
    val out = Similarity.marginPairs(inv, k = 2, thresholdPpm = 1500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // qid 0: cos(0,1)=1.0, cos(0,3)=0.6 -> avg_f=800000, best=1 (1e6)
    //        bwd(1): {1.0, 0.0} -> avg_b=500000; denom=650000
    //        margin = 1e12 div 650000 = 1538461 -> accepted at 1.5
    // qid 2: cos(2,3)=0.8, cos(2,1)=0 -> avg_f=400000, best=3 (8e5)
    //        bwd(3): {0.8, 0.6} -> avg_b=700000; denom=550000
    //        margin = 8e11 div 550000 = 1454545 -> rejected at 1.5
    assert(out.toSeq == Seq(
      (0L, 1L, 1000000L, 1538461L, true),
      (2L, 3L, 800000L, 1454545L, false)))
  }

  test("real corpus: matches are cross-parity and margins positive") {
    val rows = Similarity.marginPairs(
      IvfArtifact.inverted(spark, "/root/testdata/sf0.001", 8, 2),
      k = 3, thresholdPpm = 1050000L)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1)
      assert(r.getLong(3) > 0, "margins positive on this corpus")
    }
    // the density correction must actually reorder SOMETHING vs raw
    // cosine: acceptance by margin is not the same set as acceptance
    // by any fixed cosine cut (there exist an accepted pair with a
    // lower cosine than some rejected pair)
    val acc = rows.filter(_.getBoolean(4)).map(_.getLong(2))
    val rej = rows.filterNot(_.getBoolean(4)).map(_.getLong(2))
    if (acc.nonEmpty && rej.nonEmpty)
      assert(acc.min < rej.max,
        "margin acceptance should not be a pure cosine threshold")
  }
}
