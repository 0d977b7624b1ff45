package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Hand-computed fixtures for the label-noise audit and KNN-Shapley
  * valuation. The Shapley fixture is built so the closed-form
  * recursion is checkable by hand (K=2, N=4, one test point) and so
  * a value TIE exercises the vec_id tie-break in both cut directions. */
class LabelValueSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("knnShapley replays the closed-form recursion with integer-nano floors") {
    import spark.implicits._
    // test point 0 (label 1, (1,0)); train ranked by cosine:
    //   10 (d=1) > 11 (d=0) > 12 (d=1) > 13 (d=0),  K=2, N=4
    // s4 = d4/N = 0
    // t3 = (1-0)/2 * 2/3  -> floor(2e9/6)  =  333333333
    // t2 = (0-1)/2 * 2/2  -> -500000000
    // t1 = (1-0)/2 * 1/1  ->  500000000
    // values: 10 -> 333333333, 11 -> -166666667, 12 -> 333333333, 13 -> 0
    val emb = Seq(
      (0L, Array(1f, 0f), 1),
      (10L, Array(1f, 0.01f), 1),
      (11L, Array(1f, 0.2f), 0),
      (12L, Array(1f, 1f), 1),
      (13L, Array(0f, 1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val rows = Similarity.knnShapley(emb, queryMaxId = 1, kNeighbors = 2,
      topN = 3).as[(String, Int, Long, Int, Long)].collect().toSeq
    assert(rows == Seq(
      // value asc, ties to the smaller vec_id
      ("bottom", 1, 11L, 0, -166666667L),
      ("bottom", 2, 13L, 0, 0L),
      ("bottom", 3, 10L, 1, 333333333L),
      // value desc, the 10/12 tie resolves to 10 first
      ("top", 1, 10L, 1, 333333333L),
      ("top", 2, 12L, 1, 333333333L),
      ("top", 3, 13L, 0, 0L)))
  }

  test("labelPropagation spreads seed labels with the pinned tie-break") {
    import spark.implicits._
    // seeds 0 (label 5) and 1 (label 2); chain 0-20-21-22-23 reaches
    // 22 in exactly 3 rounds but not 23; node 10 ties between both
    // seeds and must take the SMALLER label (2); 30 is isolated.
    // Non-seed rows carry decoy labels that must be ignored.
    val edges = Seq(
      (0L, 20L, 0.9, 1), (20L, 21L, 0.9, 1), (21L, 22L, 0.9, 1),
      (22L, 23L, 0.9, 1), (10L, 0L, 0.9, 1), (10L, 1L, 0.8, 2)
    ).toDF("qid", "vec_id", "cos", "rnk")
    val labels = Seq((0L, 5), (1L, 2), (10L, 9), (20L, 1), (21L, 1),
      (22L, 1), (23L, 1), (30L, 4)).toDF("vec_id", "label")
    val rows = Similarity
      .labelPropagation(edges, labels, kPrefix = 3, seedMaxId = 2, rounds = 3)
      .as[(Int, Long, Long)].collect().toSeq
    assert(rows == Seq((-1, 0L, 2L), (2, 1L, 2L), (5, 1L, 4L)))
  }

  test("labelNoiseAudit flags majority-disagreement suspects per label") {
    import spark.implicits._
    // one cell, k=2: vector 3 (label 0) sits between two label-1
    // vectors -> both neighbors disagree -> the only suspect
    val inv = Seq(
      (1L, 0L, Array(1f, 0f)),
      (2L, 0L, Array(1f, 0.1f)),
      (3L, 0L, Array(1f, 0.15f)),
      (4L, 0L, Array(0f, 1f))
    ).toDF("vec_id", "cell", "embedding")
      .withColumn("nrm", Similarity.norm(org.apache.spark.sql.functions.col("embedding")))
    val labels = Seq((1L, 1), (2L, 1), (3L, 0), (4L, 0))
      .toDF("vec_id", "label")
    val rows = Similarity
      .labelNoiseAudit(Similarity.inCellTopK(inv, k = 2), labels)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(
      // label 0: vector 3 agrees 0/2 (suspect), vector 4 agrees 1/2
      (0, 2L, 250L, 1L),
      // label 1: vectors 1 and 2 each agree 1/2 -> exactly half, not suspect
      (1, 2L, 500L, 0L)))
  }
}
