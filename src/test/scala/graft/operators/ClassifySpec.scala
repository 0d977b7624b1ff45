package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for [[Classify.nbConfusion]]: on a two-class corpus
  * with disjoint token sets the student must classify every held-out
  * doc correctly, the matrix must cover exactly the eval split, and
  * the result must be deterministic. The registry query's oracle
  * re-checks the full arithmetic cross-engine at sf0.01. */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def bp(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % 10000
  }

  test("nbConfusion: disjoint-vocabulary classes classify perfectly") {
    import spark.implicits._
    val docs = (0L until 40L).map { id =>
      if (id % 2 == 0) (id, "apple apple pear apple", "A")
      else (id, "banana kiwi banana banana", "B")
    }.toDF("doc_id", "text", "lab")
    // the fixed 80/20 hash split must leave both classes on both sides
    val evalIds = (0L until 40L).filter(bp(_) >= 8000)
    assert(evalIds.exists(_ % 2 == 0) && evalIds.exists(_ % 2 == 1))

    val got = Classify.nbConfusion(docs, col("lab"))
      .as[(String, String, Long)].collect().toSeq.sorted
    val expected = Seq(
      ("A", "A", evalIds.count(_ % 2 == 0).toLong),
      ("B", "B", evalIds.count(_ % 2 == 1).toLong))
    assert(got == expected)
  }

  test("nbConfusion: matrix covers exactly the eval split, deterministically") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val run1 = Classify.nbConfusion(docs,
      TextAnalysis.predictedProfile(col("text")))
      .as[(String, String, Long)].collect().toSeq.sorted
    val run2 = Classify.nbConfusion(docs,
      TextAnalysis.predictedProfile(col("text")))
      .as[(String, String, Long)].collect().toSeq.sorted
    assert(run1 == run2)
    val nEval = docs.select(col("doc_id")).as[Long].collect()
      .count(bp(_) >= 8000)
    assert(run1.map(_._3).sum == nEval.toLong)
    assert(run1.forall(_._3 > 0))
  }

  test("rocchioConfusion: disjoint-vocabulary classes classify perfectly") {
    import spark.implicits._
    val docs = (0L until 40L).map { id =>
      if (id % 2 == 0) (id, "apple apple pear apple", "A")
      else (id, "banana kiwi banana banana", "B")
    }.toDF("doc_id", "text", "lab")
    val evalIds = (0L until 40L).filter(bp(_) >= 8000)
    val got = Classify.rocchioConfusion(docs, col("lab"))
      .as[(String, String, Long)].collect().toSeq.sorted
    val expected = Seq(
      ("A", "A", evalIds.count(_ % 2 == 0).toLong),
      ("B", "B", evalIds.count(_ % 2 == 1).toLong))
    assert(got == expected)
  }

  test("rocchioConfusion: covers the eval split; no-overlap docs take the fallback class") {
    import spark.implicits._
    // class B's vocabulary never appears in eval docs of class C, so C
    // docs share no centroid token and must fall back to min(label)='A'
    val docs = (0L until 60L).map { id =>
      if (id % 3 == 0) (id, "apple apple pear", "A")
      else if (id % 3 == 1) (id, "banana kiwi banana", "B")
      else (id, s"unique${id}x only${id}y", "C") // every token is a hapax
    }.toDF("doc_id", "text", "lab")
    val got = Classify.rocchioConfusion(docs, col("lab"))
      .as[(String, String, Long)].collect().toSeq
    val evalIds = (0L until 60L).filter(bp(_) >= 8000)
    assert(got.map(_._3).sum == evalIds.length.toLong)
    // hapax-only class C: its tokens never clear the shared-vocab cut
    // into any centroid component overlap with its EVAL docs (train
    // hapaxes differ from eval hapaxes), so eval C docs take the
    // alphabetically-first class
    val cRows = got.filter(_._1 == "C")
    assert(cRows.nonEmpty && cRows.forall(_._2 == "A"))
  }
}
