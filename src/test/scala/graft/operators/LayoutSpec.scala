package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the data-layout / CDC / privacy operators (the
  * oracle parity harness covers the full testdata; these pin the
  * semantics on hand-checkable inputs). */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def changelog = Seq(
    // key 1: three versions, latest by ts is id=3
    (1L, 1L, 100L, "a"), (2L, 1L, 200L, "b"), (3L, 1L, 300L, "c"),
    // key 2: ts tie between id=4 and id=5 — higher tiebreak id wins
    (4L, 2L, 100L, "d"), (5L, 2L, 100L, "e"))
    .toDF("id", "k", "t", "v")

  test("latestSnapshot keeps exactly the greatest (ts, tiebreak) row per key") {
    val snap = Layout.latestSnapshot(changelog, col("k"), col("t"),
        col("id"), Seq(col("v")))
      .select(col("key"), col("ts"), col("__p0").as("v"))
      .as[(Long, Long, String)].collect().toSet
    assert(snap == Set((1L, 300L, "c"), (2L, 100L, "e")))
  }

  test("latestSnapshot equals the window formulation on arbitrary data") {
    val big = (0 until 500).map(i =>
      (i.toLong, (i % 17).toLong, (i * 31 % 97).toLong, s"v$i"))
      .toDF("id", "k", "t", "v")
    val viaAgg = Layout.latestSnapshot(big, col("k"), col("t"),
        col("id"), Seq(col("v")))
      .select(col("key"), col("__p0")).as[(Long, String)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("t").desc, col("id").desc)
    val viaWindow = big.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("k"), col("v")).as[(Long, String)].collect().toSet
    assert(viaAgg == viaWindow && viaAgg.size == 17)
  }

  test("scd2Intervals chains each version to its successor, open tail") {
    val iv = Layout.scd2Intervals(changelog, col("k"), col("t"), col("id"))
      .select(col("id"), col("valid_from"), col("valid_to"), col("is_current"))
      .as[(Long, Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(iv(1L) == ((1L, 100L, Some(200L), false)))
    assert(iv(2L) == ((2L, 200L, Some(300L), false)))
    assert(iv(3L) == ((3L, 300L, None, true)))
    // the ts tie orders by tiebreak: id=4 precedes id=5
    assert(iv(4L) == ((4L, 100L, Some(100L), false)))
    assert(iv(5L) == ((5L, 100L, None, true)))
  }

  test("compactionPlan: ceiling file count, exact byte ledger") {
    val files = Seq(("p1", 100L), ("p1", 50L), ("p2", 10L))
      .toDF("part", "bytes")
    val plan = Layout.compactionPlan(files, col("part"), col("bytes"),
        targetBytes = 64L)
      .select(col("partition"), col("n_rows"), col("total_bytes"),
        col("n_files"), col("avg_file_bytes"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // p1: 150 bytes / 64 -> 3 files of avg 50; p2: 10 bytes -> 1 file
    assert(plan == Set(("p1", 2L, 150L, 3L, 50L), ("p2", 1L, 10L, 1L, 10L)))
  }

  test("zorderCell interleaves bits and preserves 2-D locality order") {
    val z = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (255L, 255L))
      .toDF("a", "b")
      .select(Layout.zorderCell(col("a"), col("b"), 8).as("z"))
      .as[Long].collect().toSeq
    assert(z == Seq(0L, 1L, 2L, 3L, 65535L))
    // nearby points in both dims share a high-bit prefix: (3,2) vs (2,3)
    val near = Seq((3L, 2L), (2L, 3L)).toDF("a", "b")
      .select(Layout.zorderCell(col("a"), col("b"), 8).as("z"))
      .as[Long].collect()
    assert(near.forall(v => v >= 8 && v < 16)) // same 4-wide cell
  }

  test("kAnonymity counts groups and rows under the threshold") {
    val rows = (Seq.fill(12)(("a", 1L)) ++ Seq.fill(3)(("a", 2L)) ++
      Seq.fill(1)(("b", 1L))).toDF("q1", "q2")
    val audit = Layout.kAnonymity(rows, Seq(col("q1"), col("q2")), k = 10)
      .select(col("n_groups"), col("n_small_groups"), col("n_rows"),
        col("n_rows_at_risk"), col("risk_share"))
      .as[(Long, Long, Long, Long, Double)].head()
    assert(audit == ((3L, 2L, 16L, 4L, 0.25)))
  }

  test("lDiversity flags uniform-sensitive groups regardless of size") {
    // group (a,1): 12 rows but only 1 distinct sensitive value — the
    // case k-anonymity (k=10) calls safe and l-diversity must flag
    val rows = (Seq.fill(12)(("a", 1L, 7L)) ++
      Seq((("b"), 1L, 1L), ("b", 1L, 2L), ("b", 1L, 3L))).toDF("q1", "q2", "s")
    val audit = Layout.lDiversity(rows, Seq(col("q1"), col("q2")), col("s"), l = 3)
      .select(col("n_groups"), col("n_underdiverse_groups"),
        col("min_diversity"), col("n_rows_at_risk"))
      .as[(Long, Long, Long, Long)].head()
    assert(audit == ((2L, 1L, 1L, 12L)))
  }

  test("hardNegatives never returns the query's own label") {
    val emb = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 1.3 + d).toFloat), (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val negs = Similarity.hardNegatives(emb, queryMaxId = 6, k = 4)
      .select(col("qid"), col("label")).as[(Long, Int)].collect()
    assert(negs.nonEmpty)
    negs.foreach { case (qid, lbl) => assert(lbl != (qid % 3).toInt) }
  }

  test("ivfRecallCurve is monotone-defined and hits 1.0 when cells are exact") {
    // one centroid == single cell -> IVF searches the whole corpus ->
    // recall@k = 1.0 for every k
    val emb = (0L until 24L).map { i =>
      (i, Array.tabulate(8)(d => math.cos(i * 0.9 + d * 0.7).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val curve = Similarity.ivfRecallCurve(emb, numCentroids = 1,
        qMinId = 4, qMaxId = 8, maxK = 3)
      .select(col("k"), col("recall")).as[(Int, Double)].collect().toMap
    assert(curve.keySet == Set(1, 2, 3) && curve.values.forall(_ == 1.0))
  }

  test("matryoshkaRecall is 1.0 when the prefix carries all the signal") {
    // vectors whose tail is constant: prefix search == full search
    val emb = (0L until 20L).map { i =>
      (i, Array.tabulate(8)(d =>
        if (d < 4) math.sin(i * 2.7 + d).toFloat else 0.5f))
    }.toDF("vec_id", "embedding")
    val rec = Similarity.matryoshkaRecall(emb, queryMaxId = 3, k = 4, subDim = 4)
      .select(col("recall")).as[Double].collect()
    assert(rec.length == 3 && rec.forall(_ == 1.0))
  }

  test("centroidDrift: identical vectors per label drift to cosine 1 vs a same-mean corpus") {
    val v = Array.tabulate(4)(d => (d + 1).toFloat)
    val emb = (0L until 6L).map(i => (i, v, (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
    val drift = Similarity.centroidDrift(emb)
      .select(col("label"), col("n_vectors"), col("drift_cos"))
      .as[(Int, Long, Double)].collect().toSet
    assert(drift == Set((0, 3L, 1.0), (1, 3L, 1.0)))
  }
}
