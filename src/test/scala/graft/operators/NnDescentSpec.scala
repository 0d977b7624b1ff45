package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph-ANN quality pins for [[Similarity.nnDescent]]: descent must
  * not lose recall vs its init graph, must match-or-beat an IVF
  * 2-probe search on the same corpus, and must be deterministic.
  * Ground truth is exact brute-force cosine top-k (computed in-test —
  * the corpus is 500 vectors). */
class NnDescentSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val k = 5

  private lazy val vecs: Map[Long, Array[Float]] =
    graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    // the engine ranks on 6-dp-rounded cosine; match it for fair ties
    BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Exact top-k neighbor sets (ties by vec_id, same as the engine). */
  private lazy val truth: Map[Long, Set[Long]] = vecs.map { case (q, qv) =>
    q -> vecs.toSeq.filter(_._1 != q)
      .map { case (v, ev) => (v, cos(qv, ev)) }
      .sortBy { case (v, c) => (-c, v) }.take(k).map(_._1).toSet
  }

  private def recallOf(found: Map[Long, Set[Long]]): Double =
    truth.map { case (q, t) =>
      (found.getOrElse(q, Set.empty) & t).size.toDouble / t.size
    }.sum / truth.size

  private def toSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

  /** The registered configuration: graph degree 10, 3 rounds; recall
    * is evaluated on the rank-5 prefix (the artifact convention). */
  private def descend(): org.apache.spark.sql.DataFrame =
    Similarity.nnDescent(
      graft.Tables.embeddings(spark, dir).select("vec_id", "embedding"),
      KnnEdgesArtifact.edges(spark, dir).select("qid", "vec_id"),
      k = 10, rounds = 3, scatterDegree = 10)
      .filter(col("rnk") <= k)

  test("recall@5 beats the in-cell init graph and an IVF 2-probe search") {
    val inCell = toSets(KnnEdgesArtifact.edges(spark, dir))
    val nnd = toSets(descend())
    // IVF 2-probe graph on the same corpus: per node, candidates from
    // its 2 nearest Lloyd cells (replicating ivfSearchIndexed without
    // its query/corpus id split — every node is both query and corpus)
    val cents = IvfArtifact.centroids(spark, dir, 8, 2)
      .select("cell", "cvec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val cellOf = vecs.map { case (v, ev) =>
      v -> cents.map { case (c, cv) => (c, cos(ev, cv)) }
        .sortBy { case (c, s) => (-s, c) }.head._1
    }
    val multiprobe = vecs.map { case (q, qv) =>
      val probed = cents.map { case (c, cv) => (c, cos(qv, cv)) }
        .sortBy { case (c, s) => (-s, c) }.take(2).map(_._1).toSet
      q -> vecs.toSeq
        .filter { case (v, _) => v != q && probed(cellOf(v)) }
        .map { case (v, ev) => (v, cos(qv, ev)) }
        .sortBy { case (v, c) => (-c, v) }.take(k).map(_._1).toSet
    }
    val (rInit, rProbe, rNnd) =
      (recallOf(inCell), recallOf(multiprobe), recallOf(nnd))
    info(f"recall@5: in-cell=$rInit%.3f ivf-2probe=$rProbe%.3f nndescent=$rNnd%.3f")
    assert(rNnd >= rInit, f"descent lost recall vs its init: $rNnd%.3f < $rInit%.3f")
    assert(rNnd >= rProbe,
      f"descent below the IVF multiprobe baseline: $rNnd%.3f < $rProbe%.3f")
    assert(rNnd >= 0.6, f"recall floor: $rNnd%.3f")
  }

  test("exactly k neighbors per node, no self-edges, deterministic across runs") {
    val a = descend().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQ = a.groupBy(_._1)
    assert(byQ.size == vecs.size, "every node gets a neighbor list")
    byQ.foreach { case (q, rows) =>
      assert(rows.length == k)
      assert(!rows.exists(_._2 == q), s"self-edge at $q")
      assert(rows.map(_._4).sorted.toSeq == (1 to k))
    }
    val b = descend().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(a.sortBy(r => (r._1, r._4)).toSeq == b.sortBy(r => (r._1, r._4)).toSeq,
      "two runs must produce identical graphs")
  }
}
