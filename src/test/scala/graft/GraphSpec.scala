package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the graph family on sf0.001 — oracle parity
  * re-checks full values at sf0.01; these assert the structural
  * invariants a hash can't name (handshake sum, triangle closure,
  * rank-mass conservation bounds, component-size accounting). */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = Registry.all.find(_.name == name).get

  test("q_graph_degree: handshake lemma — sum(degree*n_nodes) is even") {
    import spark.implicits._
    val rows = q("q_graph_degree").run(spark, dir)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    val degSum = rows.map { case (d, n) => d * n }.sum
    assert(degSum % 2 == 0, "sum of degrees must be twice the edge count")
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("q_graph_triangles: histogram masses are positive, supports >= 1") {
    import spark.implicits._
    val rows = q("q_graph_triangles").run(spark, dir)
      .as[(Long, Long)].collect()
    // a node in the histogram participates in >= 1 triangle
    rows.foreach { case (nTri, nNodes) =>
      assert(nTri >= 1 && nNodes >= 1)
    }
  }

  test("q_graph_pagerank: ranks bounded below by the teleport floor") {
    import spark.implicits._
    val rows = q("q_graph_pagerank").run(spark, dir)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // every rank >= 0.15e9 (teleport term); sorted desc then by node
    rows.foreach { case (_, pr) => assert(pr >= 150000000L) }
    val prs = rows.map(_._2)
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b })
  }

  test("q_graph_components: component sizes >= 2 and nodes accounted") {
    import spark.implicits._
    val hist = q("q_graph_components").run(spark, dir)
      .as[(Long, Long)].collect()
    assert(hist.nonEmpty)
    // every component in an edge-derived graph has >= 2 nodes
    hist.foreach { case (csize, n) => assert(csize >= 2 && n >= 1) }
    // total labeled nodes == nodes in the degree query's histogram
    val totalCc = hist.map { case (c, n) => c * n }.sum
    val totalDeg = q("q_graph_degree").run(spark, dir)
      .agg(sum(col("n_nodes"))).head().getLong(0)
    assert(totalCc == totalDeg)
  }

  test("q_graph_clustering: coefficient in [0, 1], wedges bound triangles") {
    val row = q("q_graph_clustering").run(spark, dir).head()
    val (nTri, nWedges, ccMicros) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nWedges >= 1)
    // every triangle closes 3 wedges, so 3*tri <= wedges
    assert(3 * nTri <= nWedges)
    assert(ccMicros >= 0L && ccMicros <= 1000000L)
  }

  test("q_graph_assortativity: correlation in [-1, 1]") {
    val row = q("q_graph_assortativity").run(spark, dir).head()
    val (nEdges, r) = (row.getLong(0), row.getDouble(1))
    assert(nEdges >= 1)
    assert(r >= -1.0 && r <= 1.0)
  }

  test("q_graph_louvain: detected partition beats singletons; accounting") {
    import spark.implicits._
    val m = q("q_graph_louvain").run(spark, dir)
      .as[(String, Long)].collect().toMap
    val nNodes = q("q_graph_degree").run(spark, dir)
      .agg(sum(col("n_nodes"))).head().getLong(0)
    val nEdges = q("q_graph_degree").run(spark, dir)
      .agg(sum(col("degree") * col("n_nodes"))).head().getLong(0) / 2
    // all-singletons has strictly negative modularity, so finding ANY
    // structure means q > 0; intra edges and sizes must account
    assert(m("q_nanos") > 0L, s"no structure found: $m")
    assert(m("intra_edges") >= 1L && m("intra_edges") <= nEdges)
    assert(m("max_size") >= 2L)
    assert(m("singletons") < m("n_communities"))
    assert(m("n_communities") < nNodes, "nothing merged")
    Seq("moved_r1", "moved_r2", "moved_r3").foreach { k =>
      assert(m(k) >= 0L && m(k) <= nNodes)
    }
    assert(m("moved_r1") > 0L, "round 1 must move the mergeable nodes")
  }
}
