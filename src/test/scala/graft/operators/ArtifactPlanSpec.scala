package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape evidence for the artifact tier: consumers must get real
  * parquet benefits from the materialized structures — column pruning
  * into the artifact scan, and no re-derivation of the expensive build
  * inside a consumer's plan. */
class ArtifactPlanSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def planOf(name: String): String = {
    val q = graft.Registry.all.find(_.name == name).get
    q.run(spark, dir).queryExecution.executedPlan.toString
  }

  test("q_graph_degree prunes the edge-artifact scan to pa/pb") {
    EdgeArtifact.edges(spark, dir).count() // ensure built
    val plan = planOf("q_graph_degree")
    assert(plan.contains("cooccur"), "must scan the edge artifact")
    // support is stored in the artifact but this consumer never needs
    // it — parquet column pruning must drop it from the read schema
    assert(!plan.contains("support"), plan.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("q_market_basket reads support from the artifact, not the fact") {
    val plan = planOf("q_market_basket")
    assert(plan.contains("cooccur"))
    assert(plan.contains("support"))
    // the expensive basket self-join is gone: no join on the order key
    assert(!plan.contains("okey"))
  }

  test("q_embed_ivf_multiprobe searches the index without rebuilding it") {
    IvfArtifact.inverted(spark, dir, 8, 2).count() // ensure built
    val plan = planOf("q_embed_ivf_multiprobe")
    assert(plan.contains("ivf_"), "must scan the IVF artifact")
    // Lloyd refinement assembles centroid means via a
    // collect_list/array_sort aggregate over exploded components — a
    // consumer plan containing it would mean the build ran inline
    // (posexplode alone is no longer a rebuild tell: the bounded
    // top-k cut legitimately posexplodes its result array)
    assert(!plan.toLowerCase.contains("collect_list"), "index rebuilt inline")
  }

  test("q_embed_ood_score broadcasts the centroid artifact; corpus never shuffles") {
    IvfArtifact.centroids(spark, dir, 8, 2).count() // ensure built
    val df = graft.Registry.all.find(_.name == "q_embed_ood_score").get
      .run(spark, dir)
    df.collect() // let AQE finalize join strategies
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ivf_"), "must scan the IVF artifact")
    assert(plan.toLowerCase.contains("broadcast"),
      "centroid side must broadcast")
    assert(!plan.toLowerCase.contains("collect_list"), "index rebuilt inline")
  }

  test("q_dedup_keep joins the label artifact, not a CC re-run") {
    ClusterArtifact.labels(spark, dir, 0.5, 2).count() // ensure built
    val plan = planOf("q_dedup_keep")
    assert(plan.contains("dedupcc"), "must scan the label artifact")
    // the pair generation explodes shingles; its absence proves the
    // consumer never re-derives pairs
    assert(!plan.contains("shingle"), "pair generation re-ran inline")
  }
}
