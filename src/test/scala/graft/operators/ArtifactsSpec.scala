package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the materialized layout artifacts (edge list, IVF
  * index, eval shingle set): lazy build on first read, results
  * identical to the from-scratch plan, fingerprint keying that
  * isolates different source dirs, and search-over-index equivalence
  * to the monolithic search. */
class ArtifactsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("edge artifact builds lazily and matches the from-scratch plan") {
    val p = new java.io.File(EdgeArtifact.path(dir))
    def del(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(del); f.delete()
    }
    del(p)
    assert(!p.exists())
    val fromArtifact = EdgeArtifact.edges(spark, dir)
      .select("pa", "pb", "support").collect().map(_.toSeq).toSet
    assert(p.exists(), "first read must materialize the artifact")
    // independent recomputation from the fact table
    val b = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey")).distinct()
    val fresh = b.select(col("okey"), col("l_partkey").as("pa"))
      .join(b.select(col("okey"), col("l_partkey").as("pb")), Seq("okey"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .collect().map(_.toSeq).toSet
    assert(fromArtifact == fresh)
  }

  test("edge artifact marginals agree with direct basket aggregates") {
    val basket = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey")).distinct()
    val freqFresh = basket.groupBy("l_partkey")
      .agg(count(lit(1)).as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val freqArt = EdgeArtifact.nodeFreq(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(freqArt == freqFresh)
    val nOrders = EdgeArtifact.meta(spark, dir).head().getLong(0)
    assert(nOrders == basket.select("okey").distinct().count())
  }

  test("artifact paths are fingerprint-keyed per source dir") {
    val a = Artifacts.path("/root/testdata/sf0.001", "lineitem", "cooccur")
    val b2 = Artifacts.path("/root/testdata/sf0.01", "lineitem", "cooccur")
    assert(a != b2)
    // stable across calls for the same (unchanged) input
    assert(a == Artifacts.path("/root/testdata/sf0.001", "lineitem", "cooccur"))
  }

  test("indexed IVF search equals the monolithic search") {
    val emb = graft.Tables.embeddings(spark, dir)
    val monolithic = Similarity.ivfSearch(emb, numCentroids = 8,
      qMinId = 8, qMaxId = 16, k = 3, probes = 2, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val indexed = Similarity.ivfSearchIndexed(
      IvfArtifact.centroids(spark, dir, 8, 2),
      IvfArtifact.inverted(spark, dir, 8, 2),
      qMinId = 8, qMaxId = 16, k = 3, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(indexed == monolithic)
  }

  test("pairs artifact equals a fresh capped-Jaccard pair run") {
    val fresh = Dedup.jaccardPairs(graft.Tables.documents(spark, dir), 0.5,
        maxDf = Some(64))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val art = PairsArtifact.pairs(spark, dir, 0.5, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(art == fresh)
  }

  test("cluster-label artifact equals a fresh pairs->CC run") {
    val fresh = Clusters.connectedComponents(
        Dedup.jaccardPairs(graft.Tables.documents(spark, dir), 0.5,
          maxDf = Some(64)).select(col("da"), col("db")), "da", "db")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val art = ClusterArtifact.labels(spark, dir, 0.5, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(art == fresh)
  }

  test("eval shingle artifact equals the from-scratch distinct set") {
    val fresh = Dedup.docShingles(
        graft.Tables.documents(spark, dir).filter(col("source") === "src0"), 5)
      .select("shingle").distinct().collect().map(_.getString(0)).toSet
    val art = EvalSetArtifact.shingles(spark, dir)
      .collect().map(_.getString(0)).toSet
    assert(art == fresh)
  }

  test("topic artifact: lazy build, total assignment, seed-labeled topics") {
    val p = new java.io.File(TopicArtifact.path(dir))
    def del(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(del); f.delete()
    }
    del(p)
    assert(!p.exists())
    val assign = TopicArtifact.assign(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p.exists(), "first read must materialize the artifact")
    // every doc with at least one token carries exactly one label
    val tokenBearing = TopicArtifact.tf(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(assign.keySet == tokenBearing)
    // topic ids are doc ids of members (label-by-representative: the
    // seed doc of a stratum labels its cluster)
    val topics = assign.values.toSet
    assert(topics.subsetOf(tokenBearing))
  }

  test("topic centroids: pos-ranked by (count desc, term), bounded to 256") {
    val cent = TopicArtifact.centroids(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    cent.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 256)
      val byPos = rows.sortBy(_._2)
      assert(byPos.map(_._2).toSeq == byPos.indices.toSeq, "dense pos")
      // (c desc, term asc) ordering encoded by pos
      val key = byPos.map(r => (-r._4, r._3)).toSeq
      assert(key == key.sorted, "centroid order must be (c desc, term)")
    }
  }
}
