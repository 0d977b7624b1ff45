package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized NN-descent kNN graph `(qid, vec_id, cos, rnk)` — the
  * graph-ANN index tier: `q_embed_nndescent` is the registered build
  * step (it pays the descent rounds and the parquet write);
  * `q_embed_graph_search` answers queries by BEAM-walking the stored
  * edges ([[Similarity.graphBeamSearch]]), touching the corpus only to
  * score visited candidates. Built at graph degree K=10 so every
  * consumer reads a rank prefix. Keyed by the embeddings fingerprint
  * (see [[Artifacts]]); parameters pinned in the path so a config
  * change can never serve a mismatched graph. */
object NndGraphArtifact {

  /** Graph degree (rank-prefix consumers read k' <= K). */
  val K = 10
  val Rounds = 3
  val ScatterDegree = 10

  def path(dir: String): String =
    s"${Artifacts.path(dir, "embeddings", "nndgraph")}_k${K}_r${Rounds}_s$ScatterDegree"

  /** Force a (re)build — the registered build step always pays this
    * cost so the bench prices it honestly. */
  def materialize(spark: SparkSession, dir: String): String = synchronized {
    val p = path(dir)
    if (Artifacts.skipBuild(p, Seq("edges"))) return p
    // the parquet write IS the descent's finalizing action — one
    // materializing pass over the round cascade, not a count + a
    // write (see the nnDescent finalize overload)
    Similarity.nnDescent(
      graft.Tables.embeddings(spark, dir)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding")),
      KnnEdgesArtifact.edges(spark, dir)
        .select(org.apache.spark.sql.functions.col("qid"),
          org.apache.spark.sql.functions.col("vec_id")),
      k = K, rounds = Rounds, scatterDegree = ScatterDegree,
      finalize = _.write.mode("overwrite").parquet(s"$p/edges"))
    p
  }

  /** The edge table, building first if absent — any registry subset
    * runs standalone in any order. */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    val p = path(dir)
    if (!Artifacts.complete(p, Seq("edges"))) materialize(spark, dir)
    spark.read.parquet(s"$p/edges")
  }
}
