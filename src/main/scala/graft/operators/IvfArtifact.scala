package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Materialized IVF index — centroid table + inverted list — for the
  * embeddings corpus. ANN systems build their index OFFLINE and serve
  * searches from it; re-running the Lloyd refinement inside every
  * search query prices the build into each search. Here
  * `q_embed_ivf_refined` is the registered build step (it already IS
  * the index build — Lloyd refinement + final assignment) and the
  * search queries consume the written index. Keyed by a size/mtime
  * fingerprint of `embeddings.parquet` (see [[Artifacts]]) so a
  * regenerated corpus always rebuilds. */
object IvfArtifact {

  def path(dir: String, numCentroids: Int, iterations: Int): String =
    s"${Artifacts.path(dir, "embeddings", "ivf")}_c${numCentroids}_i$iterations"

  /** Force a (re)build: Lloyd-refined centroids `(cell, cvec, cnrm)`
    * and the inverted list `(vec_id, cell, embedding, nrm)`. */
  def materialize(spark: SparkSession, dir: String,
                  numCentroids: Int, iterations: Int): String = synchronized {
    val p = path(dir, numCentroids, iterations)
    val (cents, inverted) = Similarity.ivfIndex(
      Tables.embeddings(spark, dir), numCentroids, iterations)
    cents.write.mode("overwrite").parquet(s"$p/centroids")
    inverted.write.mode("overwrite").parquet(s"$p/inverted")
    p
  }

  private def ensure(spark: SparkSession, dir: String,
                     numCentroids: Int, iterations: Int): String = {
    val p = path(dir, numCentroids, iterations)
    if (!Artifacts.complete(p, Seq("centroids", "inverted")))
      materialize(spark, dir, numCentroids, iterations)
    p
  }

  def centroids(spark: SparkSession, dir: String,
                numCentroids: Int, iterations: Int): DataFrame =
    spark.read.parquet(
      s"${ensure(spark, dir, numCentroids, iterations)}/centroids")

  def inverted(spark: SparkSession, dir: String,
               numCentroids: Int, iterations: Int): DataFrame =
    spark.read.parquet(
      s"${ensure(spark, dir, numCentroids, iterations)}/inverted")
}
