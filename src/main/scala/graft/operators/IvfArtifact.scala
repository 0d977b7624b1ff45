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

  /** Corpus-sized centroid count — the standard IVF sizing rule
    * C ∝ √N (cells and per-cell list lengths grow together, so probe
    * cost stays ~√N either way), clamped to [8, 4096]. One knob: the
    * production entry points below derive C from the corpus instead
    * of taking a literal, and `IvfRecallSpec` holds the recall@5
    * contract at two scale factors so a resize can never silently
    * trade recall away. The registry verify queries still pin C = 8:
    * their DuckDB oracles replay the exact integer-quantized k-means,
    * so the constant must appear verbatim in both engines' text. */
  def autoCentroids(n: Long): Int =
    math.max(8, math.min(4096, math.round(math.sqrt(n.toDouble)).toInt))

  /** The auto-sized C for this corpus (one count, scan-only). */
  def autoFor(spark: SparkSession, dir: String): Int =
    autoCentroids(Tables.embeddings(spark, dir).count())

  /** Auto-sized index accessors — C = [[autoCentroids]](corpus size). */
  def centroidsAuto(spark: SparkSession, dir: String,
                    iterations: Int = 2): DataFrame =
    centroids(spark, dir, autoFor(spark, dir), iterations)

  def invertedAuto(spark: SparkSession, dir: String,
                   iterations: Int = 2): DataFrame =
    inverted(spark, dir, autoFor(spark, dir), iterations)

  /** Force a (re)build: Lloyd-refined centroids `(cell, cvec, cnrm)`
    * and the inverted list `(vec_id, cell, embedding, nrm)`. */
  def materialize(spark: SparkSession, dir: String,
                  numCentroids: Int, iterations: Int): String = synchronized {
    val p = path(dir, numCentroids, iterations)
    if (Artifacts.skipBuild(p, Seq("centroids", "inverted"))) return p
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
