package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Materialized dedup cluster-label table: connected components over
  * the capped-Jaccard near-dup pair list, each paired doc labeled
  * with its component's minimum doc id. This IS the artifact a real
  * dedup run publishes — the pair generation + CC labeling happen
  * once, and every downstream consumer (the corpus keep-filter, the
  * cluster-size report) is a cheap join against the label table.
  * `q_dedup_clusters` is the registered build step. Keyed by a
  * size/mtime fingerprint of `documents.parquet` plus the similarity
  * parameters (see [[Artifacts]]). */
object ClusterArtifact {

  def path(dir: String, threshold: Double, maxDf: Int): String = {
    val t = math.round(threshold * 100)
    s"${Artifacts.path(dir, "documents", "dedupcc")}_t${t}_d$maxDf"
  }

  /** Force a (re)build: near-dup pairs at `threshold` (df-capped
    * shingle index) → min-label connected components →
    * `(doc_id, cluster)`. */
  def materialize(spark: SparkSession, dir: String,
                  threshold: Double, maxDf: Int): String = synchronized {
    val p = path(dir, threshold, maxDf)
    Clusters.connectedComponents(
        Dedup.jaccardPairs(Tables.documents(spark, dir), threshold,
          maxDf = Some(maxDf)).select(col("da"), col("db")),
        "da", "db")
      .write.mode("overwrite").parquet(s"$p/labels")
    p
  }

  /** Read the label table `(doc_id, cluster)`, building it first if
    * absent. Only docs in some near-dup pair carry a label. */
  def labels(spark: SparkSession, dir: String,
             threshold: Double, maxDf: Int): DataFrame = {
    val p = path(dir, threshold, maxDf)
    if (!Artifacts.complete(p, Seq("labels")))
      materialize(spark, dir, threshold, maxDf)
    spark.read.parquet(s"$p/labels")
  }
}
