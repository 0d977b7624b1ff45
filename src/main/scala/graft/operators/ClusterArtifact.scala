package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Materialized near-dup pair list: the capped-Jaccard pairs
  * `(da, db, jaccard)` a dedup pipeline's FIRST job emits.
  * `q_dedup_jaccard_capped` is the registered build step; the
  * cluster-label build ([[ClusterArtifact]]) consumes the written
  * pairs instead of re-running the shingle-index self-join. Keyed by
  * a size/mtime fingerprint of `documents.parquet` plus the
  * similarity parameters (see [[Artifacts]]). */
object PairsArtifact {

  def path(dir: String, threshold: Double, maxDf: Int): String = {
    val t = math.round(threshold * 100)
    s"${Artifacts.path(dir, "documents", "ndpairs")}_t${t}_d$maxDf"
  }

  def materialize(spark: SparkSession, dir: String,
                  threshold: Double, maxDf: Int): String = synchronized {
    val p = path(dir, threshold, maxDf)
    if (Artifacts.skipBuild(p, Seq("pairs"))) return p
    Dedup.jaccardPairs(Tables.documents(spark, dir), threshold,
        maxDf = Some(maxDf))
      .write.mode("overwrite").parquet(s"$p/pairs")
    p
  }

  /** Read the pair list `(da, db, jaccard)`, building it first if
    * absent. */
  def pairs(spark: SparkSession, dir: String,
            threshold: Double, maxDf: Int): DataFrame = {
    val p = path(dir, threshold, maxDf)
    if (!Artifacts.complete(p, Seq("pairs")))
      materialize(spark, dir, threshold, maxDf)
    spark.read.parquet(s"$p/pairs")
  }
}

/** Materialized dedup cluster-label table: connected components over
  * the capped-Jaccard near-dup pair list, each paired doc labeled
  * with its component's minimum doc id. This IS the artifact a real
  * dedup run publishes — the pair generation + CC labeling happen
  * once, and every downstream consumer (the corpus keep-filter, the
  * cluster-size report) is a cheap join against the label table.
  * `q_dedup_clusters` is the registered build step, consuming the
  * [[PairsArtifact]] pair list — the dedup pipeline's real job chain
  * (pairs → clusters → filter), each stage materialized. Keyed by a
  * size/mtime fingerprint of `documents.parquet` plus the similarity
  * parameters (see [[Artifacts]]). */
object ClusterArtifact {

  def path(dir: String, threshold: Double, maxDf: Int): String = {
    val t = math.round(threshold * 100)
    s"${Artifacts.path(dir, "documents", "dedupcc")}_t${t}_d$maxDf"
  }

  /** Force a (re)build of the labels: min-label connected components
    * over the materialized pair list → `(doc_id, cluster)`. The pair
    * generation itself lives in [[PairsArtifact]] (lazily built here
    * if absent). */
  def materialize(spark: SparkSession, dir: String,
                  threshold: Double, maxDf: Int): String = synchronized {
    val p = path(dir, threshold, maxDf)
    if (Artifacts.skipBuild(p, Seq("labels"))) return p
    Clusters.connectedComponents(
        PairsArtifact.pairs(spark, dir, threshold, maxDf)
          .select(col("da"), col("db")),
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
