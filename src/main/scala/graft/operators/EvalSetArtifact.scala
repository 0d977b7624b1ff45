package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Materialized held-out eval-set shingle table (source `src0` stands
  * in for the eval benchmark). Contamination screening joins every
  * training document's shingles against this set; the set itself is
  * FIXED per corpus — at scale it is derived once from the benchmark
  * suite and shipped to every screening job, never re-shingled inside
  * each query. `q_eval_shingles_build` is the registered build step;
  * `q_contamination` and `q_corpus_prep` consume the artifact.
  * Keyed by a size/mtime fingerprint of `documents.parquet`
  * (see [[Artifacts]]). */
object EvalSetArtifact {

  def path(dir: String): String = Artifacts.path(dir, "documents", "evalsh")

  /** Force a (re)build: the distinct 5-gram shingle set of the
    * held-out source. */
  def materialize(spark: SparkSession, dir: String): String = synchronized {
    val p = path(dir)
    if (Artifacts.skipBuild(p, Seq("shingles"))) return p
    Dedup.docShingles(
        Tables.documents(spark, dir).filter(col("source") === "src0"), 5)
      .select(col("shingle")).distinct()
      .write.mode("overwrite").parquet(s"$p/shingles")
    p
  }

  /** Read the eval shingle set (one `shingle` column), building it
    * first if absent. Small by nature — callers broadcast it. */
  def shingles(spark: SparkSession, dir: String): DataFrame = {
    val p = path(dir)
    if (!Artifacts.complete(p, Seq("shingles"))) materialize(spark, dir)
    spark.read.parquet(s"$p/shingles")
  }
}
