package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plain 128-char-window suffix-array rank levels, DERIVED from the
  * strided artifact instead of stored — the round-12 collapse of what
  * used to be two independently-built rank tables. Block 0 of the
  * strided view covers exactly each document's first `window` code
  * points, so the strided ranking RESTRICTED to block 0 is, level by
  * level, an order- and equality-preserving image of the plain
  * ranking: the LCP walk (which only tests rank EQUALITY at levels
  * `k < K`) consumes the restriction directly, and the final level is
  * re-densified with one distributed sort-and-scan
  * ([[SuffixArray.denseRerank]]) to recover the exact dense ranks the
  * adjacency pairing and the `q_suffix_array` output need. Net: the
  * plain family costs one cheap re-rank per consumer instead of a
  * second 7-round doubling build + its parquet writes every bench
  * pass. */
object SuffixArtifact {

  /** Chars of the suffix window — 128 keeps the doubling at 7 rounds
    * and caps reported matches at 128 chars (a match that long is a
    * duplicated document prefix, which is what the trim/drop decision
    * needs; the window widens by adding rounds, one per doubling). */
  val MaxLen = 128

  /** log2(MaxLen). */
  val Rounds: Int = Integer.numberOfTrailingZeros(MaxLen)

  /** Build = the strided build (one artifact serves both families). */
  def materialize(spark: SparkSession, dir: String): String =
    StridedSuffixArtifact.materialize(spark, dir)

  /** Block-0 restriction of strided level `k`, in plain coordinates
    * (`doc_id`, `pos` within the first-window slice). Ranks preserve
    * the plain level's equality classes and order but are NOT dense
    * over the slice — dense enough for the walk's equality tests. */
  private def view(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val base = SuffixArray.BlockBase
    StridedSuffixArtifact.levels(spark, dir)(k)
      .filter(pmod(col("doc_id"), lit(base)) === 0)
      .select(expr(s"doc_id DIV $base").as("doc_id"), col("pos"),
        col("rank"))
  }

  /** All plain rank levels: `levels(k)` ranked by first 2^k chars.
    * Levels `0..Rounds-1` are block-0 views (equality-preserving);
    * the final level is the dense re-rank ([[last]]). */
  def levels(spark: SparkSession, dir: String): Seq[DataFrame] =
    (0 until Rounds).map(k => view(spark, dir, k)) :+ last(spark, dir)

  /** The final level — the plain suffix array itself, with exact
    * dense ranks (equal to what the standalone plain doubling build
    * assigned; the DuckDB oracle replaying the plain construction
    * still matches hash-for-hash). */
  def last(spark: SparkSession, dir: String): DataFrame =
    SuffixArray.denseRerank(view(spark, dir, Rounds))
}

/** Strided variant of [[SuffixArtifact]] — the rank table over
  * OVERLAPPING 128-char blocks at stride 64 ([[SuffixArray.blocks]]),
  * so repeats are found anywhere in a document, not just its
  * first-128-char prefix: every position gets ≥64 chars of in-block
  * lookahead (exact matches to 64, opportunistic to 128). Positions
  * are stored in block coordinates (`doc_id` = bid); global
  * coordinates are pure arithmetic, no mapping table. Same doubling
  * construction, same level layout, ~2× the positions of a
  * full-corpus non-overlapping scheme. */
object StridedSuffixArtifact {

  val Window: Int = SuffixArtifact.MaxLen
  val Stride: Int = Window / 2
  val Rounds: Int = SuffixArtifact.Rounds

  // BlockBase is part of the key: stored bids are base-dependent, so
  // a base change must never serve a stale table
  def path(dir: String): String =
    s"${Artifacts.path(dir, "documents", "suffixstrided")}_w${Window}_s${Stride}_b${SuffixArray.BlockBase}"

  private def parts: Seq[String] = (0 to Rounds).map(k => s"level_$k")

  /** Force a (re)build — the registered build step always pays this
    * cost so the bench prices it honestly. */
  def materialize(spark: SparkSession, dir: String): String = synchronized {
    val p = path(dir)
    if (Artifacts.skipBuild(p, parts)) return p
    val blk = SuffixArray.blocks(
      graft.Tables.documents(spark, dir), Window, Stride)
    SuffixArray.rankLevels(blk, Window).zipWithIndex.foreach {
      case (lvl, k) => lvl.write.mode("overwrite").parquet(s"$p/level_$k")
    }
    p
  }

  private def ensure(spark: SparkSession, dir: String): String = {
    val p = path(dir)
    if (!Artifacts.complete(p, parts)) materialize(spark, dir)
    p
  }

  /** All stored rank levels, block-coordinate keyed. */
  def levels(spark: SparkSession, dir: String): Seq[DataFrame] = {
    val p = ensure(spark, dir)
    (0 to Rounds).map(k => spark.read.parquet(s"$p/level_$k"))
  }

  /** The final level only. */
  def last(spark: SparkSession, dir: String): DataFrame = {
    val p = ensure(spark, dir)
    spark.read.parquet(s"$p/level_$Rounds")
  }
}

/** Materialized STRIDED repeat-pair table — the greedy LCP walk's
  * output (`(doc_a, pos_a, doc_b, pos_b, lcp)` in global coordinates,
  * seam-reconciled and self-pair-free) stored once so every consumer
  * of "which exact substrings repeat where" reads pairs instead of
  * re-running the 2·K-join walk: `q_dedup_lrs_strided` is the
  * registered build step (it pays the walk), `q_dedup_cross_source`
  * reads the stored pairs. The two-deep artifact convention of the
  * IVF → kNN-edges → NN-descent chain applied to the suffix family. */
object StridedLrsPairsArtifact {

  def path(dir: String): String =
    s"${Artifacts.path(dir, "documents", "suffixpairs")}_w${StridedSuffixArtifact.Window}_s${StridedSuffixArtifact.Stride}_b${SuffixArray.BlockBase}"

  /** Force a (re)build — the registered build step always pays this
    * cost so the bench prices it honestly. */
  def materialize(spark: SparkSession, dir: String): String = synchronized {
    val p = path(dir)
    if (Artifacts.skipBuild(p, Seq("pairs"))) return p
    val levels = StridedSuffixArtifact.levels(spark, dir)
    SuffixArray.longestRepeatedStrided(levels,
        StridedSuffixArtifact.Window, StridedSuffixArtifact.Stride)
      .write.mode("overwrite").parquet(s"$p/pairs")
    p
  }

  /** The stored pair table, building first if absent. */
  def pairs(spark: SparkSession, dir: String): DataFrame = {
    val p = path(dir)
    if (!Artifacts.complete(p, Seq("pairs"))) materialize(spark, dir)
    spark.read.parquet(s"$p/pairs")
  }
}
