package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized suffix-array RANK TABLE — all prefix-doubling levels
  * `0..log2(window)` written once as fingerprint-keyed parquet, the
  * layout-artifact treatment ([[Artifacts]]) applied to the suffix
  * family: `q_suffix_array` is the registered build step (it pays the
  * full doubling construction), and `q_dedup_lrs` consumes the stored
  * levels instead of re-running the 7-round build — the greedy LCP
  * walk needs EVERY level (one rank lookup per level per pair), which
  * is exactly why the SA literature stores the rank table, not just
  * the final array. Storage is (levels × window positions) — linear
  * in corpus characters with a log(window) factor, the standard
  * space/time trade of rank-table LCP. */
object SuffixArtifact {

  /** Chars of the suffix window — 128 keeps the doubling at 7 rounds
    * and caps reported matches at 128 chars (a match that long is a
    * duplicated document prefix, which is what the trim/drop decision
    * needs; the window widens by adding rounds, one per doubling). */
  val MaxLen = 128

  /** log2(MaxLen). */
  val Rounds: Int = Integer.numberOfTrailingZeros(MaxLen)

  def path(dir: String): String =
    s"${Artifacts.path(dir, "documents", "suffixarray")}_w$MaxLen"

  private def parts: Seq[String] = (0 to Rounds).map(k => s"level_$k")

  /** Force a (re)build — the registered build step always pays this
    * cost so the bench prices it honestly. */
  def materialize(spark: SparkSession, dir: String): String = synchronized {
    val p = path(dir)
    if (Artifacts.skipBuild(p, parts)) return p
    val docs = graft.Tables.documents(spark, dir)
    SuffixArray.rankLevels(docs, MaxLen).zipWithIndex.foreach {
      case (lvl, k) => lvl.write.mode("overwrite").parquet(s"$p/level_$k")
    }
    p
  }

  private def ensure(spark: SparkSession, dir: String): String = {
    val p = path(dir)
    if (!Artifacts.complete(p, parts)) materialize(spark, dir)
    p
  }

  /** All stored rank levels, `levels(k)` = ranks by first 2^k chars. */
  def levels(spark: SparkSession, dir: String): Seq[DataFrame] = {
    val p = ensure(spark, dir)
    (0 to Rounds).map(k => spark.read.parquet(s"$p/level_$k"))
  }

  /** The final level only — the suffix array itself. */
  def last(spark: SparkSession, dir: String): DataFrame = {
    val p = ensure(spark, dir)
    spark.read.parquet(s"$p/level_$Rounds")
  }
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

  def path(dir: String): String =
    s"${Artifacts.path(dir, "documents", "suffixstrided")}_w${Window}_s$Stride"

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
    s"${Artifacts.path(dir, "documents", "suffixpairs")}_w${StridedSuffixArtifact.Window}_s${StridedSuffixArtifact.Stride}"

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
