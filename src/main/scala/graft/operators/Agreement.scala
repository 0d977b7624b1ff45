package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the first question asked of preference
  * data before any strength fit is trusted: do the raters even agree
  * with each other? Two classic gauges over a ratings table
  * `(annot, item, rating)` (one categorical rating per annotator per
  * item):
  *
  *  - Cohen's kappa per annotator PAIR (chance-corrected pairwise
  *    agreement over the items both rated),
  *  - Fleiss' kappa across the PANEL (chance-corrected agreement over
  *    items rated by every annotator).
  *
  * Engine-portable by the repo's standard trick: every probability is
  * an exact integer in ppm (numerator · 10⁶ floor-div denominator),
  * and the one signed division (kappa's (po−pe)/(1−pe), negative when
  * agreement is below chance) factors the sign out before dividing —
  * a truncate-toward-zero division both Spark (`div`) and DuckDB
  * (`//`) replay identically, where their native semantics on
  * negative operands differ (truncation vs floor).
  *
  * Scale: the ratings table is annotators × items — a small model
  * table derived from one corpus-sized reduction (the caller's duel
  * aggregate); every join here is a broadcast self-join over it, so
  * the agreement audit costs nothing extra at 100 TB of duel logs. */
object Agreement {

  private val S = 1000000L

  /** Cohen's kappa for every annotator pair `(a, b)` with `a < b`:
    * `(annot_a, annot_b, n_items, n_agree, po_ppm, pe_ppm,
    * kappa_ppm)`, over the items BOTH rated. Ratings are binary
    * (0/1); marginal chance agreement from each rater's own 0/1
    * counts. */
  def cohenKappaPairs(ratings: DataFrame): DataFrame = {
    val a = ratings.select(col("annot").as("annot_a"), col("item"),
      col("rating").as("ra"))
    val b = ratings.select(col("annot").as("annot_b"), col("item"),
      col("rating").as("rb"))
    val joined = a.join(broadcast(b), "item")
      .filter(col("annot_a") < col("annot_b"))
    val agg = joined.groupBy(col("annot_a"), col("annot_b"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("ra") === col("rb"), 1L).otherwise(0L)).as("n_agree"),
        sum(when(col("ra") === 0, 1L).otherwise(0L)).as("m0a"),
        sum(when(col("rb") === 0, 1L).otherwise(0L)).as("m0b"),
        sum(when(col("ra") === 1, 1L).otherwise(0L)).as("m1a"),
        sum(when(col("rb") === 1, 1L).otherwise(0L)).as("m1b"))
    agg
      .withColumn("po_ppm", expr(s"n_agree * $S div n_items"))
      .withColumn("pe_ppm",
        expr(s"(m0a * m0b + m1a * m1b) * $S div (n_items * n_items)"))
      .withColumn("kappa_ppm", expr(
        s"""CASE WHEN po_ppm >= pe_ppm
           |  THEN (po_ppm - pe_ppm) * $S div greatest($S - pe_ppm, 1)
           |  ELSE -((pe_ppm - po_ppm) * $S div greatest($S - pe_ppm, 1))
           |END""".stripMargin))
      .select(col("annot_a"), col("annot_b"), col("n_items"),
        col("n_agree"), col("po_ppm"), col("pe_ppm"), col("kappa_ppm"))
      .orderBy(col("annot_a"), col("annot_b"))
  }

  /** Fleiss' kappa across the panel of `nRaters` annotators, over the
    * items rated by ALL of them (the classic formulation needs equal
    * raters per item). One row: `(n_raters, n_items, pbar_ppm,
    * pe_ppm, fleiss_kappa_ppm)`. With binary categories, per-item
    * agreement P_i = (n0² + n1² − n)/(n(n−1)). */
  def fleissKappa(ratings: DataFrame, nRaters: Int): DataFrame = {
    val n = nRaters.toLong
    val perItem = ratings.groupBy(col("item"))
      .agg(count(lit(1)).as("nr"),
        sum(when(col("rating") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("rating") === 1, 1L).otherwise(0L)).as("n1"))
      .filter(col("nr") === n)
    perItem.agg(
        count(lit(1)).as("n_items"),
        sum(expr(s"n0 * n0 + n1 * n1 - $n")).as("pnum"),
        sum(col("n0")).as("s0"), sum(col("n1")).as("s1"))
      .withColumn("pbar_ppm",
        expr(s"pnum * $S div (n_items * ${n * (n - 1)})"))
      .withColumn("pe_ppm", expr(
        s"(s0 * s0 + s1 * s1) * $S div (${n * n} * n_items * n_items)"))
      .withColumn("fleiss_kappa_ppm", expr(
        s"""CASE WHEN pbar_ppm >= pe_ppm
           |  THEN (pbar_ppm - pe_ppm) * $S div greatest($S - pe_ppm, 1)
           |  ELSE -((pe_ppm - pbar_ppm) * $S div greatest($S - pe_ppm, 1))
           |END""".stripMargin))
      .select(lit(n).as("n_raters"), col("n_items"), col("pbar_ppm"),
        col("pe_ppm"), col("fleiss_kappa_ppm"))
  }
}
