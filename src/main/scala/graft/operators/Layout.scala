package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout, CDC-compaction, and privacy-gate operators — the table
  * maintenance surface a 100 TB lakehouse runs between ingest and
  * training:
  *
  *  - [[latestSnapshot]]: changelog → current-state compaction
  *    (latest-wins upsert), as ONE map-side-combinable aggregate — no
  *    per-key window sort, which at changelog scale would be a full
  *    sort of every key's history instead of a running max.
  *  - [[scd2Intervals]]: changelog → validity-interval periodization
  *    (the slowly-changing-dimension type-2 shape) via a per-key lead
  *    window — one shuffle on the key, sort only within key groups.
  *  - [[compactionPlan]]: per-partition small-file planning — target
  *    file count and residual from exact integer byte sums.
  *  - [[zorderCell]]: two-dimensional Z-order (Morton) interleave for
  *    multi-column layout clustering; pure bit arithmetic, identical
  *    in any engine.
  *  - [[kAnonymity]]: quasi-identifier group-size audit — the privacy
  *    gate a corpus passes before rows with near-unique attribute
  *    combinations are released for training.
  */
object Layout {

  /** Latest-wins snapshot of a changelog: one row per key, the row
    * with the greatest (ts, tiebreak). Implemented as
    * `max(struct(ts, tiebreak, payload…))` — a lexicographic running
    * max that combines map-side, so the shuffle carries one partial
    * row per key per partition regardless of history depth (a
    * row_number window would shuffle and SORT every key's full
    * history). `tiebreak` must make (ts, tiebreak) unique per key for
    * determinism. */
  def latestSnapshot(changelog: DataFrame, key: Column, ts: Column,
                     tiebreak: Column, payload: Seq[Column]): DataFrame = {
    val packed = struct((ts.as("__ts") +: tiebreak.as("__tb") +:
      payload.zipWithIndex.map { case (c, i) => c.as(s"__p$i") }): _*)
    changelog
      .groupBy(key.as("key"))
      .agg(max(packed).as("latest"))
      .select(col("key") +: col("latest.__ts").as("ts") +:
        payload.indices.map(i => col(s"latest.__p$i")): _*)
  }

  /** SCD-2 periodization of a changelog: each change row becomes a
    * validity interval `[valid_from, valid_to)` with `valid_to` the
    * key's next change (null while current). One shuffle on the key;
    * the lead window sorts only within a key's own history. */
  def scd2Intervals(changelog: DataFrame, key: Column, ts: Column,
                    tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changelog
      .withColumn("valid_from", ts)
      .withColumn("valid_to", lead(ts, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Small-file compaction plan per partition column value: exact
    * integer byte totals, the file count needed at `targetBytes`
    * (ceiling division), and the resulting mean file fill. The scan is
    * the only corpus-sized stage; the plan itself is one hash rollup. */
  def compactionPlan(df: DataFrame, partitionCol: Column,
                     bytesCol: Column, targetBytes: Long): DataFrame =
    df.groupBy(partitionCol.as("partition"))
      .agg(count(lit(1)).as("n_rows"), sum(bytesCol.cast("long")).as("total_bytes"))
      // DIV, not `/`: Column./ is double division, which stops being
      // exact past 2^53 total bytes — byte ledgers must stay integral
      .withColumn("n_files",
        expr(s"(total_bytes + ${targetBytes - 1}) DIV $targetBytes"))
      .withColumn("avg_file_bytes", expr("total_bytes DIV n_files"))
      .withColumn("fill_ratio",
        round(col("total_bytes").cast("double") /
          (col("n_files") * lit(targetBytes)), 6))

  /** Two-dimensional Morton (Z-order) interleave of the low `bits`
    * bits of two non-negative integer columns: bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1. The layout key that clusters
    * a table for range pruning on BOTH columns at once — pure integer
    * arithmetic, so any engine derives identical cells. */
  def zorderCell(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** k-anonymity audit over a quasi-identifier tuple: how many
    * attribute-combination groups exist, how many fall below `k`
    * members, and what share of ROWS sits in those risky groups. Two
    * hash aggregates (rows → groups → one summary row) — scan-shaped
    * at any table size. */
  def kAnonymity(df: DataFrame, quasi: Seq[Column], k: Int): DataFrame =
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_small_groups"),
        sum(col("n")).as("n_rows"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_rows_at_risk"))
      .withColumn("risk_share",
        round(col("n_rows_at_risk").cast("double") / col("n_rows"), 6))

  /** l-diversity audit — k-anonymity's sharper sibling: a
    * quasi-identifier group is risky not when it is SMALL but when its
    * SENSITIVE attribute is uniform (all k members share one value, so
    * membership alone discloses it). Reports, per the audit row: group
    * count, groups with fewer than `l` distinct sensitive values, the
    * worst (minimum) diversity seen, and the share of rows in
    * under-diverse groups. Same two-aggregate scan shape as
    * [[kAnonymity]]; `countDistinct(sensitive)` inside a group is the
    * only extra cost. */
  def lDiversity(df: DataFrame, quasi: Seq[Column], sensitive: Column,
                 l: Int): DataFrame =
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("n"), countDistinct(sensitive).as("n_distinct"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("n_distinct") < l, 1L).otherwise(0L))
          .as("n_underdiverse_groups"),
        min(col("n_distinct")).as("min_diversity"),
        sum(col("n")).as("n_rows"),
        sum(when(col("n_distinct") < l, col("n")).otherwise(0L))
          .as("n_rows_at_risk"))
      .withColumn("risk_share",
        round(col("n_rows_at_risk").cast("double") / col("n_rows"), 6))
}
