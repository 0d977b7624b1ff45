package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: attach to every left row the most
  * recent right row with the same key and `rightTs <= leftTs` —
  * the feature-store / market-data primitive Spark has no native
  * operator for.
  *
  * Formulation: instead of a range join (which explodes to
  * O(left × right-per-key) candidate pairs before picking the max),
  * both sides are interleaved into ONE stream sorted by
  * (key, ts, side) and the right payload is carried forward with
  * `last(..., ignoreNulls)` over a running window. Cost: one shuffle
  * on the key + one sort — the same as any keyed window, with no
  * pair blow-up; skewed keys are handled by AQE like any other
  * exchange. Right rows sort BEFORE left rows at equal timestamps, so
  * the match is inclusive (`>=`), exactly DuckDB's ASOF JOIN
  * semantics — which is what the oracle uses as the independent
  * implementation.
  *
  * If several right rows share (key, ts), pre-deduplicate the right
  * side deterministically (the window's ordering between them is not
  * defined otherwise).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               payloadCols: Seq[String]): DataFrame =
    interleaved(left, right, leftKey, rightKey, leftTs, rightTs,
      payloadCols, backward = true)

  /** Forward variant: attach the NEAREST right row with
    * `rightTs >= leftTs` (next-event-after semantics — "first order
    * placed on or after this touchpoint"). Same single-window plan,
    * traversed in descending time order. */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTs: String, rightTs: String,
                      payloadCols: Seq[String]): DataFrame =
    interleaved(left, right, leftKey, rightKey, leftTs, rightTs,
      payloadCols, backward = false)

  private def interleaved(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          leftTs: String, rightTs: String,
                          payloadCols: Seq[String],
                          backward: Boolean): DataFrame = {
    val lRowType = left.select(struct(left.columns.toIndexedSeq.map(col): _*)).schema.head.dataType
    val payloadType = right.select(struct(payloadCols.map(col): _*)).schema.head.dataType
    val lT = left.select(
      col(leftKey).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("_lrow"),
      lit(null).cast(payloadType).as("_payload"))
    val rT = right.select(
      col(rightKey).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
      lit(null).cast(lRowType).as("_lrow"),
      struct(payloadCols.map(col): _*).as("_payload"))
    // right rows sort before left rows at equal timestamps in BOTH
    // directions, so the match is inclusive either way
    val order =
      if (backward) Seq(col("_ts").asc, col("_side").asc)
      else Seq(col("_ts").desc, col("_side").asc)
    val w = Window.partitionBy(col("_k"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lT.unionByName(rT)
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.toIndexedSeq.map(c => col("_lrow").getField(c).as(c)) :+
        col("_asof"): _*)
  }
}
