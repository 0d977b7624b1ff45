package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream EVENT-TIME interval join — the two-stream sibling of
  * the unify buffer: `created` events join the `placed` events of the
  * SAME order whose event time falls inside `[created, created +
  * window)`, with watermarks on both sides bounding the join state
  * Spark must retain. This is the native Structured Streaming
  * formulation of "correlate two topics within a time budget" — where
  * the unify operator accumulates one projection per key in explicit
  * state, the interval join lets Spark's symmetric hash join manage
  * per-side buffers, and the time-condition is what makes the state
  * PRUNABLE (an unbounded-condition stream-stream join would retain
  * both streams forever; Spark 4 rejects outer variants without one).
  *
  *  - INNER: a (created, placed) row per in-window match, with the
  *    exact lag; out-of-window placed events match nothing.
  *  - LEFT OUTER: additionally emits `(created, null)` once the
  *    watermark proves no in-window placed can still arrive — the
  *    "ordered but never placed" feed a fulfilment monitor consumes,
  *    the same role the unify operator's incomplete-drop plays.
  *
  * Determinism: output membership depends only on the DATA (both
  * event times and the window); arrival batching affects only WHEN
  * rows emit — `StreamJoinSpec` pins one-shot == drip-fed.
  *
  * Scale: the join keys on `order-id` after the standard exchange;
  * per-key state is bounded by the window × per-key rate on each
  * side, and the watermark delay bounds total retained state exactly
  * as in the unify operator (SCALE.md, streaming tier). */
object StreamJoins {

  /** `created ⋈ placed` within `[0, windowMillis)` on order id.
    * `joinType`: "inner" or "left_outer". Output: `(orderId,
    * created_micros, placed_micros, lag_ms, placed_details)` —
    * the placed columns null for unmatched LEFT-OUTER rows. */
  def createdPlacedJoin(
      created: Dataset[OrderEvent],
      placed: Dataset[OrderEvent],
      windowMillis: Long = OrderUnify.DefaultBufferMillis,
      watermarkDelay: String = "2 seconds",
      joinType: String = "inner"): DataFrame = {
    val c = created.toDF()
      .select(col("orderId").as("c_order"),
        col("timestampMicros").as("created_micros"),
        timestamp_micros(col("timestampMicros")).as("c_time"))
      .withWatermark("c_time", watermarkDelay)
    val p = placed.toDF()
      .select(col("orderId").as("p_order"),
        col("timestampMicros").as("placed_micros"),
        col("orderDetails").as("placed_details"),
        timestamp_micros(col("timestampMicros")).as("p_time"))
      .withWatermark("p_time", watermarkDelay)
    c.join(p,
        col("c_order") === col("p_order") &&
          col("p_time") >= col("c_time") &&
          col("p_time") < col("c_time") + expr(
            s"INTERVAL ${windowMillis * 1000} MICROSECOND"),
        joinType)
      .select(col("c_order").as("orderId"), col("created_micros"),
        col("placed_micros"),
        ((col("placed_micros") - col("created_micros")) / 1000L)
          .cast("long").as("lag_ms"),
        col("placed_details"))
  }
}
