package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time SESSION WINDOWS — the dynamic-gap aggregation the fixed
  * buffer cannot express: a session extends while events keep arriving
  * within `gap` of each other and closes `gap` after the last one, so
  * the window's extent is DATA-DEFINED (`session_window` +
  * watermark). The part worth pinning is the MERGE: two sessions that
  * look separate can be joined retroactively by one bridging event
  * that arrives later (inside the watermark) — state-store sessions
  * must coalesce, something a tumbling/sliding window never does.
  * Emission is append-mode: a session emits exactly once, when the
  * watermark proves no extension can still arrive.
  *
  * Batch analog: the gaps-and-islands sessionization of
  * `q_sessionize` (AnalyticsQueries) computes identical extents over
  * the stored events table — this is its live path.
  *
  * Scale: state is per (key, open session) — bounded by key count ×
  * sessions inside the watermark horizon; the shuffle keys on the
  * session key exactly like the unify operator. */
object SessionWindows {

  /** Per-user sessions over `(userId, tsMicros)` arrivals: one row per
    * CLOSED session `(userId, start_micros, end_micros, n_events)` —
    * `end` is last-event + gap (Spark's session_window convention). */
  def userSessions(events: Dataset[(Long, Long)],
      gapSeconds: Int, watermarkDelay: String = "2 seconds"): DataFrame =
    events.toDF("userId", "tsMicros")
      .withColumn("eventTime", timestamp_micros(col("tsMicros")))
      .withWatermark("eventTime", watermarkDelay)
      .groupBy(col("userId"),
        session_window(col("eventTime"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("userId"),
        unix_micros(col("session_window.start")).as("start_micros"),
        unix_micros(col("session_window.end")).as("end_micros"),
        col("n_events"))
}
