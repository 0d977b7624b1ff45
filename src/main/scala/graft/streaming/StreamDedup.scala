package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Stream-wide INGEST deduplication — `dropDuplicatesWithinWatermark`
  * on the (orderId, eventType) pair, the at-least-once-ingest guard
  * that runs BEFORE the stateful unify: a Kafka producer retry or a
  * replayed partition redelivers the same lifecycle event, and while
  * the unify buffer's first-wins slot (G2) makes duplicates idempotent
  * WITHIN an open buffer, a duplicate arriving after its buffer
  * flushed would seed a spurious fresh buffer (and, incomplete, count
  * against the drop metrics). State is bounded by the watermark delay
  * — exactly the retention a redelivery window needs, vs. plain
  * `dropDuplicates` whose streaming state grows forever.
  *
  * Semantics (Spark's contract): a record is dropped iff a record
  * with the same key was seen while its event time was still inside
  * the watermark; the FIRST arrival wins — the same first-wins
  * discipline as the unify slot, applied stream-wide.
  * `StreamDedupSpec` pins cross-batch dedup inside the delay and
  * first-arrival-wins payloads. */
object StreamDedup {

  /** Events with per-key duplicates (same orderId + eventType inside
    * the watermark window) removed, first arrival kept. */
  def dedupEvents(events: Dataset[OrderEvent],
      watermarkDelay: String = "10 seconds"): Dataset[OrderEvent] = {
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", timestamp_micros(col("timestampMicros")))
      .withWatermark("eventTime", watermarkDelay)
      .dropDuplicatesWithinWatermark("orderId", "eventType")
      .drop("eventTime")
      .as[OrderEvent]
  }
}
