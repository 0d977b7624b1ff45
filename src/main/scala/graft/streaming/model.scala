package graft.streaming

/** Data model for the streaming order-unification pipeline — Spark-first
  * re-expression of the reference's model classes
  * (the model classes under `src/main/java/com/example/stream/model/`
  * in selcukusta/kafka_stream_unify_order_messages).
  */

/** Kafka-shaped input record (key/value/topic + per-partition arrival
  * sequence). With a real Kafka source `seq` is the partition offset;
  * with memory/test sources it is a per-batch arrival index — only
  * within-batch relative order is ever used. */
final case class SourceRecord(key: String, value: String, topic: String, seq: Long)

/** The single input event type on all three source topics
  * (`model/OrderEvent.java:12-30`). `orderDetails` is the raw free-form
  * JSON passthrough (`OrderEvent.java:17,24`); `timestampMicros` is the
  * parsed ISO-8601 instant (`serde/JsonSerde.java:13-15`). */
final case class OrderEvent(
    orderId: String,
    eventType: String,
    timestampMicros: Long,
    orderDetails: String,
    seq: Long)

/** Canonical lifecycle types with priorities and alias parsing —
  * `model/OrderEventType.java:7-43`: CREATED(10,"created"),
  * PLACED(20,"placed"), CANCELLED(30,"cancelled"); parsing is
  * case-insensitive and accepts short and topic-style names. */
object OrderEventType {
  val Created = "created"
  val Placed = "placed"
  val Cancelled = "cancelled"

  /** Output-ordering priority (`OrderEventType.java:8-10`). */
  val priority: Map[String, Int] =
    Map(Created -> 10, Placed -> 20, Cancelled -> 30)

  /** All three types are required for a complete projection
    * (`OrderProjection.java:19-20`). */
  val requiredTypes: Set[String] = priority.keySet

  /** Alias table (`OrderEventType.java:12-19`): short name and
    * topic-style name both parse, case-insensitively. */
  val aliases: Map[String, String] = Map(
    "created" -> Created, "order-created" -> Created,
    "placed" -> Placed, "order-placed" -> Placed,
    "cancelled" -> Cancelled, "order-cancelled" -> Cancelled)

  /** Source topic -> fallback type (`OrderProjectionTopology.java:84-97`:
    * unrecognized/missing `type` falls back to the source topic's type). */
  val topicFallback: Map[String, String] = Map(
    "order-created" -> Created,
    "order-placed" -> Placed,
    "order-cancelled" -> Cancelled)

  def parse(raw: String): Option[String] =
    Option(raw).flatMap(r => aliases.get(r.trim.toLowerCase))
}

/** State-store value (`model/PendingOrder.java:8-37`): the in-flight
  * projection plus the fixed flush deadline. The deadline is set once,
  * when the buffer is created, and never extended
  * (`PendingOrder.withProjection` keeps the deadline,
  * `PendingOrder.java:31-36`). */
final case class PendingOrder(
    events: Map[String, OrderEvent],
    deadlineEpochMillis: Long)

/** Emitted projection (`model/OrderProjectionPayload.java:8-30`):
  * key = orderId, value = the assembled JSON payload with events in
  * priority order. */
final case class ProjectionResult(orderId: String, payloadJson: String)
