package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** `transformWithState` variant of the unify operator (Spark 4's
  * next-generation stateful API). Semantics are identical to
  * [[OrderUnify.stateFunc]] — both delegate to the same pure logic —
  * but the mapping to the reference is even more direct:
  *
  *  - the fixed per-order deadline is an EXPLICIT registered timer
  *    (`registerTimer(deadline)`), set once at buffer creation and only
  *    re-registered when a stale buffer is replaced (G7) — no per-batch
  *    re-arming;
  *  - the timer firing is the punctuator path
  *    (`OrderProjectionTransformer.java:90-104`), per key instead of a
  *    full-store scan.
  *
  * Requires the RocksDB state-store provider (an OSS `transformWithState`
  * constraint) — which is also what the reference uses
  * (`OrderProjectionTopology.java:48-52`).
  */
class OrderUnifyProcessor(bufferMillis: Long)
    extends StatefulProcessor[String, OrderEvent, ProjectionResult] {

  @transient private var pending: ValueState[PendingOrder] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    pending = getHandle.getValueState[PendingOrder](
      "pending", Encoders.product[PendingOrder], TTLConfig.NONE)

  override def handleInputRows(
      orderId: String,
      rows: Iterator[OrderEvent],
      timerValues: TimerValues): Iterator[ProjectionResult] = {
    val now = timerValues.getCurrentProcessingTimeInMs()
    val prior = if (pending.exists()) Some(pending.get()) else None
    val arrivals = rows.toSeq.sortBy(_.seq)
    val (out, next) = OrderUnify.onEvents(orderId, arrivals, prior, now, bufferMillis)
    next match {
      case Some(p) =>
        pending.update(p)
        val priorDeadline = prior.map(_.deadlineEpochMillis)
        if (!priorDeadline.contains(p.deadlineEpochMillis)) {
          priorDeadline.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(p.deadlineEpochMillis)
        }
      case None => pending.clear()
    }
    out.iterator
  }

  override def handleExpiredTimer(
      orderId: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[ProjectionResult] = {
    val prior = if (pending.exists()) Some(pending.get()) else None
    // a timer may outlive its buffer (G7 replaced it); flush only a
    // buffer whose own deadline has actually been reached
    val due = prior.filter(_.deadlineEpochMillis <= expiredTimerInfo.getExpiryTimeInMs())
    val out = OrderUnify.onTimeout(orderId, due)
    if (due.nonEmpty) pending.clear()
    out.iterator
  }
}

object OrderUnifyTws {
  /** Drop-in alternative to [[OrderUnifyPipeline.unify]]. */
  def unify(events: Dataset[OrderEvent],
            bufferMillis: Long = OrderUnify.DefaultBufferMillis): Dataset[ProjectionResult] = {
    implicit val resultEnc = OrderUnifyPipeline.resultEnc
    events
      .groupByKey(_.orderId)(OrderUnifyPipeline.stringEnc)
      .transformWithState(
        new OrderUnifyProcessor(bufferMillis),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
