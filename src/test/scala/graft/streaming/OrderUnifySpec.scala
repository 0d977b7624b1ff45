package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests of the pure unify logic — mirrors the reference's
  * per-case behavior in `OrderProjectionTransformer.java` /
  * `OrderProjection.java` (SURVEY.md §5.2 item 1). */
class OrderUnifySpec extends AnyFunSuite {
  private val T0 = 1_000_000L // ms
  private val Buf = 5000L

  private def ev(typ: String, seq: Long, details: String = """{"d":1}"""): OrderEvent =
    OrderEvent("o1", typ, (T0 + seq) * 1000L, details, seq)

  test("G1: first event creates buffer with fixed deadline") {
    val (out, st) = OrderUnify.onEvents("o1", Seq(ev("created", 0)), None, T0, Buf)
    assert(out.isEmpty)
    assert(st.get.deadlineEpochMillis == T0 + Buf)
    assert(st.get.events.keySet == Set("created"))
  }

  test("G1: later events merge without extending the deadline") {
    val (_, st1) = OrderUnify.onEvents("o1", Seq(ev("created", 0)), None, T0, Buf)
    val (out2, st2) = OrderUnify.onEvents("o1", Seq(ev("placed", 1)), st1, T0 + 3000, Buf)
    assert(out2.isEmpty)
    assert(st2.get.deadlineEpochMillis == T0 + Buf) // NOT T0+3000+Buf
    assert(st2.get.events.keySet == Set("created", "placed"))
  }

  test("G2: duplicate type ignored, first arrival wins") {
    val first = ev("created", 0, """{"first":true}""")
    val dup = ev("created", 1, """{"first":false}""")
    val (out, st) = OrderUnify.onEvents("o1", Seq(first, dup), None, T0, Buf)
    assert(out.isEmpty)
    assert(st.get.events("created").orderDetails == """{"first":true}""")
  }

  test("G3/G8: incomplete buffer flushes to nothing") {
    val (_, st) = OrderUnify.onEvents("o1", Seq(ev("created", 0), ev("placed", 1)), None, T0, Buf)
    assert(OrderUnify.onTimeout("o1", st).isEmpty)
  }

  test("G3/G4/G9: complete buffer flushes one projection in priority order") {
    // arrival order shuffled: cancelled, created, placed
    val (_, st) = OrderUnify.onEvents("o1",
      Seq(ev("cancelled", 0), ev("created", 1), ev("placed", 2)), None, T0, Buf)
    val out = OrderUnify.onTimeout("o1", st)
    assert(out.size == 1)
    val types = """"type":"(\w+)"""".r.findAllMatchIn(out.head.payloadJson).map(_.group(1)).toSeq
    assert(types == Seq("created", "placed", "cancelled"))
  }

  test("per-record path never emits the current buffer even when complete") {
    val (out, st) = OrderUnify.onEvents("o1",
      Seq(ev("created", 0), ev("placed", 1), ev("cancelled", 2)), None, T0, Buf)
    assert(out.isEmpty) // OrderProjectionTransformer.java:82 returns null
    assert(st.nonEmpty)
  }

  test("G7: arrival past deadline flushes complete old buffer, seeds fresh one") {
    val (_, st1) = OrderUnify.onEvents("o1",
      Seq(ev("created", 0), ev("placed", 1), ev("cancelled", 2)), None, T0, Buf)
    val late = ev("created", 9, """{"late":true}""")
    val (out, st2) = OrderUnify.onEvents("o1", Seq(late), st1, T0 + Buf + 100, Buf)
    assert(out.size == 1) // old complete buffer emitted on the arrival path
    assert(st2.get.events.keySet == Set("created"))
    assert(st2.get.events("created").orderDetails == """{"late":true}""")
    assert(st2.get.deadlineEpochMillis == T0 + Buf + 100 + Buf)
  }

  test("G7: arrival past deadline drops incomplete old buffer silently") {
    val (_, st1) = OrderUnify.onEvents("o1", Seq(ev("created", 0)), None, T0, Buf)
    val (out, st2) = OrderUnify.onEvents("o1", Seq(ev("placed", 5)), st1, T0 + Buf, Buf)
    assert(out.isEmpty)
    assert(st2.get.events.keySet == Set("placed"))
  }

  test("corrupt state (non-positive deadline) is replaced, not emitted") {
    val corrupt = PendingOrder(Map("created" -> ev("created", 0)), 0L)
    val (out, st) = OrderUnify.onEvents("o1", Seq(ev("placed", 1)), Some(corrupt), T0, Buf)
    assert(out.isEmpty)
    assert(st.get.events.keySet == Set("placed"))
    assert(st.get.deadlineEpochMillis == T0 + Buf)
  }

  test("unknown event types buffer but never complete a projection") {
    val (_, st) = OrderUnify.onEvents("o1",
      Seq(ev("created", 0), ev("placed", 1), ev("mystery", 2)), None, T0, Buf)
    assert(OrderUnify.onTimeout("o1", st).isEmpty)
  }

  test("payload JSON shape matches the reference output contract") {
    val e = OrderEvent("o-9", "created", 1723823479799000L, """{"total":42.5}""", 0)
    val (_, st) = OrderUnify.onEvents("o-9",
      Seq(e, e.copy(eventType = "placed", seq = 1), e.copy(eventType = "cancelled", seq = 2)),
      None, T0, Buf)
    val json = OrderUnify.onTimeout("o-9", st).head.payloadJson
    assert(json.startsWith("""{"orderId":"o-9","events":["""))
    assert(json.contains(""""timestamp":"2024-08-16T15:51:19.799Z""""))
    assert(json.contains(""""order_details":{"total":42.5}"""))
  }

  test("json escaping handles quotes/control chars in ids") {
    assert(Json.escape("a\"b\\c\nd") == "a\\\"b\\\\c\\nd")
  }

  test("type alias parsing is case-insensitive, accepts topic-style names") {
    assert(OrderEventType.parse("CREATED").contains("created"))
    assert(OrderEventType.parse("order-cancelled").contains("cancelled"))
    assert(OrderEventType.parse(" Placed ").contains("placed"))
    assert(OrderEventType.parse("garbage").isEmpty)
    assert(OrderEventType.parse(null).isEmpty)
  }
}
