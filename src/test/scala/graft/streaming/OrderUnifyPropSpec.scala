package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based tests (SURVEY.md §5.2 item 3): for any lifecycle
  * subset × duplication × permutation arriving within the window, the
  * unify output is permutation-invariant, duplication-invariant, and
  * non-empty iff all three types are present; output order is always
  * priority order. */
object OrderUnifyPropSpec extends Properties("OrderUnify") {
  private val T0 = 1_000_000L
  private val Buf = 5000L
  private val types = Seq("created", "placed", "cancelled")

  private def ev(typ: String, seq: Long): OrderEvent =
    OrderEvent("o1", typ, (T0 + seq) * 1000L, s"""{"seq":$seq}""", seq)

  private val genArrivals: Gen[Seq[String]] = for {
    subset <- Gen.someOf(types)
    dups <- Gen.listOfN(subset.size, Gen.chooseNum(1, 4))
    expanded = subset.toSeq.zip(dups).flatMap { case (t, k) => Seq.fill(k)(t) }
    shuffled <- Gen.const(scala.util.Random.shuffle(expanded))
  } yield shuffled

  private def runScenario(arrivalTypes: Seq[String]): Seq[ProjectionResult] = {
    val arrivals = arrivalTypes.zipWithIndex.map { case (t, i) => ev(t, i.toLong) }
    val (mid, st) = OrderUnify.onEvents("o1", arrivals, None, T0, Buf)
    mid ++ OrderUnify.onTimeout("o1", st)
  }

  property("non-empty iff all three types present") = forAll(genArrivals) { ts =>
    val out = runScenario(ts)
    if (ts.toSet == types.toSet) out.size == 1 else out.isEmpty
  }

  property("output order is always priority order") = forAll(genArrivals) { ts =>
    val out = runScenario(ts)
    Prop(out.forall { r =>
      val got = """"type":"(\w+)"""".r.findAllMatchIn(r.payloadJson).map(_.group(1)).toSeq
      got == Seq("created", "placed", "cancelled")
    })
  }

  property("first arrival per type is kept (duplication-invariant content)") =
    forAll(genArrivals) { ts =>
      val out = runScenario(ts)
      Prop(out.forall { r =>
        // the kept event per type must be the minimum seq of that type
        types.forall { t =>
          val firstSeq = ts.zipWithIndex.collect { case (`t`, i) => i }.min
          r.payloadJson.contains(s"""{"seq":$firstSeq}""")
        }
      })
    }

  property("splitting arrivals across invocations within the window is equivalent") =
    forAll(genArrivals, Gen.chooseNum(0, 10)) { (ts, splitAt) =>
      val arrivals = ts.zipWithIndex.map { case (t, i) => ev(t, i.toLong) }
      val k = math.min(splitAt, arrivals.size)
      val (a, b) = arrivals.splitAt(k)
      val (out1, st1) = OrderUnify.onEvents("o1", a, None, T0, Buf)
      val (out2, st2) = OrderUnify.onEvents("o1", b, st1, T0 + 1000, Buf)
      val split = out1 ++ out2 ++ OrderUnify.onTimeout("o1", st2)
      val whole = runScenario(ts)
      split == whole
    }
}
