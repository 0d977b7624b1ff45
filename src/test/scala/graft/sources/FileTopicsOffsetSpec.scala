package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Offset-serialization pins for the Kafka-contract source: the
  * offset JSON must round-trip exactly (it lives in streaming
  * checkpoints — a drift here is a silent replay or skip after
  * restart), be canonical (sorted keys, so equality is textual), and
  * handle topic names needing encoding. Corrupted checkpoint text
  * must fail LOUDLY, never parse to a wrong offset. */
class FileTopicsOffsetSpec extends AnyFunSuite {

  test("offset json round-trips and is canonical") {
    val o = FileTopicsOffset(Map(
      ("order-created", 1) -> 42L, ("order-created", 0) -> 7L,
      ("b topic/odd", 3) -> 0L))
    val j = o.json()
    assert(FileTopicsOffset.parse(j) == o)
    // canonical: re-serializing the parse is byte-identical
    assert(FileTopicsOffset.parse(j).json() == j)
    // sorted keys: a map built in another order serializes the same
    val o2 = FileTopicsOffset(o.counts.toSeq.reverse.toMap)
    assert(o2.json() == j)
    // the encoded topic with a slash/space survives
    assert(o.counts.keySet.contains(("b topic/odd", 3)))
  }

  test("empty offset and zero-count entries round-trip") {
    assert(FileTopicsOffset.parse(FileTopicsOffset(Map.empty).json())
      == FileTopicsOffset(Map.empty))
  }

  test("corrupted checkpoint text fails loudly, never parses wrong") {
    for (bad <- Seq("{\"t/0\":notanumber}", "{\"t0\":5}", "{\"t/0\"5}"))
      intercept[Exception] { FileTopicsOffset.parse(bad) }
  }
}
