package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint restart + exactly-once sink delivery — the S5/S6
  * operational story without a broker: a stateful aggregation stopped
  * mid-stream resumes from its checkpoint with state intact, and the
  * foreachBatch sink applies each (batchId, partition of updates)
  * idempotently, so a replayed batch after a crash-restart cannot
  * double-apply. */
class RestartRecoverySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** Upsert KV sink with a batch-id ledger: the idempotence guard every
    * exactly-once foreachBatch sink needs (Spark guarantees batchId is
    * stable across a replay of the same epoch). */
  private object Store {
    val counts = TrieMap.empty[String, Long]
    val applied = TrieMap.empty[Long, Boolean]
    def upsert(rows: Seq[(String, Long)], batchId: Long): Unit =
      if (applied.putIfAbsent(batchId, true).isEmpty)
        rows.foreach { case (k, v) => counts.update(k, v) }
    def reset(): Unit = { counts.clear(); applied.clear() }
  }

  test("stateful aggregation resumes from checkpoint; sink ledger makes replay a no-op") {
    Store.reset()
    val ckpt = graft.TestSpark.checkpointDir + "/restart-recovery"
    val input = MemoryStream[String]
    val counted = input.toDF().toDF("k")
      .groupBy(col("k")).agg(count(lit(1)).as("n"))

    def start() = counted.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        Store.upsert(
          df.select(col("k"), col("n")).as[(String, Long)].collect().toSeq,
          batchId)
      }
      .start()

    val q1 = start()
    try {
      input.addData(Seq("a", "a", "b"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(Store.counts.toMap == Map("a" -> 2L, "b" -> 1L))

    // restart from the same checkpoint: prior state must carry over
    input.addData(Seq("a", "c"))
    val q2 = start()
    try q2.processAllAvailable()
    finally q2.stop()
    assert(Store.counts.toMap == Map("a" -> 3L, "b" -> 1L, "c" -> 1L),
      s"state lost across restart: ${Store.counts.toMap}")

    // simulate an epoch replay after a crash between sink-apply and
    // commit: re-delivering an already-applied batchId must not
    // double-apply
    val before = Store.counts.toMap
    val replayedId = Store.applied.keys.max
    Store.upsert(Seq("a" -> 999L), replayedId)
    assert(Store.counts.toMap == before, "replayed batch was double-applied")
  }
}
