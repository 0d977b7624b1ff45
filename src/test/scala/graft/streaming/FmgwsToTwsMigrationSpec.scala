package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileTopics

/** The FMGWS → TWS checkpoint MIGRATION ([[StateMigration]]), end to
  * end: a unify stream started under flatMapGroupsWithState is
  * stopped mid-lifecycle, its state and committed source offsets are
  * lifted out of the checkpoint offline, and the stream resumes under
  * transformWithState (RocksDB) on a fresh checkpoint — with ZERO
  * lost projections (the pending buffer completes and flushes after
  * the cutover) and ZERO duplicated projections (the carried source
  * offset means nothing is re-read; the pre-cutover emission happens
  * exactly once across both incarnations). */
class FmgwsToTwsMigrationSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def evJson(id: String, typ: String): String =
    s"""{"order-id":"$id","type":"$typ","timestamp":"2024-08-16T15:51:19.799Z","order_details":{"d":1}}"""

  private def produce(root: String, id: String, types: Seq[String]): Unit =
    types.foreach { t =>
      FileTopics.append(root, s"order-$t", 3, Seq((id, evJson(id, t))))
    }

  private def until(deadlineMs: Long)(done: => Boolean): Unit = {
    val end = System.currentTimeMillis() + deadlineMs
    while (!done && System.currentTimeMillis() < end) Thread.sleep(200)
  }

  test("stream under FMGWS, migrate, resume under TWS: zero lost, zero duplicated") {
    val root = java.nio.file.Files.createTempDirectory("mig-topics")
      .toFile.getAbsolutePath
    val ckptOld = graft.TestSpark.checkpointDir + "/mig-fmgws"
    val ckptNew = graft.TestSpark.checkpointDir + "/mig-tws"
    val topics = OrderUnifyPipeline.sourceTopics
    val W = 10000L

    // cross-incarnation idempotent sink: emission counts per order id,
    // per-query batch ledgers (the RestartRecoverySpec discipline)
    val emitted = TrieMap.empty[String, Long]
    def ledgerSink(applied: TrieMap[Long, Boolean])(
        df: org.apache.spark.sql.Dataset[ProjectionResult],
        batchId: Long): Unit = {
      val ids = df.collect().map(_.orderId)
      if (applied.putIfAbsent(batchId, true).isEmpty)
        ids.foreach(id =>
          emitted.updateWith(id)(c => Some(c.getOrElse(0L) + 1L)))
    }

    // ---- phase 1: FMGWS on the shared (HDFS-provider) session ----
    produce(root, "mig-a", Seq("created", "placed", "cancelled"))
    val applied1 = TrieMap.empty[Long, Boolean]
    val q1 = OrderUnifyPipeline
      .unify(OrderUnifyPipeline.parseAndCanonicalize(
        FileTopics.source(spark, root, topics)), W, impl = "fmgws")
      .writeStream
      .option("checkpointLocation", ckptOld)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .foreachBatch(ledgerSink(applied1) _)
      .start()
    try {
      // A's complete buffer flushes at its deadline under FMGWS
      until(60000L)(emitted.contains("mig-a"))
      assert(emitted.toMap == Map("mig-a" -> 1L),
        s"phase 1 must emit exactly mig-a once: ${emitted.toMap}")
      // B arrives AFTER A's flush: pending (created+placed) at stop.
      // Wait until a COMMITTED offset covers all 5 produced records —
      // "a newer commit exists" alone could be A's flush batch.
      produce(root, "mig-b", Seq("created", "placed"))
      def committedRecords: Long =
        try {
          val json = StateMigration.committedSourceOffsetJson(ckptOld)
          ":(\\d+)".r.findAllMatchIn(json).map(_.group(1).toLong).sum
        } catch { case _: IllegalArgumentException => -1L }
      until(30000L)(committedRecords == 5L)
      assert(committedRecords == 5L, "phase 1 never committed B's batch")
    } finally q1.stop()

    // ---- offline migration ----
    val carried = StateMigration.fmgwsPendingState(spark, ckptOld).collect()
    assert(carried.map(_._1).toSeq == Seq("mig-b"),
      s"only mig-b may be pending: ${carried.map(_._1).toSeq}")
    val pendingB = carried.head._2
    assert(pendingB.events.keySet == Set("created", "placed"))
    val startOffsets = StateMigration.committedSourceOffsetJson(ckptOld)

    // new traffic lands while the pipeline is down: B's completion
    // and a fresh full lifecycle C
    produce(root, "mig-b", Seq("cancelled"))
    produce(root, "mig-c", Seq("created", "placed", "cancelled"))

    // ---- phase 2: TWS on a RocksDB session, fresh checkpoint ----
    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val initial = StateMigration.fmgwsPendingState(rocks, ckptOld)
    val applied2 = TrieMap.empty[Long, Boolean]
    val q2 = OrderUnifyTws
      .unifyWithInitialState(
        OrderUnifyPipeline.parseAndCanonicalize(
          FileTopics.source(rocks, root, topics, Some(startOffsets))),
        initial, W)
      .writeStream
      .option("checkpointLocation", ckptNew)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .foreachBatch(ledgerSink(applied2) _)
      .start()
    try {
      until(60000L)(emitted.contains("mig-b") && emitted.contains("mig-c"))
    } finally q2.stop()

    // zero lost: B completed across the cutover; C flowed normally.
    // zero duplicated: A emitted exactly once across both incarnations.
    assert(emitted.toMap ==
      Map("mig-a" -> 1L, "mig-b" -> 1L, "mig-c" -> 1L),
      s"cutover must lose nothing and duplicate nothing: ${emitted.toMap}")

    // offset carry: the TWS incarnation read ONLY the 4 post-cutover
    // records (B's cancelled + C's three), never re-reading phase 1's
    val replayed = q2.recentProgress.map(_.numInputRows).sum
    assert(replayed == 4L,
      s"TWS must read only the 4 new records, read $replayed")
  }
}
