package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** OFFLINE checkpoint migration: flatMapGroupsWithState →
  * transformWithState.
  *
  * The two unify implementations write DIFFERENT state formats, so a
  * checkpoint is pinned to the operator it was created with
  * ([[OrderUnifyPipeline.unify]]'s `impl` override documents the pin).
  * A long-lived deployment upgrading to the TWS default needs a
  * MIGRATION, not a pin: with the old query STOPPED,
  *
  *  1. [[fmgwsPendingState]] reads the old checkpoint's state store
  *     through Spark's state data source (`format("statestore")` —
  *     the official offline reader; no internal file formats touched)
  *     and yields every key's live [[PendingOrder]];
  *  2. [[committedSourceOffsetJson]] lifts the last COMMITTED source
  *     offset out of the old checkpoint's offset log;
  *  3. the new TWS query starts on a FRESH checkpoint with
  *     [[OrderUnifyTws.unifyWithInitialState]] seeding the state and
  *     re-registering each key's deadline timer, and the source
  *     positioned at the carried offset (`startingOffsets`) — so no
  *     record is re-read (no duplicated projections) and no pending
  *     buffer is lost.
  *
  * Emitted-projection dedup across the cutover is the sink's idempotence
  * ledger, as for any restart (RestartRecoverySpec); the migration
  * itself re-reads nothing and re-emits nothing. */
object StateMigration {

  /** Highest batch id with BOTH an offsets entry and a commit — the
    * last epoch whose state and sink output are durable. */
  def lastCommittedBatch(ckpt: String): Long = {
    def ids(sub: String): Set[Long] =
      Option(new java.io.File(ckpt, sub).listFiles())
        .getOrElse(Array.empty)
        .map(_.getName).filter(n => n.nonEmpty && n.forall(_.isDigit))
        .map(_.toLong).toSet
    val committed = ids("commits") intersect ids("offsets")
    require(committed.nonEmpty, s"no committed batch under $ckpt")
    committed.max
  }

  /** The per-source offset JSON of the last committed batch — where
    * the NEW query's source must start so nothing is re-read and
    * nothing is skipped. (OffsetSeqLog layout: line 1 version, line 2
    * metadata, then one offset JSON per source.) */
  def committedSourceOffsetJson(ckpt: String, sourceIdx: Int = 0): String = {
    val f = new java.io.File(s"$ckpt/offsets/${lastCommittedBatch(ckpt)}")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try {
      val lines = src.getLines().toVector
      require(lines.size > 2 + sourceIdx, s"malformed offset log ${f.getPath}")
      lines(2 + sourceIdx)
    } finally src.close()
  }

  /** Every key's live FMGWS state from the STOPPED checkpoint, read
    * offline via the state data source. The FMGWS state row nests the
    * user state under `value.groupState` (alongside the engine's
    * `timeoutTimestamp`, which the TWS processor re-derives from the
    * buffer's own deadline). */
  def fmgwsPendingState(spark: SparkSession,
      ckpt: String): Dataset[(String, PendingOrder)] = {
    implicit val enc = Encoders.tuple(
      Encoders.STRING, Encoders.product[PendingOrder])
    spark.read.format("statestore").option("path", ckpt).load()
      .select(col("key.value").as("_1"), col("value.groupState").as("_2"))
      .as[(String, PendingOrder)]
  }
}
