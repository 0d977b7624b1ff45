package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage control for iterative builds. */
object Frames {

  /** Materialize a frame and restart its lineage from the cached rows
    * — like `localCheckpoint`, but the resulting scan carries NO
    * rewritten constraints (`LogicalRDD`'s constraint rewriting
    * references pre-checkpoint attribute ids and throws `key not
    * found: <attr>#N` when the plan is re-analyzed inside a streaming
    * `foreachBatch`). Iterative operators snapshot each round so plan
    * analysis stays O(1) per round instead of re-expanding the whole
    * round chain per reference; blocks are freed by the context
    * cleaner once the frame goes out of scope. */
  def snapshot(df: DataFrame): DataFrame = {
    val rdd = df.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    df.sparkSession.createDataFrame(rdd, df.schema)
  }
}
