package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared partitioning helper for compute-heavy per-row stages. */
object Partitioning {

  /** Hash-distribute `df` on `key` ONLY when its planned parallelism is
    * below the cluster's. Input partitioning follows file splits, which
    * under-parallelizes small-but-expensive tables (a 0.6 MB documents
    * file arrives as ONE partition feeding the most compute-intense
    * stages in the engine); hash-distributing on the row key decouples
    * CPU parallelism from input layout, and AQE coalesces afterwards if
    * the stage output is small. The conditional is the 100 TB half of
    * the contract: a corpus that already arrives in thousands of splits
    * skips the (full-shuffle) redistribution entirely.
    *
    * Contract: callers pass SCAN-SHAPED inputs (a table read plus
    * pushed filters/projections — every call site in this engine does),
    * where `df.rdd` costs one physical planning pass and runs no job,
    * and the split count is an honest parallelism proxy. A plan
    * containing an exchange would both execute upstream stages here
    * (AQE materializes query stages under `.rdd`) and could carry
    * skewed/empty partitions the count can't see — don't route such
    * plans through this helper. */
  def spreadBy(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(key))
  }
}
