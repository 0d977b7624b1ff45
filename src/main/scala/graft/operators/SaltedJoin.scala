package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key salting for skewed large-large equi-joins: a hot key
  * whose rows all land in one shuffle partition serializes the join on
  * one task. Salting splits each left key into `nSalts` sub-keys (salt
  * derived from a non-key column, so a hot key's rows spread across
  * salts) and replicates the right side once per salt, so the hot
  * key's work runs on `nSalts` tasks.
  *
  * Salting is purely physical: the join RESULT is identical to the
  * unsalted join (every left row still meets every matching right row,
  * exactly once — its salt replica). That invariant is what the
  * registered query verifies: the oracle is the PLAIN join.
  *
  * AQE's skew-join split handles sort-merge skew after the fact;
  * explicit salting remains the tool when the skew is known ahead of
  * time, when the engine must avoid the stragglers entirely (not
  * re-plan around them), or when the join is hash- rather than
  * sort-based.
  */
object SaltedJoin {

  def saltedEquiJoin(left: DataFrame, leftKey: Column, saltSource: Column,
                     right: DataFrame, rightKey: Column,
                     nSalts: Int): DataFrame = {
    val salted = left.withColumn("_lsalt", pmod(xxhash64(saltSource), lit(nSalts.toLong)))
    val replicated = right.withColumn("_rsalt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    salted
      .join(replicated, leftKey === rightKey && col("_lsalt") === col("_rsalt"))
      .drop("_lsalt", "_rsalt")
  }
}
