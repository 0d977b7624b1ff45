package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact aggregation idioms shared by the oracled
  * queries. Floating-point SUMS are order-dependent, and Spark and
  * DuckDB aggregate in different orders — any mean built on a raw
  * double sum can drift in the last bits and break a hash compare.
  * The fix is one quantization: values go through integer micro-units
  * so the sum is exact, and division happens once at the end on
  * identical integers. */
object Exact {

  /** Drift-free mean of `x` over group size `n`: each value is rounded
    * half-up to 1e-6 units as BIGINT, summed exactly, divided once. */
  def microMean(x: Column, n: Column): Column =
    round(sum(floor(x * 1000000 + 0.5).cast("long")).cast("double")
      / n / 1000000, 6)
}
