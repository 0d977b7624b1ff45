package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) joins expressed as equi-joins via unit banding.
  *
  * A naive `fact.value BETWEEN dim.lo AND dim.hi` join has no equi
  * condition, so Spark plans a broadcast-nested-loop (fine for a tiny
  * dim) or, worse, a cartesian — at 100 TB of facts every row visits
  * every interval. Banding restores an equi-join: each interval is
  * exploded into the fixed-width units it covers, each fact row
  * computes its unit in one scalar expression, and the join runs on
  * `unit` as an ordinary (broadcast or shuffled) hash join, with the
  * exact `lo <= v < hi` predicate re-applied as a post-filter. Work
  * scales with facts × (intervals overlapping each unit), not facts ×
  * intervals. The same trick is what Spark's own range-join hints and
  * interval-join implementations in stream processors do under the
  * hood; here it is explicit and engine-portable.
  */
object RangeJoin {

  /** Explode `(lo, hi)` intervals (hi exclusive) into covered units of
    * width `unit`: one output row per (interval, unit id). Interval
    * columns are preserved. */
  def bandIntervals(intervals: DataFrame, lo: Column, hi: Column,
                    unit: Double): DataFrame =
    intervals.withColumn("band_unit",
      explode(sequence(
        floor(lo / unit).cast("long"),
        // hi is exclusive: a boundary-aligned hi contributes no unit,
        // so back off by one when hi sits exactly on a unit boundary.
        ceil(hi / unit).cast("long") - lit(1L))))

  /** Banded interval join: `facts` rows matched to every interval with
    * `lo <= factValue < hi`. The interval side is exploded into units
    * and broadcast (interval tables are dimension-sized); the fact
    * side computes `floor(value / unit)` in-row — no shuffle of the
    * fact table at all when the banded dim broadcasts. */
  def bandedJoin(facts: DataFrame, factValue: Column,
                 intervals: DataFrame, lo: Column, hi: Column,
                 unit: Double): DataFrame = {
    val banded = bandIntervals(intervals, lo, hi, unit)
    facts
      .withColumn("band_unit", floor(factValue / unit).cast("long"))
      .join(broadcast(banded), "band_unit")
      .filter(lo <= factValue && factValue < hi)
      .drop("band_unit")
  }
}
