package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the planning operators: banded range joins, split
  * assignment, and cell-blocked semantic dedup (the oracle parity
  * harness covers the full testdata; these pin semantics on
  * hand-checkable inputs). */
class PlanningOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("bandIntervals covers every unit an interval touches, boundary-exact") {
    val bands = Seq(("a", 0.0, 25.0), ("b", 25.0, 80.0), ("c", 80.0, 100.0))
      .toDF("id", "lo", "hi")
    val units = RangeJoin.bandIntervals(bands, col("lo"), col("hi"), 25.0)
      .select(col("id"), col("band_unit")).as[(String, Long)].collect().toSet
    // a: [0,25) -> unit 0 only (hi on the boundary contributes nothing)
    // b: [25,80) -> units 1,2,3; c: [80,100) -> unit 3 only
    assert(units == Set(("a", 0L), ("b", 1L), ("b", 2L), ("b", 3L), ("c", 3L)))
  }

  test("bandedJoin equals the naive range join") {
    val facts = (0 until 200).map(i => (i.toLong, i * 0.7)).toDF("id", "v")
    val bands = Seq(("x", 0.0, 30.0), ("y", 30.0, 31.0), ("z", 55.5, 140.0))
      .toDF("band_id", "lo", "hi")
    val banded = RangeJoin.bandedJoin(facts, col("v"),
        bands, col("lo"), col("hi"), unit = 10.0)
      .select(col("id"), col("band_id")).as[(Long, String)].collect().toSet
    val naive = facts.join(bands, col("lo") <= col("v") && col("v") < col("hi"))
      .select(col("id"), col("band_id")).as[(Long, String)].collect().toSet
    assert(banded == naive && banded.nonEmpty)
  }

  test("splitLabel: total, deterministic, and proportional-ish") {
    val keys = (0L until 2000L).toDF("k")
    val labeled = keys.select(col("k"),
      Sampling.splitLabel(col("k"),
        Seq("train" -> 9000, "val" -> 9500, "test" -> 10000)).as("s"))
    val counts = labeled.groupBy("s").count().as[(String, Long)]
      .collect().toMap
    assert(counts.values.sum == 2000L)
    // hash split of 2000 keys: train ~90%, both tails present
    assert(counts("train") > 1700 && counts("val") > 20 && counts("test") > 20)
    // deterministic: second evaluation produces identical assignment
    val again = keys.select(col("k"),
      Sampling.splitLabel(col("k"),
        Seq("train" -> 9000, "val" -> 9500, "test" -> 10000)).as("s"))
    assert(labeled.except(again).count() == 0)
  }

  test("splitLabel rejects cuts not ending at 10000") {
    intercept[IllegalArgumentException] {
      Sampling.splitLabel(lit(1L), Seq("a" -> 5000, "b" -> 9999))
    }
  }

  test("shard plan: serpentine striping balances token mass") {
    val rows = graft.queries.PlanningQueries.qShardPlan
      .run(spark, "/root/testdata/sf0.001")
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("load_ratio"))
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == (0L until 8L))
    assert(rows.map(_._2).sum == 500L) // every doc lands in exactly one shard
    // at 25 docs/source the per-source stripe remainder leaves a few
    // percent of noise (it decays as docs/shard grows); the mechanism
    // guarantee worth pinning is "no systematic big-end shard": every
    // shard within ±10% of ideal, vs +28% for plain round-robin here
    assert(rows.map(_._4).max <= 1.1 && rows.map(_._4).min >= 0.9,
      s"imbalanced shards: ${rows.map(_._4).toSeq}")
  }

  test("curriculum phases partition the corpus with monotone quality") {
    val rows = graft.queries.PlanningQueries.qCurriculum
      .run(spark, "/root/testdata/sf0.001")
      .select(col("phase"), col("n_docs"), col("avg_quality"))
      .as[(Int, Long, Double)].collect()
    assert(rows.map(_._2).sum == 500L)
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(0, 1, 2, 3))
    // per-phase mean quality (docs-weighted across sources) rises with phase
    val byPhase = rows.groupBy(_._1).view.mapValues { rs =>
      rs.map(r => r._3 * r._2).sum / rs.map(_._2).sum
    }.toMap
    assert((0 to 2).forall(p => byPhase(p) < byPhase(p + 1)), byPhase.toString)
  }

  test("MAD outlier screen: yardstick immune to the outliers it flags") {
    val rows = graft.queries.AnalyticsQueries.qAnomalyMad
      .run(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("n_events"), col("med"), col("mad"),
        col("n_outliers"))
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.length == 5)
    rows.foreach { case (et, n, med, mad, out) =>
      assert(mad > 0 && med > 0, s"$et degenerate stats")
      // right-skewed exponential-ish values: outliers exist but are a
      // small minority (median-based stats would break if this failed)
      assert(out > 0 && out < n / 4, s"$et: $out of $n flagged")
    }
  }

  test("gap percentiles: monotone quantiles, exact microsecond gaps") {
    val row = graft.queries.AnalyticsQueries.qGapPercentiles
      .run(spark, "/root/testdata/sf0.001")
      .select(col("n_gaps"), col("p50_us"), col("p90_us"), col("p99_us"),
        col("max_us"), col("n_over_30m"))
      .as[(Long, Double, Double, Double, Long, Long)].collect().head
    val (n, p50, p90, p99, mx, over) = row
    assert(n > 0 && over <= n)
    assert(p50 <= p90 && p90 <= p99 && p99 <= mx.toDouble,
      s"non-monotone quantiles: $row")
    assert(p50 > 0, "timestamps collide at microsecond precision")
  }

  test("cellBlockedNearDupPairs only pairs within a learned cell") {
    // two tight clusters far apart: cross-cluster pairs must not appear
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f, 0.0f), 0),
      (3L, Array(0.1f, 0.99f, 0.0f), 0),
      (4L, Array(0.98f, 0.05f, 0.0f), 0),
      (5L, Array(0.05f, 0.98f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val pairs = Similarity.cellBlockedNearDupPairs(vecs, numCentroids = 2,
        minCos = 0.9)
      .select(col("va"), col("vb")).as[(Long, Long)].collect().toSet
    // cells seed from vec 0 (x-axis) and vec 1 (y-axis):
    // x-cell = {0,2,4}, y-cell = {1,3,5}; all within-cell cosines > 0.9
    assert(pairs == Set((0L, 2L), (0L, 4L), (2L, 4L), (1L, 3L), (1L, 5L), (3L, 5L)))
    // keep column marks the lower id of each pair
    val keeps = Similarity.cellBlockedNearDupPairs(vecs, 2, 0.9)
      .select(col("va"), col("keep")).as[(Long, Long)].collect()
    assert(keeps.forall { case (va, keep) => keep == va })
  }
}
