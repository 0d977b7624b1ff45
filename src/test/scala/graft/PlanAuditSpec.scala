package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression guard over the WHOLE registry: no query may
  * plan an unconditional CartesianProduct (the broadcast nested-loop
  * cross joins of the ANN family are intentional — tiny broadcast side
  * — and are allowed; a shuffled CartesianProduct of two large sides
  * is never the plan you want at corpus scale). */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("registry names are unique") {
    // a duplicate name makes Registry.all.find, Verify's output files
    // and the driver's per-query correctness rows silently ambiguous
    val dups = Registry.all.groupBy(_.name).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("no registry query plans a CartesianProduct") {
    val offenders = Registry.all.flatMap { q =>
      val plan =
        try q.run(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }

  test("no registry query funnels unbounded input through a global window") {
    // An unpartitioned window requires `Exchange SinglePartition`
    // directly under the Window node — the round-3 q_skew_profile bug
    // class (every distinct key's row through ONE partition before a
    // cut). Allowlisted: windows whose input is bounded by
    // construction (q_corpus_mixture ranks source×lang cells,
    // q_text_bm25 ranks a ≤10-row top-k).
    // q_zipf_fit ranks a <=100-row top-k; q_daily_backlog and
    // q_cusum_drift cumsum a calendar-bounded day table — all bounded
    // by construction.
    // q_theil_sen ranks month-pair slopes — bounded by the month
    // domain squared (≈3k rows), not the fact table.
    // q_survival_km cumsums the lifetime-day histogram — bounded by
    // the calendar day domain, never the event rows.
    // q_sample_priority ranks the ≤513-row TakeOrderedAndProject
    // survivor set — bounded by the sample size k+1, never the rows.
    // q_quantile_norm cumsums the POOLED length histogram — bounded by
    // the distinct-length domain, never the doc rows.
    // q_broken_stick windows the ~80-row monthly moment table — the
    // candidate space is the month domain, never the fact rows.
    // q_profile_kanon / q_profile_ldiv take a total over their band
    // histogram — ≤4 rows by construction (the band domain), never the
    // user rows.
    // q_changepoint_binseg prefix-sums the calendar-bounded day table
    // (the q_cusum_drift input shape), never the event rows.
    val allowed = Set("q_corpus_mixture", "q_text_bm25", "q_zipf_fit",
      "q_daily_backlog", "q_cusum_drift", "q_theil_sen", "q_survival_km",
      "q_sample_priority", "q_quantile_norm", "q_broken_stick",
      "q_seasonal_decompose", "q_profile_kanon", "q_profile_ldiv",
      "q_changepoint_binseg")
    val offenders = Registry.all.filterNot(q => allowed(q.name)).flatMap { q =>
      val lines = q.run(spark, dir).queryExecution.executedPlan
        .toString.linesIterator.toVector
      val feeding = lines.indices.exists { i =>
        lines(i).contains("Exchange SinglePartition") &&
          lines.slice(math.max(0, i - 3), i).exists(_.contains("Window"))
      }
      if (feeding) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"single-partition window in: ${offenders.mkString(", ")}")
  }

  test("q_upsert_latest compacts via aggregate, not a per-key sort window") {
    val plan = Registry.all.find(_.name == "q_upsert_latest").get
      .run(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected aggregate-based compaction:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("row_number"),
      s"latest-wins snapshot must not sort per-key history:\n$plan")
  }

  test("q_join_snowflake broadcasts the dimension side") {
    val df = Registry.all.find(_.name == "q_join_snowflake").get.run(spark, dir)
    df.collect() // let AQE finalize join strategies
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast dim joins:\n$plan")
  }

  test("lambda-free scan-shaped hot paths stay inside whole-stage codegen") {
    // queries whose cost is per-row expression work: dropping out of
    // codegen is a silent multi-x regression. Only lambda-free queries
    // qualify — Spark's higher-order functions (filter/aggregate/
    // transform with lambdas) are CodegenFallback and legitimately
    // exclude their stage (which is why the custom native expressions
    // exist for the true hot paths).
    val scanShaped = Seq("q_text_fingerprint", "q_canonicalize_type",
      "q_json_extract", "q_text_redact")
    val byName = Registry.all.map(q => q.name -> q).toMap
    scanShaped.foreach { name =>
      val df = byName(name).run(spark, dir)
      // execute THIS df's QueryExecution (count() would plan its own,
      // pruned query); AQE only materializes codegen stages at execution
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*("),
        s"$name has no WholeStageCodegen stage:\n$plan")
    }
  }
}
