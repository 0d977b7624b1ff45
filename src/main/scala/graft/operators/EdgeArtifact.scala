package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Materialized part co-occurrence edge list — the shared input of the
  * whole graph family (`q_graph_*`) and `q_market_basket`.
  *
  * Seven queries consume the identical support-thresholded edge set
  * (distinct basket → pair self-join → support >= 2). Rebuilding it in
  * each query made the build — a full fact scan, distinct, and
  * Σ|basket|²/2 pair aggregation — ~7× of the graph family's cost. At
  * 100 TB the right posture is the one `q_zorder_cells` takes for zone
  * maps: write the derived structure ONCE as a layout artifact and let
  * every consumer scan the (orders-of-magnitude smaller) artifact
  * instead of the fact table. `q_graph_edges_build` is the registered
  * build step and carries the honest build cost; consumers lazily
  * build if the artifact is absent, so any subset of the registry can
  * run standalone in any order.
  *
  * The artifact is keyed by source directory AND a fingerprint of the
  * fact file (size + mtime), so a regenerated dataset can never serve
  * a stale edge list.
  */
object EdgeArtifact {

  def path(dir: String): String = Artifacts.path(dir, "lineitem", "cooccur")

  /** The edge-list plan over a (persisted) distinct basket: pair
    * self-join on the order key, pa < pb orientation, one aggregate
    * applying the support >= 2 threshold. Fan-out is bounded by
    * Σ|basket|²/2 (baskets hold ≤ ~17 parts).
    * Columns: (pa, pb, support), undirected with pa < pb. */
  private def edgePlan(basket: DataFrame): DataFrame = {
    basket.select(col("okey"), col("l_partkey").as("pa"))
      .join(basket.select(col("okey"), col("l_partkey").as("pb")), Seq("okey"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
  }

  /** Force a (re)build of the artifact — the registered build step
    * always pays this cost so the bench prices it honestly. Three
    * parquet outputs share ONE persisted distinct-basket scan:
    *  - edges: (pa, pb, support)   — the support >= 2 dense core
    *  - freq:  (l_partkey, f)      — per-part basket frequency
    *  - meta:  (n_orders)          — basket count, one row
    * freq/meta are the marginals association metrics (lift,
    * confidence) need; storing them beside the edges makes
    * `q_market_basket` a pure artifact consumer. */
  def materialize(spark: SparkSession, dir: String): String = synchronized {
    val p = path(dir)
    val basket = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // A layout build compacts its output: the AQE rebalance hint
      // packs the result into size-targeted files (one locally, ~64 MB
      // chunks on a cluster) instead of shuffle-partition-count
      // shards. Consumers then scan a few well-sized files, and their
      // downstream AQE stages size themselves off the real data
      // volume rather than 32 near-empty splits.
      edgePlan(basket).hint("rebalance")
        .write.mode("overwrite").parquet(s"$p/edges")
      basket.groupBy(col("l_partkey")).agg(count(lit(1)).as("f"))
        .hint("rebalance").write.mode("overwrite").parquet(s"$p/freq")
      basket.agg(countDistinct(col("okey")).as("n_orders"))
        .write.mode("overwrite").parquet(s"$p/meta")
    } finally basket.unpersist()
    p
  }

  private def ensure(spark: SparkSession, dir: String): String = {
    val p = path(dir)
    if (!Artifacts.complete(p, Seq("edges", "freq", "meta")))
      materialize(spark, dir)
    p
  }

  /** Read the edge artifact, building it first if absent. Returned
    * columns: (pa, pb, support). Consumers re-scan the parquet per
    * branch — the artifact is the dense core, orders of magnitude
    * smaller than the fact, so repeated scans beat caching it (and at
    * scale, beat re-deriving it from the fact by far more). */
  def edges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, dir)}/edges")

  /** Per-part basket frequency (l_partkey, f). */
  def nodeFreq(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, dir)}/freq")

  /** One-row (n_orders) basket count. */
  def meta(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, dir)}/meta")
}
