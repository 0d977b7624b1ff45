package graft.sources

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed join layout: both sides bucketed+sorted by the join key
  * must join with zero shuffle exchanges. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def countExchanges(plan: SparkPlan): Int = {
    val self = plan match {
      case _: Exchange => 1
      case a: AdaptiveSparkPlanExec => return countExchanges(a.executedPlan)
      case _ => 0
    }
    self + plan.children.map(countExchanges).sum
  }

  test("bucketed tables join without any exchange") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      joined.count() // materialize so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan
      assert(countExchanges(plan) == 0, s"expected no exchanges in:\n$plan")
      // sanity: result matches a plain join
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
