package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: run each connected-components-backed registry query at
  * a given SF dir and report the CC round count and convergence state
  * (Clusters.lastRounds/lastConverged). Usage:
  *   sbt "runMain graft.tools.CcProbe /root/testdata/sf0.1"
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-cc-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("q_dedup_clusters", "q_graph_components")) {
      val t0 = System.nanoTime()
      graft.Registry.all.find(_.name == name).get.run(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ccprobe] $name rounds=${graft.operators.Clusters.lastRounds}" +
        f" converged=${graft.operators.Clusters.lastConverged} sec=$dt%.2f")
    }
    spark.stop()
  }
}
