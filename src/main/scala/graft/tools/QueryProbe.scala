package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query profiler: runs one registry query N times on a
  * given SF dir, printing per-execution wall time and the final
  * executed plan — the local feedback loop for plan iteration that
  * `Bench` (whole-registry, JSON-only) is too coarse for.
  *
  * Usage: tools/run.sh graft.tools.QueryProbe <name> [sfDir] [reps] [--plan]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    // flags are position-independent: `QueryProbe q_x --plan` must not
    // consume "--plan" as the sfDir
    val (flags, positional) = args.partition(_.startsWith("--"))
    val name = positional(0)
    val sfDir = if (positional.length > 1) positional(1) else "/root/testdata/sf0.1"
    val reps = if (positional.length > 2) positional(2).toInt else 3
    val showPlan = flags.contains("--plan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.Registry.all.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name"))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = q.run(spark, sfDir).count()
      println(f"[probe] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      spark.sqlContext.clearCache()
    }
    if (showPlan)
      println(q.run(spark, sfDir).queryExecution.executedPlan.toString)
    spark.stop()
  }
}
