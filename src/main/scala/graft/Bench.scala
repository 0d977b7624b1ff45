package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registry query on
  * SPARK_GRAFT_SF_DIR and prints exactly one JSON line.
  *
  * Each query gets one untimed warmup execution first (JIT + codegen +
  * parquet footer caches), then one timed run — the driver's number
  * should measure the engine, not JVM warmup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run (local hotspot
    // iteration); the driver never sets it, so its runs time everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = Registry.all.filter(q => only.forall(_.contains(q.name)))
    // warmup: one full execution per query, untimed (JIT + codegen +
    // parquet footers); drop the caches it left behind so timed runs
    // are honest.
    ordered.foreach { q =>
      try q.run(spark, sfDir).count()
      catch { case _: Throwable => () }
      spark.sqlContext.clearCache()
    }
    System.gc()
    // two timed repetitions, keep the per-query minimum (GC noise in a
    // single-JVM run of the whole registry is substantial). Caches are
    // dropped AFTER each query's clock stops: operators persist
    // intermediates mid-query (correct inside one query), but a
    // 105-query session otherwise accumulates every query's leftovers —
    // by the iterative ANN queries the storage pool is full of other
    // queries' blocks and their many-stage loops eat the full-GC pauses
    // (measured: q_embed_ivf_refined 7.9 s in the polluted session vs
    // 1.7 s hermetic). Each query is timed against the engine, not
    // against the registry's accumulated state.
    // A query that throws must surface in the JSON, not be silently
    // timed as near-zero: a regression that breaks a query would
    // otherwise *improve* the bench total.
    // Repetitions: same-code full sweeps on this host span ±35% from
    // ambient load — wide enough to hide a real 1.3x regression under
    // the 2x gate — so the per-query MINIMUM across SPARK_GRAFT_BENCH_REPS
    // (default 3) timed passes is the reported figure: the minimum
    // estimates the ambient-free cost, and two consecutive reported
    // sweeps agree where single passes do not.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(3)
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val times = (1 to reps).map { _ =>
      val rep = ordered.map { q =>
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).count()
        catch {
          case e: Throwable =>
            failures(q.name) =
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sqlContext.clearCache()
        q.name -> dt
      }.toMap
      System.gc()
      rep
    }
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    val results = ordered.map(q => q.name -> times.map(_(q.name)).min)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // measurement-noise transparency: per-query max/min across reps —
    // a reader can tell a real regression (stable across reps) from
    // ambient jitter (wide spread) without a second full sweep
    val spreads = ordered.map { q =>
      val vs = times.map(_(q.name))
      q.name -> (if (vs.min <= 0) 1.0 else vs.max / vs.min)
    }
    val noisy = spreads.sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val errJson = failures.map { case (k, v) => "\"" + k + "\":" + jstr(v) }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","errors":${failures.size},"reps":$reps,"noisiest":$noisy,"failed":$errJson,"queries":$qs,"sf":"$sfDir"}"""
    // The driver keeps only a tail of captured stdout; the full
    // per-query line (~2 KB for 79 queries) can start mid-JSON in that
    // tail, so the LAST line printed must be compact enough to always
    // fit. Full detail goes to a file + a pre-shutdown print; the final
    // post-stop() line is total-only (<100 bytes).
    val compact =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","errors":${failures.size},"sf":"$sfDir"}"""
    val outPath = java.nio.file.Paths.get(
      args.headOption.getOrElse(
        sys.props.getOrElse("user.dir", ".") + "/bench_result.json"))
    java.nio.file.Files.write(outPath, json.getBytes("UTF-8"))
    println(json)
    spark.stop()
    println(compact)
  }
}
