package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{OrderUnifyPipeline, SourceRecord}

/** Streaming throughput soak: drives N complete order lifecycles
  * (3 events each: created/placed/cancelled, distinct keys) through
  * the full unify pipeline — parse → canonicalize → shuffle by key →
  * flatMapGroupsWithState buffer/flush — and reports end-to-end
  * events/second, from first `addData` to the last projection landing
  * in the sink (deadline tail included: the figure is end-to-end, not
  * map-stage-only).
  *
  * The reference deployment's implied load is ~3 events/s
  * (BASELINE.md); this records the same pipeline's capacity headroom
  * at local[32]. Run:
  * `sbt "runMain graft.tools.StreamSoak [lifecycles] [tws|fmgws]"` —
  * the second arg selects the stateful implementation:
  * transformWithState with explicit timers on the RocksDB provider
  * (the default — timeout cost tracks expired keys, ≈3.3× faster at
  * 100k keys), or flatMapGroupsWithState on the HDFS provider (the
  * Spark-3-compatible fallback, whose per-batch timeout scan touches
  * the whole store).
  */
object StreamSoak {

  def lifecycleRecords(lo: Int, hi: Int): Seq[SourceRecord] = {
    val ts = "2024-08-16T15:51:19.799Z"
    def json(id: String, typ: String): String =
      s"""{"order-id":"$id","type":"$typ","timestamp":"$ts","order_details":{"d":1}}"""
    (lo until hi).flatMap { i =>
      val id = s"ord-$i"
      Seq(
        SourceRecord(id, json(id, "created"), "order-created", 3L * i),
        SourceRecord(id, json(id, "placed"), "order-placed", 3L * i + 1),
        SourceRecord(id, json(id, "cancelled"), "order-cancelled", 3L * i + 2))
    }
  }

  def main(args: Array[String]): Unit = {
    val lifecycles = args.headOption.map(_.toInt).getOrElse(100000)
    val impl = args.lift(1).getOrElse("tws")
    require(impl == "fmgws" || impl == "tws", s"unknown impl '$impl'")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-soak-ckpt").toString
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-soak")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.checkpointLocation", ckpt)
      .config("spark.ui.enabled", "false")
    if (impl == "tws") // OSS transformWithState requires RocksDB
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val bufferMillis = 2000L
    val input = MemoryStream[SourceRecord]
    // projections() auto-dispatches: RocksDB session -> TWS,
    // HDFS-provider session -> FMGWS
    val out = OrderUnifyPipeline.projections(input.toDF(), bufferMillis)
    val query = out.writeStream
      .format("memory").queryName("soak").outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()

    val t0 = System.nanoTime()
    val chunk = 10000
    var i = 0
    while (i < lifecycles) {
      val hi = math.min(i + chunk, lifecycles)
      input.addData(lifecycleRecords(i, hi))
      i = hi
    }
    val deadline = System.currentTimeMillis() + 600000L
    var done = 0L
    while (done < lifecycles && System.currentTimeMillis() < deadline) {
      Thread.sleep(200)
      done = spark.table("soak").count()
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    // settle before asserting exactness: catch late duplicate emission
    // the count-poll loop would miss (the timed figure is already
    // captured above)
    Thread.sleep(1000)
    val finalCount = spark.table("soak").count()
    val distinctKeys = spark.table("soak")
      .select(col("orderId")).distinct().count()
    query.stop()
    val events = 3L * lifecycles
    val eps = events / elapsed
    require(finalCount == lifecycles && distinctKeys == lifecycles,
      s"not exactly-once: $finalCount rows / $distinctKeys keys for " +
        s"$lifecycles lifecycles after ${elapsed}s")
    val json =
      f"""{"metric":"stream_events_per_sec","value":$eps%.0f,"unit":"events/sec","impl":"$impl%s","lifecycles":$lifecycles,"elapsed_sec":$elapsed%.2f}"""
    println(json)
    spark.stop()
    println(json)
  }
}
