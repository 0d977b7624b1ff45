package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Volume soak of the unify pipeline: 20k complete lifecycles (60k
  * events, distinct keys) must all land exactly once, and end-to-end
  * throughput must clear a deliberately conservative floor (the
  * BASELINE.md headline figure comes from `graft.tools.StreamSoak` at
  * 100k lifecycles; this spec guards reproducibility and
  * exactly-onceness at volume, not the headline). */
class StreamThroughputSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("20k lifecycles: every projection exactly once, above the throughput floor") {
    val lifecycles = 20000
    val input = MemoryStream[SourceRecord]
    val out = OrderUnifyPipeline.projections(input.toDF(), bufferMillis = 2000L)
    val query = out.writeStream
      .format("memory").queryName("soak_spec").outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      val t0 = System.nanoTime()
      (0 until lifecycles by 5000).foreach { lo =>
        input.addData(graft.tools.StreamSoak.lifecycleRecords(
          lo, math.min(lo + 5000, lifecycles)))
      }
      val deadline = System.currentTimeMillis() + 300000L
      var done = 0L
      while (done < lifecycles && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        done = spark.table("soak_spec").count()
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // settle: catch over-emission too
      val rows = spark.table("soak_spec")
      val n = rows.count()
      assert(n == lifecycles, s"expected $lifecycles projections, got $n")
      // distinct keys — no duplicate emission
      assert(rows.select("orderId").distinct().count() == lifecycles)
      val eps = 3.0 * lifecycles / elapsed
      info(f"stream soak: $eps%.0f events/s over $elapsed%.1f s")
      // floor is ~20x under the quiet-machine figure: this guards
      // regressions to seconds-per-event, not ambient variance
      assert(eps > 1000.0, f"throughput $eps%.0f events/s below floor")
    } finally query.stop()
  }
}
