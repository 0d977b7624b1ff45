package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      // Spark 4.1's checksum checkpoint-file manager can deadlock on
      // state-store delta commit in rapid micro-batch tests (tasks
      // wait forever in ChecksumCancellableFSDataOutputStream.close)
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // Keep per-micro-batch state-store filesystem work minimal: the
      // HDFS-backed provider shells out for local-FS metadata calls and
      // snapshot maintenance, which starves rapid-trigger tests.
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      .config("spark.sql.streaming.checkpointLocation", "/dev/shm/graft-ckpt")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
