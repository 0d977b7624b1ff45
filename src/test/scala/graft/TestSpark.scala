package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object TestSpark {

  /** Per-JVM checkpoint root: streaming checkpoints cannot be reused
    * across runs (Spark refuses to recover flatMapGroupsWithState /
    * transformWithState queries from a prior run's checkpoint), so the
    * root is a fresh temp dir per test JVM, deleted on exit. Also
    * removes the round-1 fixed path if a stale copy is present so old
    * sandboxes converge. */
  /** Exposed for suites that need an explicit per-query checkpoint
    * location (e.g. restart-recovery tests reusing one checkpoint
    * across two query incarnations). */
  def checkpointDir: String = checkpointRoot

  private val checkpointRoot: String = {
    val legacy = new java.io.File("/dev/shm/graft-ckpt")
    if (legacy.exists()) deleteRecursively(legacy)
    val base = new java.io.File(
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else sys.props("java.io.tmpdir"))
    val dir = java.nio.file.Files.createTempDirectory(base.toPath, "graft-ckpt-").toFile
    sys.addShutdownHook(deleteRecursively(dir))
    dir.getAbsolutePath
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

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
      .config("spark.sql.streaming.checkpointLocation", checkpointRoot)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
