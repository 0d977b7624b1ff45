package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A file-backed streaming source exposing KAFKA'S CONTRACT — named
  * topics, numbered partitions, per-partition monotone offsets,
  * key-hash partition routing, and checkpointed offset-exact resume —
  * so the S5/X4 pipeline paths (`kafkaSource`/`kafkaSink`,
  * `OrderProjectionTopology.java:57-64`) can be executed end to end in
  * an environment with no broker and no connector jar. This is a real
  * DataSource V2 `MicroBatchStream`: Spark checkpoints THIS source's
  * offsets through the same offset-log machinery a Kafka query uses,
  * so a kill-and-restart replays from the last committed offsets
  * exactly (FileTopicsE2ESpec pins no-loss/no-dup resume).
  *
  * Layout: `<root>/<topic>/p<k>.log`, one append-only log per
  * (topic, partition); offset = line number. Each line is
  * URL-encoded `key TAB value` (no JSON parsing on the hot path, no
  * escaping ambiguity). The producer routes key → partition with
  * [[FileTopics.partitionFor]] — Kafka's invariant (same key ⇒ same
  * partition ⇒ per-key total order) with a documented stable hash.
  *
  * Scale honesty: this source exists to VERIFY the contract in-sandbox
  * at test scale — `latestOffset` counts lines per log (a production
  * source keeps an offset index) and the sink helper appends through
  * one writer per partition file. The production path stays the Kafka
  * connector (`OrderUnifyPipeline.kafkaSource/kafkaSink`); the
  * pipeline code between source and sink is identical for both. */
object FileTopics {

  val Schema: StructType = new StructType()
    .add("key", StringType).add("value", StringType)
    .add("topic", StringType).add("partition", IntegerType)
    .add("offset", LongType)

  /** Kafka's routing invariant: same key ⇒ same partition. Stable
    * FNV-1a over the key's UTF-8 bytes (documented, engine-neutral —
    * NOT Kafka's murmur2; the contract is the invariant, not the
    * specific hash). Delegates to the single static loop behind the
    * codegen'd [[graft.functions.FnvPartition]] sink expression, so
    * producer-side and sink-side routing can never diverge. A null
    * key (permitted by Kafka's record contract) routes like the empty
    * key — deterministically, never an NPE. */
  def partitionFor(key: String, numPartitions: Int): Int =
    graft.functions.FnvPartition.compute(
      if (key == null) null
      else org.apache.spark.unsafe.types.UTF8String.fromString(key),
      numPartitions)

  // null keys encode as the empty string (the log format has no null
  // marker; a null-keyed record degrades to empty-keyed, same routing)
  private def enc(s: String): String =
    java.net.URLEncoder.encode(if (s == null) "" else s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def logFile(root: String, topic: String, p: Int): java.io.File =
    new java.io.File(s"$root/$topic", s"p$p.log")

  /** Producer: append `(key, value)` records to `topic`, key-routed
    * across `numPartitions` logs. Appends are line-atomic per call. */
  def append(root: String, topic: String, numPartitions: Int,
      records: Seq[(String, String)]): Unit = synchronized {
    records.groupBy { case (k, _) => partitionFor(k, numPartitions) }
      .foreach { case (p, recs) =>
        val f = logFile(root, topic, p)
        f.getParentFile.mkdirs()
        val out = new java.io.FileOutputStream(f, true)
        try {
          val sb = new StringBuilder
          recs.foreach { case (k, v) =>
            sb.append(enc(k)).append('\t').append(enc(v)).append('\n')
          }
          out.write(sb.toString.getBytes("UTF-8"))
        } finally out.close()
      }
  }

  /** Current (topic, partition) → record-count map — the "latest
    * offsets" a consumer group would see. */
  def latestOffsets(root: String, topics: Seq[String]): Map[(String, Int), Long] =
    topics.flatMap { t =>
      val d = new java.io.File(root, t)
      Option(d.listFiles()).getOrElse(Array.empty).toSeq
        .filter(f => f.getName.startsWith("p") && f.getName.endsWith(".log"))
        .map { f =>
          val p = f.getName.stripPrefix("p").stripSuffix(".log").toInt
          (t, p) -> countLines(f)
        }
    }.toMap

  private def countLines(f: java.io.File): Long = {
    val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
    try {
      var n = 0L; var c = in.read()
      while (c >= 0) { if (c == '\n') n += 1; c = in.read() }
      n
    } finally in.close()
  }

  private[sources] def readRange(root: String, topic: String, p: Int,
      from: Long, until: Long): Iterator[(String, String, Long)] = {
    val f = logFile(root, topic, p)
    if (!f.exists() || until <= from) return Iterator.empty
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val lines = src.getLines().zipWithIndex
      .slice(math.min(from, Int.MaxValue).toInt,
        math.min(until, Int.MaxValue).toInt).toVector
    src.close()
    lines.iterator.map { case (line, i) =>
      val tab = line.indexOf('\t')
      (dec(line.substring(0, tab)), dec(line.substring(tab + 1)), i.toLong)
    }
  }

  /** The reader: a streaming DataFrame with the Kafka source's
    * projection (`key, value, topic, seq`) — drop-in for
    * [[graft.streaming.OrderUnifyPipeline.kafkaSource]]'s output.
    * `startingOffsets` (the canonical [[FileTopicsOffset]] JSON, e.g.
    * a value carried out of a stopped query's checkpoint by
    * [[graft.streaming.StateMigration]]) positions a FRESH checkpoint
    * at those offsets — the Kafka source's `startingOffsets` contract;
    * ignored on resume because Spark then feeds the checkpointed
    * offset back through `deserializeOffset`. */
  def source(spark: SparkSession, root: String, topics: Seq[String],
             startingOffsets: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val rd = spark.readStream
      .format(classOf[FileTopicsProvider].getName)
      .option("root", root)
      .option("topics", topics.mkString(","))
    startingOffsets.foreach(j => rd.option("startingOffsets", j))
    rd.load()
      .select(col("key"), col("value"), col("topic"),
        col("offset").as("seq"))
  }

  /** Kafka-sink stand-in with Kafka's semantics (AT-LEAST-ONCE on
    * retry, key-routed partitions): call from `foreachBatch`. Rows
    * are routed to their partition on executors (one exchange on the
    * partition id — no driver collect) and each partition file has
    * exactly one writer per batch. Routing is the native codegen'd
    * [[graft.functions.FnvPartition]] Column expression — the sink
    * projection stays inside whole-stage codegen (no per-row Scala
    * UDF), and null keys route like the empty key instead of NPE-ing. */
  def sinkBatch(root: String, topic: String, numPartitions: Int)(
      batch: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftshim.ColumnShim
    val keyCol = col("key").cast("string")
    val routed = batch
      .select(keyCol.as("key"), col("value").cast("string").as("value"),
        ColumnShim.column(graft.functions.FnvPartition(
          ColumnShim.expression(keyCol), numPartitions)).as("p"))
      .repartition(numPartitions, col("p"))
    routed.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      it.toSeq.groupBy(_.getInt(2)).foreach { case (p, rows) =>
        val f = logFile(root, topic, p)
        f.getParentFile.mkdirs()
        val out = new java.io.FileOutputStream(f, true)
        try {
          val sb = new StringBuilder
          rows.foreach { r =>
            sb.append(enc(r.getString(0))).append('\t')
              .append(enc(r.getString(1))).append('\n')
          }
          out.write(sb.toString.getBytes("UTF-8"))
        } finally out.close()
      }
    }
  }
}

/** Offset = (topic, partition) → next line to read, JSON'd with
  * sorted, URL-encoded keys so serialization is canonical. */
private[sources] case class FileTopicsOffset(counts: Map[(String, Int), Long])
    extends Offset {
  override def json(): String =
    counts.toSeq
      .sortBy { case ((t, p), _) => (t, p) }
      .map { case ((t, p), n) =>
        s""""${java.net.URLEncoder.encode(t, "UTF-8")}/$p":$n"""
      }
      .mkString("{", ",", "}")
}

private[sources] object FileTopicsOffset {
  def parse(json: String): FileTopicsOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}")
    if (body.isEmpty) return FileTopicsOffset(Map.empty)
    FileTopicsOffset(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":", 2)
      val slash = k.stripPrefix("\"").stripSuffix("\"")
      val cut = slash.lastIndexOf('/')
      val t = java.net.URLDecoder.decode(slash.substring(0, cut), "UTF-8")
      (t, slash.substring(cut + 1).toInt) -> v.toLong
    }.toMap)
  }
}

class FileTopicsProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-file-topics"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileTopics.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new FileTopicsTable(properties.get("root"),
      properties.get("topics").split(",").toSeq,
      Option(properties.get("startingOffsets")))
}

private[sources] class FileTopicsTable(root: String, topics: Seq[String],
    startingOffsets: Option[String])
    extends Table with SupportsRead {
  override def name(): String = s"file-topics($root)"
  override def schema(): StructType = FileTopics.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FileTopics.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FileTopicsMicroBatchStream(root, topics, startingOffsets)
      }
    }
}

private[sources] class FileTopicsMicroBatchStream(root: String,
    topics: Seq[String], startingOffsets: Option[String] = None)
    extends MicroBatchStream {

  override def latestOffset(): Offset =
    FileTopicsOffset(FileTopics.latestOffsets(root, topics))

  override def initialOffset(): Offset =
    startingOffsets.map(FileTopicsOffset.parse)
      .getOrElse(FileTopicsOffset(Map.empty))

  override def deserializeOffset(json: String): Offset =
    FileTopicsOffset.parse(json)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileTopicsOffset].counts
    val e = end.asInstanceOf[FileTopicsOffset].counts
    e.toSeq.sortBy { case ((t, p), _) => (t, p) }.flatMap {
      case ((t, p), until) =>
        val from = s.getOrElse((t, p), 0L)
        if (until > from)
          Some(FileTopicsInputPartition(root, t, p, from, until): InputPartition)
        else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val ip = partition.asInstanceOf[FileTopicsInputPartition]
        new PartitionReader[InternalRow] {
          private val it =
            FileTopics.readRange(ip.root, ip.topic, ip.p, ip.from, ip.until)
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (!it.hasNext) false
            else {
              val (k, v, off) = it.next()
              cur = new GenericInternalRow(Array[Any](
                UTF8String.fromString(k), UTF8String.fromString(v),
                UTF8String.fromString(ip.topic), ip.p, off))
              true
            }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

private[sources] case class FileTopicsInputPartition(root: String,
    topic: String, p: Int, from: Long, until: Long) extends InputPartition
