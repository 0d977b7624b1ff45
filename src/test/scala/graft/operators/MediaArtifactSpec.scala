package graft.operators

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialized media table must behave like a production blob
  * store: stored parquet binary blobs decoded by the real codecs, a
  * format partition that prunes at planning time, and metadata
  * queries whose scans never read a media page. */
class MediaArtifactSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def scans(plan: SparkPlan): Seq[FileSourceScanExec] =
    plan.collect { case f: FileSourceScanExec => f } ++
      plan.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
      }.flatten

  test("every format is materialized, one row per document") {
    val nDocs = graft.Tables.documents(spark, dir).count()
    val counts = MediaArtifact.table(spark, dir)
      .groupBy(col("format")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == MediaArtifact.Formats.toSet)
    MediaArtifact.Formats.foreach { f =>
      assert(counts(f) == nDocs, s"format $f must cover the corpus")
    }
  }

  test("a format-scoped read prunes to its partition directory") {
    val wav = MediaArtifact.records(spark, dir, "wav")
    wav.count() // materialize the plan
    val scan = scans(wav.queryExecution.executedPlan).headOption
      .getOrElse(fail("no file scan in the records plan"))
    assert(scan.metadata.get("PartitionFilters").exists(_.contains("wav")),
      s"format filter must be a partition filter: ${scan.metadata}")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 of ${MediaArtifact.Formats.size} partitions, " +
        s"got ${scan.selectedPartitions.partitionCount}")
  }

  test("a metadata-only query never reads the media column") {
    val catalog = MediaArtifact.table(spark, dir)
      .groupBy(col("format"), col("mime"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("bytes"))
    catalog.count()
    val scan = scans(catalog.queryExecution.executedPlan).headOption
      .getOrElse(fail("no file scan in the catalog plan"))
    val readSchema = scan.requiredSchema.fieldNames.toSet
    assert(!readSchema.contains("media"),
      s"catalog scan must prune the blob column, read: $readSchema")
    assert(readSchema.contains("mime") && readSchema.contains("n_bytes"))
  }

  test("decoding stored blobs equals decoding freshly synthesized bytes") {
    import spark.implicits._
    // wav: artifact-fed decode vs direct synthesis decode
    val stored = Codecs.decodeWavBatch(MediaArtifact.records(spark, dir, "wav"))
      .collect().map(m => m.id -> m).toMap
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("int"))
      .as[(Long, Int)].collect()
    assert(stored.size == docs.length)
    docs.take(50).foreach { case (id, _) => assert(stored(id).ok) }
    val (id0, _) = docs.head
    val n0 = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") === id0)
      .select(col("text").cast("binary")).as[Array[Byte]].head().length
    assert(stored(id0) == Codecs.parseWav(id0, Codecs.synthesizeWav(id0, n0)))
    // jpeg: the stored container decodes exactly to the flat-block recipe
    val jm = Jpeg.decodeJpegBatch(MediaArtifact.records(spark, dir, "jpeg"))
      .collect().map(m => m.id -> m).toMap
    assert(jm.values.forall(_.ok), "every stored JPEG must decode")
    assert(jm(id0) == Jpeg.parseJpeg(id0, Jpeg.synthesizeJpeg(id0, n0)))
  }

  test("a regenerated corpus fingerprint forces a rebuild key change") {
    val p = MediaArtifact.path(dir)
    assert(p.contains("media_"), s"artifact path must be family-tagged: $p")
    // the fingerprint depends on documents.parquet size/mtime — two
    // different dirs must never share an artifact path
    val p2 = MediaArtifact.path("/root/testdata/sf0.01")
    assert(p != p2)
  }
}
