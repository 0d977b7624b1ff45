package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `order_details` as VariantType: typed, lossless access to the
  * free-form details passthrough (SURVEY.md §1.2). */
class VariantDetailsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def rec(id: String, details: String): SourceRecord =
    SourceRecord(id,
      s"""{"order-id":"$id","type":"created","timestamp":"2024-08-16T15:51:19.799Z","order_details":$details}""",
      "order-created", 0L)

  test("details parse into a variant with typed field access") {
    val events = OrderUnifyPipeline.parseAndCanonicalize(
      Seq(
        rec("o1", """{"sku":"A-7","qty":3,"gift":{"wrap":true}}"""),
        rec("o2", """{"sku":"B-1","qty":1}""")).toDF())
    val typed = OrderUnifyPipeline.detailsAsVariant(events)
      .select(col("orderId"),
        variant_get(col("details"), "$.sku", "string").as("sku"),
        variant_get(col("details"), "$.qty", "long").as("qty"),
        variant_get(col("details"), "$.gift.wrap", "boolean").as("wrap"))
      .orderBy(col("orderId"))
      .as[(String, String, Long, Option[Boolean])].collect().toSeq
    assert(typed == Seq(
      ("o1", "A-7", 3L, Some(true)),
      ("o2", "B-1", 1L, None)))
  }

  test("absent or non-JSON details yield a null variant, not an error") {
    // a scalar string detail is unquoted by the JSON-path extractor, so
    // it is no longer parseable JSON: the typed view nulls it rather
    // than failing the job (same lenient posture as the default parse)
    val events = OrderUnifyPipeline.parseAndCanonicalize(
      Seq(rec("o3", "\"just a plain string\"")).toDF())
    val out = OrderUnifyPipeline.detailsAsVariant(events)
      .select(col("details").isNull.as("is_null")).as[Boolean].head()
    assert(out)
  }
}
