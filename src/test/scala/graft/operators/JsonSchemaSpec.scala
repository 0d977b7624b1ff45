package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generic JSON-Schema validator (X3): schema-document-driven
  * required/type/pattern/closed-properties checks. */
class JsonSchemaSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val doc = """{
    "type": "object",
    "properties": {
      "email": {"type": "string", "pattern": "^[a-z]+@[a-z.]+$"},
      "index": {"type": "integer"},
      "tags": {"type": "array"}
    },
    "required": ["email", "index"],
    "additionalProperties": false
  }"""

  private def valid(jsons: String*): Seq[Boolean] =
    jsons.toSeq.toDF("j")
      .select(JsonSchema.isValid(col("j"), doc).as("v"))
      .as[Boolean].collect().toSeq

  test("schema document parses into the supported subset") {
    val s = JsonSchema.parse(doc)
    assert(s.properties.map(_.name) == Seq("email", "index", "tags"))
    assert(s.properties.head.pattern.isDefined)
    assert(s.required == Seq("email", "index"))
    assert(!s.additionalProperties)
  }

  test("valid objects pass; optional properties may be absent") {
    assert(valid(
      """{"email":"a@b.c","index":5}""",
      """{"email":"a@b.c","index":5,"tags":[1,2]}""") == Seq(true, true))
  }

  test("violations fail: missing required, extra prop, wrong type, bad pattern") {
    assert(valid(
      """{"email":"a@b.c"}""",                           // missing required
      """{"email":"a@b.c","index":5,"zzz":1}""",         // extra property
      """{"email":"a@b.c","index":"5"}""",               // string is not integer
      """{"email":"a@b.c","index":5.5}""",               // fraction is not integer
      """{"email":"A@B.C","index":5}""",                 // pattern violation
      """{"email":"a@b.c","index":5,"tags":"x"}""",      // string is not array
      """{"email":null,"index":5}"""                     // JSON null is not string
    ).forall(_ == false))
  }

  test("malformed JSON and non-objects are invalid, never null") {
    assert(valid("not json", "[1,2]", """"str"""", "42").forall(_ == false))
  }

  test("open schemas admit extra properties") {
    val open = """{"type":"object","properties":{"a":{"type":"integer"}},
                   "required":["a"]}"""
    val v = Seq("""{"a":1,"anything":"goes"}""").toDF("j")
      .select(JsonSchema.isValid(col("j"), open).as("v")).as[Boolean].head()
    assert(v)
  }
}
