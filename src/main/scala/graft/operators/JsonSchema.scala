package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Generic JSON-Schema validation (X3) — the reference registers a
  * draft-07 schema with required fields, per-field types/patterns, and
  * `additionalProperties: false` against its transactions topic
  * (`docker-compose/transactions-schema.json:1-37`). This compiles the
  * same schema subset into a single boolean `Column` over a JSON
  * string, built entirely from codegen'd built-ins:
  *
  *  - well-formedness via `try_parse_json` (variant),
  *  - required / closed-property checks via `json_object_keys`,
  *  - type checks via `schema_of_variant(variant_get(...))` — real
  *    JSON-type introspection (a JSON string `"42"` is NOT an integer),
  *  - `pattern` checks via `rlike` on the extracted string.
  *
  * Supported schema subset: top-level `type: object`, `properties`
  * with `type` ∈ {string, integer, number, boolean, array, object,
  * null} and optional `pattern`, `required`, `additionalProperties`.
  * A property that is absent passes its type/pattern checks (presence
  * is `required`'s job — draft-07 semantics).
  *
  * Scale: the validity predicate is one pass of scalar expressions —
  * no shuffle, no UDF; it whole-stage-codegens into the scan that
  * reads the JSON column.
  */
object JsonSchema {

  final case class PropertySpec(name: String, typ: Option[String],
                                pattern: Option[String])

  final case class ObjectSchema(properties: Seq[PropertySpec],
                                required: Seq[String],
                                additionalProperties: Boolean)

  /** Parse the supported draft-07 subset from a schema document.
    * Uses Jackson (already on the Spark classpath — Spark's own JSON
    * parser is built on it). */
  def parse(doc: String): ObjectSchema = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(doc)
    require(!root.has("type") || root.get("type").asText() == "object",
      "only type: object schemas are supported")
    val props = Option(root.get("properties")).map { p =>
      val it = p.properties().iterator()
      val buf = Seq.newBuilder[PropertySpec]
      while (it.hasNext) {
        val e = it.next()
        val spec = e.getValue
        buf += PropertySpec(
          e.getKey,
          Option(spec.get("type")).map(_.asText()),
          Option(spec.get("pattern")).map(_.asText()))
      }
      buf.result()
    }.getOrElse(Seq.empty)
    val required = Option(root.get("required")).map { r =>
      (0 until r.size()).map(r.get(_).asText())
    }.getOrElse(Seq.empty)
    val closed = Option(root.get("additionalProperties"))
      .exists(n => !n.asBoolean(true))
    ObjectSchema(props, required, !closed)
  }

  /** Predicate over `schema_of_variant`'s type name for a draft-07
    * `type` keyword. Variant renders all JSON integers as BIGINT,
    * fractions as DECIMAL(p,s)/DOUBLE, strings as STRING, JSON null as
    * VOID, containers as ARRAY<...>/OBJECT<...>. */
  private def typeCheck(typ: String, typeName: Column): Column = typ match {
    case "integer" => typeName === "BIGINT"
    case "number" => typeName === "BIGINT" || typeName === "DOUBLE" ||
      typeName.startsWith("DECIMAL")
    case "string" => typeName === "STRING"
    case "boolean" => typeName === "BOOLEAN"
    case "array" => typeName.startsWith("ARRAY")
    case "object" => typeName.startsWith("OBJECT")
    case "null" => typeName === "VOID"
    case other => throw new IllegalArgumentException(
      s"unsupported schema type: $other")
  }

  /** Compile the schema into a validity predicate over a JSON string
    * column. Malformed JSON and non-objects are invalid; the result is
    * never null. */
  def isValid(json: Column, schema: ObjectSchema): Column = {
    val v = try_parse_json(json)
    val keys = json_object_keys(json) // null for malformed / non-object
    val wellFormed = v.isNotNull && keys.isNotNull
    val requiredOk = schema.required
      .map(r => array_contains(keys, r))
      .reduceOption(_ && _).getOrElse(lit(true))
    val closedOk =
      if (schema.additionalProperties) lit(true)
      else size(array_except(keys,
        array(schema.properties.map(p => lit(p.name)): _*))) === 0
    val fieldsOk = schema.properties.flatMap { p =>
      val pv = variant_get(v, s"$$.${p.name}", "variant")
      val tOk = p.typ.map(t => typeCheck(t, schema_of_variant(pv)))
      val patOk = p.pattern.map(pat =>
        get_json_object(json, s"$$.${p.name}").rlike(pat))
      val checks = tOk.toSeq ++ patOk.toSeq
      if (checks.isEmpty) None
      else Some(when(pv.isNull, lit(true)).otherwise(checks.reduce(_ && _)))
    }
    val all = (wellFormed +: requiredOk +: closedOk +: fieldsOk).reduce(_ && _)
    coalesce(all, lit(false))
  }

  /** One-step convenience: validate against a schema document. */
  def isValid(json: Column, schemaDoc: String): Column =
    isValid(json, parse(schemaDoc))
}
