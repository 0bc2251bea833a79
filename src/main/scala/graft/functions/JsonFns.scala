package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, VariantType}

/** JSON function family (reference JenaX `json:*` extensions,
  * docs/examples/README.md:142-380), Spark-first: JSON values ride
  * Spark 4 VARIANT columns, auto-typing uses `schema_of_variant`, and
  * the multi-row `json:unnest` property function is `posexplode` over
  * `from_json(col, array<variant>)` — a Catalyst Generator, fully
  * parallel, no UDFs.
  */
object JsonFns {

  private val Xsd = "http://www.w3.org/2001/XMLSchema#"

  /** Auto-typed RDF literal for one JSON value (a VARIANT column),
    * matching the reference's `json:unnest` typing
    * (docs/examples/README.md:166-204): JSON string → plain literal,
    * any JSON number → xsd:double (1 → "1.0"), boolean → xsd:boolean,
    * object/array → compact-serialized xsd:json literal.
    */
  def variantToRdfLiteral(v: Column): Column = {
    val ty = schema_of_variant(v)
    val isNum = ty.isin("BIGINT", "DOUBLE", "FLOAT", "INT", "SMALLINT",
      "TINYINT") || ty.startsWith("DECIMAL")
    when(v.isNull || ty === "VOID", lit(null: String))
      .when(ty === "STRING",
        concat(lit("\""), RdfTerms.ntEscape(variant_get(v, "$", "string")),
          lit("\"")))
      .when(ty === "BOOLEAN",
        concat(lit("\""), variant_get(v, "$", "string"),
          lit("\"^^<" + Xsd + "boolean>")))
      .when(isNum,
        concat(lit("\""), variant_get(v, "$", "double").cast("string"),
          lit("\"^^<" + Xsd + "double>")))
      .otherwise( // OBJECT / ARRAY: compact JSON text as xsd:json
        concat(lit("\""), RdfTerms.ntEscape(v.cast("string")),
          lit("\"^^<" + Xsd + "json>")))
  }

  /** `?json json:unnest (?item ?index)` — explode a JSON-array column
    * into (keep…, idx, item) with auto-typed literal items; idx is
    * 0-based like the reference.
    */
  def unnest(df: DataFrame, jsonArr: Column, keep: Seq[Column]): DataFrame =
    df.select(keep :+ posexplode(from_json(jsonArr, ArrayType(VariantType))): _*)
      .select(keep :+ col("pos").as("idx") :+
        variantToRdfLiteral(col("col")).as("item"): _*)

  /** JSON-encode one native column value (the `json:convert`/`json:toJson`
    * core): numbers/booleans bare, strings quoted+escaped, NULL → "null".
    * Implemented with to_json over a 1-field struct (codegen) — the
    * `{"v":` prefix and `}` suffix are stripped positionally.
    */
  def jsonEncode(c: Column): Column = {
    val s = to_json(struct(c.as("v")), Map("ignoreNullFields" -> "false"))
    s.substr(lit(6), length(s) - 6)
  }

  /** `json:convert(term)` → the JSON encoding as an xsd:json literal. */
  def jsonConvert(c: Column): Column =
    concat(lit("\""), RdfTerms.ntEscape(jsonEncode(c)),
      lit("\"^^<" + Xsd + "json>"))

  /** `json:array(args…)` → compact JSON array text (mixed types allowed —
    * each element is independently JSON-encoded).
    */
  def jsonArray(cs: Column*): Column =
    concat(lit("["), concat_ws(",", cs.map(jsonEncode): _*), lit("]"))
}
