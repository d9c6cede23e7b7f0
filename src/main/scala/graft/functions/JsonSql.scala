package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, JsonToStructs, Literal}
import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** `json_transform` family + `json_serialize_sql`/`json_deserialize_sql`
  * (reference `extension/json/json_functions/json_transform.cpp`,
  * `json_serialize_sql.cpp`).
  *
  * json_transform(json, structure): `structure` is a JSON template whose
  * leaf strings are type names — `{"a": "INTEGER", "b": ["VARCHAR"]}`.
  * The template is parsed at ANALYSIS time (it must be a literal, as in
  * the reference where it drives function binding) into a Spark schema,
  * and the call lowers to Catalyst's own from_json — codegen'd,
  * partition-parallel, no UDF. The non-strict form yields NULL for
  * mis-typed fields (PERMISSIVE); json_transform_strict raises
  * (FAILFAST), matching the reference's pair.
  *
  * json_serialize_sql(sql): parses `sql` with the session parser and
  * returns `{"error":false,"statements":[{"sql":…,"plan":[…]}]}` where
  * `plan` is Catalyst's JSON rendering of the unresolved logical plan
  * (TreeNode.toJSON) — the engine-native AST, as the reference emits
  * ITS native ParseInfo AST. Parse failures return
  * `{"error":true,...}` like the reference's error document.
  * json_deserialize_sql extracts the statement back out of the
  * document (the document carries the statement text; we do not
  * re-render SQL from the plan JSON — divergence documented in
  * SURVEY §2.8).
  */
object JsonSql {
  private val mapper = new ObjectMapper()

  private def litString(e: Expression, what: String): String = e.eval(null) match {
    case null => throw new IllegalArgumentException(s"$what must not be NULL")
    case s => s.toString
  }

  // ---- json_transform ------------------------------------------------------

  private def typeOf(name: String): DataType = {
    val n = name.trim.toUpperCase
    n match {
      case "VARCHAR" | "TEXT" | "STRING" | "JSON" => StringType
      case "TINYINT" | "INT1" => ByteType
      case "SMALLINT" | "INT2" => ShortType
      case "INTEGER" | "INT" | "INT4" | "SIGNED" => IntegerType
      case "BIGINT" | "INT8" => LongType
      case "HUGEINT" => DecimalType(38, 0)
      case "UBIGINT" => DecimalType(20, 0)
      case "UINTEGER" => LongType
      case "FLOAT" | "REAL" | "FLOAT4" => FloatType
      case "DOUBLE" | "FLOAT8" => DoubleType
      case "BOOLEAN" | "BOOL" => BooleanType
      case "DATE" => DateType
      case "TIMESTAMP" | "DATETIME" => TimestampType
      case "BLOB" | "BINARY" => BinaryType
      case other => DataType.fromDDL(other) // DECIMAL(p,s) etc.
    }
  }

  private def schemaOf(node: JsonNode): DataType =
    if (node.isTextual) typeOf(node.asText)
    else if (node.isArray) {
      if (node.size != 1)
        throw new IllegalArgumentException(
          "json_transform structure arrays must hold exactly one element")
      ArrayType(schemaOf(node.get(0)))
    } else if (node.isObject) {
      if (node.isEmpty)
        throw new IllegalArgumentException(
          "Binder Error: Empty object in JSON structure")
      val it = node.fields()
      val fields = scala.collection.mutable.ArrayBuffer[StructField]()
      while (it.hasNext) {
        val e = it.next()
        fields += StructField(e.getKey, schemaOf(e.getValue))
      }
      StructType(fields.toSeq)
    } else throw new IllegalArgumentException(
      s"invalid json_transform structure node: $node")

  def transformExpr(es: Seq[Expression], strict: Boolean): Expression = {
    require(es.length == 2, "json_transform expects (json, structure)")
    require(es(1).foldable, "json_transform structure must be a literal")
    val schema = schemaOf(mapper.readTree(litString(es(1), "structure")))
    val opts = if (strict) Map("mode" -> "FAILFAST") else Map.empty[String, String]
    schema match {
      case _: StructType | _: ArrayType =>
        JsonToStructs(schema, opts, es.head)
      case scalar => // wrap: from_json needs a container; unwrap after
        org.apache.spark.sql.catalyst.expressions.GetStructField(
          JsonToStructs(StructType(Seq(StructField("v", scalar))), opts,
            org.apache.spark.sql.catalyst.expressions.Concat(Seq(
              Literal("{\"v\":"), es.head, Literal("}")))), 0, Some("v"))
    }
  }

  // ---- json_serialize_sql --------------------------------------------------

  def serializeExpr(spark: SparkSession, es: Seq[Expression]): Expression = {
    require(es.nonEmpty, "json_serialize_sql expects a SQL string")
    val sql = litString(es.head, "sql")
    val doc =
      try {
        val plan = spark.sessionState.sqlParser.parsePlan(sql)
        val node = mapper.createObjectNode()
        node.put("error", false)
        val stmts = node.putArray("statements")
        val st = stmts.addObject()
        st.put("sql", sql)
        st.set("plan", mapper.readTree(plan.toJSON))
        mapper.writeValueAsString(node)
      } catch {
        case e: Exception =>
          val node = mapper.createObjectNode()
          node.put("error", true)
          node.put("error_type", "parser")
          node.put("error_message", String.valueOf(e.getMessage).take(500))
          mapper.writeValueAsString(node)
      }
    Literal(doc)
  }

  def deserializeExpr(es: Seq[Expression]): Expression = {
    require(es.nonEmpty, "json_deserialize_sql expects a serialized document")
    val doc = mapper.readTree(litString(es.head, "document"))
    if (doc.path("error").asBoolean(false))
      throw new IllegalArgumentException(
        "json_deserialize_sql: document carries a parse error: " +
          doc.path("error_message").asText(""))
    val stmts = doc.path("statements")
    if (!stmts.isArray || stmts.size == 0)
      throw new IllegalArgumentException(
        "json_deserialize_sql: no statements in document")
    Literal(stmts.get(0).path("sql").asText())
  }
}
