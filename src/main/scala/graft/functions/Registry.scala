package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-name registration for the engine's custom functions.
  *
  * The reference registers ~580 scalar/aggregate functions
  * (`/root/reference/src/function/function_list.cpp` +
  * `extension/core_functions/function_list.cpp`); almost all map to native
  * Spark functions (SURVEY §2.8). Here we register only the genuinely
  * missing ones as Catalyst expressions so both the Column DSL and
  * spark.sql can reach them.
  */
object Registry {
  @volatile private var registered = false

  def registerAll(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.graft._
    def f1(name: String, build: Expression => Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => build(es.head), "scala_udf")
    def f2(name: String, build: (Expression, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => build(es(0), es(1)), "scala_udf")

    f2("vec_dot", VecDot(_, _))
    f2("vec_cosine_similarity", VecCosine(_, _))
    f2("vec_l2_distance", VecL2(_, _))
    f1("vec_norm", VecNorm(_))
    f2("jaro_winkler", JaroWinkler(_, _))
    f2("damerau_levenshtein", DamerauLevenshtein(_, _))
    f2("hamming_distance", HammingDistance(_, _))
    f2("jaccard_sim", JaccardChars(_, _))
    f2("gcd", Gcd(_, _))
    f2("lcm", Lcm(_, _))
    f1("strip_accents", StripAccents(_))
    f1("nfc_normalize", NfcNormalize(_))
    f2("json_merge_patch", JsonMergePatch(_, _))
    f1("json_structure", JsonStructure(_))
    f1("json_pretty", JsonPretty(_))
    f2("nextafter", NextAfter(_, _))
    reg.createOrReplaceTempFunction("uuidv7", _ => UuidV7(), "scala_udf")
    registered = true
  }
}
