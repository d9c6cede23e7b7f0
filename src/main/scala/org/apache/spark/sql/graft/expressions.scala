package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-internal expressions for the graft engine.
  *
  * This package lives under `org.apache.spark.sql` to reach Spark's
  * `private[sql]` extension surface (AbstractDataType, ExpressionUtils) —
  * the standard pattern for Spark extension libraries. Public DSL wrappers
  * are re-exported from `graft.functions`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

// ---------------------------------------------------------------------------
// Vector math over ArrayType(FloatType) embeddings.
//
// Capability parity with the reference's list vector functions
// (/root/reference/extension/core_functions/scalar/list/
//  list_cosine_similarity.cpp, list_distance.cpp, list_inner_product.cpp),
// re-expressed as codegen'd Catalyst expressions: the generated Java loop
// stays inside whole-stage codegen — no boxing, no UDF serialization. This
// is the hot path of the ANN / near-dup operators at 100 TB scale.
// Accumulation in double (the reference promotes to the widest type too).
// ---------------------------------------------------------------------------

abstract class BinaryVectorExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def compute(a: ArrayData, b: ArrayData, n: Int): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    compute(a, b,
      BinaryVectorExpression.checkedLength(a.numElements(), b.numElements(), prettyName))
  }

  // all loop locals come from freshName: Janino rejects a variable name
  // reused by sibling expression snippets in the same generated method
  protected def loopCode(ctx: CodegenContext, a: String, b: String, n: String,
      result: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      s"""
         |int $n = org.apache.spark.sql.graft.BinaryVectorExpression.checkedLength(
         |  $a.numElements(), $b.numElements(), "$prettyName");
         |${loopCode(ctx, a, b, n, ev.value.toString)}
       """.stripMargin
    })
}

object BinaryVectorExpression {
  /** The reference errors on mismatched list sizes
    * (extension/core_functions/scalar/list/list_cosine_similarity.cpp);
    * silently truncating to min(len) would turn an upstream dimension bug
    * into plausible-but-wrong similarity scores.
    */
  def checkedLength(na: Int, nb: Int, fn: String): Int = {
    if (na != nb) throw new IllegalArgumentException(
      s"$fn: vector length mismatch ($na vs $nb)")
    na
  }
}

/** Inner product: reference list_inner_product. */
case class VecDot(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "vec_dot"
  protected def compute(a: ArrayData, b: ArrayData, n: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
  protected def loopCode(ctx: CodegenContext, a: String, b: String, n: String,
      result: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
    s"""double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);
       |}
       |$result = $acc;""".stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Cosine similarity: reference list_cosine_similarity. If either vector is
  * all-zero the result is NaN (0/0, matching the reference's double math —
  * it applies no zero-norm guard either); callers that need a defined value
  * for zero vectors should wrap with nanvl().
  */
case class VecCosine(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "vec_cosine_similarity"
  protected def compute(a: ArrayData, b: ArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / math.sqrt(na * nb)
  }
  protected def loopCode(ctx: CodegenContext, a: String, b: String, n: String,
      result: String): String = {
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
    val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    s"""double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = (double)$a.getFloat($i); double $y = (double)$b.getFloat($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |$result = $dot / java.lang.Math.sqrt($na * $nb);""".stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Euclidean (L2) distance: reference list_distance. */
case class VecL2(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "vec_l2_distance"
  protected def compute(a: ArrayData, b: ArrayData, n: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    math.sqrt(acc)
  }
  protected def loopCode(ctx: CodegenContext, a: String, b: String, n: String,
      result: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    s"""double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = (double)$a.getFloat($i) - (double)$b.getFloat($i);
       |  $acc += $d * $d;
       |}
       |$result = java.lang.Math.sqrt($acc);""".stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** L2 norm of one vector. */
case class VecNorm(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "vec_norm"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0
    while (i < a.numElements()) {
      val x = a.getFloat(i).toDouble; acc += x * x; i += 1
    }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $x = (double)$a.getFloat($i); $acc += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

// ---------------------------------------------------------------------------
// String similarity — kernels live in graft.functions.StringSim; codegen is
// a static call so whole-stage codegen spans are preserved.
// Reference: extension/core_functions/scalar/string/{jaccard,jaro_winkler,
// damerau_levenshtein,hamming}.cpp
// ---------------------------------------------------------------------------

abstract class StaticStringSimExpr extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def nullIntolerant: Boolean = true
  protected def method: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $method($a, $b);")
}

case class JaroWinkler(left: Expression, right: Expression) extends StaticStringSimExpr {
  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType
  protected def method: String = "graft.functions.StringSim.jaroWinkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.StringSim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class DamerauLevenshtein(left: Expression, right: Expression) extends StaticStringSimExpr {
  override def prettyName: String = "damerau_levenshtein"
  override def dataType: DataType = LongType
  protected def method: String = "graft.functions.StringSim.damerauLevenshtein"
  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.StringSim.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class JaccardChars(left: Expression, right: Expression) extends StaticStringSimExpr {
  override def prettyName: String = "jaccard_sim"
  override def dataType: DataType = DoubleType
  protected def method: String = "graft.functions.StringSim.jaccard"
  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.StringSim.jaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 64-bit SimHash over a token array (Charikar 2002, the standard
  * near-dup sketch): per-token md5 → 64-bit hash, bitwise majority vote.
  * Kernel in graft.functions.TextHash; codegen is a static call.
  */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "simhash64"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    graft.functions.TextHash.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.simhash64($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Unicode helpers — reference src/function/scalar/string (strip_accents,
  * nfc_normalize): NFD-decompose + drop combining marks, and NFC
  * normalization. Spark has no native equivalents.
  */
case class StripAccents(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "strip_accents"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(StripAccents.strip(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  org.apache.spark.sql.graft.StripAccents.strip($a.toString()));""".stripMargin)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
object StripAccents {
  def strip(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "")
}

case class NfcNormalize(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "nfc_normalize"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($a.toString(), java.text.Normalizer.Form.NFC));""".stripMargin)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Full MinHash signature of a text column in ONE pass: per k-shingle
  * 60-bit md5 base hash, n minhashes derived by XOR masks (same family as
  * graft.pipeline.Dedup's SQL formulation, which the DuckDB oracle
  * mirrors — results are bit-identical). Replaces a transform/md5/conv/
  * substring expression chain whose interpreted per-shingle evaluation
  * dominated the dedup benchmark; the kernel is a tight Java loop with a
  * reused digest (graft.functions.TextHash.minhashSignature).
  */
case class MinhashSignature(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "minhash_signature"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    graft.functions.TextHash.minhashSignature(v.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHash.minhashSignature($a, $k, $numHashes);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** gcd/lcm on BIGINT — reference extension/core_functions/scalar/math
  * (GreatestCommonDivisorFun/LeastCommonMultipleFun); Spark has no native
  * equivalent.
  */
case class Gcd(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "gcd"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    Gcd.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.Gcd.compute($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object Gcd {
  // Euclid in the NEGATIVE domain so |Long.MinValue| never overflows
  // (math.abs(Long.MinValue) is negative, which used to leak a negative
  // gcd out of the loop for gcd(MinValue, odd))
  def compute(a: Long, b: Long): Long = {
    var x = if (a > 0) -a else a
    var y = if (b > 0) -b else b
    while (y != 0) { val t = x % y; x = y; y = t }
    if (x == Long.MinValue)
      throw new ArithmeticException("gcd: result out of range")
    -x
  }
}

object Lcm {
  // overflow errors like the reference's lcm (TryMultiplyOperator)
  def compute(a: Long, b: Long): Long = {
    if (a == 0 || b == 0) return 0
    val g = Gcd.compute(a, b)
    math.abs(Math.multiplyExact(a / g, b))
  }
}

case class Lcm(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "lcm"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    Lcm.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.Lcm.compute($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Hamming distance; errors on empty or unequal-length inputs like the
  * reference (hamming.cpp / Mismatch Function).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "hamming_distance"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input); val b = right.eval(input)
    if (a == null || b == null) null
    else graft.functions.StringSim.hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val la = left.genCode(ctx); val ra = right.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    ev.copy(code =
      code"""
         |${la.code}
         |${ra.code}
         |boolean ${ev.isNull} = true;
         |long ${ev.value} = -1L;
         |if (!${la.isNull} && !${ra.isNull}) {
         |  java.lang.Long $boxed = graft.functions.StringSim.hamming(${la.value}, ${ra.value});
         |  if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
         |}
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** RFC 7386 JSON Merge Patch — the reference's `json_merge_patch`
  * (`/root/reference/extension/json/json_functions/json_merge_patch.cpp`):
  * a null in the patch deletes the key, nested objects merge recursively,
  * anything else replaces. Serialization is compact with insertion order
  * preserved (original keys first, patch-added keys appended) — the same
  * rendering the reference produces, so results compare byte-identical.
  */
/** RFC 7386 merge patch with the reference's NULL semantics
  * (`json_merge_patch.cpp` via the corpus): a SQL NULL patch nulls the
  * result; a SQL NULL target means "undefined" and the patch applies to
  * nothing (its null members stripped). Chained variadic calls fold left
  * through the registry, so `(a, NULL, c)` = `c` with nulls stripped.
  */
case class JsonMergePatch(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "json_merge_patch"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val p = right.eval(input)
    if (p == null) return null
    val t = left.eval(input)
    UTF8String.fromString(JsonMergePatch.merge(
      if (t == null) null else t.asInstanceOf[UTF8String].toString,
      p.asInstanceOf[UTF8String].toString))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val tmp = ctx.freshName("mpTarget")
    ev.copy(code = code"""
      |${r.code}
      |boolean ${ev.isNull} = ${r.isNull};
      |org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
      |if (!${ev.isNull}) {
      |  ${l.code}
      |  String $tmp = ${l.isNull} ? null : ${l.value}.toString();
      |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
      |    org.apache.spark.sql.graft.JsonMergePatch.merge($tmp, ${r.value}.toString()));
      |}
      |""".stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object JsonMergePatch {
  import com.fasterxml.jackson.databind.JsonNode
  import com.fasterxml.jackson.databind.node.ObjectNode
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def merge(target: String, patch: String): String =
    mapper.writeValueAsString(mergeNodes(
      if (target == null) null else mapper.readTree(target),
      mapper.readTree(patch)))

  private def mergeNodes(target: JsonNode, patch: JsonNode): JsonNode =
    if (!patch.isObject) patch
    else {
      // reference key order (json_merge_patch.cpp builder): target keys
      // the patch doesn't touch FIRST, then the patch's keys in patch
      // order — a key present in both renders at its patch position
      val out = mapper.createObjectNode()
      if (target != null && target.isObject) {
        val it = target.fields()
        while (it.hasNext) {
          val e = it.next()
          if (!patch.has(e.getKey)) out.set[JsonNode](e.getKey, e.getValue)
        }
      }
      val it = patch.fields()
      while (it.hasNext) {
        val e = it.next()
        if (!e.getValue.isNull)
          out.set[JsonNode](e.getKey, mergeNodes(
            if (target != null && target.isObject) target.get(e.getKey) else null,
            e.getValue))
      }
      out
    }
}

/** Hyperplane-LSH bucket code (SimHash-for-cosine) as ONE codegen'd
  * kernel — semantically identical to the planes×dims element_at
  * expression chain it replaces (graft.pipeline.Similarity's SQL
  * formulation, sign matrix pinned by PipelineSpec), but constant-size in
  * the plan: the chain's ~400-node tree per band made Catalyst analysis
  * and janino compilation the dominant cost of every LSH query.
  */
case class LshBucket(child: Expression, planes: Int, dims: Int, seed: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "lsh_bucket"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(v: Any): Any =
    graft.functions.VecHash.lshBucket(
      v.asInstanceOf[ArrayData], planes, dims, seed, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecHash.lshBucket($a, $planes, $dims, $seed, $isFloat);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** IEEE-754 nextafter — reference core_functions `nextafter(a, b)`
  * (`extension/core_functions/scalar/math/numeric.cpp`): the next
  * representable double from `a` toward `b`. No Spark native.
  */
case class NextAfter(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "nextafter"
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    Math.nextAfter(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = Math.nextAfter($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** UUID v7 (time-ordered, RFC 9562) — the reference's `uuidv7()`
  * (`src/common/types/uuid.cpp`): 48-bit unix-epoch millis, then version
  * and variant bits over random payload. Nondeterministic by nature.
  */
case class UuidV7() extends LeafExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "uuidv7"
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = {
    val r = java.util.concurrent.ThreadLocalRandom.current()
    val ms = System.currentTimeMillis()
    val hi = (ms << 16) | 0x7000L | (r.nextLong() & 0x0fffL) // 48b time | ver 7 | 12b rand
    val lo = (r.nextLong() & 0x3fffffffffffffffL) | 0x8000000000000000L // variant 10
    UTF8String.fromString(new java.util.UUID(hi, lo).toString)
  }
}

/** All four text-quality metrics in one traversal — the column
  * formulation (pipeline.TextAnalysis) re-split and re-regexed the text
  * once per metric; this kernel computes n_tokens / avg_word_len /
  * punct_ratio / composite quality with identical semantics (the DuckDB
  * oracle pins them) in a single pass per row.
  */
case class TextQualityStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "text_quality_stats"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  // punct_ratio/quality are null for empty text (zero-divisor Divide in
  // the column formulation yields NULL) — the double fields must be nullable.
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("avg_word_len", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = true),
    StructField("quality", DoubleType, nullable = true)))
  override def nullIntolerant: Boolean = true
  @transient private lazy val stopArr: Array[String] = stopwords.toArray
  override def nullSafeEval(v: Any): Any =
    graft.functions.TextMetrics.stats(v.asInstanceOf[UTF8String], stopArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwords", stopArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextMetrics.stats($a, $ref);")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `json_structure` — the reference's structure inference
  * (`/root/reference/extension/json/json_functions/json_structure.cpp`):
  * scalars map to JSON type names (uint literal → UBIGINT, signed →
  * BIGINT, real → DOUBLE, string → VARCHAR, bool → BOOLEAN, null →
  * NULL); array elements MERGE into one structure (numerics promote
  * DOUBLE > HUGEINT > BIGINT, NULL absorbs into anything);
  * irreconcilable types render as "JSON", as does an empty object.
  * Returns NULL on malformed input.
  */
case class JsonStructure(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "json_structure"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    JsonShape.structure(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = org.apache.spark.sql.graft.JsonShape.structure($a.toString());
      |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `json_pretty` — the reference's pretty printer
  * (`/root/reference/extension/json/json_functions/json_pretty.cpp`,
  * yyjson YYJSON_WRITE_PRETTY): 4-space indent, `"key": value`, one
  * element per line, empty containers stay inline. Number literals are
  * preserved verbatim from the input (yyjson re-canonicalizes doubles;
  * preserving the source text is the lossless choice and identical for
  * already-canonical values). Returns NULL on malformed input.
  */
case class JsonPretty(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "json_pretty"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    JsonShape.pretty(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = org.apache.spark.sql.graft.JsonShape.pretty($a.toString());
      |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object JsonShape {
  import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
  import com.fasterxml.jackson.databind.JsonNode
  import scala.collection.mutable

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val factory = new JsonFactory()

  // ---- json_structure ----------------------------------------------------

  private val Numerics = Set("UBIGINT", "BIGINT", "HUGEINT", "DOUBLE")
  // v1.0 lattice (the oracle's): DOUBLE > HUGEINT > BIGINT. Reference
  // HEAD additionally widens BIGINT+UBIGINT → HUGEINT
  // (json_structure.cpp MaxNumericType); the oracle predates that, and
  // the merged-sign case must gate-match, so 1.0 semantics win here.
  private def maxNumeric(a: String, b: String): String =
    if (a == "DOUBLE" || b == "DOUBLE") "DOUBLE"
    else if (a == "HUGEINT" || b == "HUGEINT") "HUGEINT"
    else "BIGINT"

  private final class Desc(var tpe: String) {
    var elem: Node = _                                      // LIST child
    val fields = mutable.LinkedHashMap.empty[String, Node]  // STRUCT children
  }
  private final class Node {
    val descs = mutable.ArrayBuffer.empty[Desc]
    // reference GetOrCreateDescription: NULL absorbs, numerics promote,
    // anything else accumulates a second description (rendered "JSON")
    def getOrCreate(t: String): Desc = {
      if (descs.isEmpty) { descs += new Desc(t); return descs.last }
      if (descs.length == 1 && descs.head.tpe == "NULL") {
        descs.head.tpe = t; return descs.head
      }
      if (t == "NULL") return descs.last
      descs.find(_.tpe == t) match {
        case Some(d) => d
        case None =>
          descs.find(d => Numerics(t) && Numerics(d.tpe)) match {
            case Some(d) => d.tpe = maxNumeric(t, d.tpe); d
            case None => descs += new Desc(t); descs.last
          }
      }
    }
  }

  private def numberType(n: JsonNode): String =
    if (n.isFloatingPointNumber) "DOUBLE"
    else if (n.canConvertToLong) { if (n.asLong() < 0) "BIGINT" else "UBIGINT" }
    else {
      val big = n.bigIntegerValue()
      if (big.signum() >= 0 && big.bitLength() <= 64) "UBIGINT" else "DOUBLE"
    }

  private def extract(node: Node, v: JsonNode): Unit =
    if (v.isNull) { node.getOrCreate("NULL"); () }
    else if (v.isBoolean) { node.getOrCreate("BOOLEAN"); () }
    else if (v.isNumber) { node.getOrCreate(numberType(v)); () }
    else if (v.isTextual) { node.getOrCreate("VARCHAR"); () }
    else if (v.isArray) {
      val d = node.getOrCreate("LIST")
      if (d.tpe == "LIST") {
        if (d.elem == null) d.elem = new Node
        val it = v.elements()
        while (it.hasNext) extract(d.elem, it.next())
      }
    } else {
      val d = node.getOrCreate("STRUCT")
      if (d.tpe == "STRUCT") {
        val it = v.fields()
        while (it.hasNext) {
          val e = it.next()
          extract(d.fields.getOrElseUpdate(e.getKey, new Node), e.getValue)
        }
      }
    }

  private def render(node: Node): JsonNode =
    if (node == null || node.descs.isEmpty) mapper.getNodeFactory.textNode("NULL")
    else if (node.descs.length != 1) mapper.getNodeFactory.textNode("JSON")
    else node.descs.head match {
      case d if d.tpe == "LIST" =>
        val arr = mapper.createArrayNode(); arr.add(render(d.elem)); arr
      case d if d.tpe == "STRUCT" =>
        if (d.fields.isEmpty) mapper.getNodeFactory.textNode("JSON")
        else {
          val obj = mapper.createObjectNode()
          d.fields.foreach { case (k, c) => obj.set[JsonNode](k, render(c)) }
          obj
        }
      case d => mapper.getNodeFactory.textNode(d.tpe)
    }

  def structure(json: String): UTF8String =
    try {
      val root = new Node
      extract(root, mapper.readTree(json))
      UTF8String.fromString(mapper.writeValueAsString(render(root)))
    } catch { case _: Exception => null }

  // ---- json_pretty -------------------------------------------------------

  private def escape(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  def pretty(json: String): UTF8String =
    try {
      val p = factory.createParser(json)
      val sb = new java.lang.StringBuilder
      def indent(n: Int): Unit = { var i = 0; while (i < n) { sb.append("    "); i += 1 } }
      def value(tok: JsonToken, depth: Int): Unit = tok match {
        case JsonToken.START_OBJECT =>
          var t = p.nextToken()
          if (t == JsonToken.END_OBJECT) sb.append("{}")
          else {
            sb.append("{\n")
            var first = true
            while (t != JsonToken.END_OBJECT) {
              if (!first) sb.append(",\n")
              first = false
              indent(depth + 1)
              escape(sb, p.currentName())
              sb.append(": ")
              value(p.nextToken(), depth + 1)
              t = p.nextToken()
            }
            sb.append('\n'); indent(depth); sb.append('}')
          }
        case JsonToken.START_ARRAY =>
          var t = p.nextToken()
          if (t == JsonToken.END_ARRAY) sb.append("[]")
          else {
            sb.append("[\n")
            var first = true
            while (t != JsonToken.END_ARRAY) {
              if (!first) sb.append(",\n")
              first = false
              indent(depth + 1)
              value(t, depth + 1)
              t = p.nextToken()
            }
            sb.append('\n'); indent(depth); sb.append(']')
          }
        case JsonToken.VALUE_STRING => escape(sb, p.getText)
        case JsonToken.VALUE_TRUE => sb.append("true")
        case JsonToken.VALUE_FALSE => sb.append("false")
        case JsonToken.VALUE_NULL => sb.append("null")
        case _ => sb.append(p.getText) // numbers: literal text preserved
      }
      val t0 = p.nextToken()
      if (t0 == null) null
      else {
        value(t0, 0)
        if (p.nextToken() != null) null // trailing garbage
        else UTF8String.fromString(sb.toString)
      }
    } catch { case _: Exception => null }
}

// ---------------------------------------------------------------------------
// OpaqueBarrier: identity wrapper flagged nondeterministic.
//
// Purpose: block Catalyst alias substitution / constraint inference through
// a computed join key while staying INSIDE whole-stage codegen (the previous
// workaround — routing the key through a one-element explode — blocked the
// substitution too, but GenerateExec does not participate in codegen and
// forced the downstream join+aggregate pipeline onto the interpreted path).
// Evaluation is a pure passthrough; "nondeterministic" is only the optimizer
// contract that keeps rules from substituting or duplicating it.
// ---------------------------------------------------------------------------

case class OpaqueBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OpaqueBarrier =
    copy(child = newChild)
}

object OpaqueBarrier {
  def apply(c: Column): Column = Bridge.column(OpaqueBarrier(Bridge.expression(c)))
}
