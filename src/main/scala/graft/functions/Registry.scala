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
    // Overriding builtins (length/len/typeof/reduce/...) with the
    // reference's semantics is INTENDED — silence only the registry's
    // replacement notice so real warnings stay visible in bench logs.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry",
      org.apache.logging.log4j.Level.ERROR)
    val reg = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.graft._
    // arity is enforced so e.g. damerau_levenshtein('a','b','c') fails
    // analysis like the reference binder does, instead of silently
    // dropping the extra argument
    def fn(name: String, arity: Int)(build: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => {
        if (es.length != arity)
          throw new IllegalArgumentException(
            s"$name expects $arity arguments, got ${es.length}")
        build(es)
      }, "scala_udf")
    def f1(name: String, build: Expression => Expression): Unit =
      fn(name, 1)(es => build(es.head))
    def f2(name: String, build: (Expression, Expression) => Expression): Unit =
      fn(name, 2)(es => build(es(0), es(1)))

    f2("vec_dot", VecDot(_, _))
    f2("vec_cosine_similarity", VecCosine(_, _))
    f2("vec_l2_distance", VecL2(_, _))
    f1("vec_norm", VecNorm(_))
    f2("jaro_winkler", JaroWinkler(_, _))
    // optional 3rd arg = rapidfuzz score_cutoff: scores below it go to 0
    reg.createOrReplaceTempFunction("jaro_winkler_similarity",
      es => es.length match {
        case 2 => JaroWinkler(es(0), es(1))
        case 3 =>
          val jw = JaroWinkler(es(0), es(1))
          If(LessThan(jw, Cast(es(2),
            org.apache.spark.sql.types.DoubleType)), Literal(0.0), jw)
        case n => throw new IllegalArgumentException(
          s"jaro_winkler_similarity expects 2-3 args, got $n")
      }, "scala_udf")
    // timezone(tz, ts) — the ICU AT TIME ZONE function pair
    // (icu-timezone.cpp); directionality dispatches on operand type
    f2("timezone", AtTimeZone(_, _))
    f2("damerau_levenshtein", DamerauLevenshtein(_, _))
    f2("hamming_distance", HammingDistance(_, _))
    f2("jaccard_sim", JaccardChars(_, _))
    f2("gcd", Gcd(_, _))
    f2("lcm", Lcm(_, _))
    f1("strip_accents", StripAccents(_))
    f1("nfc_normalize", NfcNormalize(_))
    // variadic like the reference (RFC 7386 fold, left to right)
    reg.createOrReplaceTempFunction("json_merge_patch", es => {
      if (es.length < 2) throw new IllegalArgumentException(
        s"json_merge_patch expects >=2 args, got ${es.length}")
      es.reduceLeft(JsonMergePatch(_, _))
    }, "scala_udf")
    f1("json_structure", JsonStructure(_))
    f1("json_pretty", JsonPretty(_))
    // reference JSON extraction/inspection/modification surface
    // (jsonnav.scala); the importer lowers `->` / `->>` to
    // json_extract / json_extract_string. Paths cast to STRING so the
    // reference's integer-index overload binds too.
    val str = org.apache.spark.sql.types.StringType
    for (nm <- Seq("json_extract", "json_extract_path"))
      f2(nm, JsonNavExpr.of(_, _, "extract"))
    for (nm <- Seq("json_extract_string", "json_extract_path_text"))
      f2(nm, JsonNavExpr.of(_, _, "extract_string"))
    f2("json_value", JsonNavExpr.of(_, _, "value"))
    f1("json_valid", JsonValidExpr(_))
    f2("json_contains", JsonContainsExpr(_, _))
    f2("json_exists", JsonExistsExpr(_, _))
    f1("json_normalize", JsonUnaryExpr(_, "normalize"))
    f1("json", JsonUnaryExpr(_, "minify"))
    f1("json_strip_nulls", JsonUnaryExpr(_, "strip_nulls"))
    for (nm <- Seq("set", "insert", "replace"))
      fn(s"json_$nm", 3)(es =>
        JsonModifyExpr(es(0), Cast(es(1), str), Cast(es(2), str), nm))
    f2("json_remove", (j, p) =>
      JsonModifyExpr(j, Cast(p, str), Literal("null"), "remove"))
    f2("json_merge_patch_diff", JsonMergePatchDiffExpr(_, _))
    reg.createOrReplaceTempFunction("json_deep_merge", es => {
      if (es.length < 2) throw new IllegalArgumentException(
        s"json_deep_merge expects >=2 args, got ${es.length}")
      JsonDeepMergeExpr(es)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("json_keys", es => es.length match {
      case 1 => JsonKeysExpr(es.head, Literal("$"))
      case 2 => JsonKeysExpr.of(es(0), es(1))
      case n => throw new IllegalArgumentException(
        s"json_keys expects 1-2 args, got $n")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("json_type", es => es.length match {
      case 1 => JsonNavExpr(es.head, Literal("$"), "type")
      case 2 => JsonNavExpr.of(es(0), es(1), "type")
      case n => throw new IllegalArgumentException(
        s"json_type expects 1-2 args, got $n")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("json_array_length", es => es.length match {
      case 1 => JsonArrayLengthPath(es.head, Literal("$"))
      case 2 => JsonArrayLengthPath(es(0), es(1))
      case n => throw new IllegalArgumentException(
        s"json_array_length expects 1-2 args, got $n")
    }, "scala_udf")
    // json_group_array / json_group_object — the reference's JSON
    // aggregate macros, composed from Spark's own aggregates
    reg.createOrReplaceTempFunction("json_group_array", es => {
      if (es.length != 1) throw new IllegalArgumentException(
        s"json_group_array expects 1 arg, got ${es.length}")
      org.apache.spark.sql.catalyst.expressions.StructsToJson(
        Map.empty[String, String],
        org.apache.spark.sql.catalyst.expressions.aggregate.CollectList(es.head)
          .toAggregateExpression())
    }, "scala_udf")
    reg.createOrReplaceTempFunction("json_group_object", es => {
      if (es.length != 2) throw new IllegalArgumentException(
        s"json_group_object expects 2 args, got ${es.length}")
      import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
      // collect (key, value) ENTRIES, not two parallel lists: CollectList
      // silently drops NULL inputs, which would misalign keys and values
      // (issue23114: a NULL value must keep its entry as JSON null, a
      // NULL key must raise — MapFromEntries raises on null keys)
      org.apache.spark.sql.catalyst.expressions.StructsToJson(
        Map("ignoreNullFields" -> "false"),
        MapFromEntries(CollectList(CreateNamedStruct(Seq(
          Literal("key"), Cast(es(0), str),
          Literal("value"), es(1)))).toAggregateExpression()))
    }, "scala_udf")
    // json_object(k1, v1, ...) — reference json_create.cpp
    reg.createOrReplaceTempFunction("json_object", es => {
      if (es.length % 2 != 0) throw new IllegalArgumentException(
        "json_object expects an even number of arguments")
      JsonObjectExpr(es)
    }, "scala_udf")
    // list lambda spellings (core_functions/scalar/list): Spark's
    // transform/filter under the reference's names; list_reduce seeds
    // with the first element and folds the rest (list_reduce.cpp).
    // The reference's optional second lambda parameter is a 1-BASED
    // index (lambda_functions.cpp) where Spark supplies 0-based —
    // rewrite index references in the body to (i + 1).
    def oneBasedIdx(lam: Expression): Expression = lam match {
      case LambdaFunction(body, args, hidden) if args.length == 2 =>
        val idxName = args(1) match {
          case u: UnresolvedNamedLambdaVariable => u.nameParts.map(_.toLowerCase)
          case n => Seq(n.name.toLowerCase)
        }
        // manual recursion (not transformUp): a nested lambda that
        // rebinds the same index name shadows ours — its references
        // must NOT be shifted (they get their own +1 when that nested
        // call's oneBasedIdx runs)
        def shadows(lf: LambdaFunction): Boolean = lf.arguments.exists {
          case u: UnresolvedNamedLambdaVariable =>
            u.nameParts.map(_.toLowerCase) == idxName
          case n => Seq(n.name.toLowerCase) == idxName
        }
        def rewrite(e: Expression): Expression = e match {
          case lf: LambdaFunction if shadows(lf) => lf
          case u: UnresolvedNamedLambdaVariable
              if u.nameParts.map(_.toLowerCase) == idxName =>
            Add(u, Literal(1))
          case other => other.mapChildren(rewrite)
        }
        LambdaFunction(rewrite(body), args, hidden)
      case other => other
    }
    // a bare NULL list yields SQL NULL in the reference; Spark's HOFs
    // fail analysis on the untyped NULL, so it is retyped to a NULL
    // list (the HOF itself then evaluates to NULL, and the analyzer
    // still sees a higher-order function consuming the lambda)
    def fixNullList(e: Expression): Expression = e match {
      case Literal(null, org.apache.spark.sql.types.NullType) =>
        Literal.create(null, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.NullType))
      case other => other
    }
    for (nm <- Seq("list_transform", "array_transform", "list_apply",
        "array_apply", "apply"))
      f2(nm, (a, l) => ArrayTransform(fixNullList(a), oneBasedIdx(l)))
    for (nm <- Seq("list_filter", "array_filter"))
      f2(nm, (a, l) => ArrayFilter(fixNullList(a), oneBasedIdx(l)))
    for (nm <- Seq("list_reduce", "array_reduce", "reduce"))
      f2(nm, (arr0, lam) => { val arr = fixNullList(arr0)
        val fin = UnresolvedNamedLambdaVariable(Seq("acc_fin"))
        ArrayAggregate(
          Slice(arr, Literal(2), Subtract(Size(arr), Literal(1))),
          ElementAt(arr, Literal(1)),
          lam.asInstanceOf[LambdaFunction],
          LambdaFunction(fin, Seq(fin)))
      })
    // map_contains_entry(m, k, v) — entry-wise membership
    fn("map_contains_entry", 3)(es =>
      ArrayContains(MapEntries(es(0)),
        CreateNamedStruct(Seq(Literal("key"), es(1), Literal("value"), es(2)))))
    f2("map_contains_value", (m, v) => ArrayContains(MapValues(m), v))
    // explicit double casts so NULL/int literals resolve like the
    // reference's implicit numeric->double binding
    f2("nextafter", (a, b) =>
      NextAfter(Cast(a, org.apache.spark.sql.types.DoubleType),
        Cast(b, org.apache.spark.sql.types.DoubleType)))
    reg.createOrReplaceTempFunction("uuidv7", _ => UuidV7(), "scala_udf")
    // uuid_extract_version/_timestamp (reference uuid.cpp;
    // test_uuid_function.test): version = hex nibble 13 of the
    // canonical text; v7 timestamp = leading 48 bits as epoch millis.
    // Composed from codegen'd builtins — no custom kernel needed.
    locally {
      import org.apache.spark.sql.types.{IntegerType, LongType, StringType => STR}
      def ver(e: Expression): Expression =
        Cast(Conv(Substring(Cast(e, STR), Literal(15), Literal(1)),
          Literal(16), Literal(10)), IntegerType)
      f1("uuid_extract_version", ver(_))
      f1("uuid_extract_timestamp", e => {
        val s = Cast(e, STR)
        val ms = Cast(Conv(Concat(Seq(Substring(s, Literal(1), Literal(8)),
          Substring(s, Literal(10), Literal(4)))),
          Literal(16), Literal(10)), LongType)
        If(EqualTo(ver(s), Literal(7)), MillisToTimestamp(ms),
          Cast(RaiseError(Concat(Seq(
            Literal("Invalid Input Error: Given UUID is with version "),
            Cast(ver(s), STR), Literal(", not version 7.")))),
            org.apache.spark.sql.types.TimestampType))
      })
    }

    // sequence scalar surface (graft.functions.Sequences) — the name must
    // be a constant, like the reference binder
    // (test_sequence.test: "must be a constant expression")
    val seqKey = Sequences.sessionKey(spark)
    def seqName(e: Expression, fn: String): Option[String] = e match {
      case Literal(null, _) => None
      case Literal(u: org.apache.spark.unsafe.types.UTF8String, _) =>
        Some(u.toString)
      case _ =>
        // constant EXPRESSIONS bind too ('s'||'e'||'q' in
        // test_sequence.test); anything row-dependent is the binder error
        val const = try e.resolved && e.foldable catch { case _: Throwable => false }
        if (!const) throw new IllegalArgumentException(
          s"Binder Error: $fn: the sequence name must be a constant expression")
        e.eval(null) match {
          case null => None
          case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
          case other => Some(String.valueOf(other))
        }
    }
    f1("nextval", e => SeqValExpr(seqKey, "nextval", seqName(e, "nextval"), Nil))
    f1("currval", e => SeqValExpr(seqKey, "currval", seqName(e, "currval"), Nil))
    reg.createOrReplaceTempFunction("setval", es => es.length match {
      case 2 | 3 => SeqValExpr(seqKey, "setval", seqName(es.head, "setval"), es.tail)
      case n => throw new IllegalArgumentException(
        s"setval expects 2-3 args, got $n")
    }, "scala_udf")

    // ---- reference SQL-name compatibility surface, pinned by the
    // imported sqllogictest corpus (src/test/resources/sql/ref/) ----
    // string similarity spellings (function_list.cpp)
    f2("jaccard", JaccardChars(_, _))
    f2("mismatches", HammingDistance(_, _))
    f2("hamming", HammingDistance(_, _))
    f2("editdist3", Levenshtein(_, _))
    // prefix/suffix predicates
    f2("prefix", StartsWith(_, _))
    f2("suffix", EndsWith(_, _))
    f2("starts_with", StartsWith(_, _))
    // codepoint functions: reference chr/unicode are full-Unicode
    // (Spark's chr is ASCII-mod-256, hence the shadow)
    f1("chr", CodePointChr(_))
    f1("unicode", FirstCodePoint(_))
    f1("ord", FirstCodePoint(_))
    // hex spellings (Spark: hex/unhex); from_hex errors on non-hex
    // input like the reference (Spark's lenient unhex returns NULL)
    f1("to_hex", Hex(_))
    f1("from_hex", Unhex(_, failOnError = true))
    reg.createOrReplaceTempFunction("to_base", es => es.length match {
      case 2 => ToBase(es(0), es(1), Literal(0))
      case 3 => ToBase(es(0), es(1), es(2))
      case n => throw new IllegalArgumentException(
        s"to_base expects 2 or 3 arguments, got $n")
    }, "scala_udf")
    fn("binom", 2)(es => Binom(es(0), es(1)))
    // fmod/fdiv under SET ieee_floating_point_ops=false: floored
    // division/modulo with NULL (not error) on zero divisor. Spark's
    // Pmod only corrects negative remainders (assumes positive
    // modulus), so floored mod is composed from Remainder directly:
    // r when sign(r) in {0, sign(y)}, else r + y
    def nullIfZeroDiv(y: Expression, e: Expression): Expression =
      If(EqualTo(y, Literal(0)),
        Literal.create(null, org.apache.spark.sql.types.NullType), e)
    def flooredMod(x: Expression, y: Expression): Expression = {
      val r = Remainder(x, y)
      If(Or(EqualTo(r, Literal(0)), EqualTo(Signum(r), Signum(y))),
        r, Add(r, y))
    }
    f2("fmod", (x, y) => nullIfZeroDiv(y, flooredMod(x, y)))
    f2("fdiv", (x, y) => nullIfZeroDiv(y, Floor(Divide(x, y))))
    // reference mod() returns NULL on zero divisor (ANSI Spark errors);
    // C-style sign-of-dividend = Spark's Remainder
    f2("mod", (x, y) => nullIfZeroDiv(y, Remainder(x, y)))
    // operator-function aliases (function_list.cpp "+","-",...)
    f2("add", Add(_, _))
    f2("subtract", Subtract(_, _))
    f2("multiply", Multiply(_, _))
    f2("divide", Divide(_, _))
    f2("xor", BitwiseXor(_, _))
    // regex options arg ('i' case-insensitive, 's' dotall, 'm'/'n'/'p'
    // newline-sensitive, 'l' literal, 'c' the case-sensitive default)
    // folded into the pattern at bind time; 'g' and unknown letters are
    // binder errors like the reference's (re_functions.cpp options parse)
    def withOpts(p: Expression, opts: Expression): Expression = opts match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
        val o = s.toString.filterNot(_.isWhitespace) // spaces/tabs separate options
        o.find(c => !"cilmnps".contains(c)).foreach { c =>
          throw new IllegalArgumentException(
            if (c == 'g') "the 'g' modifier is only valid for regexp_replace"
            else s"unrecognized regex option '$c'")
        }
        if (o.contains('l'))
          Concat(Seq(Literal.create("\\Q", org.apache.spark.sql.types.StringType),
            p, Literal.create("\\E", org.apache.spark.sql.types.StringType)))
        else {
          val flags = o.flatMap {
            case 'i' => "i"
            case 's' => "s"
            case 'm' | 'n' | 'p' => "m"
            case _ => "" // 'c' is the default
          }.distinct
          if (flags.isEmpty) p
          else Concat(Seq(Literal.create(s"(?$flags)",
            org.apache.spark.sql.types.StringType), p))
        }
      case _ => throw new IllegalArgumentException(
        "regex options must be a literal string")
    }
    f2("icu_sort_key", IcuSortKey(_, _))
    // printf: Spark's format_string feeds its Decimal wrapper straight
    // to java.util.Formatter, which rejects %f — coerce (printf.cpp)
    reg.createOrReplaceTempFunction("printf", es => {
      if (es.isEmpty) throw new IllegalArgumentException("printf expects arguments")
      GraftPrintf(es)
    }, "scala_udf")
    // regexp_replace: the reference replaces the FIRST match unless the
    // 'g' option is given (re_functions.cpp) — Spark's builtin replaces
    // all, so override with the reference-semantics expression
    reg.createOrReplaceTempFunction("regexp_replace", es => es.length match {
      case 3 => GraftRegexpReplace(es(0), es(1), es(2),
        Literal.create("", org.apache.spark.sql.types.StringType))
      case 4 => GraftRegexpReplace(es(0), es(1), es(2), es(3))
      case n => throw new IllegalArgumentException(
        s"regexp_replace expects 3-4 args, got $n")
    }, "scala_udf")
    // regexp_matches = partial-match boolean (re_functions.cpp) = RLIKE,
    // with an optional options arg; regexp_full_match anchors the string
    reg.createOrReplaceTempFunction("regexp_matches", es => es.length match {
      case 2 => RLike(es(0), es(1))
      case 3 => RLike(es(0), withOpts(es(1), es(2)))
      case n => throw new IllegalArgumentException(
        s"regexp_matches expects 2-3 args, got $n")
    }, "scala_udf")
    def anchored(p: Expression): Expression = Concat(Seq(
      Literal.create("^(?:", org.apache.spark.sql.types.StringType), p,
      Literal.create(")$", org.apache.spark.sql.types.StringType)))
    reg.createOrReplaceTempFunction("regexp_full_match", es => es.length match {
      case 2 => RLike(es(0), anchored(es(1)))
      case 3 => RLike(es(0), anchored(withOpts(es(1), es(2))))
      case n => throw new IllegalArgumentException(
        s"regexp_full_match expects 2-3 args, got $n")
    }, "scala_udf")
    // strlen = byte length (reference length.cpp octet variant)
    f1("strlen", OctetLength(_))
    // error('msg') raises like the reference's error() (generic pack)
    f1("error", RaiseError(_))
    // reference factorial/log-family error on domain violations where
    // Spark returns NULL/NaN; reference 1-arg log IS log10
    f1("factorial", GraftFactorial(_))
    f1("ln", CheckedMathFn("ln", _))
    f1("log10", CheckedMathFn("log10", _))
    f1("log2", CheckedMathFn("log2", _))
    f1("sqrt", CheckedMathFn("sqrt", _))
    reg.createOrReplaceTempFunction("log", es => es.length match {
      case 1 => CheckedMathFn("log10", es.head)
      case 2 => Logarithm(es(0), es(1))
      case n => throw new IllegalArgumentException(
        s"log expects 1 or 2 arguments, got $n")
    }, "scala_udf")
    // split_part divergences: part 0 returns '' in the reference
    // (Spark errors); empty separator splits into characters
    fn("split_part", 3)(es =>
      If(EqualTo(es(2), Literal(0)),
        Literal.create("", org.apache.spark.sql.types.StringType),
        If(EqualTo(es(1), Literal.create("", org.apache.spark.sql.types.StringType)),
          Substring(es(0), es(2), Literal(1)),
          SplitPart(es(0), es(1), es(2)))))
    // 2-arg ltrim/rtrim: reference order is (str, trimChars); Spark's
    // SQL surface reverses them
    reg.createOrReplaceTempFunction("ltrim", es => es.length match {
      case 1 => StringTrimLeft(es(0))
      case 2 => StringTrimLeft(es(0), es(1))
      case n => throw new IllegalArgumentException(s"ltrim expects 1-2 args, got $n")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("rtrim", es => es.length match {
      case 1 => StringTrimRight(es(0))
      case 2 => StringTrimRight(es(0), es(1))
      case n => throw new IllegalArgumentException(s"rtrim expects 1-2 args, got $n")
    }, "scala_udf")
    // reference regexp_extract: default group 0, missing group -> '',
    // optional 4th options arg; the group index must be constant (the
    // reference resolves the capture slot at bind time, so a per-row
    // index is a Binder Error — the pattern itself may be per-row)
    def constantIdx(idx: Expression): Unit = {
      if (!idx.foldable)
        throw new IllegalArgumentException(
          "regexp_extract group index must be a constant expression")
      // the reference has no VARCHAR->INT implicit cast here: a string
      // group index is a binder error, not a runtime cast
      val integral = try {
        {
          import org.apache.spark.sql.types._
          idx.dataType match {
            case ByteType | ShortType | IntegerType | LongType | NullType => true
            case _ => false
          }
        }
      } catch { case _: Exception => true } // unresolved: let analysis decide
      if (!integral)
        throw new IllegalArgumentException(
          "regexp_extract group index must be an integer")
    }
    // a NULL group index yields '' (not NULL) in the reference, though
    // NULL subject/pattern still null-propagate
    def extractWith(s: Expression, p: Expression, idx: Expression): Expression = {
      constantIdx(idx)
      idx match {
        case Literal(null, _) =>
          If(Or(IsNull(s), IsNull(p)),
            Literal.create(null, org.apache.spark.sql.types.StringType),
            Literal.create("", org.apache.spark.sql.types.StringType))
        case _ => GraftRegexpExtract(s, p, idx)
      }
    }
    reg.createOrReplaceTempFunction("regexp_extract", es => es.length match {
      case 2 => GraftRegexpExtract(es(0), es(1), Literal(0))
      case 3 => extractWith(es(0), es(1), es(2))
      case 4 =>
        // 'k' (extract-only option): keep the original string when the
        // pattern does not match, instead of returning ''
        val (keep, rest) = es(3) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, t)
              if s.toString.contains('k') =>
            (true, Literal.create(s.toString.filterNot(_ == 'k'), t))
          case other => (false, other)
        }
        val pat = withOpts(es(1), rest)
        val ex = extractWith(es(0), pat, es(2))
        if (keep) If(RLike(es(0), pat), ex, es(0)) else ex
      case n => throw new IllegalArgumentException(
        s"regexp_extract expects 2-4 args, got $n")
    }, "scala_udf")
    // grapheme-aware reverse (reference string/reverse.cpp)
    f1("reverse", GraftReverse(_))
    // 2-arg trim is (str, trimChars) in the reference; Spark reverses
    reg.createOrReplaceTempFunction("trim", es => es.length match {
      case 1 => StringTrim(es(0))
      case 2 => StringTrim(es(0), es(1))
      case n => throw new IllegalArgumentException(s"trim expects 1-2 args, got $n")
    }, "scala_udf")
    // bit-string spellings (reference bin()/from_binary over VARCHAR)
    f1("to_binary", ToBitString(_))
    f1("from_binary", FromBitString(_))
    // fmt-style format(); error(format(...)) is the reference idiom
    reg.createOrReplaceTempFunction("format",
      es => GraftFormat(es), "scala_udf")
    // constant_or_null(v, c1, ...): NULL if any guard is NULL
    reg.createOrReplaceTempFunction("constant_or_null", es => {
      if (es.length < 2)
        throw new IllegalArgumentException(
          s"constant_or_null expects 2+ arguments, got ${es.length}")
      If(es.tail.map(IsNull(_): Expression).reduce(Or),
        Literal.create(null, org.apache.spark.sql.types.NullType), es.head)
    }, "scala_udf")
    // reference CONCAT skips NULL arguments (= concat_ws('')) and is
    // list-aware (all-list args concat as lists, mixing errors —
    // concat.cpp); imported corpus maps CONCAT( -> graft_concat( to get
    // those semantics without shadowing Spark's concat
    reg.createOrReplaceTempFunction("graft_concat", es => {
      if (es.isEmpty)  // reference CONCAT() is a binder error
        throw new IllegalArgumentException("concat expects 1+ arguments")
      DuckConcatFn(es)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("path_join", es => PathJoin(es), "scala_udf")
    // TRY(expr): NULL on runtime error (reference TRY expression wrapper);
    // Spark's TryEval is the same catch-to-null semantics, codegen'd
    f1("try", TryEval(_))
    // ---- aggregate spellings (reference function_list.cpp) ----
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    f2("argmin", MinBy(_, _)); f2("arg_min", MinBy(_, _))
    f2("argmax", MaxBy(_, _)); f2("arg_max", MaxBy(_, _))
    // arbitrary/first: any value of the group (reference first.cpp)
    f1("arbitrary", First(_, ignoreNulls = false))
    // string_agg defaults to ',' in the reference (Spark's listagg
    // concatenates with no separator)
    reg.createOrReplaceTempFunction("string_agg", es => es.length match {
      case 1 => ListAgg(es(0),
        Literal.create(",", org.apache.spark.sql.types.StringType))
      case 2 => ListAgg(es(0), es(1))
      case n => throw new IllegalArgumentException(
        s"string_agg expects 1-2 args, got $n")
    }, "scala_udf")
    // Kahan-compensated sum/avg (graft KahanSum DeclarativeAggregate)
    val DT = org.apache.spark.sql.types.DoubleType
    f1("fsum", e => KahanSum(Cast(e, DT)))
    f1("sumkahan", e => KahanSum(Cast(e, DT)))
    f1("kahan_sum", e => KahanSum(Cast(e, DT)))
    f1("favg", e => Divide(KahanSum(Cast(e, DT)).toAggregateExpression(),
      Cast(Count(Seq(e)).toAggregateExpression(), DT)))
    // skewness / kurtosis: the reference's SAMPLE estimators from raw
    // power sums (skew.cpp:74-77, kurtosis.cpp G2 branch) — Spark's
    // builtins are the population estimators, so shadow the SQL names
    // with the same composition q_skew_kurt verifies against the oracle
    locally {
      val DTd = org.apache.spark.sql.types.DoubleType
      def powSum(x: Expression, k: Int): Expression = {
        val d = Cast(x, DTd)
        Sum((1 until k).foldLeft(d: Expression)((a, _) =>
          Multiply(a, d))).toAggregateExpression()
      }
      def moments(e: Expression) = {
        val n = Cast(Count(Seq(e)).toAggregateExpression(), DTd)
        (n, powSum(e, 1), powSum(e, 2), powSum(e, 3), powSum(e, 4))
      }
      def lit(d: Double) = Literal(d)
      val nullD = Literal.create(null, DTd)
      // the guard must stay OUTSIDE the divisions: in ANSI mode a zero
      // divisor errors (even during constant folding of kurtosis(NULL)),
      // while the reference returns NULL below the minimum n
      reg.createOrReplaceTempFunction("skewness", es => {
        val (n, s1, s2, s3, _) = moments(es.head)
        val temp = Divide(lit(1.0), n)
        val variance = Multiply(temp,
          Subtract(s2, Multiply(Multiply(s1, s1), temp)))
        val num = Subtract(Add(s3, Multiply(Multiply(lit(2.0),
          Multiply(Multiply(s1, s1), s1)), Multiply(temp, temp))),
          Multiply(lit(3.0), Multiply(Multiply(s2, s1), temp)))
        If(LessThanOrEqual(n, lit(2.0)), nullD,
          If(LessThanOrEqual(variance, lit(0.0)), nullD,
            Multiply(Divide(Sqrt(Multiply(n, Subtract(n, lit(1.0)))),
              Subtract(n, lit(2.0))),
              Divide(Multiply(temp, num), Sqrt(Pow(variance, lit(3.0)))))))
      }, "scala_udf")
      reg.createOrReplaceTempFunction("kurtosis", es => {
        val (n, s1, s2, s3, s4) = moments(es.head)
        val temp = Divide(lit(1.0), n)
        val variance = Multiply(temp,
          Subtract(s2, Multiply(Multiply(s1, s1), temp)))
        val m4 = Multiply(temp, Add(
          Subtract(s4, Multiply(Multiply(lit(4.0), Multiply(s3, s1)), temp)),
          Subtract(Multiply(Multiply(lit(6.0), Multiply(s2, Multiply(s1, s1))),
            Multiply(temp, temp)),
            Multiply(lit(3.0), Multiply(Pow(s1, lit(4.0)),
              Multiply(Multiply(temp, temp), temp))))))
        If(LessThanOrEqual(n, lit(3.0)), nullD,
          If(LessThanOrEqual(variance, lit(0.0)), nullD,
            Divide(Multiply(Subtract(n, lit(1.0)),
              Subtract(Divide(Multiply(Add(n, lit(1.0)), m4),
                Multiply(variance, variance)),
                Multiply(lit(3.0), Subtract(n, lit(1.0))))),
              Multiply(Subtract(n, lit(2.0)), Subtract(n, lit(3.0))))))
      }, "scala_udf")
    }
    // kurtosis_pop = the population estimator = Spark's builtin
    f1("kurtosis_pop", Kurtosis(_))
    // reference date_add(date, INTERVAL) returns TIMESTAMP (Spark's
    // builtin wants an int day count and stays DATE)
    f2("date_add", (d, iv) =>
      Add(Cast(d, org.apache.spark.sql.types.TimestampType), iv))
    // dow: Sunday=0..Saturday=6 (Spark's EXTRACT(DOW) is 1-based)
    f1("dow", e => Cast(Subtract(DayOfWeek(e), Literal(1)),
      org.apache.spark.sql.types.LongType))
    // to_years(n) etc: scalar -> interval constructors (reference
    // interval.cpp to_* family)
    locally {
      val IT = org.apache.spark.sql.types.IntegerType
      def ym(yrs: Expression, mos: Expression) = MakeYMInterval(yrs, mos)
      val zero = Literal(0)
      f1("to_years", e => ym(Cast(e, IT), zero))
      f1("to_decades", e => ym(Multiply(Cast(e, IT), Literal(10)), zero))
      f1("to_centuries", e => ym(Multiply(Cast(e, IT), Literal(100)), zero))
      f1("to_millennia", e => ym(Multiply(Cast(e, IT), Literal(1000)), zero))
      f1("to_months", e => ym(zero, Cast(e, IT)))
      f1("to_quarters", e => ym(zero, Multiply(Cast(e, IT), Literal(3))))
      def dt(d: Expression, h: Expression, m: Expression, s: Expression) =
        MakeDTInterval(d, h, m, s)
      val zeroS = Literal(org.apache.spark.sql.types.Decimal(0),
        org.apache.spark.sql.types.DecimalType(26, 6))
      f1("to_days", e => dt(Cast(e, IT), zero, zero, zeroS))
      f1("to_weeks", e => dt(Multiply(Cast(e, IT), Literal(7)), zero, zero, zeroS))
      f1("to_hours", e => dt(zero, Cast(e, IT), zero, zeroS))
      f1("to_minutes", e => dt(zero, zero, Cast(e, IT), zeroS))
      f1("to_seconds", e => dt(zero, zero, zero,
        Cast(e, org.apache.spark.sql.types.DecimalType(26, 6))))
      f1("to_milliseconds", e => dt(zero, zero, zero,
        Cast(Divide(Cast(e, org.apache.spark.sql.types.DoubleType),
          Literal(1000.0)), org.apache.spark.sql.types.DecimalType(26, 6))))
      f1("to_microseconds", e => dt(zero, zero, zero,
        Cast(Divide(Cast(e, org.apache.spark.sql.types.DoubleType),
          Literal(1000000.0)), org.apache.spark.sql.types.DecimalType(26, 6))))
    }
    f1("make_timestamp_ms", MillisToTimestamp(_))
    f1("make_timestamp_ns", e =>
      MicrosToTimestamp(IntegralDivide(e, Literal(1000L))))
    // make_timestamp(micros) 1-arg overload (reference make_timestamp.cpp)
    reg.createOrReplaceTempFunction("make_timestamp", es => es.length match {
      case 1 => MicrosToTimestamp(es(0))
      case 6 => MakeTimestamp(es(0), es(1), es(2), es(3), es(4), es(5))
      case n => throw new IllegalArgumentException(
        s"make_timestamp expects 1 or 6 args, got $n")
    }, "scala_udf")
    // strftime/strptime: C %-format converted to a Java pattern at bind
    // time (format must be constant, like the reference's compiled path)
    def cFmtToJava(f: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < f.length) {
        if (f(i) == '%' && i + 1 < f.length) {
          val (c, pad) =
            if (f(i + 1) == '-' && i + 2 < f.length) (f(i + 2), false)
            else (f(i + 1), true)
          val m = c match {
            case 'a' => "EEE";  case 'A' => "EEEE"
            case 'b' => "MMM";  case 'B' => "MMMM"
            case 'd' => if (pad) "dd" else "d"
            case 'f' => "SSSSSS"
            case 'H' => if (pad) "HH" else "H"
            case 'I' => if (pad) "hh" else "h"
            case 'j' => if (pad) "DDD" else "D"
            case 'm' => if (pad) "MM" else "M"
            case 'M' => if (pad) "mm" else "m"
            case 'p' => "a"
            case 'S' => if (pad) "ss" else "s"
            case 'y' => "yy";   case 'Y' => "yyyy"
            case '%' => "%"
            case other => throw new IllegalArgumentException(
              s"strftime: unsupported format specifier %$other")
          }
          sb.append(m)
          i += (if (pad) 2 else 3)
        } else {
          val ch = f(i)
          if (ch.isLetter) { sb.append('\''); sb.append(ch); sb.append('\'') }
          else sb.append(ch)
          i += 1
        }
      }
      sb.toString
    }
    def constFmt(e: Expression, who: String): Literal = e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
        Literal.create(cFmtToJava(s.toString),
          org.apache.spark.sql.types.StringType)
      case _ => throw new IllegalArgumentException(
        s"$who format must be a constant string")
    }
    f2("strftime", (x, f) => DateFormatClass(
      Cast(x, org.apache.spark.sql.types.TimestampType),
      constFmt(f, "strftime")))
    f2("strptime", (s, f) => GetTimestamp(s, constFmt(f, "strptime"),
      org.apache.spark.sql.types.TimestampType))
    f2("try_strptime", (s, f) => TryEval(GetTimestamp(s,
      constFmt(f, "strptime"), org.apache.spark.sql.types.TimestampType)))
    // date-part functions Spark's EXTRACT grammar lacks (reference
    // date_part.cpp): the importer rewrites extract(decade FROM x) to
    // decade(x) etc.
    locally {
      val LT = org.apache.spark.sql.types.LongType
      def yr(e: Expression) = Cast(Year(e), LT)
      // decade(1992) = 199; C-style truncating division like the
      // reference's `year / 10`
      f1("decade", e => IntegralDivide(yr(e), Literal(10L)))
      // century/millennium are 1-based (2000 -> 20th century)
      def oneBased(e: Expression, span: Long): Expression = {
        val y = yr(e)
        If(GreaterThan(y, Literal(0L)),
          Add(IntegralDivide(Subtract(y, Literal(1L)), Literal(span)),
            Literal(1L)),
          Subtract(IntegralDivide(Add(y, Literal(1L)), Literal(span)),
            Literal(1L)))
      }
      f1("century", oneBased(_, 100))
      f1("millennium", oneBased(_, 1000))
      // epoch: seconds since 1970-01-01 (BIGINT on both engines)
      f1("epoch", e => Cast(UnixTimestamp(e,
        Literal.create("yyyy-MM-dd HH:mm:ss",
          org.apache.spark.sql.types.StringType)), LT))
      // isodow: Monday=1..Sunday=7 (Spark dayofweek is Sunday=1)
      f1("isodow", e => Cast(Add(Pmod(Add(DayOfWeek(e), Literal(5)),
        Literal(7)), Literal(1)), LT))
      // local-time functions (icu-current.cpp): wall clock in the
      // session zone; Spark's LocalTimestamp/CurrentTime are exactly that
      fn("current_localtimestamp", 0)(_ => LocalTimestamp(None))
      fn("current_localtime", 0)(_ => CurrentTime())
      // dayofweek: the reference's dow numbering is Sunday=0..Saturday=6
      // (date_part.cpp); Spark's builtin is Sunday=1 — shadowed
      f1("dayofweek", e => Cast(Subtract(DayOfWeek(e), Literal(1)), LT))
      // dayname/monthname: the reference prints FULL names ("Sunday",
      // "September"); Spark 4's builtins abbreviate — shadowed here
      f1("dayname", e => DateFormatClass(
        Cast(e, org.apache.spark.sql.types.TimestampType),
        Literal.create("EEEE", org.apache.spark.sql.types.StringType), None))
      f1("monthname", e => DateFormatClass(
        Cast(e, org.apache.spark.sql.types.TimestampType),
        Literal.create("MMMM", org.apache.spark.sql.types.StringType), None))
      // seconds-of-minute including the fractional part, in micro/milli
      // units (reference date_part microseconds/milliseconds)
      def microsOfMinute(e: Expression): Expression =
        Pmod(UnixMicros(Cast(e, org.apache.spark.sql.types.TimestampType)),
          Literal(60000000L))
      f1("microseconds", microsOfMinute(_))
      f1("microsecond", microsOfMinute(_))
      f1("milliseconds", e => IntegralDivide(microsOfMinute(e), Literal(1000L)))
      f1("millisecond", e => IntegralDivide(microsOfMinute(e), Literal(1000L)))
      f1("era", e => If(GreaterThan(yr(e), Literal(0L)),
        Literal(1L), Literal(0L)))
      // yearweek: ISO year * 100 + ISO week (reference date_part.cpp)
      f1("yearweek", e => Add(Multiply(Cast(YearOfWeek(e), LT),
        Literal(100L)), Cast(WeekOfYear(e), LT)))
    }
    // geomean = exp(avg(ln(x))) (reference geomean is the same fold)
    f1("geomean", e => Exp(Average(Log(Cast(e,
      org.apache.spark.sql.types.DoubleType))).toAggregateExpression()))
    f1("geometric_mean", e => Exp(Average(Log(Cast(e,
      org.apache.spark.sql.types.DoubleType))).toAggregateExpression()))
    // ---- scalar spellings ----
    f1("sha256", e => Sha2(e, Literal(256)))
    for (nm <- Seq("roundbankers", "round_even"))
      reg.createOrReplaceTempFunction(nm, es => es.length match {
        case 1 => BRound(es(0), Literal(0))
        case 2 => BRound(es(0), es(1))
        case n => throw new IllegalArgumentException(
          s"$nm expects 1-2 args, got $n")
      }, "scala_udf")
    // even(x): round |x| up to the next even integer, away from zero,
    // double-domain (saturating — no long round-trip)
    f1("even", EvenFn(_))
    f1("signbit", SignBit(_))
    f1("format_bytes", FormatBytes(_))
    f1("pg_size_pretty", FormatBytes(_))
    f1("formatreadablesize", FormatBytes(_))
    f1("formatreadabledecimalsize", FormatBytesDecimal(_))
    f1("md5_number_upper", Md5Half(_, upper = true))
    f1("md5_number_lower", Md5Half(_, upper = false))
    // isnan(NULL) is NULL in the reference (Spark's IsNaN says false)
    f1("isnan", e => If(IsNull(e),
      Literal.create(null, org.apache.spark.sql.types.BooleanType), IsNaN(e)))
    // array_extract / list_extract over VARCHAR: 1-based single
    // grapheme; a negative index counts from the end (list semantics);
    // out of range -> ''
    for (nm <- Seq("array_extract", "list_extract"))
    f2(nm, (s, i) => {
      val it = org.apache.spark.sql.types.IntegerType
      val idx = Cast(i, it)
      val pos = If(LessThan(idx, Literal(0)),
        Add(Add(Cast(LengthGrapheme(s), it), idx), Literal(1)), idx)
      If(LessThanOrEqual(pos, Literal(0)),
        If(IsNull(s), Literal.create(null,
          org.apache.spark.sql.types.StringType),
          Literal.create("", org.apache.spark.sql.types.StringType)),
        SubstringGrapheme(s, pos, Literal(1)))
    })
    // substring/substr: reference semantics (substring.cpp) — negative
    // offsets count from the end, offset 0 consumes a length unit,
    // negative lengths scan backwards; positive args match Spark exactly
    for (nm <- Seq("substring", "substr"))
      reg.createOrReplaceTempFunction(nm, es => es.length match {
        // 2-arg: to end of string; 2^32-1 is the reference's max length
        case 2 => GraftSubstring(es(0), es(1), Literal(4294967295L))
        case 3 => GraftSubstring(es(0), es(1), es(2))
        case n => throw new IllegalArgumentException(
          s"$nm expects 2-3 args, got $n")
      }, "scala_udf")
    // grapheme-indexed left/right (reference left_right.cpp grapheme
    // variants); negative n drops from the other end, like left/right
    def strNullGuard(s: Expression, n: Expression, body: Expression): Expression =
      If(Or(IsNull(s), IsNull(n)),
        Literal.create(null, org.apache.spark.sql.types.StringType), body)
    f2("left_grapheme", (s, n) => strNullGuard(s, n,
      SubstringGrapheme(s, Literal(1), Cast(
        If(GreaterThanOrEqual(n, Literal(0)), n,
          Greatest(Seq(Literal(0), Add(Cast(LengthGrapheme(s),
            org.apache.spark.sql.types.IntegerType), n)))),
        org.apache.spark.sql.types.IntegerType))))
    f2("right_grapheme", (s, n) => {
      val it = org.apache.spark.sql.types.IntegerType
      val lg = Cast(LengthGrapheme(s), it)
      val take = Cast(If(GreaterThanOrEqual(n, Literal(0)), n,
        Greatest(Seq(Literal(0), Add(lg, n)))), it)
      strNullGuard(s, n, SubstringGrapheme(s, Greatest(Seq(Literal(1),
        Add(Subtract(lg, take), Literal(1)))), take))
    })
    // decode(blob): reference 1-arg decode = bytes -> VARCHAR; Spark's
    // 2-arg charset decode still works
    reg.createOrReplaceTempFunction("decode", es => es.length match {
      case 1 => StringDecode(es(0),
        Literal.create("UTF-8", org.apache.spark.sql.types.StringType))
      case 2 => StringDecode(es(0), es(1))
      case n => throw new IllegalArgumentException(
        s"decode expects 1-2 args, got $n")
    }, "scala_udf")
    // LEFT/RIGHT with negative n drop |n| chars from the other end
    // (reference left_right.cpp; Spark's builtins return '')
    val emptyStr = Literal.create("", org.apache.spark.sql.types.StringType)
    val nullStr = Literal.create(null, org.apache.spark.sql.types.StringType)
    def posLen(s: Expression, n: Expression): Expression =
      Greatest(Seq(Literal(0), Add(Length(s), n)))
    def nullGuard(s: Expression, n: Expression, body: Expression): Expression =
      If(Or(IsNull(s), IsNull(n)), nullStr, body)
    f2("left", (s, n) => nullGuard(s, n,
      If(GreaterThanOrEqual(n, Literal(0)),
        Substring(s, Literal(1), n), Substring(s, Literal(1), posLen(s, n)))))
    f2("right", (s, n) => nullGuard(s, n,
      If(GreaterThanOrEqual(n, Literal(0)),
        If(EqualTo(n, Literal(0)), emptyStr,
          If(GreaterThanOrEqual(n, Length(s)), s,
            Substring(s, UnaryMinus(n), n))),
        If(GreaterThan(posLen(s, n), Literal(0)),
          Substring(s, UnaryMinus(posLen(s, n)), posLen(s, n)), emptyStr))))
    f1("parse_formatted_bytes", ParseFormattedBytes(_))
    f1("length_grapheme", LengthGrapheme(_))
    reg.createOrReplaceTempFunction("substring_grapheme", es => es.length match {
      case 2 => SubstringGrapheme(es(0), es(1), Literal(Int.MaxValue))
      case 3 => SubstringGrapheme(es(0), es(1), es(2))
      case n => throw new IllegalArgumentException(
        s"substring_grapheme expects 2-3 args, got $n")
    }, "scala_udf")

    // ---- reference LIST/STRUCT/MAP surface (list_extract.cpp,
    // array_slice.cpp, core_functions/scalar/list/) — bracket subscript
    // and slice arrive from the imported corpus as graft_subscript /
    // graft_slice (tools/import_slt.py) ----
    f2("graft_subscript", DuckSubscript(_, _))
    fn("graft_slice", 3)(es => DuckSlice(es(0), es(1), es(2)))
    // MAP(keys_list, values_list) constructor (map.cpp MapFunction);
    // MAP() is the empty map — `MAP {k: v}` literals arrive as Spark's
    // own map(k, v, ...) from the importer
    // json_transform family + SQL (de)serialization (JsonSql)
    reg.createOrReplaceTempFunction("json_transform",
      es => JsonSql.transformExpr(es, strict = false), "scala_udf")
    reg.createOrReplaceTempFunction("from_json_graft",
      es => JsonSql.transformExpr(es, strict = false), "scala_udf")
    reg.createOrReplaceTempFunction("json_transform_strict",
      es => JsonSql.transformExpr(es, strict = true), "scala_udf")
    reg.createOrReplaceTempFunction("json_serialize_sql",
      es => JsonSql.serializeExpr(spark, es), "scala_udf")
    reg.createOrReplaceTempFunction("json_deserialize_sql",
      es => JsonSql.deserializeExpr(es), "scala_udf")

    // reference list math / construction aliases
    // (core_functions/scalar/list/list_distance.cpp etc.) — the duck
    // binder implicitly casts any numeric list; mirror with an explicit
    // ARRAY<FLOAT> cast in front of the strict vec kernels
    def vf(e: Expression): Expression = Cast(e,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    f2("list_cosine_similarity", (a, b) => VecCosine(vf(a), vf(b)))
    f2("array_cosine_similarity", (a, b) => VecCosine(vf(a), vf(b)))
    f2("list_distance", (a, b) => VecL2(vf(a), vf(b)))
    f2("array_distance", (a, b) => VecL2(vf(a), vf(b)))
    f2("list_inner_product", (a, b) => VecDot(vf(a), vf(b)))
    f2("array_inner_product", (a, b) => VecDot(vf(a), vf(b)))
    f2("list_cosine_distance", (a, b) =>
      Subtract(Literal(1.0), VecCosine(vf(a), vf(b))))
    f2("array_cosine_distance", (a, b) =>
      Subtract(Literal(1.0), VecCosine(vf(a), vf(b))))
    for (nm <- Seq("list_negative_inner_product", "list_negative_dot_product",
        "array_negative_inner_product", "array_negative_dot_product"))
      f2(nm, (a, b) => UnaryMinus(VecDot(vf(a), vf(b))))
    reg.createOrReplaceTempFunction("array_value",
      es => CreateArray(es), "scala_udf")
    reg.createOrReplaceTempFunction("array_slice", es => es.length match {
      case 2 => DuckSlice(es(0), es(1),
        Literal.create(null, org.apache.spark.sql.types.NullType))
      case 3 => DuckSlice(es(0), es(1), es(2))
      case k => throw new IllegalArgumentException(
        s"array_slice expects 2-3 arguments, got $k")
    }, "scala_udf")
    f2("list_has_any", ArraysOverlap(_, _))
    f2("array_has_any", ArraysOverlap(_, _))
    // has_all(l, sub): every element of sub present in l
    f2("list_has_all", (l, sub) =>
      EqualTo(Size(ArrayExcept(sub, l)), Literal(0)))
    f2("array_has_all", (l, sub) =>
      EqualTo(Size(ArrayExcept(sub, l)), Literal(0)))
    f2("string_split", StringSplitSQL(_, _))
    f2("str_split", StringSplitSQL(_, _))
    f2("string_to_array", StringSplitSQL(_, _))
    reg.createOrReplaceTempFunction("graft_map", {
      case Seq() => CreateMap(Nil)
      case Seq(k, v) => MapFromArrays(k, v)
      case es => throw new IllegalArgumentException(
        s"MAP() expects 0 or 2 arguments, got ${es.length}")
    }, "scala_udf")
    fn("list_slice", 3)(es => DuckSlice(es(0), es(1), es(2)))
    // list_extract/array_extract/list_element: string variant keeps the
    // grapheme semantics registered above only for VARCHAR — the duck
    // subscript dispatches identically for strings, so one expression
    // serves lists, maps, structs and strings
    // overrides the string-only registration above: same grapheme
    // semantics for VARCHAR, plus LIST/MAP/STRUCT dispatch
    for (nm <- Seq("list_element", "list_extract", "array_extract",
        "struct_extract", "map_extract_value"))
      f2(nm, DuckSubscript(_, _))
    reg.createOrReplaceTempFunction("list_value",
      es => CreateArray(es), "scala_udf")
    reg.createOrReplaceTempFunction("list_pack",
      es => CreateArray(es), "scala_udf")
    f1("list_distinct", ListDistinct(_))
    f1("list_unique", ListUnique(_))
    f2("list_position", ListPosition(_, _))
    f2("list_indexof", ListPosition(_, _))
    f2("list_contains", (l, v) =>
      DuckContains(l, v))
    f2("array_contains", (l, v) => DuckContains(l, v))
    f2("array_has", (l, v) => DuckContains(l, v))
    f2("contains", DuckContains(_, _))
    f2("map_contains", DuckContains(_, _))
    reg.createOrReplaceTempFunction("list_concat",
      es => ListConcat(es), "scala_udf")
    reg.createOrReplaceTempFunction("list_cat",
      es => ListConcat(es), "scala_udf")
    reg.createOrReplaceTempFunction("array_cat",
      es => ListConcat(es), "scala_udf")
    // append/prepend are macros over list_concat in the reference
    // (functions/macros: list_append(l,e) = list_concat(l, [e])), so a
    // NULL list behaves as empty — list_append(NULL, 3) = [3] — where
    // Spark's ArrayAppend would return NULL / reject a VOID literal
    f2("list_append", (l, e) => ListConcat(Seq(l, CreateArray(Seq(e)))))
    f2("array_push_back", (l, e) => ListConcat(Seq(l, CreateArray(Seq(e)))))
    // reference arg order: list_prepend/array_prepend(element, list)
    // (Spark's builtin array_prepend is (list, element) — shadowed)
    f2("list_prepend", (e, l) => ListConcat(Seq(CreateArray(Seq(e)), l)))
    f2("array_prepend", (e, l) => ListConcat(Seq(CreateArray(Seq(e)), l)))
    f2("array_append", (l, e) => ListConcat(Seq(l, CreateArray(Seq(e)))))
    f2("array_push_front", (l, e) => ListConcat(Seq(CreateArray(Seq(e)), l)))
    val sortArgs: PartialFunction[(String, String), (Boolean, Boolean)] = {
      case ("asc", "nulls first") => (true, true)
      case ("asc", "nulls last") => (true, false)
      case ("desc", "nulls first") => (false, true)
      case ("desc", "nulls last") => (false, false)
    }
    def lit(e: Expression): String = e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        s.toString.toLowerCase.trim
      case other => String.valueOf(other).toLowerCase.trim
    }
    reg.createOrReplaceTempFunction("list_sort", es => es.length match {
      // reference defaults (list_sort.cpp): ASC, NULLS FIRST
      case 1 => ListSortFull(es(0), asc = true, nullsFirst = true)
      case 2 =>
        val asc = lit(es(1)) == "asc"
        ListSortFull(es(0), asc, nullsFirst = asc)
      case 3 =>
        val (a, nf) = sortArgs((lit(es(1)), lit(es(2))))
        ListSortFull(es(0), a, nf)
      case n => throw new IllegalArgumentException(
        s"list_sort expects 1-3 args, got $n")
    }, "scala_udf")
    f1("list_reverse_sort", ListSortFull(_, asc = false, nullsFirst = false))
    // grade_up: session default null order (NULLS LAST) regardless of
    // direction — unlike list_sort's own NULLS FIRST default
    reg.createOrReplaceTempFunction("list_grade_up", es => es.length match {
      case 1 => ListGradeUp(es(0), asc = true, nullsFirst = false)
      case 2 => ListGradeUp(es(0), lit(es(1)) == "asc", nullsFirst = false)
      case 3 => ListGradeUp(es(0), lit(es(1)) == "asc",
        nullsFirst = lit(es(2)) == "nulls first")
      case n => throw new IllegalArgumentException(
        s"list_grade_up expects 1-3 args, got $n")
    }, "scala_udf")
    f1("list_reverse", Reverse(_))
    f1("array_reverse", Reverse(_))
    f2("list_intersect", ArrayIntersect(_, _))
    f2("array_intersect_graft", ArrayIntersect(_, _))
    // list_count: non-NULL element count (list_aggregate 'count')
    f1("list_count", l => Size(ArrayCompact(l)))
    f1("regexp_escape", RegexpEscape(_))
    reg.createOrReplaceTempFunction("list_resize", es => es.length match {
      case 2 => ListResize(es(0), es(1),
        Literal.create(null, org.apache.spark.sql.types.NullType))
      case 3 => ListResize(es(0), es(1), es(2))
      case n => throw new IllegalArgumentException(
        s"list_resize expects 2-3 args, got $n")
    }, "scala_udf")
    f2("array_to_string", (l, s) => ArrayJoin(l, s, None))
    // list_aggregate + the list_<name> rewrites (list_aggregates.cpp);
    // LIST(x) is the reference spelling of collect_list. Returned BARE
    // (not .toAggregateExpression()) so the analyzer's own wrapping
    // handles DISTINCT/FILTER modifiers at the call site.
    reg.createOrReplaceTempFunction("list", es =>
      org.apache.spark.sql.catalyst.expressions.aggregate.CollectList(es.head),
      "scala_udf")
    reg.createOrReplaceTempFunction("array_agg", es =>
      org.apache.spark.sql.catalyst.expressions.aggregate.CollectList(es.head),
      "scala_udf")
    for (nm <- Seq("list_aggregate", "list_aggr", "array_aggregate", "array_aggr"))
      reg.createOrReplaceTempFunction(nm, es => es.length match {
        case 2 => ListAggr(es(0), es(1), None)
        case 3 => ListAggr(es(0), es(1), Some(es(2)))
        case k => throw new IllegalArgumentException(
          s"$nm expects 2-3 args, got $k")
      }, "scala_udf")
    // `aggregate` is BOTH Spark's fold HOF (aggregate(arr, init, merge
    // [, finish])) and the reference's list_aggregate alias
    // (aggregate(arr, 'name'[, arg])). A string-literal second argument
    // picks the reference form; everything else stays the builtin.
    locally {
      val builtin = reg.lookupFunctionBuilder(
        org.apache.spark.sql.catalyst.FunctionIdentifier("aggregate"))
      reg.createOrReplaceTempFunction("aggregate", es => {
        // fold form with a string INIT value — aggregate(arr, '', (acc,x)
        // -> ...) — must stay the builtin: a lambda anywhere after the
        // name/init argument disambiguates (r11 ADVICE)
        val hasLambda = es.drop(2).exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.LambdaFunction])
        val isName = !hasLambda && es.length >= 2 && (es(1) match {
          case Literal(v, org.apache.spark.sql.types.StringType) => v != null
          case _ => false
        })
        if (isName && es.length == 2) ListAggr(es(0), es(1), None)
        else if (isName && es.length == 3) ListAggr(es(0), es(1), Some(es(2)))
        else builtin match {
          case Some(b) => b(es)
          case None => throw new IllegalArgumentException(
            s"aggregate expects (list, 'fn') or the fold form, got ${es.length} args")
        }
      }, "scala_udf")
    }
    for (nm <- Seq("sum", "min", "max", "avg", "mean", "median", "mode",
        "count", "product", "sem", "skewness", "kurtosis", "entropy",
        "mad", "stddev", "stddev_samp", "stddev_pop", "var_samp",
        "var_pop", "string_agg", "histogram", "bool_and", "bool_or",
        "first", "last", "any_value", "approx_count_distinct")) {
      val lit = Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(nm),
        org.apache.spark.sql.types.StringType)
      reg.createOrReplaceTempFunction(s"list_$nm", es => es.length match {
        case 1 => ListAggr(es(0), lit, None)
        case 2 => ListAggr(es(0), lit, Some(es(1)))
        case k => throw new IllegalArgumentException(
          s"list_$nm expects 1-2 args, got $k")
      }, "scala_udf")
    }

    // group-aggregate spellings of the holistic kernels: compose
    // collect_list (map-side partials, null-dropping — matching the
    // reference's NULL-skipping aggregates) with the row-local ListAggr
    // kernel at the result projection. Conformance surface: the hot-path
    // pipeline queries use native Spark aggregates throughout.
    for (nm <- Seq("histogram", "mad", "entropy", "product", "sem")) {
      val lit = Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(nm),
        org.apache.spark.sql.types.StringType)
      def one(es: Seq[Expression]) = ListAggr(
        org.apache.spark.sql.catalyst.expressions.aggregate
          .CollectList(es.head).toAggregateExpression(), lit, None)
      if (nm == "histogram")
        // histogram(x, bins) — binned form; the bin list may vary per
        // group (reference test uses a CASE over a group key), so it
        // rides along as a first() aggregate
        reg.createOrReplaceTempFunction(nm, es => es.length match {
          case 1 => one(es)
          case 2 => ListAggr(
            org.apache.spark.sql.catalyst.expressions.aggregate
              .CollectList(es.head).toAggregateExpression(), lit,
            Some(org.apache.spark.sql.catalyst.expressions.aggregate
              .First(es(1), ignoreNulls = false).toAggregateExpression()))
          case k => throw new IllegalArgumentException(
            s"histogram expects 1-2 args, got $k")
        }, "scala_udf")
      else fn(nm, 1)(one)
    }
    // reference quantile family → Spark's exact percentile aggregates
    // (quantile_cont interpolates; quantile/quantile_disc picks the
    // smallest element with cume_dist >= q)
    f2("quantile_cont", (x, q) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .Percentile(x, q).toAggregateExpression())
    for (nm <- Seq("quantile_disc", "quantile"))
      f2(nm, (x, q) =>
        org.apache.spark.sql.catalyst.expressions.aggregate
          .PercentileDisc(x, q, false).toAggregateExpression())
    // time_bucket(width, ts[, origin|offset]) — TimescaleDB bucketing
    reg.createOrReplaceTempFunction("time_bucket", es => es.length match {
      case 2 => TimeBucket(es(0), es(1), None)
      case 3 => TimeBucket(es(0), es(1), Some(es(2)))
      case k => throw new IllegalArgumentException(
        s"time_bucket expects 2-3 args, got $k")
    }, "scala_udf")
    f2("strpos", (s, sub) => StringInstr(s, sub))
    // pg_typeof is the reference's lowercase macro over typeof
    // (default_functions.cpp: "(expression) AS lower(typeof(expression))")
    f1("pg_typeof", e => Lower(DuckTypeOf(e)))
    fn("gen_random_uuid", 0)(_ => Uuid())
    fn("uuidv4", 0)(_ => Uuid()) // reference alias (uuid.cpp)
    // logical VARIANT ordering key (variant_comparator.cpp) — ORDER BY
    // v::VARIANT in the reference is exactly ORDER BY this key
    f1("variant_comparator", VariantComparator(_))

    f1("typeof", DuckTypeOf(_))
    reg.createOrReplaceTempFunction("struct_concat",
      es => StructConcat(es), "scala_udf")
    f1("len", DuckLen(_))
    f1("array_length", DuckLen(_))
    f1("list_length", DuckLen(_))
    // duck `length` dispatches on type (string chars / list cardinality);
    // engine-internal code uses functions.length (catalyst-direct), so
    // the registry shadow only affects SQL text
    f1("length", DuckLen(_))
    reg.createOrReplaceTempFunction("range", es =>
      GenSeries(es, inclusive = false), "scala_udf")
    reg.createOrReplaceTempFunction("generate_series", es =>
      GenSeries(es, inclusive = true), "scala_udf")
    registered = true
  }
}
