package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reference JSON function surface — extraction (`json_extract` family,
  * the `->` / `->>` operators, which the corpus importer lowers to these
  * names), inspection (`json_type`, `json_valid`, `json_exists`,
  * `json_keys`, `json_array_length`, `json_contains`) and modification
  * (`json_set` / `json_insert` / `json_replace` / `json_remove`,
  * `json_normalize`, `json_strip_nulls`, `json_deep_merge`).
  *
  * Semantics follow the reference's yyjson-based implementations
  * (`/root/reference/extension/json/json_functions/json_extract.cpp`,
  * `json_value.cpp`, `json_type.cpp`, `json_valid.cpp`,
  * `json_array_length.cpp`, `json_contains.cpp`, `json_modify.cpp`,
  * `json_normalize.cpp`, `json_strip_nulls.cpp`, `json_deep_merge.cpp`):
  *
  *  - paths: `$`-rooted reference syntax (`$.key`, `$."quoted key"`,
  *    `$[3]`, `$[#-1]` back-index, `$[#]` append position), JSON-pointer
  *    (`/a/b/0`), a bare string key (digits included — only the
  *    INTEGER-typed overload indexes, spelled through pathOf as
  *    `$[i]`, negative wraps); the empty path addresses the whole
  *    document;
  *    wildcard paths (`$.*`, `$[*]`, recursive `$.**`/`$..key`) make the
  *    extraction return a LIST of every match in the reference's
  *    traversal order (json_common.cpp GetWildcardPathInternal) — the
  *    LIST return type binds from the constant path like the
  *    reference's ValidatePath
  *  - malformed JSON input THROWS (the reference casts to JSON at bind,
  *    which raises) — except `json_valid`, which reports it
  *  - `json_extract` returns the JSON TEXT of the subtree (strings stay
  *    quoted, compact rendering); `json_extract_string` (`->>`) unquotes
  *    scalars and returns SQL NULL for a JSON null
  *  - `json_value` is extract-but-NULL-for-containers-and-null
  *  - `json_type` names: OBJECT ARRAY VARCHAR BIGINT UBIGINT DOUBLE
  *    BOOLEAN NULL (integer sign picks BIGINT/UBIGINT, as
  *    `json_structure` already does)
  *  - `json_array_length` is yyjson_arr_size: 0 for non-arrays
  *  - `json_contains` is fuzzy containment: needle equals the node, or
  *    arrays contain all needle elements (any order), or objects contain
  *    all needle fields, recursively at any depth
  *  - modify family: SET creates-and-overwrites, INSERT creates but
  *    never overwrites, REPLACE only overwrites existing, REMOVE only
  *    removes existing; a failed modification returns the document
  *    unchanged (re-rendered compact)
  *  - NaN / Infinity literals are accepted and rendered bare, matching
  *    yyjson's ALLOW_INF_AND_NAN read/write flags
  *
  * All expressions are codegen'd via static helper calls (same pattern
  * as [[JsonShape]]).
  */
object JsonNav {
  import com.fasterxml.jackson.databind.JsonNode
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.configure(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS, true)
    m.configure(com.fasterxml.jackson.core.JsonGenerator.Feature.QUOTE_NON_NUMERIC_NUMBERS, false)
    m.configure(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS, true)
    m.configure(com.fasterxml.jackson.core.json.JsonReadFeature.ALLOW_TRAILING_COMMA.mappedFeature, true)
    m
  }

  /** yyjson accepts nan/inf/Infinity case-insensitively; Jackson only
    * its canonical spellings — normalize bare (unquoted) tokens.
    */
  private def normalizeNonFinite(json: String): String = {
    if (!json.exists(c => c == 'n' || c == 'N' || c == 'i' || c == 'I'))
      return json
    val sb = new java.lang.StringBuilder(json.length)
    var i = 0
    var inStr = false
    while (i < json.length) {
      val c = json.charAt(i)
      if (inStr) {
        sb.append(c)
        if (c == '\\' && i + 1 < json.length) { sb.append(json.charAt(i + 1)); i += 1 }
        else if (c == '"') inStr = false
        i += 1
      } else if (c == '"') { sb.append(c); inStr = true; i += 1 }
      else if (c.isLetter) {
        var j = i
        while (j < json.length && json.charAt(j).isLetter) j += 1
        val tok = json.substring(i, j)
        sb.append(tok.toLowerCase match {
          case "nan" => "NaN"
          case "inf" | "infinity" => "Infinity"
          case _ => tok
        })
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def readDoc(json: String): JsonNode =
    try mapper.readTree(normalizeNonFinite(json))
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"Malformed JSON: ${e.getMessage}")
    }

  private sealed trait Seg
  private final case class Key(k: String) extends Seg
  private final case class Idx(i: Int) extends Seg // negative wraps from back
  private final case class Back(i: Int) extends Seg // [#-i]
  private case object Append extends Seg // [#]
  private case object KeyWild extends Seg // `.*` — object values only
  private case object IdxWild extends Seg // `[*]` — array elements only
  private case object RecWild extends Seg // `.**` / the `..` prefix — all descendants

  // yyjson parses the index as uint64: beyond uint64 is a PATH ERROR,
  // within uint64 but out of array range is simply a missed position
  private def safeInt(digits: String, path: String): Int =
    try digits.toInt catch {
      case _: NumberFormatException =>
        if (BigInt(digits) > BigInt("18446744073709551615")) malformedPath(path)
        else Int.MaxValue
    }

  private def malformedPath(path: String): Nothing =
    throw new IllegalArgumentException(
      s"Binder Error: JSON path error near '$path'")

  /** null = unsupported/malformed path (extraction then yields NULL). */
  private def parse(path: String): List[Seg] = {
    if (path == null) return null
    if (path.isEmpty || path == "$") return Nil
    if (path.startsWith("/")) {
      // JSON pointer; ~1 -> '/', ~0 -> '~'; '-' is the append position
      return path.split("/", -1).toList.tail.map { raw =>
        val s = raw.replace("~1", "/").replace("~0", "~")
        if (s == "-") Append
        else if (s.matches("\\d+")) Idx(s.toInt)
        else Key(s)
      }
    }
    if (!path.startsWith("$")) {
      // a bare double-quoted key unwraps (json_common.cpp: the quotes
      // delimit the key, they are not part of it — issue13948)
      return List(Key(
        if (path.length >= 2 && path.head == '"' && path.last == '"')
          path.substring(1, path.length - 1)
        else path))
    }
    val segs = scala.collection.mutable.ListBuffer.empty[Seg]
    var i = 1
    while (i < path.length) {
      path.charAt(i) match {
        case '.' =>
          i += 1
          if (i >= path.length) malformedPath(path)
          // '..key' / '..[i]' recursive descent (reference ReadKey
          // recursive flag + RecWildCardShortcut): mark RecWild; a
          // following '[' continues at the bracket, a following key
          // re-enters the loop AT the second dot so it parses normally
          // (a trailing '..' then falls through to the malformed error)
          if (path.charAt(i) == '.') {
            segs += RecWild
            if (i + 1 < path.length && path.charAt(i + 1) == '[') i += 1
            else if (i + 1 < path.length && path.charAt(i + 1) == '*')
              i += 2 // `..*` IS the recursive wildcard (ReadKey: '.' + '*')
            // else i stays at the second dot (`..key` re-parses as .key)
          }
          else if (path.charAt(i) == '*') {
            // `.**` is the recursive wildcard, `.*` the single-level one
            if (i + 1 < path.length && path.charAt(i + 1) == '*') {
              segs += RecWild; i += 2
            } else { segs += KeyWild; i += 1 }
          }
          else if (path.charAt(i) == '"') {
            // quoted key with backslash escapes (\" and \\)
            val sb = new java.lang.StringBuilder
            var j = i + 1
            var closed = false
            while (j < path.length && !closed) {
              val c = path.charAt(j)
              if (c == '\\' && j + 1 < path.length) {
                // only \" and \\ unescape; other escapes stay verbatim
                val n = path.charAt(j + 1)
                if (n == '"' || n == '\\') sb.append(n)
                else { sb.append(c); sb.append(n) }
                j += 2
              } else if (c == '"') { closed = true; j += 1 }
              else { sb.append(c); j += 1 }
            }
            if (!closed || sb.length == 0) malformedPath(path)
            segs += Key(sb.toString)
            i = j
          } else {
            var j = i
            while (j < path.length && path.charAt(j) != '.' && path.charAt(j) != '[') j += 1
            val k = path.substring(i, j)
            if (k.isEmpty) malformedPath(path)
            segs += Key(k)
            i = j
          }
        case '[' =>
          val close = path.indexOf(']', i)
          if (close < 0) malformedPath(path)
          val body = path.substring(i + 1, close).trim
          if (body == "#") segs += Append
          else if (body == "*") segs += IdxWild
          else if (body.startsWith("#-") && body.drop(2).matches("\\d+"))
            segs += Back(safeInt(body.drop(2), path))
          else if (body.matches("-\\d+")) segs += Back(-safeInt(body, path))
          else if (body.matches("\\d+")) segs += Idx(safeInt(body, path))
          else if (body.length >= 2 && body.head == '"' && body.last == '"')
            segs += Key(body.substring(1, body.length - 1))
          else malformedPath(path)
          i = close + 1
        case _ => malformedPath(path)
      }
    }
    segs.toList
  }

  private def step(cur: JsonNode, s: Seg): JsonNode =
    if (cur == null) null
    else s match {
      case Key(k) => if (cur.isObject) cur.get(k) else null
      case Idx(i) =>
        val k = if (i < 0) cur.size + i else i
        if (cur.isArray && k >= 0 && k < cur.size) cur.get(k) else null
      case Back(i) =>
        // reverse index 0 reads the FIRST element (json_common.cpp:285)
        val k = if (i == 0) 0 else cur.size - i
        if (cur.isArray && k >= 0 && k < cur.size) cur.get(k) else null
      case Append => null
      case KeyWild | IdxWild | RecWild => null // unreachable: node() rejects wildcards
    }

  private def isWild(s: Seg): Boolean =
    s == KeyWild || s == IdxWild || s == RecWild

  /** Does `path` parse to a wildcard-bearing path? (Bind-time check for
    * the LIST return type; malformed paths report false and fail later
    * on the scalar route.) */
  def isWildcardPath(path: UTF8String): Boolean =
    if (path == null) false
    else try {
      val segs = parse(path.toString)
      segs != null && segs.exists(isWild)
    } catch { case _: IllegalArgumentException => false }

  /** All nodes matched by a wildcard path, in the reference's traversal
    * order (GetWildcardPathInternal, json_common.cpp:325): `.*` fans out
    * over object values only, `[*]` over array elements only, `.**`
    * visits every descendant breadth-first (the node itself included
    * when a tail follows, excluded for a terminal `**`).
    */
  private def collect(cur0: JsonNode, segs0: List[Seg],
      out: scala.collection.mutable.ListBuffer[JsonNode]): Unit = {
    var cur = cur0
    var segs = segs0
    while (cur != null && segs.nonEmpty) {
      segs match {
        case KeyWild :: tl =>
          if (cur.isObject) {
            val it = cur.elements()
            while (it.hasNext) collect(it.next(), tl, out)
          }
          return
        case IdxWild :: tl =>
          if (cur.isArray) {
            val it = cur.elements()
            while (it.hasNext) collect(it.next(), tl, out)
          }
          return
        case RecWild :: tl =>
          // breadth-first: the queue grows while it is scanned
          val rec = scala.collection.mutable.ArrayBuffer[JsonNode](cur)
          var i = 0
          while (i < rec.length) {
            val n = rec(i)
            if (n.isContainerNode) {
              val it = n.elements()
              while (it.hasNext) rec += it.next()
            }
            if (i > 0 || tl.nonEmpty) collect(n, tl, out)
            i += 1
          }
          return
        case s :: tl =>
          cur = step(cur, s)
          segs = tl
      }
    }
    if (cur != null) out += cur
  }

  private def wildNodes(json: String, path: String): List[JsonNode] = {
    val segs = parse(path)
    val root = readDoc(json)
    if (segs == null) return Nil
    val out = scala.collection.mutable.ListBuffer.empty[JsonNode]
    collect(root, segs, out)
    out.toList
  }

  private def wildOf(j: UTF8String, p: UTF8String)(
      f: JsonNode => Any): GenericArrayData =
    new GenericArrayData(wildNodes(j.toString, p.toString).map(f).toArray)

  /** LIST(JSON) → JSON array text, the reference's implicit list→JSON
    * cast (a wildcard extract feeding another json function): elements
    * are already JSON, inserted raw. */
  def arrayToJson(a: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder("[")
    var i = 0
    while (i < a.numElements()) {
      if (i > 0) sb.append(',')
      if (a.isNullAt(i)) sb.append("null")
      else sb.append(a.getUTF8String(i).toString)
      i += 1
    }
    UTF8String.fromString(sb.append(']').toString)
  }

  def extractWild(j: UTF8String, p: UTF8String): GenericArrayData =
    wildOf(j, p)(render)
  def extractStringWild(j: UTF8String, p: UTF8String): GenericArrayData =
    wildOf(j, p) { n =>
      if (n.isNull) null
      else if (n.isTextual) UTF8String.fromString(n.textValue)
      else render(n)
    }
  def valueWild(j: UTF8String, p: UTF8String): GenericArrayData =
    wildOf(j, p)(n => if (n.isContainerNode || n.isNull) null else render(n))
  def typeOfWild(j: UTF8String, p: UTF8String): GenericArrayData =
    wildOf(j, p)(n => typeName(n))

  /** Subtree at `path`, or null when missing/unsupported path. Throws on
    * malformed JSON.
    */
  private def node(json: String, path: String): JsonNode = {
    val segs = parse(path)
    val root = readDoc(json)
    if (segs == null) return null
    if (segs.exists(isWild))
      throw new IllegalArgumentException(
        "JSON path wildcards require a constant path (LIST-returning extraction)")
    var cur: JsonNode = root
    for (s <- segs) cur = step(cur, s)
    cur
  }

  private def render(n: JsonNode): UTF8String =
    try UTF8String.fromString(mapper.writeValueAsString(n))
    catch { case _: Exception => null }

  def extract(json: UTF8String, path: UTF8String): UTF8String = {
    val n = node(json.toString, path.toString)
    if (n == null) null else render(n)
  }

  def extractString(json: UTF8String, path: UTF8String): UTF8String = {
    val n = node(json.toString, path.toString)
    if (n == null || n.isNull) null
    else if (n.isTextual) UTF8String.fromString(n.textValue)
    else render(n)
  }

  def value(json: UTF8String, path: UTF8String): UTF8String = {
    val n = node(json.toString, path.toString)
    if (n == null || n.isContainerNode || n.isNull) null else render(n)
  }

  private def typeName(n: JsonNode): UTF8String = {
    val t =
      if (n.isObject) "OBJECT"
      else if (n.isArray) "ARRAY"
      else if (n.isTextual) "VARCHAR"
      else if (n.isBoolean) "BOOLEAN"
      else if (n.isNull) "NULL"
      else if (n.isFloatingPointNumber) "DOUBLE"
      else if (n.canConvertToLong) { if (n.asLong() < 0) "BIGINT" else "UBIGINT" }
      else {
        val big = n.bigIntegerValue()
        if (big.signum() >= 0 && big.bitLength() <= 64) "UBIGINT" else "DOUBLE"
      }
    UTF8String.fromString(t)
  }

  def typeOf(json: UTF8String, path: UTF8String): UTF8String = {
    val n = node(json.toString, path.toString)
    if (n == null) null else typeName(n)
  }

  def valid(json: UTF8String): Boolean =
    try { mapper.readTree(normalizeNonFinite(json.toString)); true }
    catch { case _: Exception => false }

  /** `json(x)` — parse and re-render compact (yyjson minify). */
  def minify(json: UTF8String): UTF8String = render(readDoc(json.toString))

  def exists(json: UTF8String, path: UTF8String): Boolean =
    node(json.toString, path.toString) != null

  def arrayLength(json: UTF8String, path: UTF8String): java.lang.Long = {
    val n = node(json.toString, path.toString)
    if (n == null) null
    else if (n.isArray) java.lang.Long.valueOf(n.size.toLong)
    else java.lang.Long.valueOf(0L)
  }

  /** Keys of the object at `path` (empty array for non-objects), null
    * for a missing path — json_keys.cpp.
    */
  private def keysOf(n: JsonNode): GenericArrayData = {
    if (!n.isObject) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val it = n.fieldNames()
    while (it.hasNext) out += UTF8String.fromString(it.next())
    new GenericArrayData(out.toArray)
  }

  def keys(json: UTF8String, path: UTF8String): GenericArrayData = {
    val n = node(json.toString, path.toString)
    if (n == null) null else keysOf(n)
  }

  /** json_keys over a wildcard path: one key-list per match. */
  def keysWild(j: UTF8String, p: UTF8String): GenericArrayData =
    wildOf(j, p)(keysOf)

  // ---- list-of-paths overloads (json_executors.hpp ExecuteMany) ---------

  private def manyOf(j: UTF8String,
      paths: org.apache.spark.sql.catalyst.util.ArrayData)(
      f: (UTF8String, UTF8String) => Any): GenericArrayData = {
    val n = paths.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (paths.isNullAt(i)) null else f(j, paths.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def extractMany(j: UTF8String, p: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData =
    manyOf(j, p)(extract)
  def extractStringMany(j: UTF8String, p: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData =
    manyOf(j, p)(extractString)
  def valueMany(j: UTF8String, p: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData =
    manyOf(j, p)(value)
  def typeOfMany(j: UTF8String, p: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData =
    manyOf(j, p)(typeOf)
  def existsMany(j: UTF8String, p: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData =
    manyOf(j, p)((a, b) => java.lang.Boolean.valueOf(exists(a, b)))
  def arrayLengthMany(j: UTF8String, p: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData =
    manyOf(j, p)(arrayLength)
  def keysMany(j: UTF8String, p: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData =
    manyOf(j, p)(keys)

  /** Integer-index path overload (`json_extract(j, 0)`) as a path.
    * Spelled `$[i]` — a bare digit STRING path is a KEY lookup in the
    * reference (issue13948: json_extract('[1,2,3]', '0') is NULL), only
    * the integer-typed overload indexes. */
  def pathOf(i: Long): UTF8String = UTF8String.fromString(s"$$[$i]")

  /** json_object(k1, v1, ...) — reference json_create.cpp: NULL keys
    * raise, NULL values render as JSON null, VARCHAR values become JSON
    * strings, numerics/booleans stay raw. */
  def jsonObject(kvs: Array[AnyRef]): UTF8String = {
    val node = mapper.createObjectNode()
    var i = 0
    while (i < kvs.length) {
      val k = kvs(i)
      if (k == null)
        throw new IllegalArgumentException(
          "Invalid Input Error: json_object JSON key cannot be NULL")
      val key = k.toString
      kvs(i + 1) match {
        case null => node.putNull(key)
        case u: UTF8String => node.put(key, u.toString)
        case n: java.lang.Long => node.put(key, n.longValue)
        case n: java.lang.Integer => node.put(key, n.intValue)
        case n: java.lang.Short => node.put(key, n.intValue)
        case n: java.lang.Byte => node.put(key, n.intValue)
        case n: java.lang.Double => node.put(key, n.doubleValue)
        case n: java.lang.Float => node.put(key, n.floatValue)
        case b: java.lang.Boolean => node.put(key, b.booleanValue)
        case d: org.apache.spark.sql.types.Decimal =>
          node.put(key, d.toJavaBigDecimal)
        case other => node.put(key, String.valueOf(other))
      }
      i += 2
    }
    render(node)
  }

  // ---- json_contains (fuzzy containment, json_contains.cpp) -------------

  private def fuzzyEquals(h: JsonNode, n: JsonNode): Boolean = {
    if (h.equals(n)) return true
    if (h.getNodeType != n.getNodeType) return false
    if (h.isArray) {
      val it = n.elements()
      while (it.hasNext) {
        val ne = it.next()
        var found = false
        val hit = h.elements()
        while (hit.hasNext && !found) found = fuzzyEquals(hit.next(), ne)
        if (!found) return false
      }
      true
    } else if (h.isObject) {
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        val hv = h.get(e.getKey)
        if (hv == null || !fuzzyEquals(hv, e.getValue)) return false
      }
      true
    } else false
  }

  private def containsNode(h: JsonNode, n: JsonNode): Boolean = {
    if (fuzzyEquals(h, n)) return true
    if (h.isContainerNode) {
      val it = h.elements()
      while (it.hasNext) if (containsNode(it.next(), n)) return true
    }
    false
  }

  def contains(haystack: UTF8String, needle: UTF8String): Boolean =
    containsNode(readDoc(haystack.toString), readDoc(needle.toString))

  // ---- json_normalize / json_strip_nulls --------------------------------

  private def sortKeys(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = o.fieldNames()
      while (it.hasNext) names += it.next()
      val sorted = mapper.createObjectNode()
      val byteLt = (x: String, y: String) => {
        val (a, b) = (x.getBytes("UTF-8"), y.getBytes("UTF-8"))
        var i = 0
        var r = 0
        while (r == 0 && i < a.length && i < b.length) {
          r = (a(i) & 0xff) - (b(i) & 0xff); i += 1
        }
        (if (r == 0) a.length - b.length else r) < 0
      }
      for (k <- names.sortWith(byteLt))
        sorted.set[JsonNode](k, sortKeys(o.get(k)))
      sorted
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      val it = a.elements()
      while (it.hasNext) out.add(sortKeys(it.next()))
      out
    case other => other
  }

  def normalize(json: UTF8String): UTF8String =
    render(sortKeys(readDoc(json.toString)))

  private def stripNulls(n: JsonNode): Unit = n match {
    case o: ObjectNode =>
      val it = o.fields()
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNull) dead += e.getKey else stripNulls(e.getValue)
      }
      dead.foreach(o.remove)
    case a: ArrayNode =>
      val it = a.elements()
      while (it.hasNext) stripNulls(it.next())
    case _ =>
  }

  def stripNullsFn(json: UTF8String): UTF8String = {
    val root = readDoc(json.toString)
    stripNulls(root)
    render(root)
  }

  // ---- modify family (json_modify.cpp) ----------------------------------

  /** mode: set | insert | replace | remove. `value` is JSON text (ignored
    * for remove). A modification that cannot apply returns the document
    * unchanged; removing the root yields SQL NULL.
    */
  def modify(json: UTF8String, path: UTF8String, value: UTF8String,
      mode: String): UTF8String = {
    val segs = parse(path.toString)
    val root = readDoc(json.toString).deepCopy[JsonNode]()
    if (segs == null) return render(root)
    if (segs.exists(isWild))
      throw new IllegalArgumentException(
        "JSON path wildcards are not supported in JSON modification functions")
    val newVal: JsonNode =
      if (mode == "remove") null else readDoc(value.toString)
    if (segs.isEmpty) {
      // ModifyRoot: root always exists — INSERT never overwrites it
      return mode match {
        case "set" | "replace" => render(newVal)
        case "insert" => render(root)
        case "remove" => null
      }
    }
    val create = mode == "set" || mode == "insert"
    // resolve the parent, creating intermediate containers when allowed;
    // build the created chain detached and only attach on success
    var cur: JsonNode = root
    var pendingParent: JsonNode = null // where the created chain attaches
    var pendingSeg: Seg = null
    var pendingChild: JsonNode = null // head of the created chain
    var failed = false
    var i = 0
    while (i + 1 < segs.length && !failed) {
      val s = segs(i)
      val next = segs(i + 1)
      var child = step(cur, s)
      if (child == null) {
        val compatible = s match {
          case Key(_) => cur.isObject
          case Append => cur.isArray
          case Idx(ix) => cur.isArray && ix == cur.size
          case Back(_) => false
        }
        if (!create || !compatible) failed = true
        else {
          val made: JsonNode = next match {
            case Key(_) => mapper.createObjectNode()
            case _ => mapper.createArrayNode()
          }
          if (pendingChild == null) {
            pendingParent = cur; pendingSeg = s; pendingChild = made
          } else attach(cur, s, made)
          child = made
        }
      }
      cur = child
      i += 1
    }
    if (!failed) failed = !applyModify(cur, segs.last, mode, newVal)
    if (!failed && pendingChild != null) attach(pendingParent, pendingSeg, pendingChild)
    if (failed) render(readDoc(json.toString)) else render(root)
  }

  private def attach(parent: JsonNode, s: Seg, child: JsonNode): Unit = s match {
    case Key(k) => parent.asInstanceOf[ObjectNode].set[JsonNode](k, child)
    case _ => parent.asInstanceOf[ArrayNode].add(child)
  }

  private def arrayPos(arr: JsonNode, s: Seg): Int = s match {
    case Idx(i) => if (i < 0) -1 else i
    case Back(i) => if (i > arr.size) -1 else arr.size - i // reverse 0 appends
    case Append => arr.size
    case _ => -1
  }

  private def applyModify(parent: JsonNode, s: Seg, mode: String,
      newVal: JsonNode): Boolean = s match {
    case Key(k) =>
      if (!parent.isObject) return false
      val obj = parent.asInstanceOf[ObjectNode]
      val existing = obj.get(k)
      if (mode == "insert" && existing != null) return false
      if ((mode == "replace" || mode == "remove") && existing == null) return false
      if (mode == "remove") obj.remove(k) else obj.set[JsonNode](k, newVal)
      true
    case seg =>
      if (!parent.isArray) return false
      val arr = parent.asInstanceOf[ArrayNode]
      val pos = arrayPos(arr, seg)
      if (pos < 0 || pos > arr.size) return false
      val exists = pos < arr.size
      mode match {
        case "set" =>
          if (exists) arr.set(pos, newVal) else arr.add(newVal); true
        case "insert" =>
          if (exists) false else { arr.add(newVal); true }
        case "replace" =>
          if (!exists) false else { arr.set(pos, newVal); true }
        case "remove" =>
          if (!exists) false else { arr.remove(pos); true }
      }
  }

  // ---- json_merge_patch_diff (json_merge_patch_diff.cpp) ----------------

  /** The RFC 7386 patch that transforms `old` into `new`: object pairs
    * diff recursively (removed keys -> null, empty diff -> {}); any
    * other pair yields `new` verbatim. A SQL NULL old yields `new`.
    */
  def mergePatchDiff(oldJ: UTF8String, newJ: UTF8String): UTF8String = {
    val n = readDoc(newJ.toString)
    if (oldJ == null) return render(n)
    val o = readDoc(oldJ.toString)
    val out =
      if (o.isObject && n.isObject) {
        val d = computeDiff(o, n)
        if (d == null) mapper.createObjectNode() else d
      } else n
    render(out)
  }

  private def computeDiff(o: JsonNode, n: JsonNode): JsonNode = {
    if (o.isObject && n.isObject) {
      val b = mapper.createObjectNode()
      var has = false
      val oit = o.fields()
      while (oit.hasNext) {
        val e = oit.next()
        if (!n.has(e.getKey)) {
          b.set[JsonNode](e.getKey, mapper.getNodeFactory.nullNode); has = true
        }
      }
      val nit = n.fields()
      while (nit.hasNext) {
        val e = nit.next()
        val ov = o.get(e.getKey)
        if (ov == null) { b.set[JsonNode](e.getKey, e.getValue); has = true }
        else {
          val sub = computeDiff(ov, e.getValue)
          if (sub != null) { b.set[JsonNode](e.getKey, sub); has = true }
        }
      }
      if (has) b else null
    } else if (o == n) null
    else n
  }

  // ---- json_deep_merge (json_deep_merge.cpp) ----------------------------

  private def deepMerge(orig: JsonNode, patch: JsonNode): JsonNode = {
    if (patch == null) return orig
    if (!patch.isObject) {
      if (patch.isNull && orig != null) return orig
      return patch
    }
    if (orig == null || !orig.isObject) return patch
    val builder = mapper.createObjectNode()
    val oit = orig.fields()
    while (oit.hasNext) {
      val e = oit.next()
      val pv = patch.get(e.getKey)
      if (pv == null || pv.isNull)
        builder.set[JsonNode](e.getKey, e.getValue)
    }
    val pit = patch.fields()
    while (pit.hasNext) {
      val e = pit.next()
      if (!e.getValue.isNull)
        builder.set[JsonNode](e.getKey, deepMerge(orig.get(e.getKey), e.getValue))
    }
    builder
  }

  /** Left-fold deep merge over ≥2 documents with the reference's NULL
    * semantics (pinned by the corpus): a SQL NULL patch nulls the
    * accumulator; a NULL accumulator means "undefined" and the next
    * patch replaces it wholesale.
    */
  def deepMergeMany(docs: Array[UTF8String]): UTF8String = {
    var acc: JsonNode = if (docs.head == null) null else readDoc(docs.head.toString)
    for (d <- docs.tail)
      acc =
        if (d == null) null
        else if (acc == null) readDoc(d.toString)
        else deepMerge(acc, readDoc(d.toString))
    if (acc == null) null else render(acc)
  }
}

/** Binary string->string JSON navigation expression; `mode` selects the
  * JsonNav kernel (extract | extract_string | value | type). The path
  * operand may also be a LIST of paths (the reference's ExecuteMany
  * overload), in which case the result is a LIST of per-path results.
  */
case class JsonNavExpr(left: Expression, right: Expression, mode: String,
    wildcard: Boolean = false)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = s"json_$mode"
  // a LIST(JSON) document (a wildcard extract's output) casts to a JSON
  // array implicitly, like the reference binder
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(StringType, ArrayType(StringType)),
      TypeCollection(StringType, ArrayType(StringType), LongType, IntegerType))
  private def leftList: Boolean = left.dataType.isInstanceOf[ArrayType]
  private def asDoc(l: Any): UTF8String = l match {
    case u: UTF8String => u
    case a: org.apache.spark.sql.catalyst.util.ArrayData => JsonNav.arrayToJson(a)
  }
  protected def docRef(a: String): String =
    if (leftList) s"org.apache.spark.sql.graft.JsonNav.arrayToJson($a)" else a
  private def many: Boolean = right.dataType.isInstanceOf[ArrayType]
  private def integralPath: Boolean =
    right.dataType == LongType || right.dataType == IntegerType
  private def asPathValue(r: Any): UTF8String = r match {
    case u: UTF8String => u
    case n: java.lang.Number => JsonNav.pathOf(n.longValue)
  }
  protected def pathRef(b: String): String =
    if (integralPath) s"org.apache.spark.sql.graft.JsonNav.pathOf((long) $b)" else b
  override def dataType: DataType =
    if (many || wildcard) ArrayType(StringType, containsNull = true)
    else StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  private def kernel: String = (mode match {
    case "extract" => "extract"
    case "extract_string" => "extractString"
    case "value" => "value"
    case "type" => "typeOf"
  }) + (if (many) "Many" else if (wildcard) "Wild" else "")
  override def nullSafeEval(l: Any, r: Any): Any = {
    val j = asDoc(l)
    if (many) {
      val p = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      mode match {
        case "extract" => JsonNav.extractMany(j, p)
        case "extract_string" => JsonNav.extractStringMany(j, p)
        case "value" => JsonNav.valueMany(j, p)
        case "type" => JsonNav.typeOfMany(j, p)
      }
    } else if (wildcard) {
      val p = asPathValue(r)
      mode match {
        case "extract" => JsonNav.extractWild(j, p)
        case "extract_string" => JsonNav.extractStringWild(j, p)
        case "value" => JsonNav.valueWild(j, p)
        case "type" => JsonNav.typeOfWild(j, p)
      }
    } else {
      val p = asPathValue(r)
      mode match {
        case "extract" => JsonNav.extract(j, p)
        case "extract_string" => JsonNav.extractString(j, p)
        case "value" => JsonNav.value(j, p)
        case "type" => JsonNav.typeOf(j, p)
      }
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |${ev.value} = org.apache.spark.sql.graft.JsonNav.$kernel(${docRef(a)}, ${pathRef(b)});
      |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** json_object(k1, v1, k2, v2, ...) — keys must be VARCHAR at bind
  * (json_create.cpp), NULL keys raise at eval, NULL values keep a JSON
  * null entry. */
case class JsonObjectExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def prettyName: String = "json_object"
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.length % 2 != 0)
      TypeCheckFailure("json_object expects key/value pairs")
    else if (!children.grouped(2).forall(_.head.dataType == StringType))
      TypeCheckFailure("json_object() keys must be VARCHAR")
    else TypeCheckSuccess
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val kvs = new Array[AnyRef](children.length)
    var i = 0
    while (i < children.length) {
      kvs(i) = children(i).eval(input).asInstanceOf[AnyRef]
      i += 1
    }
    JsonNav.jsonObject(kvs)
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(children = cs)
}

object JsonNavExpr {
  /** Bind-time wildcard detection (json_common.cpp ValidatePath): the
    * LIST return type is decided from a CONSTANT path literal at
    * registration and is sticky — a path that becomes foldable only
    * after optimization keeps the scalar type (the runtime kernel then
    * raises, mirroring the reference's non-constant wildcard bind
    * error). This keeps dataType stable across analyzer/optimizer
    * copies.
    */
  def of(l: Expression, r: Expression, mode: String): JsonNavExpr =
    JsonNavExpr(l, r, mode, r match {
      case Literal(u: UTF8String, StringType) => JsonNav.isWildcardPath(u)
      case _ => false
    })
}

case class JsonValidExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "json_valid"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    JsonNav.valid(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.JsonNav.valid($a);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class JsonExistsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "json_exists"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, TypeCollection(StringType, ArrayType(StringType), LongType, IntegerType))
  private def many: Boolean = right.dataType.isInstanceOf[ArrayType]
  private def integralPath: Boolean =
    right.dataType == LongType || right.dataType == IntegerType
  private def asPathValue(r: Any): UTF8String = r match {
    case u: UTF8String => u
    case n: java.lang.Number => JsonNav.pathOf(n.longValue)
  }
  protected def pathRef(b: String): String =
    if (integralPath) s"org.apache.spark.sql.graft.JsonNav.pathOf((long) $b)" else b
  override def dataType: DataType =
    if (many) ArrayType(BooleanType, containsNull = true) else BooleanType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any =
    if (many)
      JsonNav.existsMany(l.asInstanceOf[UTF8String],
        r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    else JsonNav.exists(l.asInstanceOf[UTF8String], asPathValue(r))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (many)
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |${ev.value} = org.apache.spark.sql.graft.JsonNav.existsMany($a, $b);
        |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    else nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.JsonNav.exists($a, ${pathRef(b)});")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class JsonKeysExpr(left: Expression, right: Expression,
    wildcard: Boolean = false)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "json_keys"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(StringType, ArrayType(StringType)),
      TypeCollection(StringType, ArrayType(StringType), LongType, IntegerType))
  private def leftList: Boolean = left.dataType.isInstanceOf[ArrayType]
  private def asDoc(l: Any): UTF8String = l match {
    case u: UTF8String => u
    case a: org.apache.spark.sql.catalyst.util.ArrayData => JsonNav.arrayToJson(a)
  }
  protected def docRef(a: String): String =
    if (leftList) s"org.apache.spark.sql.graft.JsonNav.arrayToJson($a)" else a
  private def many: Boolean = right.dataType.isInstanceOf[ArrayType]
  private def integralPath: Boolean =
    right.dataType == LongType || right.dataType == IntegerType
  private def asPathValue(r: Any): UTF8String = r match {
    case u: UTF8String => u
    case n: java.lang.Number => JsonNav.pathOf(n.longValue)
  }
  protected def pathRef(b: String): String =
    if (integralPath) s"org.apache.spark.sql.graft.JsonNav.pathOf((long) $b)" else b
  override def dataType: DataType =
    if (many || wildcard)
      ArrayType(ArrayType(StringType, containsNull = false), containsNull = true)
    else ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  private def kernel: String =
    if (many) "keysMany" else if (wildcard) "keysWild" else "keys"
  override def nullSafeEval(l: Any, r: Any): Any =
    if (many)
      JsonNav.keysMany(asDoc(l),
        r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    else if (wildcard) JsonNav.keysWild(asDoc(l), asPathValue(r))
    else JsonNav.keys(asDoc(l), asPathValue(r))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |${ev.value} = org.apache.spark.sql.graft.JsonNav.$kernel(${docRef(a)}, ${if (many) b else pathRef(b)});
      |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object JsonKeysExpr {
  /** Same sticky bind-time wildcard detection as [[JsonNavExpr.of]]. */
  def of(l: Expression, r: Expression): JsonKeysExpr =
    JsonKeysExpr(l, r, r match {
      case Literal(u: UTF8String, StringType) => JsonNav.isWildcardPath(u)
      case _ => false
    })
}

case class JsonArrayLengthPath(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "json_array_length"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, TypeCollection(StringType, ArrayType(StringType), LongType, IntegerType))
  private def many: Boolean = right.dataType.isInstanceOf[ArrayType]
  private def integralPath: Boolean =
    right.dataType == LongType || right.dataType == IntegerType
  private def asPathValue(r: Any): UTF8String = r match {
    case u: UTF8String => u
    case n: java.lang.Number => JsonNav.pathOf(n.longValue)
  }
  protected def pathRef(b: String): String =
    if (integralPath) s"org.apache.spark.sql.graft.JsonNav.pathOf((long) $b)" else b
  override def dataType: DataType =
    if (many) ArrayType(LongType, containsNull = true) else LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any =
    if (many)
      JsonNav.arrayLengthMany(l.asInstanceOf[UTF8String],
        r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    else {
      val v = JsonNav.arrayLength(l.asInstanceOf[UTF8String], asPathValue(r))
      if (v == null) null else v.longValue
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (many)
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |${ev.value} = org.apache.spark.sql.graft.JsonNav.arrayLengthMany($a, $b);
        |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    else {
      val tmp = ctx.freshName("jlen")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |java.lang.Long $tmp = org.apache.spark.sql.graft.JsonNav.arrayLength($a, ${pathRef(b)});
        |${ev.isNull} = $tmp == null;
        |${ev.value} = ${ev.isNull} ? -1L : $tmp.longValue();""".stripMargin)
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class JsonContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "json_contains"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any =
    JsonNav.contains(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.JsonNav.contains($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Unary STRING->STRING JSON kernels (normalize | strip_nulls). */
case class JsonUnaryExpr(child: Expression, mode: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = s"json_$mode"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  private def kernel: String = mode match {
    case "normalize" => "normalize"
    case "strip_nulls" => "stripNullsFn"
    case "minify" => "minify"
  }
  override def nullSafeEval(v: Any): Any = {
    val j = v.asInstanceOf[UTF8String]
    mode match {
      case "normalize" => JsonNav.normalize(j)
      case "strip_nulls" => JsonNav.stripNullsFn(j)
      case "minify" => JsonNav.minify(j)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = org.apache.spark.sql.graft.JsonNav.$kernel($a);
      |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** json_set / json_insert / json_replace (3 args) and json_remove (the
  * registry passes Literal("null") as the unused value argument).
  */
case class JsonModifyExpr(first: Expression, second: Expression,
    third: Expression, mode: String)
    extends TernaryExpression with ExpectsInputTypes {
  override def prettyName: String = s"json_$mode"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(j: Any, p: Any, v: Any): Any =
    JsonNav.modify(j.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String],
      v.asInstanceOf[UTF8String], mode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
      |${ev.value} = org.apache.spark.sql.graft.JsonNav.modify($a, $b, $c, "$mode");
      |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

/** json_merge_patch_diff — SQL NULL `new` nulls the result; SQL NULL
  * `old` yields `new` (reference validity semantics).
  */
case class JsonMergePatchDiffExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "json_merge_patch_diff"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = right.eval(input)
    if (n == null) return null
    val o = left.eval(input)
    JsonNav.mergePatchDiff(
      if (o == null) null else o.asInstanceOf[UTF8String],
      n.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val tmp = ctx.freshName("mpdOld")
    ev.copy(code = code"""
      |${r.code}
      |boolean ${ev.isNull} = ${r.isNull};
      |org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
      |if (!${ev.isNull}) {
      |  ${l.code}
      |  org.apache.spark.unsafe.types.UTF8String $tmp = ${l.isNull} ? null : ${l.value};
      |  ${ev.value} = org.apache.spark.sql.graft.JsonNav.mergePatchDiff($tmp, ${r.value});
      |  ${ev.isNull} = ${ev.value} == null;
      |}
      |""".stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class JsonDeepMergeExpr(children: Seq[Expression])
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "json_deep_merge"
  override def inputTypes: Seq[AbstractDataType] = children.map(_ => StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    JsonNav.deepMergeMany(
      children.map(_.eval(input).asInstanceOf[UTF8String]).toArray)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]) = copy(children = cs)
}
