package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CREATE TABLE constraint capture + DML-time enforcement.
  *
  * Reference semantics: `src/storage/data_table.cpp:594-632`
  * (`VerifyAppendConstraints`: NOT NULL, CHECK, unique-index probes run
  * BEFORE any row is appended — a failed multi-row INSERT writes
  * nothing), `src/planner/binder/statement/bind_create_table.cpp` (CHECK
  * expressions bind against the table's own columns only: no subqueries,
  * no aggregates, no other relations), and the
  * `test/sql/constraints/{test_not_null,check,primarykey,unique}` suites.
  *
  * Spark has no enforced constraints, so the engine keeps the declared
  * constraint set in a session registry (the DDL executes with the
  * constraint syntax stripped) and the DML layer (graft.functions.Dml)
  * verifies every batch of new rows — one declarative aggregate per
  * constraint — before swapping contents in. At 100 TB the NOT
  * NULL/CHECK probes are narrow scans of the new rows only; the
  * PK/UNIQUE probe is one hash-shuffle (groupBy count) of the key
  * columns, the same cost class as the reference's ART-index build. A
  * real warehouse deployment would keep a persistent key index; the
  * declarative probe is the engine-native equivalent with identical
  * accept/reject semantics.
  *
  * Error surfaces mirrored exactly:
  *  - "NOT NULL constraint failed: table.col" (data_table.cpp:594)
  *  - "CHECK constraint failed on table t with expression expr"
  *    (data_table.cpp:632)
  *  - append: "PRIMARY KEY or UNIQUE constraint violation: duplicate
  *    key \"col: v\"" (art.cpp:570)
  *  - rewrite (UPDATE/upsert DO UPDATE): "Duplicate key \"col: v\"
  *    violates primary key|unique constraint." (art.cpp:839)
  */
object Constraints {

  case class UniqueSet(cols: Seq[String], isPk: Boolean)

  case class TableConstraints(
      table: String,
      notNull: Seq[String],
      checks: Seq[String],
      uniques: Seq[UniqueSet])

  // session-scoped registry (same WeakHashMap+UUID keying discipline as
  // graft.functions.Sequences — see the rationale there)
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, TableConstraints]()
  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())
  private def sessionKey(spark: SparkSession): String =
    sessionIds.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)

  private def bare(table: String): String =
    Dml.unq(table.split('.').last.trim).toLowerCase

  private def currentDb(spark: SparkSession): String =
    try spark.catalog.currentDatabase.toLowerCase
    catch { case _: Throwable => "default" }

  /** Registry names are db-qualified: a CREATE/DROP of `otherdb.t` must
    * not touch the constraints of `default.t` (the multi-database
    * surface — ATTACH, COPY FROM DATABASE — makes bare-name keying
    * wrong). Unqualified names resolve against the session's current
    * database, matching the reference's schema search path. */
  private def resolvedName(spark: SparkSession, table: String): String = {
    // the reference's builtin schema prefix (main.t / system.main.t)
    // means "current database", same stripping as Dml.parseTableRef
    val stripped = table.replaceAll("(?i)^(system\\s*\\.\\s*)?main\\s*\\.\\s*", "")
    val parts = stripped.split('.').iterator
      .map(p => Dml.unq(p.trim).toLowerCase).filter(_.nonEmpty).toSeq
    val t = parts.last
    val db =
      if (parts.length < 2) currentDb(spark)
      else parts(parts.length - 2) match {
        // catalog.main.table — interior "main" is the builtin schema
        case "main" if parts.length >= 3 => parts(parts.length - 3)
        case "main" => currentDb(spark)
        case d => d
      }
    db + "." + t
  }

  private def key(spark: SparkSession, table: String): String =
    sessionKey(spark) + ":" + resolvedName(spark, table)

  def of(spark: SparkSession, table: String): Option[TableConstraints] =
    Option(registry.get(key(spark, table)))

  /** Register under tc.table resolved in the CURRENT database. */
  def register(spark: SparkSession, tc: TableConstraints): Unit =
    registry.put(key(spark, tc.table), tc): Unit

  /** Register under an explicitly (possibly db-qualified) name — used
    * when the registration site's current database is not the target's
    * (COPY FROM DATABASE, qualified CREATE TABLE). */
  def registerAt(spark: SparkSession, table: String, tc: TableConstraints): Unit =
    registry.put(key(spark, table), tc): Unit

  def unregister(spark: SparkSession, table: String): Unit =
    registry.remove(key(spark, table)): Unit

  /** Drop every registration of this session (corpus-runner hermeticity,
    * like Macros.clear). */
  def clear(spark: SparkSession): Unit = {
    val pfx = sessionKey(spark) + ":"
    registry.keySet.removeIf(_.startsWith(pfx)): Unit
  }

  // ------------------------------------------------------------------
  // DDL interception
  // ------------------------------------------------------------------

  private val CreateHead =
    """(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP\s+|TEMPORARY\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?((?:"[^"]+"|`[^`]+`|[\w$]+)(?:\s*\.\s*(?:"[^"]+"|`[^`]+`|[\w$]+))*)\s*\(""".r
  private val DropHead =
    """(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?((?:"[^"]+"|`[^`]+`|[\w$]+)(?:\s*\.\s*(?:"[^"]+"|`[^`]+`|[\w$]+))*)""".r
  private val ConstraintKw =
    """(?i)\b(PRIMARY\s+KEY|UNIQUE|CHECK\s*\(|NOT\s+NULL|FOREIGN\s+KEY)\b""".r

  /** True when the statement is a CREATE TABLE whose body declares
    * constraints this module must capture and enforce. */
  def matchesDdl(sql: String): Boolean = CreateHead.findFirstMatchIn(sql) match {
    case Some(m) =>
      ConstraintKw.findFirstIn(sql.substring(m.end - 1)).isDefined
    case None => false
  }

  /** Runner-side hook: handles constraint-bearing CREATE TABLE fully
    * (returns Some); unregisters stale entries on DROP TABLE / plain
    * CREATE TABLE and returns None so the default path executes. */
  def intercept(spark: SparkSession, sql: String): Option[DataFrame] = {
    DropHead.findFirstMatchIn(sql).foreach(m => unregister(spark, m.group(1)))
    CreateHead.findFirstMatchIn(sql) match {
      case Some(m) =>
        if (ConstraintKw.findFirstIn(sql.substring(m.end - 1)).isDefined)
          Some(executeDdl(spark, sql))
        else { unregister(spark, m.group(3)); None }
      case None => None
    }
  }

  // ------------------------------------------------------------------
  // CREATE UNIQUE INDEX / DROP INDEX — the reference's other spelling
  // of a uniqueness constraint (art_index.cpp; plain CREATE INDEX only
  // changes physical planning and stays dropped at import)
  // ------------------------------------------------------------------

  private val UniqueIndexRe =
    """(?is)^\s*CREATE\s+UNIQUE\s+INDEX\s+(?:IF\s+NOT\s+EXISTS\s+)?("[^"]+"|`[^`]+`|[\w$]+)\s+ON\s+((?:"[^"]+"|`[^`]+`|[\w$]+)(?:\s*\.\s*(?:"[^"]+"|`[^`]+`|[\w$]+))*)\s*\(([^)]*)\)""".r
  private val DropIndexRe =
    """(?is)^\s*DROP\s+INDEX\s+(?:IF\s+EXISTS\s+)?("[^"]+"|`[^`]+`|[\w$]+)""".r

  /** session:indexname → (table bare name, column set) */
  private val indexes =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[String])]()

  def matchesIndexDdl(sql: String): Boolean =
    UniqueIndexRe.findFirstMatchIn(sql).isDefined ||
      DropIndexRe.findFirstMatchIn(sql).isDefined

  def executeIndexDdl(spark: SparkSession, sql: String): DataFrame = {
    UniqueIndexRe.findFirstMatchIn(sql) match {
      case Some(m) =>
        val idx = Dml.unq(m.group(1)).toLowerCase
        val table = m.group(2)
        val cols = Dml.splitTop(m.group(3)).map(Dml.unq)
        // existing contents must already be unique (art_index.cpp:106)
        val colSql = cols.map(Dml.q).mkString(", ")
        val nonNull = cols.map(c => s"${Dml.q(c)} IS NOT NULL").mkString(" AND ")
        if (firstRow(spark,
            s"""SELECT $colSql FROM $table WHERE $nonNull
               |GROUP BY $colSql HAVING count(*) > 1 LIMIT 1""".stripMargin).nonEmpty)
          throw new IllegalArgumentException(
            "Constraint Error: Data contains duplicates on indexed column(s)")
        val tc = of(spark, table).getOrElse(
          TableConstraints(bare(table), Nil, Nil, Nil))
        registerAt(spark, table, tc.copy(
          uniques = tc.uniques :+ UniqueSet(cols, isPk = false)))
        indexes.put(sessionKey(spark) + ":" + idx,
          (resolvedName(spark, table), cols))
        spark.emptyDataFrame
      case None =>
        val m = DropIndexRe.findFirstMatchIn(sql).getOrElse(
          throw new IllegalArgumentException(s"not an index DDL: $sql"))
        val idx = Dml.unq(m.group(1)).toLowerCase
        Option(indexes.remove(sessionKey(spark) + ":" + idx)).foreach {
          case (table, cols) =>
            of(spark, table).foreach { tc =>
              registerAt(spark, table, tc.copy(uniques = tc.uniques.filterNot(u =>
                !u.isPk && u.cols.map(_.toLowerCase) == cols.map(_.toLowerCase))))
            }
        }
        spark.emptyDataFrame
    }
  }

  private case class ColDef(name: String, tpe: String, default: Option[String])

  /** Parse + validate + register + run the constraint-stripped DDL. */
  def executeDdl(spark: SparkSession, sql: String): DataFrame = {
    val m = CreateHead.findFirstMatchIn(sql).getOrElse(
      throw new IllegalArgumentException(s"not a CREATE TABLE: $sql"))
    val orReplace = m.group(1) != null
    val ifNotExists = m.group(2) != null
    val table = m.group(3)
    // body = text between the opening paren and its matching close
    val openIdx = m.end - 1
    val (_, depth) = Dml.scanFull(sql)
    var close = openIdx + 1
    while (close < sql.length && !(sql.charAt(close) == ')' && depth(close) == openDepth(depth, openIdx)))
      close += 1
    val body = sql.substring(openIdx + 1, close)

    val cols = scala.collection.mutable.ArrayBuffer[ColDef]()
    val notNull = scala.collection.mutable.LinkedHashSet[String]()
    val checks = scala.collection.mutable.ArrayBuffer[String]()
    val uniques = scala.collection.mutable.ArrayBuffer[UniqueSet]()

    for (item0 <- Dml.splitTop(body)) {
      val item = item0.replaceFirst("(?is)^CONSTRAINT\\s+(\"[^\"]+\"|`[^`]+`|[\\w$]+)\\s+", "")
      val il = item.toLowerCase
      if (il.startsWith("primary")) {
        val pkCols = innerList(item)
        uniques += UniqueSet(pkCols, isPk = true)
        notNull ++= pkCols
      } else if (il.startsWith("unique")) {
        uniques += UniqueSet(innerList(item), isPk = false)
      } else if (il.startsWith("check")) {
        checks += innerParen(item)
      } else if (il.startsWith("foreign")) {
        // FOREIGN KEY: accepted, not enforced (documented non-goal —
        // the reference's FK machinery rides its MVCC storage)
      } else {
        cols += parseColDef(item, notNull, checks, uniques)
      }
    }

    // CHECK validation at create time (bind_create_table.cpp): no
    // subqueries, no aggregates, only this table's columns
    val probe = cols.map(c =>
      s"CAST(NULL AS ${c.tpe}) AS ${Dml.q(c.name)}").mkString(", ")
    for (ck <- checks) {
      if (Dml.hasSubquery(ck))
        throw new IllegalArgumentException(
          "Binder Error: subqueries are not allowed in CHECK constraints")
      val bound = stripSelfQualifier(ck, table)
      try spark.sql(s"SELECT count(*) FROM (SELECT $probe) WHERE coalesce(($bound), true)").collect()
      catch {
        case e: Throwable => throw new IllegalArgumentException(
          s"Binder Error: invalid CHECK constraint expression ($ck): ${e.getMessage}")
      }
    }

    val coldefs = cols.map(c =>
      s"${Dml.q(c.name)} ${c.tpe}" + c.default.map(d => s" DEFAULT $d").getOrElse(""))
    if (orReplace) spark.sql(s"DROP TABLE IF EXISTS $table").collect()
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    spark.sql(s"CREATE TABLE $ine$table (${coldefs.mkString(", ")})").collect()
    registerAt(spark, table, TableConstraints(bare(table), notNull.toSeq,
      checks.map(c => stripSelfQualifier(c, table)).toSeq, uniques.toSeq))
    spark.emptyDataFrame
  }

  private def openDepth(depth: Array[Int], openIdx: Int): Int = depth(openIdx)

  /** `PRIMARY KEY (a, b)` → Seq(a, b). */
  private def innerList(item: String): Seq[String] =
    Dml.splitTop(innerParen(item)).map(Dml.unq)

  /** Text inside the item's first top-level parenthesis group. */
  private def innerParen(item: String): String = innerParenSpan(item)._1

  /** Same, plus the index of the matching close paren — callers that
    * keep parsing past the group must advance with this index, NOT a
    * length reconstructed from the trimmed inner text (`CHECK ( i > 0 )`
    * trims two chars and would mis-offset the tail). */
  private def innerParenSpan(item: String): (String, Int) = {
    val (_, depth) = Dml.scanFull(item)
    val open = item.indexOf('(')
    if (open < 0) throw new IllegalArgumentException(
      s"Parser Error: expected a parenthesized list in: $item")
    var close = open + 1
    while (close < item.length && !(item.charAt(close) == ')' && depth(close) == depth(open)))
      close += 1
    (item.substring(open + 1, close).trim, close)
  }

  private val TailKws = Seq("not null", "null", "primary key", "unique",
    "check", "default", "references", "collate")

  private def parseColDef(item: String,
      notNull: scala.collection.mutable.LinkedHashSet[String],
      checks: scala.collection.mutable.ArrayBuffer[String],
      uniques: scala.collection.mutable.ArrayBuffer[UniqueSet]): ColDef = {
    val (inQ, depth) = Dml.scanFull(item) match { case (q, d) => (q.map(_ != ' '), d) }
    val lower = item.toLowerCase
    // first token = column name
    val NameRe = """(?s)^\s*("[^"]+"|`[^`]+`|[\w$]+)(.*)$""".r
    val (name, afterName) = item match {
      case NameRe(n, rest) => (Dml.unq(n), rest)
      case _ => throw new IllegalArgumentException(
        s"Parser Error: cannot parse column definition: $item")
    }
    val nameEnd = item.length - afterName.length
    // type runs to the first top-level constraint keyword
    var cut = item.length
    var i = nameEnd
    while (i < item.length) {
      if (depth(i) == 0 && !inQ(i) &&
          TailKws.exists(k => Dml.kwAt(lower, inQ, i, k)) && i < cut) {
        cut = i; i = item.length
      } else i += 1
    }
    val tpe = item.substring(nameEnd, cut).trim
    if (tpe.isEmpty) throw new IllegalArgumentException(
      s"Parser Error: column $name is missing a type: $item")
    var default: Option[String] = None
    var tail = item.substring(cut)
    var guard = 0
    while (tail.trim.nonEmpty && guard < 32) {
      guard += 1
      val t = tail.trim
      val tl = t.toLowerCase
      if (tl.startsWith("not null")) { notNull += name; tail = t.substring(8) }
      else if (tl.startsWith("null")) tail = t.substring(4)
      else if (tl.startsWith("primary key")) {
        uniques += UniqueSet(Seq(name), isPk = true); notNull += name
        tail = t.substring(11)
      }
      else if (tl.startsWith("unique")) {
        uniques += UniqueSet(Seq(name), isPk = false); tail = t.substring(6)
      }
      else if (tl.startsWith("check")) {
        val (inner, close) = innerParenSpan(t)
        checks += inner
        tail = t.substring(close + 1)
      }
      else if (tl.startsWith("default")) {
        // DEFAULT expr runs to the next top-level constraint keyword
        val rest = t.substring(7)
        val (q2, d2) = Dml.scanFull(rest)
        val inQ2 = q2.map(_ != ' ')
        val rl = rest.toLowerCase
        var j = 0
        var end = rest.length
        while (j < rest.length) {
          if (d2(j) == 0 && !inQ2(j) &&
              Seq("not null", "primary key", "unique", "check", "references")
                .exists(k => Dml.kwAt(rl, inQ2, j, k)) && j < end) {
            end = j; j = rest.length
          } else j += 1
        }
        default = Some(rest.substring(0, end).trim)
        tail = rest.substring(end)
      }
      else if (tl.startsWith("references")) {
        // REFERENCES tbl [(col)] — accepted, unenforced
        val rest = t.substring(10).trim
        val RefRe = """(?s)^("[^"]+"|`[^`]+`|[\w$]+)(\s*\([^)]*\))?(.*)$""".r
        tail = rest match {
          case RefRe(_, _, r) => r
          case _ => ""
        }
      }
      else if (tl.startsWith("collate")) {
        val rest = t.substring(7).trim
        tail = rest.dropWhile(c => !c.isWhitespace)
      }
      else throw new IllegalArgumentException(
        s"Parser Error: cannot parse column constraint tail: $t")
    }
    ColDef(name, tpe, default)
  }

  /** Strip `tablename.` self-qualifiers so CHECK expressions evaluate
    * against any relation alias carrying the table's columns. */
  private def stripSelfQualifier(expr: String, table: String): String = {
    val b = bare(table)
    expr.replaceAll("(?i)(?<![\\w$.])" + java.util.regex.Pattern.quote(b) + "\\s*\\.\\s*", "")
  }

  // ------------------------------------------------------------------
  // enforcement
  // ------------------------------------------------------------------

  private def firstRow(spark: SparkSession, sql: String): Option[org.apache.spark.sql.Row] =
    Dml.gsql(spark, sql).collect().headOption

  private def keyMsg(cols: Seq[String], row: org.apache.spark.sql.Row): String =
    cols.zipWithIndex.map { case (c, i) =>
      val v = row.get(i)
      s"$c: ${if (v == null) "NULL" else v.toString}"
    }.mkString(", ")

  /** NOT NULL + CHECK over a relation of new rows (view or subquery
    * text usable in FROM position). */
  private def verifyRowChecks(spark: SparkSession, tc: TableConstraints,
      rel: String): Unit = {
    for (c <- tc.notNull) {
      if (firstRow(spark,
          s"SELECT 1 FROM $rel WHERE ${Dml.q(c)} IS NULL LIMIT 1").nonEmpty)
        throw new IllegalArgumentException(
          s"Constraint Error: NOT NULL constraint failed: ${tc.table}.$c")
    }
    for (ck <- tc.checks) {
      if (firstRow(spark,
          s"SELECT 1 FROM $rel WHERE NOT coalesce(($ck), true) LIMIT 1").nonEmpty)
        throw new IllegalArgumentException(
          s"Constraint Error: CHECK constraint failed on table ${tc.table} with expression ($ck)")
    }
  }

  /** Verify a batch of to-be-appended rows (full target width) in a
    * view named `batch`: NOT NULL + CHECK on the batch, PK/UNIQUE
    * within the batch and against the existing table
    * (data_table.cpp VerifyAppendConstraints). `skipSets` excludes the
    * unique sets an ON CONFLICT clause already resolved. */
  def verifyAppend(spark: SparkSession, tc: TableConstraints, batch: String,
      table: String, skipSets: Set[Seq[String]] = Set.empty): Unit = {
    verifyRowChecks(spark, tc, batch)
    for (u <- tc.uniques if !skipSets.contains(u.cols.map(_.toLowerCase))) {
      val colSql = u.cols.map(Dml.q).mkString(", ")
      val nonNull = u.cols.map(c => s"${Dml.q(c)} IS NOT NULL").mkString(" AND ")
      val inner = firstRow(spark,
        s"""SELECT $colSql FROM $batch WHERE $nonNull
           |GROUP BY $colSql HAVING count(*) > 1 LIMIT 1""".stripMargin)
      val dup = inner.orElse {
        val eq = u.cols.map(c =>
          s"${Dml.G}b.${Dml.q(c)} = ${Dml.G}t.${Dml.q(c)}").mkString(" AND ")
        firstRow(spark,
          s"""SELECT ${u.cols.map(c => s"${Dml.G}b.${Dml.q(c)}").mkString(", ")}
             |FROM $batch AS ${Dml.G}b JOIN $table AS ${Dml.G}t ON $eq LIMIT 1""".stripMargin)
      }
      dup.foreach { r =>
        throw new IllegalArgumentException(
          "Constraint Error: PRIMARY KEY or UNIQUE constraint violation: " +
            s"""duplicate key "${keyMsg(u.cols, r)}"""")
      }
    }
  }

  /** Verify the FULL new contents of a rewritten table (UPDATE / MERGE /
    * upsert DO UPDATE) before the swap. */
  def verifyContents(spark: SparkSession, tc: TableConstraints,
      df: DataFrame): Unit = {
    val vn = Dml.G + "verify_" + tc.table
    df.createOrReplaceTempView(vn)
    verifyRowChecks(spark, tc, vn)
    for (u <- tc.uniques) {
      val colSql = u.cols.map(Dml.q).mkString(", ")
      val nonNull = u.cols.map(c => s"${Dml.q(c)} IS NOT NULL").mkString(" AND ")
      firstRow(spark,
        s"""SELECT $colSql FROM $vn WHERE $nonNull
           |GROUP BY $colSql HAVING count(*) > 1 LIMIT 1""".stripMargin)
        .foreach { r =>
          val kind = if (u.isPk) "primary key" else "unique"
          throw new IllegalArgumentException(
            s"""Constraint Error: Duplicate key "${keyMsg(u.cols, r)}" violates $kind constraint.""")
        }
    }
  }
}
