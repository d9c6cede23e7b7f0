package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ATTACH / DETACH / USE / duckdb_databases() — the reference's
  * multi-database surface (`src/execution/operator/schema/physical_attach
  * .cpp`, `parser/statement/attach_statement.hpp`, `test/sql/attach/`)
  * mapped onto Spark's catalog databases.
  *
  * The reference attaches a STORAGE FILE; the engine's storage is
  * parquet/csv directories, so:
  *   - `ATTACH ':memory:' AS name` / `ATTACH 'x.db' AS name` → an empty
  *     Spark database `name` (tables created into it live in the
  *     warehouse, exactly like the reference's fresh database file)
  *   - `ATTACH '<directory>' AS name` → a database whose tables are the
  *     parquet/CSV files under the directory (one external, path-backed
  *     table per file — scans stream from the files, nothing is copied,
  *     so a 100 TB directory attaches in O(#files) metadata time)
  *   - `DETACH name` → drop the database (CASCADE; external data stays)
  *   - cross-database references (`name.tbl`) are native Spark
  *     resolution from there on
  *   - `duckdb_databases()` rewrites to a VALUES relation over the live
  *     catalog (same inline-TVF treatment as duckdb_functions())
  *
  * Naming defaults mirror transform_attach.cpp: the alias defaults to
  * the path's file stem (`ATTACH 'dir/tpch.db'` → `tpch`).
  */
object Attach {

  private val AttachRe =
    """(?is)^\s*ATTACH\s+(?:DATABASE\s+)?(IF\s+NOT\s+EXISTS\s+)?'([^']*)'(?:\s+AS\s+("[^"]+"|`[^`]+`|[\w$]+))?\s*(\(.*\))?\s*;?\s*$""".r
  private val DetachRe =
    """(?is)^\s*DETACH\s+(?:DATABASE\s+)?(IF\s+EXISTS\s+)?("[^"]+"|`[^`]+`|[\w$]+)\s*;?\s*$""".r

  def matches(sql: String): Boolean =
    AttachRe.findFirstMatchIn(sql).isDefined ||
      DetachRe.findFirstMatchIn(sql).isDefined

  private def unq(s: String): String = Dml.unq(s)

  /** transform_attach.cpp: alias defaults to the path's file stem. */
  def defaultAlias(path: String): String = {
    val base = path.replaceAll("[/\\\\]+$", "").split("[/\\\\]").last
    val stem = base.split('.').head
    if (stem.isEmpty) "memory" else stem.replaceAll("[^\\w]", "_")
  }

  /** session:db names attached READ_ONLY (physical_attach.cpp option;
    * enforced on the bulk-write surfaces). */
  private val readOnly =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())
  private def roKey(spark: SparkSession, db: String): String =
    sessionIds.computeIfAbsent(spark,
      _ => java.util.UUID.randomUUID().toString) + ":" + db.toLowerCase

  def isReadOnly(spark: SparkSession, db: String): Boolean =
    readOnly.contains(roKey(spark, db))

  def execute(spark: SparkSession, sql: String): DataFrame = sql match {
    case AttachRe(ine, path, alias0, opts) =>
      val name = Option(alias0).map(unq).getOrElse(defaultAlias(path))
      if (opts != null &&
          """(?i)\bREAD_ONLY\b""".r.findFirstIn(opts).isDefined)
        readOnly.add(roKey(spark, name)): Unit
      val exists = spark.catalog.databaseExists(name)
      if (exists && ine == null)
        throw new IllegalArgumentException(
          s"""Binder Error: Unique file handle conflict: Database "$name" is already attached""")
      if (!exists) {
        spark.sql(s"CREATE DATABASE `$name`").collect()
        val dir = new java.io.File(path)
        if (dir.isDirectory) {
          // one external table per data file under the directory —
          // metadata-only registration; scans stream from the files
          for (f <- dir.listFiles().sortBy(_.getName)) {
            val (stem, fmt) = f.getName.split('.') match {
              case parts if parts.length >= 2 => (parts.dropRight(1).mkString("_"), parts.last.toLowerCase)
              case parts => (parts.head, "")
            }
            val tbl = stem.replaceAll("[^\\w]", "_")
            fmt match {
              case "parquet" =>
                spark.catalog.createTable(s"`$name`.`$tbl`", f.getAbsolutePath, "parquet")
              case "csv" =>
                spark.catalog.createTable(s"`$name`.`$tbl`", f.getAbsolutePath, "csv",
                  Map("header" -> "true", "inferSchema" -> "true"))
              case "json" | "ndjson" =>
                spark.catalog.createTable(s"`$name`.`$tbl`", f.getAbsolutePath, "json")
              case _ => () // non-data files skipped
            }
          }
        }
      }
      spark.emptyDataFrame
    case DetachRe(ife, alias0) =>
      val name = unq(alias0)
      readOnly.remove(roKey(spark, name)): Unit
      if (!spark.catalog.databaseExists(name)) {
        if (ife == null) throw new IllegalArgumentException(
          s"Binder Error: Failed to detach database with name \"$name\": database not found")
      } else spark.sql(s"DROP DATABASE `$name` CASCADE").collect()
      spark.emptyDataFrame
    case _ => throw new IllegalArgumentException(s"not an ATTACH/DETACH statement: $sql")
  }

  private val SetSchemaRe =
    """(?is)^\s*SET\s+(?:SESSION\s+)?SCHEMA\s*(?:=|TO)?\s*'?([\w$]+)'?\s*;?\s*$""".r

  /** `SET schema = x` — the reference's current-schema switch, mapped
    * onto Spark's current database ("main"/"memory" → default). */
  def matchesSetSchema(sql: String): Boolean =
    SetSchemaRe.findFirstMatchIn(sql).isDefined

  def executeSetSchema(spark: SparkSession, sql: String): DataFrame = {
    val m = SetSchemaRe.findFirstMatchIn(sql).get
    val db0 = m.group(1).toLowerCase
    val db = if (db0 == "main" || db0 == "memory") "default" else db0
    if (!spark.catalog.databaseExists(db))
      throw new IllegalArgumentException(
        s"""Catalog Error: SET schema: No catalog + schema named "$db0" found.""")
    spark.catalog.setCurrentDatabase(db)
    spark.emptyDataFrame
  }

  /** `duckdb_databases()` → inline VALUES over the live Spark catalog
    * (rewritten by Macros.expandAll, like duckdb_functions()). */
  def databasesRelation(spark: SparkSession): String = {
    val rows = spark.catalog.listDatabases().collect().toSeq.sortBy(_.name).map { db =>
      val internal = db.name == "default"
      s"('${db.name.replace("'", "''")}', ${internal.toString})"
    }
    s"(SELECT * FROM (VALUES ${rows.mkString(", ")}) AS duckdb_databases(database_name, internal))"
  }

  private def esc(s: String) = s.replace("'", "''")

  // engine-internal memoized fixtures are not user catalog entries
  private val InternalPrefixes = Seq("g_", "cb_", "job_", "fx_", Dml.G)
  private def isInternal(n: String): Boolean =
    InternalPrefixes.exists(n.startsWith)

  private def catalogEntries(spark: SparkSession)
      : Seq[(String, String, String)] = {
    // (database_name, table_name, tableType); temp views map to the
    // reference's "temp" catalog, the default db to "memory"
    val cat = spark.sessionState.catalog
    val temps = cat.listLocalTempViews("*").map(t => ("temp", t.table, "TEMPORARY"))
    val perDb = spark.catalog.listDatabases().collect().toSeq.flatMap { db =>
      cat.listTables(db.name).flatMap { ti =>
        if (!ti.database.contains(db.name)) None
        else {
          val tt = try cat.getTableMetadata(ti).tableType.name
                   catch { case _: Throwable => "MANAGED" }
          val dbName = if (db.name == "default") "memory" else db.name
          Some((dbName, ti.table, tt))
        }
      }
    }
    (temps ++ perDb).filterNot(e => isInternal(e._2))
  }

  /** `duckdb_tables()` — the reference's table-catalog TVF
    * (src/function/table/system/duckdb_tables.cpp), inlined as a VALUES
    * relation over the live Spark catalog. Column subset covers the
    * reference tests' projections; `temporary` is true for the temp
    * catalog (session temp views). */
  def tablesRelation(spark: SparkSession): String = {
    val rows = catalogEntries(spark).filter(_._3 != "VIEW")
      .sortBy(e => (e._1, e._2)).map { case (db, t, tt) =>
        val tmp = tt == "TEMPORARY"
        val schema = "main"
        val cols =
          try spark.table(if (tmp) s"`$t`" else s"`${if (db == "memory") "default" else db}`.`$t`")
            .schema.size
          catch { case _: Throwable => 0 }
        val hasPk = Constraints.of(spark,
          (if (db == "memory") "default" else db) + "." + t)
          .exists(_.uniques.exists(_.isPk))
        s"('${esc(db)}', '$schema', '${esc(t)}', false, $tmp, $hasPk, " +
          s"CAST(NULL AS BIGINT), $cols, CAST(NULL AS STRING))"
      }
    if (rows.isEmpty)
      "(SELECT CAST(NULL AS STRING) AS database_name, CAST(NULL AS STRING) AS schema_name, " +
        "CAST(NULL AS STRING) AS table_name, false AS internal, false AS temporary, " +
        "false AS has_primary_key, CAST(NULL AS BIGINT) AS estimated_size, " +
        "0 AS column_count, CAST(NULL AS STRING) AS sql WHERE 1=0)"
    else
      s"(SELECT * FROM (VALUES ${rows.mkString(", ")}) AS duckdb_tables(" +
        "database_name, schema_name, table_name, internal, temporary, " +
        "has_primary_key, estimated_size, column_count, sql))"
  }

  /** `duckdb_constraints()` — constraint-catalog TVF
    * (duckdb_constraints.cpp) over the session constraint registry.
    * constraint_text mirrors the reference's rendering (fk_20530.test:
    * `FOREIGN KEY (zippy_id) REFERENCES freddy.zippy(id)`, parent
    * db-qualified only when it lives outside the current database). */
  def constraintsRelation(spark: SparkSession): String = {
    // identifiers in constraint TEXT render double-quoted when they
    // need quoting, like the reference's KeywordHelper (fk "b c")
    def qid(n: String): String =
      if (n.matches("[A-Za-z_][A-Za-z0-9_$]*") && !n.exists(_.isUpper)) n
      else if (n.matches("[\\w$]+")) n
      else "\"" + n.replace("\"", "\"\"") + "\""
    val rows = scala.collection.mutable.ArrayBuffer[String]()
    // constraint_index is a GLOBAL running number over the catalog scan
    // (duckdb_constraints.cpp), not per-table
    var idx = 0
    for ((resolved, tc) <- Constraints.allOf(spark).toSeq.sortBy(_._1)) {
      val Array(db0, t) = resolved.split('.').slice(0, 2) match {
        case a if a.length == 2 => a
        case a => Array("default", a.last)
      }
      val db = if (db0 == "default") "memory" else db0
      def oid(kind: String, parts: String*): Int = {
        val h = (kind +: parts).mkString(" ").hashCode
        if (h < 0) ~h else h
      }
      // 0-based physical column positions (duckdb_constraints
      // constraint_column_indexes; pg_constraint conkey builds on it)
      val colPos: Map[String, Int] =
        try spark.table(s"`${if (db0 == "default") t else db0 + "`.`" + t}`")
          .schema.fieldNames.zipWithIndex
          .map { case (n, i) => (n.toLowerCase, i) }.toMap
        catch { case _: Throwable => Map.empty }
      def emit(tpe: String, text: String, cols: Seq[String],
          expression: Option[String] = None, cname: String = "",
          refTable: Option[String] = None, refCols: Seq[String] = Nil): Unit = {
        val idxs = cols.flatMap(c => colPos.get(c.toLowerCase))
        val exprSql = expression.map(e => s"'${esc(e)}'").getOrElse("CAST(NULL AS STRING)")
        val refSql = refTable.map(r => s"'${esc(r)}'").getOrElse("CAST(NULL AS STRING)")
        rows += s"('${esc(db)}', ${oid("db", db)}, 'main', ${oid("ns", "main")}, " +
          s"'${esc(t)}', ${oid("rel", db, t)}, $idx, '${esc(tpe)}', " +
          s"'${esc(text)}', $exprSql, " +
          s"array(${idxs.mkString(", ")}), " +
          s"array(${cols.map(c => s"'${esc(c)}'").mkString(", ")}), " +
          s"'${esc(if (cname.nonEmpty) cname else s"${t}_$idx")}', " +
          s"$refSql, array(${refCols.map(c => s"'${esc(c)}'").mkString(", ")}))"
        idx += 1
      }
      // reference ordering (duckdb_constraints.cpp via catalog entry
      // order): column-level NOT NULLs at their declaration position
      // (before table constraints), PK-implied NOT NULLs appended LAST
      val pkCols = tc.uniques.filter(_.isPk)
        .flatMap(_.cols.map(_.toLowerCase)).toSet
      for (c <- tc.notNull if !pkCols.contains(c.toLowerCase))
        emit("NOT NULL", "NOT NULL", Seq(c))
      for (u <- tc.uniques)
        emit(if (u.isPk) "PRIMARY KEY" else "UNIQUE",
          (if (u.isPk) "PRIMARY KEY(" else "UNIQUE(") +
            u.cols.map(qid).mkString(", ") + ")",
          u.cols)
      for (ck <- tc.checks) emit("CHECK", s"CHECK(($ck))", Nil,
        expression = Some(ck))
      for (fk <- tc.foreignKeys) {
        val pparts = fk.parentTable.split('.')
        val pdb = pparts.dropRight(1).lastOption.getOrElse("default")
        // the reference renders the parent schema-qualified unless it
        // lives in the default ("main") schema (fk_20530: freddy.zippy
        // qualified, zippy_main bare)
        val pname = if (pdb == "default") pparts.last else fk.parentTable
        emit("FOREIGN KEY",
          s"FOREIGN KEY (${fk.cols.map(qid).mkString(", ")}) " +
            s"REFERENCES $pname(${fk.parentCols.map(qid).mkString(", ")})",
          fk.cols, refTable = Some(pparts.last), refCols = fk.parentCols)
      }
      for (c <- tc.notNull if pkCols.contains(c.toLowerCase))
        emit("NOT NULL", "NOT NULL", Seq(c))
    }
    if (rows.isEmpty)
      "(SELECT CAST(NULL AS STRING) AS database_name, CAST(NULL AS BIGINT) AS database_oid, " +
        "CAST(NULL AS STRING) AS schema_name, CAST(NULL AS BIGINT) AS schema_oid, " +
        "CAST(NULL AS STRING) AS table_name, CAST(NULL AS BIGINT) AS table_oid, " +
        "0 AS constraint_index, " +
        "CAST(NULL AS STRING) AS constraint_type, CAST(NULL AS STRING) AS constraint_text, " +
        "CAST(NULL AS STRING) AS expression, " +
        "CAST(array() AS ARRAY<INT>) AS constraint_column_indexes, " +
        "CAST(array() AS ARRAY<STRING>) AS constraint_column_names, " +
        "CAST(NULL AS STRING) AS constraint_name, " +
        "CAST(NULL AS STRING) AS referenced_table, " +
        "CAST(array() AS ARRAY<STRING>) AS referenced_column_names WHERE 1=0)"
    else
      s"(SELECT * FROM (VALUES ${rows.mkString(", ")}) AS duckdb_constraints(" +
        "database_name, database_oid, schema_name, schema_oid, table_name, " +
        "table_oid, constraint_index, constraint_type, constraint_text, " +
        "expression, constraint_column_indexes, constraint_column_names, " +
        "constraint_name, referenced_table, referenced_column_names))"
  }

  /** `duckdb_views()` — view-catalog TVF (duckdb_views.cpp). */
  def viewsRelation(spark: SparkSession): String = {
    val rows = catalogEntries(spark).filter(e => e._3 == "VIEW" || e._3 == "TEMPORARY")
      .sortBy(e => (e._1, e._2)).map { case (db, v, tt) =>
        s"('${esc(db)}', 'main', '${esc(v)}', false, ${tt == "TEMPORARY"}, CAST(NULL AS STRING))"
      }
    if (rows.isEmpty)
      "(SELECT CAST(NULL AS STRING) AS database_name, CAST(NULL AS STRING) AS schema_name, " +
        "CAST(NULL AS STRING) AS view_name, false AS internal, false AS temporary, " +
        "CAST(NULL AS STRING) AS sql WHERE 1=0)"
    else
      s"(SELECT * FROM (VALUES ${rows.mkString(", ")}) AS duckdb_views(" +
        "database_name, schema_name, view_name, internal, temporary, sql))"
  }

  /** Per-column catalog rows shared by duckdb_columns() and the
    * information_schema.columns emulation: (db, table, column, 1-based
    * index, default SQL or null, nullable, duck type name,
    * generated expr or null). */
  private def columnRows(spark: SparkSession)
      : Seq[(String, String, String, Int, Option[String], Boolean, String, Option[String])] =
    catalogEntries(spark).sortBy(e => (e._1, e._2)).flatMap {
      case (db, t, tt) =>
        val tmp = tt == "TEMPORARY"
        val sparkDb = if (db == "memory") "default" else db
        val fs =
          try spark.table(if (tmp) s"`$t`" else s"`$sparkDb`.`$t`")
            .schema.fields.toSeq
          catch { case _: Throwable => Seq.empty[org.apache.spark.sql.types.StructField] }
        val tc = Constraints.of(spark, sparkDb + "." + t)
        val nn = tc.map(_.notNull.map(_.toLowerCase).toSet).getOrElse(Set.empty[String])
        fs.zipWithIndex.map { case (f, i) =>
          val gen = tc.flatMap(_.generated.find(_.name.equalsIgnoreCase(f.name)))
            .map(g => s"CAST(${g.expr} AS ${GraftTypes.duckName(
              org.apache.spark.sql.types.StructType.fromDDL(s"`x` ${g.tpe}").head.dataType)})")
          val dflt =
            if (f.metadata.contains("CURRENT_DEFAULT") || f.metadata.contains("GRAFT_DEFAULT"))
              Some(Dml.defaultExpr(f))
            else gen // the reference surfaces the generation expression
                     // as the column default too (gcol_duckdb_columns)
          (db, t, f.name, i + 1, dflt,
            f.nullable && !nn.contains(f.name.toLowerCase),
            GraftTypes.duckName(f.dataType), gen)
        }
    }

  /** `duckdb_columns()` — column-catalog TVF (duckdb_columns.cpp);
    * column_index is 1-based like the reference. */
  def columnsRelation(spark: SparkSession): String = {
    val rows = columnRows(spark).map {
      case (db, t, c, i, dflt, nullable, tpe, gen) =>
        val d = dflt.map(x => s"'${esc(x)}'").getOrElse("CAST(NULL AS STRING)")
        val g = gen.map(x => s"'${esc(x)}'").getOrElse("CAST(NULL AS STRING)")
        s"('${esc(db)}', 'main', '${esc(t)}', '${esc(c)}', $i, " +
          s"$d, $nullable, '${esc(tpe)}', ${gen.isDefined}, $g)"
    }
    if (rows.isEmpty)
      "(SELECT CAST(NULL AS STRING) AS database_name, CAST(NULL AS STRING) AS schema_name, " +
        "CAST(NULL AS STRING) AS table_name, CAST(NULL AS STRING) AS column_name, " +
        "0 AS column_index, CAST(NULL AS STRING) AS column_default, " +
        "true AS is_nullable, CAST(NULL AS STRING) AS data_type, " +
        "false AS is_generated, CAST(NULL AS STRING) AS generation_expression WHERE 1=0)"
    else
      s"(SELECT * FROM (VALUES ${rows.mkString(", ")}) AS duckdb_columns(" +
        "database_name, schema_name, table_name, column_name, column_index, " +
        "column_default, is_nullable, data_type, is_generated, generation_expression))"
  }

  /** `information_schema.columns` emulation (ANSI names; is_generated
    * renders NEVER/ALWAYS like the reference). */
  def infoSchemaColumnsRelation(spark: SparkSession): String = {
    val rows = columnRows(spark).map {
      case (db, t, c, i, dflt, nullable, tpe, gen) =>
        val d = dflt.map(x => s"'${esc(x)}'").getOrElse("CAST(NULL AS STRING)")
        val g = gen.map(x => s"'${esc(x)}'").getOrElse("CAST(NULL AS STRING)")
        s"('${esc(db)}', 'main', '${esc(t)}', '${esc(c)}', $i, $d, " +
          s"'${if (nullable) "YES" else "NO"}', '${esc(tpe)}', " +
          s"'${if (gen.isDefined) "ALWAYS" else "NEVER"}', $g)"
    }
    if (rows.isEmpty)
      "(SELECT CAST(NULL AS STRING) AS table_catalog, CAST(NULL AS STRING) AS table_schema, " +
        "CAST(NULL AS STRING) AS table_name, CAST(NULL AS STRING) AS column_name, " +
        "0 AS ordinal_position, CAST(NULL AS STRING) AS column_default, " +
        "CAST(NULL AS STRING) AS is_nullable, CAST(NULL AS STRING) AS data_type, " +
        "CAST(NULL AS STRING) AS is_generated, CAST(NULL AS STRING) AS generation_expression WHERE 1=0)"
    else
      s"(SELECT * FROM (VALUES ${rows.mkString(", ")}) AS information_schema_columns(" +
        "table_catalog, table_schema, table_name, column_name, ordinal_position, " +
        "column_default, is_nullable, data_type, is_generated, generation_expression))"
  }
}

/** Spark → reference type-name rendering (DESCRIBE/duckdb_columns
  * output: the reference prints INTEGER/BIGINT/VARCHAR/...,
  * information_schema style, not Spark's int/bigint/string). */
object GraftTypes {
  import org.apache.spark.sql.types._
  def duckName(dt: DataType): String = dt match {
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case StringType => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case BinaryType => "BLOB"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP WITH TIME ZONE"
    case TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case a: ArrayType => duckName(a.elementType) + "[]"
    case m: MapType => s"MAP(${duckName(m.keyType)}, ${duckName(m.valueType)})"
    case s: StructType =>
      s.fields.map(f => s"${f.name} ${duckName(f.dataType)}")
        .mkString("STRUCT(", ", ", ")")
    case other => other.sql
  }
}
