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

  /** `duckdb_databases()` → inline VALUES over the live Spark catalog
    * (rewritten by Macros.expandAll, like duckdb_functions()). */
  def databasesRelation(spark: SparkSession): String = {
    val rows = spark.catalog.listDatabases().collect().toSeq.sortBy(_.name).map { db =>
      val internal = db.name == "default"
      s"('${db.name.replace("'", "''")}', ${internal.toString})"
    }
    s"(SELECT * FROM (VALUES ${rows.mkString(", ")}) AS duckdb_databases(database_name, internal))"
  }
}
