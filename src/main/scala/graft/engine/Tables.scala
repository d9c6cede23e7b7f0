package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture loader: the driver's parquet star schema at
  * /root/testdata/<sf>/<table>.parquet (see TESTDATA.md / FIXTURES.md).
  *
  * Equivalent of the reference's base-table scan with projection/filter
  * pushdown (`/root/reference/src/execution/operator/scan/
  * physical_table_scan.cpp`) — Spark's parquet DataSource does the
  * pushdown; we keep scans declarative so Catalyst prunes columns and
  * row groups.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Loaded-plan cache: `spark.read.parquet` pays a driver-side file
    * listing + footer/schema read every call (~30-50 ms), and SQL-based
    * queries register all ten fixtures — uncached that alone costs ~0.4 s
    * per query. DataFrames are immutable plans, so reuse per
    * (session, dir, table) is safe.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name), _ => {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") {
        // ts is TIMESTAMP(NANOS) in the file; with nanosAsLong it arrives as
        // epoch-nanos LongType. Convert to Spark's native µs timestamp
        // (integer DIV — the ns epoch exceeds double's 2^53 mantissa).
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      } else df
    })

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture as a temp view so spark.sql(...) can be used. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
