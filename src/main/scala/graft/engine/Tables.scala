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
    *
    * Eviction is EXPLICIT, not weak-key: a cached DataFrame strongly
    * references its session (`df.sparkSession`), so a WeakHashMap keyed by
    * session would hold a value→key cycle and never collect anything. A
    * listener on the session's context clears its entries when the
    * application ends, so a long-lived JVM hosting successive contexts
    * does not accumulate dead sessions' plans.
    */
  private val cache = graft.functions.SessionScoped(
    () => new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]())

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.get(spark)
    perSession.computeIfAbsent((dir, name), _ => {
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
  }

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

  /** Scatter a small-but-compute-heavy input across all cores. A single
    * parquet row group scans as ONE task, so per-row CPU-bound stages
    * (minhash signatures, text metrics) would otherwise run
    * single-threaded no matter the cluster; one tiny round-robin shuffle
    * buys full parallelism for the expensive expression that follows.
    * Use ONLY before compute-bound stages — scan-bound queries would pay
    * the shuffle for nothing. Measured at sf0.1: the exchange barrier +
    * task startup COSTS more than it saves below ~1s of single-task
    * compute, so none of the fixture queries use it; it is the tool for
    * genuinely heavy single-split inputs (e.g. one large document shard).
    */
  def scatter(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Drop a session's cached plans — for services that retire sessions on
    * a long-lived context (automatic eviction only fires at application
    * end).
    */
  def invalidate(spark: SparkSession): Unit = cache.drop(spark)

  /** Register every fixture as a temp view so spark.sql(...) can be used. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
