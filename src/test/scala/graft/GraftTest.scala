package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared by every suite (same JVM, sequential). */
object GraftTest {
  lazy val spark: SparkSession = {
    // per-run warehouse: the imported sqllogictest corpus CREATEs real
    // (managed) tables, and a persistent ./spark-warehouse leaks their
    // LOCATIONs across JVMs while the in-memory catalog forgets them —
    // CREATE then dies with LOCATION_ALREADY_EXISTS on the next run
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val s = graft.engine.EngineSession
      .builder("local[4]")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.engine.EngineSession.configure(s)
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
