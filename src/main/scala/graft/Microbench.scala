package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time ad-hoc SQL against a fixture dir.
  * Usage: runMain graft.Microbench <sfDir> <sql...>   (each arg timed 3x)
  */
object Microbench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.engine.EngineSession
      .builder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.EngineSession.configure(spark)
    graft.engine.Tables.registerAll(spark, sfDir)
    args.drop(1).foreach { sql =>
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[micro] ${times.drop(1).min}%.3f s (first ${times.head}%.3f)  $sql")
    }
    spark.stop()
  }
}
