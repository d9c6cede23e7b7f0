package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.EngineSession

/** Amplified-scale soak: the closest local[32] can get to the 100×
  * question. Facts are amplified N× (explode over a sequence, keys
  * re-salted so join/group cardinalities scale, dims copied 1×) into a
  * fixture-layout directory; every headline query then runs UNCHANGED
  * through `SparkEntry.queries` against both directories. For each
  * query we record wall time at 1× and N× and whether the physical
  * plan SHAPE (the executed-plan node sequence) is identical — a plan
  * that mutates under 10× data (a broadcast that flips to shuffle it
  * shouldn't, a sort that collapses to one task) is exactly the
  * scale-killer this soak exists to catch.
  *
  * Usage: runMain graft.ScaleSoak <sfDir> <outMd> [amplify]
  * Writes a markdown table (SCALE.md) with t_1x, t_Nx, ratio, and
  * plan-equality per query.
  */
object ScaleSoak {

  val HeadlineQueries: Seq[String] = Seq(
    "q1_agg", "q3_top_revenue", "q5_region_revenue", "q_topn",
    "q_join_range", "q_join_asof", "q_window_running",
    "q_window_median_unbounded", "q_dedup_minhash_pairs", "q_dedup_exact",
    "q_cb09", "q_cb33", "q_h2o_g10", "q_h2o_j05", "q_job06a",
    "q_sessionize", "q_text_quality",
    // r11: the r9/r10 additions under the same plan_equal+ratio
    // discipline, plus the now-real multimodal decode pass
    "q_ldbc_bi4", "q_ldbc_ic2", "q_jb2", "q_rn_transform_agg",
    "q_qualify", "q_ds11_channel_growth", "q_multimodal_features",
    // r11b: copy-on-write DML (merge = one full-outer join + swap),
    // native sampling, and the end-to-end pipeline composition
    "q_dml_update_from", "q_dml_merge", "q_sample_rows", "q_pipeline_e2e",
    // r14: the DDL control plane — constraint probes (FK anti/semi
    // joins), ALTER rebuild paths, generated-column recompute — pinned
    // flat at 10× like everything else
    "q_ddl_alter", "q_ddl_fk", "q_ddl_generated")

  private val facts = Seq("lineitem", "orders", "events", "documents",
    "embeddings")
  private val dims = Seq("region", "nation", "customer", "supplier", "part")

  /** Amplify `src` fixtures into `dst` (facts ×n, dims copied). Key
    * columns are offset per replica so cardinalities scale too.
    */
  def amplify(spark: SparkSession, src: String, dst: String, n: Int): Unit = {
    for (t <- dims)
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    for (t <- facts) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      val rep = df.withColumn("__rep", explode(sequence(lit(0), lit(n - 1))))
      // offset the high-card identity keys so each replica is a
      // distinct entity; FK columns into dims stay untouched
      val keyed = t match {
        case "lineitem" =>
          val mx = df.agg(org.apache.spark.sql.functions.max(col("l_orderkey")))
            .head.getLong(0) + 1
          rep.withColumn("l_orderkey",
            col("l_orderkey") + col("__rep") * mx)
        case "orders" =>
          val mx = df.agg(org.apache.spark.sql.functions.max(col("o_orderkey")))
            .head.getLong(0) + 1
          rep.withColumn("o_orderkey",
            col("o_orderkey") + col("__rep") * mx)
        case "events" =>
          val mx = df.agg(org.apache.spark.sql.functions.max(col("event_id")))
            .head.getLong(0) + 1
          rep.withColumn("event_id", col("event_id") + col("__rep") * mx)
        case "documents" =>
          val mx = df.agg(org.apache.spark.sql.functions.max(col("doc_id")))
            .head.getLong(0) + 1
          rep.withColumn("doc_id", col("doc_id") + col("__rep") * mx)
        case _ =>
          val mx = df.agg(org.apache.spark.sql.functions.max(col("vec_id")))
            .head.getLong(0) + 1
          rep.withColumn("vec_id", col("vec_id") + col("__rep") * mx)
      }
      keyed.drop("__rep").write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
  }

  def planShape(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect { case p => p.getClass.getSimpleName }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outMd = args.lift(1).getOrElse("SCALE.md")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val dst = s"/tmp/graft_scale_x$n"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineSession.create(s"local[$cpus]")
    amplify(spark, src, dst, n)
    val rows = for (q <- HeadlineQueries) yield {
      val fn = SparkEntry.queries(q)
      def run(dir: String): Double = { // warm + best-of-2
        val a = time(fn(spark, dir).write.mode("overwrite")
          .format("noop").save())
        val b = time(fn(spark, dir).write.mode("overwrite")
          .format("noop").save())
        math.min(a, b)
      }
      val t1 = run(src)
      val tn = run(dst)
      // output cardinality at both scales: a runtime ratio must be read
      // against output growth (pair-emitting queries grow quadratically
      // when amplification duplicates content — more real duplicates)
      val r1 = fn(spark, src).count()
      val rn = fn(spark, dst).count()
      val eq = planShape(fn(spark, src)) == planShape(fn(spark, dst))
      val ratio = tn / t1
      println(f"[scale] $q%-28s t1=$t1%7.3fs t$n=$tn%7.3fs ratio=$ratio%5.2f rows=$r1%d->$rn%d planEq=$eq")
      (q, t1, tn, ratio, eq, r1, rn)
    }
    val sb = new StringBuilder
    sb.append(s"# SCALE — amplified-fixture soak (facts ×$n from $src)\n\n")
    sb.append("Same `SparkEntry.queries` code against the 1× fixtures and a " +
      s"${n}×-amplified copy (facts replicated with re-salted keys, dims " +
      "unchanged). `plan_equal` compares the executed-plan node sequence — " +
      "the 100 TB claim is that plans do NOT mutate under data growth and " +
      "runtime stays ~linear (ratio ≈ amplification, minus fixed per-query " +
      "overhead which makes small queries sub-linear).\n\n")
    sb.append("`rows` shows output cardinality at both scales: a time ratio " +
      "is only meaningful against output growth — amplification duplicates " +
      "document CONTENT, so pair-emitting dedup queries legitimately emit " +
      "quadratically more (every replica is a real near-duplicate) and their " +
      "time ratio must stay well below their row ratio.\n\n")
    sb.append(s"| query | t_1x (s) | t_${n}x (s) | ratio | rows 1x→${n}x | plan_equal |\n")
    sb.append("|---|---|---|---|---|---|\n")
    for ((q, t1, tn, r, eq, r1, rn) <- rows)
      sb.append(f"| $q | $t1%.3f | $tn%.3f | $r%.2f | $r1%d → $rn%d | $eq |\n")
    // flag: plan mutation, or superlinear runtime NOT explained by
    // superlinear output (time ratio beyond 3n with time growing faster
    // than rows)
    val bad = rows.filter { case (_, _, _, ratio, eq, r1, rn) =>
      !eq || (ratio > 3.0 * n &&
        ratio > (if (r1 > 0) rn.toDouble / r1 else n.toDouble))
    }
    sb.append(s"\n${rows.size} queries; ${bad.size} flagged " +
      s"(plan mutation or ratio > ${3 * n}).\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outMd),
      sb.toString.getBytes("UTF-8"))
    println(s"[scale] wrote $outMd; flagged=${bad.size}")
    spark.stop()
  }
}
