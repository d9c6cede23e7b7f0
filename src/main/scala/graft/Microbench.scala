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
    args.drop(1).foreach { arg =>
      // "explain:<query-name>" prints the formatted plan of a SparkEntry
      // query; "q:<query-name>" times it; anything else is timed as SQL.
      if (arg == "scanab") {
        // A/B: original single-row-group file vs re-encoded store layout
        def time(mk: () => org.apache.spark.sql.DataFrame, label: String): Unit = {
          val ts = (1 to 5).map { _ =>
            val t0 = System.nanoTime()
            mk().filter("l_quantity < 3")
              .groupBy("l_returnflag").agg(org.apache.spark.sql.functions.sum("l_extendedprice"))
              .write.mode("overwrite").format("noop").save()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[scanab] $label min=${ts.drop(1).min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
        }
        time(() => spark.read.parquet(s"$sfDir/lineitem.parquet"), "original ")
        time(() => graft.engine.Tables.lineitem(spark, sfDir), "reencoded")
      } else if (arg == "tune") {
        graft.engine.EngineSession.tuneForScale(
          spark, graft.engine.EngineSession.dirBytes(sfDir))
        println(s"[micro] tuned: shuffle.partitions=" +
          spark.conf.get("spark.sql.shuffle.partitions") +
          " adaptive=" + spark.conf.get("spark.sql.adaptive.enabled"))
      } else if (arg == "warm") {
        graft.engine.Tables.warm(spark, sfDir)
        println("[micro] fixtures warmed")
      } else if (arg.startsWith("amplify:")) {
        // "amplify:<n>" — ScaleSoak-amplify THIS sfDir ×n into
        // /tmp/graft_scale_x<n>; point a second Microbench run at that
        // dir for larger-scale A/Bs
        val n = arg.stripPrefix("amplify:").toInt
        val dst = s"/tmp/graft_scale_x$n"
        ScaleSoak.amplify(spark, sfDir, dst, n)
        println(s"[micro] amplified $sfDir x$n -> $dst")
      } else if (arg.startsWith("set:")) {
        // "set:key=value" — flip a runtime conf between timed args (A/B)
        val Array(k, v) = arg.stripPrefix("set:").split("=", 2)
        spark.conf.set(k, v)
        println(s"[micro] set $k=$v")
      } else if (arg.startsWith("stats:")) {
        // print per-node size estimates of the optimized plan (smallsort gate)
        val df = SparkEntry.queries(arg.stripPrefix("stats:"))(spark, sfDir)
        val opt = df.queryExecution.optimizedPlan
        println(s"==== ${arg} ====")
        opt.foreach { n =>
          println(f"${n.stats.sizeInBytes}%12s  ${n.nodeName}")
        }
      } else if (arg.startsWith("jobs:")) {
        // count Spark jobs/stages/tasks for ONE noop-sink run (fixed
        // per-query overhead: broadcast builds, sampling passes, writes)
        val name = arg.stripPrefix("jobs:")
        val jobs = new java.util.concurrent.atomic.AtomicInteger
        val stages = new java.util.concurrent.atomic.AtomicInteger
        val tasks = new java.util.concurrent.atomic.AtomicInteger
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
            tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
          }
        }
        // warm once so codegen/broadcast caches don't inflate the count
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        spark.sparkContext.addSparkListener(l)
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        spark.sparkContext.removeSparkListener(l)
        println(s"[micro] jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}  $name")
      } else if (arg.startsWith("plantime:")) {
        // driver-side cost only: DataFrame build + analysis + optimization
        // + physical planning, no execution (11 reps, median of last 10)
        val name = arg.stripPrefix("plantime:")
        val ts = (1 to 11).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
          (System.nanoTime() - t0) / 1e9
        }
        val med = ts.drop(1).sorted.apply(5)
        println(f"[micro] plan $med%.3f s (first ${ts.head}%.3f)  $name")
      } else if (arg.startsWith("phases:")) {
        // split the driver-side cost: Dataset BUILD (eager per-step
        // analysis) vs the final QueryExecution's analysis/optimization/
        // physical-planning phases (QueryPlanningTracker; the first
        // floor(n/2) reps are discarded as JIT warmup, median of the
        // remaining ceil(n/2))
        // optional rep count: "phases:<q>:<n>" (default 11); a spec whose
        // tail is not a number is treated as a plain query name
        val spec = arg.stripPrefix("phases:")
        val (name, nrep) = spec.split(":") match {
          case Array(n, r) if r.toIntOption.isDefined => (n, r.toInt)
          case _ => (spec, 11)
        }
        val reps = (1 to nrep).map { _ =>
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(name)(spark, sfDir)
          val tBuild = (System.nanoTime() - t0) / 1e9
          val qe = df.queryExecution
          qe.executedPlan
          val ph = qe.tracker.phases.map { case (k, v) =>
            k -> (v.endTimeMs - v.startTimeMs) / 1e3 }
          (tBuild, ph)
        }.drop(nrep / 2)
        def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
        val build = med(reps.map(_._1))
        val keys = reps.flatMap(_._2.keys).distinct.sorted
        // median over only the reps that recorded the phase — a missing
        // phase must not deflate the timing toward zero
        val phases = keys.map { k =>
          val xs = reps.flatMap(_._2.get(k))
          f"$k=${if (xs.isEmpty) Double.NaN else med(xs)}%.3f"
        }.mkString(" ")
        println(f"[micro] build $build%.3f s  $phases  $name")
      } else if (arg.startsWith("explain:")) {
        val df = SparkEntry.queries(arg.stripPrefix("explain:"))(spark, sfDir)
        println(s"==== ${arg} ====")
        df.explain("formatted")
      } else {
        val mk: () => org.apache.spark.sql.DataFrame =
          if (arg == "rjprobe") { () =>
            import org.apache.spark.sql.functions._
            val sup = graft.engine.Tables.supplier(spark, sfDir)
              .select("s_suppkey", "s_acctbal", "s_nationkey")
            val c = graft.engine.Tables.customer(spark, sfDir)
              .select("c_custkey", "c_acctbal", "c_nationkey")
            def t(label: String)(f: => Unit): Unit = {
              val t0 = System.nanoTime(); f
              println(f"[rjprobe] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
            }
            t("cuts (approxQuantile)") {
              graft.operators.Banding.cuts(sup, "s_acctbal", 32, 0.01): Unit
            }
            val joined = graft.operators.RangeJoin.bandedLess(
              c, "c_acctbal", sup, "s_acctbal",
              residual = Some(col("c_nationkey") =!= col("s_nationkey")))
            t("join+count(*) only") {
              println("[rjprobe] pairs=" + joined.count())
            }
            val q = joined.groupBy("s_suppkey")
              .agg(count(lit(1)).as("n_cheaper")).orderBy("s_suppkey")
            t("full query") { q.collect(): Unit }
            val ex = q.queryExecution.executedPlan.toString
            println("[rjprobe] codegen spans: " +
              "WholeStageCodegen".r.findAllIn(ex).length)
            println(ex.linesIterator.take(40).mkString("\n"))
            spark.emptyDataFrame
          }
          else if (arg == "mmprobe") { () =>
            val docs = graft.engine.Tables.documents(spark, sfDir)
            def t(label: String)(f: => Unit): Unit = {
              val t0 = System.nanoTime(); f
              println(f"[mmprobe] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
            }
            val media = graft.pipeline.Multimodal.fromDocuments(docs)
            println(s"[mmprobe] media partitions=${media.rdd.getNumPartitions}")
            t("encode-only (fromDocuments)") {
              media.write.mode("overwrite").format("noop").save()
            }
            val feats = graft.pipeline.Multimodal.extractFeatures(media)
            t("encode+decode (no sort)") {
              feats.write.mode("overwrite").format("noop").save()
            }
            t("encode+decode+sort") {
              feats.orderBy("media_id").write.mode("overwrite").format("noop").save()
            }
            spark.emptyDataFrame
          }
          else if (arg.startsWith("parts:")) { () =>
            val df = SparkEntry.queries(arg.stripPrefix("parts:"))(spark, sfDir)
            println(s"[micro] partitions=${df.rdd.getNumPartitions}  $arg")
            df
          }
          else if (arg.startsWith("q:")) () => SparkEntry.queries(arg.stripPrefix("q:"))(spark, sfDir)
          else () => spark.sql(arg)
        val times = (1 to 4).map { _ =>
          val t0 = System.nanoTime()
          mk().write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[micro] ${times.drop(1).min}%.3f s (first ${times.head}%.3f)  $arg")
      }
    }
    spark.stop()
  }
}
