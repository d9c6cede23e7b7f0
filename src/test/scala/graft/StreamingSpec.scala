package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark

  /** awaitTermination(timeout) returns false and leaves the query RUNNING
    * on timeout — a leaked micro-batch thread then races every later suite
    * on the shared session (conf/current-database/temp-view mutation).
    * Always stop on timeout and fail the test explicitly.
    */
  private def awaitDone(q: org.apache.spark.sql.streaming.StreamingQuery,
      timeoutMs: Long = 120000): Unit = {
    val done = q.awaitTermination(timeoutMs)
    if (!done) q.stop()
    assert(done, s"streaming query ${q.name} did not finish in ${timeoutMs} ms")
  }

  /** The streaming file source wants a directory — stage the fixture file. */
  lazy val eventsDir: String = {
    val dir = java.nio.file.Paths.get("/tmp/graft_stream/events")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${GraftTest.sf}/events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming tumbling agg equals the batch run of the same transform") {
    val batch = graft.engine.Tables.events(spark, GraftTest.sf)
    val expected = EventStream.tumblingAgg(batch).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val stream = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.tumblingAgg(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .trigger(Trigger.AvailableNow()).start()
    awaitDone(q)
    val got = spark.table("tumbling_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("flatMapGroupsWithState sessionization matches the window-based batch query") {
    val batch = graft.engine.Tables.events(spark, GraftTest.sf)
    val expected = SparkEntry.queries("q_sessionize")(spark, GraftTest.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = EventStream.sessionize(batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("stream-stream interval join matches the batch run of the same transform") {
    val batch = graft.engine.Tables.events(spark, GraftTest.sf)
    val expected = EventStream.clickViewJoin(batch, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet

    val s1 = EventStream.readEvents(spark, eventsDir)
    val s2 = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.clickViewJoin(s1, s2)
      .writeStream.outputMode("append")
      .format("memory").queryName("join_out")
      .trigger(Trigger.AvailableNow()).start()
    awaitDone(q)
    val got = spark.table("join_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("stream-stream LEFT OUTER interval join: inner rows exact, unmatched watermark-gated") {
    val batch = graft.engine.Tables.events(spark, GraftTest.sf)
    val expectedAll = EventStream.clickViewJoin(batch, batch, "left_outer").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.toString))).toSet
    val expectedInner = expectedAll.filter(_._2.isDefined)

    val stream = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.clickViewJoin(stream, stream, "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("lojoin_out")
      .trigger(Trigger.AvailableNow()).start()
    awaitDone(q)
    val got = spark.table("lojoin_out").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.toString))).toSet
    val gotInner = got.filter(_._2.isDefined)
    // matched pairs must be exactly the batch join's matched pairs
    assert(gotInner == expectedInner && gotInner.nonEmpty)
    // every emitted unmatched click is a true batch-side unmatched click;
    // the tail inside the final watermark window is legitimately withheld
    val gotNullKeys = got.filter(_._2.isEmpty).map(_._1)
    val expNullKeys = expectedAll.filter(_._2.isEmpty).map(_._1)
    assert(gotNullKeys.subsetOf(expNullKeys))
  }

  test("watermarked streaming dedup keeps one event per (user, type)") {
    val batch = graft.engine.Tables.events(spark, GraftTest.sf)
    val expectedKeys = batch.select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    val stream = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.firstEventPerUserType(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    awaitDone(q)
    val got = spark.table("dedup_out").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    assert(got.toSet == expectedKeys)
    assert(got.length == expectedKeys.size) // exactly one survivor per key
    // batch path: same key set
    val batchGot = EventStream.firstEventPerUserType(batch)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(batchGot == expectedKeys)
  }

  test("stream-static broadcast enrichment matches the batch join, no stream shuffle") {
    val dim = graft.engine.Tables.customer(spark, GraftTest.sf)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
    val batch = graft.engine.Tables.events(spark, GraftTest.sf)
    val expected = EventStream.enrichWithDim(batch, dim, "user_id", "c_custkey")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    val stream = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.enrichWithDim(stream, dim, "user_id", "c_custkey")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow()).start()
    awaitDone(q)
    val got = spark.table("enrich_out").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("sliding window rate over a stream produces per-user windows") {
    val stream = EventStream.readEvents(spark, eventsDir)
    val q = EventStream.slidingRate(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sliding_out")
      .trigger(Trigger.AvailableNow()).start()
    awaitDone(q)
    val got = spark.table("sliding_out")
    assert(got.count() > 0)
    // each event lands in exactly width/slide = 2 windows
    val batch = graft.engine.Tables.events(spark, GraftTest.sf)
    assert(got.agg(sum("n_events")).collect().head.getLong(0) == 2 * batch.count())
  }
}
