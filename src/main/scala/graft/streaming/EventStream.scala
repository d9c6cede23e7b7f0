package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events fixture schema.
  *
  * The reference has no event-time streaming engine (SURVEY §2.10) — this
  * module is the forward-looking streaming face of the same batch
  * operators: tumbling/sliding window aggregation with watermarks and
  * gap-based sessionization via flatMapGroupsWithState. A batch DataFrame
  * with the same schema runs through the identical transforms (Structured
  * Streaming's unified model), which is how the specs verify them.
  */
object EventStream {

  /** events.parquet raw schema — ts arrives as epoch-nanos long (older
    * fixture generations, read with nanosAsLong) or a native timestamp
    * (current generation); probe the file footer once.
    */
  def rawSchema(spark: SparkSession, path: String): StructType = {
    val fileType = spark.read.parquet(path).schema("ts").dataType
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", fileType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** Streaming read of an events parquet directory (ts → µs timestamp). */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    val schema = rawSchema(spark, path)
    val raw = spark.readStream.schema(schema).parquet(path)
    if (schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Tumbling-window counts/sums with a watermark — works on both a
    * streaming and a batch frame.
    */
  def tumblingAgg(events: DataFrame, width: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), width).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .select(col("win.start").as("bucket"), col("event_type"), col("n"), col("total_value"))
  }

  case class SessEvent(user_id: Long, event_id: Long, ts_us: Long)
  case class SessState(sessionId: Long, lastTs: Long, n: Long)
  case class Session(user_id: Long, session_id: Long, n_events: Long)

  /** Gap-based sessionization via `flatMapGroupsWithState` — the custom-
    * state shape: per-user state carries the open session across
    * micro-batches; a gap larger than `gapUs` closes the session and emits
    * it. `flushOpen` emits the still-open trailing session too — correct
    * for batch frames (the group is complete) and for end-of-stream
    * flushes; a live stream would leave it false and rely on timeouts.
    * Batch equivalence with the window-based q_sessionize is spec-tested.
    */
  def sessionize(events: DataFrame, gapUs: Long = 1800000000L,
      flushOpen: Boolean = true): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          // a group's batch arrives unordered; sessionization is inherently
          // sequential per key, so sort the (bounded per-user) slice
          val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
          var st = state.getOption.getOrElse(SessState(0L, Long.MinValue, 0L))
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          for (e <- evs) {
            if (st.n == 0L || e.ts_us - st.lastTs > gapUs) {
              if (st.n > 0) out += Session(uid, st.sessionId, st.n)
              st = SessState(st.sessionId + 1, e.ts_us, 1L)
            } else st = SessState(st.sessionId, e.ts_us, st.n + 1)
          }
          state.update(st)
          if (flushOpen && st.n > 0) out += Session(uid, st.sessionId, st.n)
          out.iterator
      }.toDF()
  }

  /** Stream-stream event-time interval join: each click paired with the
    * same user's views from the preceding ten minutes. Both sides carry
    * watermarks and the join condition bounds event time on BOTH ends —
    * that is what lets Structured Streaming garbage-collect join state
    * (an unbounded condition would buffer each side forever). The same
    * transform runs on batch frames (no watermark needed), which is how
    * the spec checks result equivalence.
    */
  /** Stream-stream interval join. `joinType` "inner" (default) or
    * "left_outer": the outer form needs the same watermark + time-bound
    * condition (Spark requires both to bound the outer side's state);
    * unmatched clicks emit with null view columns once the watermark
    * passes their interval — so under AvailableNow the trailing
    * unmatched rows inside the final watermark window are withheld,
    * which is correct streaming semantics, not data loss.
    */
  def clickViewJoin(clicks: DataFrame, views: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val c = (if (clicks.isStreaming) clicks.withWatermark("ts", "30 minutes") else clicks)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val v = (if (views.isStreaming) views.withWatermark("ts", "30 minutes") else views)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
    c.join(v,
        col("user_id") === col("v_user") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 10 MINUTES") &&
          col("view_ts") <= col("click_ts"),
        joinType)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"))
  }

  /** Streaming deduplication: first event per (user, type), state bounded
    * by the watermark (`dropDuplicatesWithinWatermark` — late duplicates
    * beyond the watermark age out of state instead of pinning it forever,
    * the scale-safe form of streaming dedup). Batch frames take the plain
    * `dropDuplicates` path — same key semantics, no state.
    */
  def firstEventPerUserType(events: DataFrame): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
    else events.dropDuplicates("user_id", "event_type")

  /** Sliding-window per-user event rate. */
  def slidingRate(events: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "15 minutes") else events
    withWm
      .groupBy(window(col("ts"), width, slide).as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("win_start"), col("user_id"), col("n_events"))
  }

  /** Stream-static enrichment: join the event stream to a dimension
    * table. The static side is broadcast, so the streaming side never
    * shuffles and needs no watermark — each micro-batch probes the
    * broadcast hash table (the standard 100 TB/day enrichment topology;
    * the dim is re-read per batch, picking up slowly-changing updates).
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(
        org.apache.spark.sql.functions.broadcast(dim),
        col(eventKey) === col(dimKey), "left")
      .drop(dimKey)
}
