package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as partition-local batch functions.
  *
  * The actual image/audio decode is STUBBED (`fakeDecode`) — the codec
  * libraries are not in this container — but everything Spark-side is real
  * and tested: schema, partitioning, batch iteration shape, feature
  * schema. Swapping `fakeDecode` for a real JNI/codec call changes no
  * plan topology.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  /** Synthesize a media table from the documents fixture (payload = utf8
    * bytes standing in for an encoded image).
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"),
        lit("fake/rgb8").as("format")).as("meta"))

  /** STUB decode: a real implementation would decode `payload` with an
    * image codec; this deterministic fake derives "pixel stats" from the
    * bytes so the distributed plumbing is exercised end-to-end.
    */
  private def fakeDecode(payload: Array[Byte], w: Int, h: Int): (Double, Double, Long) = {
    if (payload == null || payload.isEmpty) return (0.0, 0.0, 0L)
    var sum = 0L; var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
    val mean = sum.toDouble / payload.length
    var varAcc = 0.0; i = 0
    while (i < payload.length) {
      val d = (payload(i) & 0xff) - mean; varAcc += d * d; i += 1
    }
    (mean, math.sqrt(varAcc / payload.length), w.toLong * h)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = true),
    StructField("mean_intensity", DoubleType, nullable = true),
    StructField("std_intensity", DoubleType, nullable = true),
    StructField("n_pixels", LongType, nullable = true)))

  /** Resize: STUB re-encode to the target box — deterministic payload
    * truncation/padding standing in for a scaler; meta is updated for
    * real. A real scaler swaps only the lambda body; plan shape (narrow
    * map, no shuffle) is what matters at scale.
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(1.0),
      least(lit(maxW) / col("meta.width"), lit(maxH) / col("meta.height")))
    media.select(
      col("media_id"), col("modality"),
      // stub: proportionally truncate the byte payload
      expr(s"substring(payload, 1, greatest(1, CAST(length(payload) * " +
        s"least(1.0, least($maxW / meta.width, $maxH / meta.height)) AS INT)))")
        .as("payload"),
      struct(
        ceil(col("meta.width") * scale).cast("int").as("width"),
        ceil(col("meta.height") * scale).cast("int").as("height"),
        col("meta.format").as("format")).as("meta"))
  }

  /** Frame sampling: one row per sampled frame (video → k frames). STUB
    * slices the payload into k equal chunks; a real demuxer emits decoded
    * frames. posexplode keeps (media, frame_no) alignment; downstream
    * per-frame operators inherit the natural partitioning.
    */
  def sampleFrames(media: DataFrame, k: Int): DataFrame =
    media
      .select(col("media_id"), col("meta"),
        posexplode(expr(
          s"""transform(sequence(0, ${k - 1}),
             |  i -> substring(payload,
             |                 1 + i * greatest(1, length(payload) DIV $k),
             |                 greatest(1, length(payload) DIV $k)))""".stripMargin)))
      .select(col("media_id"), col("pos").cast("int").as("frame_no"),
        col("col").as("frame_payload"), col("meta"))

  // NOT private: the encoder's generated projections instantiate these
  // from codegen'd classes, which cannot access private members.
  case class MediaIn(
      media_id: Long, modality: String, payload: Array[Byte],
      width: Option[Int], height: Option[Int])
  case class MediaFeatures(
      media_id: Long, modality: String, n_bytes: Long,
      mean_intensity: Double, std_intensity: Double, n_pixels: Long)

  /** Feature extraction as a partition-local batch pass (the `mapInPandas`
    * equivalent in Scala): one decoder instance per partition, rows
    * streamed through it — the shape a real codec needs (expensive init
    * amortized per partition, not per row).
    *
    * Typed `Dataset.mapPartitions` (encoder-backed), NOT `.rdd`: the RDD
    * drop-out severed the SQL plan (external row conversion both ways and
    * an opaque boundary Catalyst can't see through); the typed map keeps
    * one plan — codegen'd deserialize → the same per-partition iterator →
    * codegen'd serialize — and column pruning still reaches the scan.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(
        col("media_id"), col("modality"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[MediaIn]
      .mapPartitions { rows =>
        // per-partition decoder init would go here
        rows.map { m =>
          val (mean, std, pixels) = fakeDecode(m.payload,
            m.width.getOrElse(0), m.height.getOrElse(0))
          MediaFeatures(m.media_id, m.modality,
            if (m.payload == null) 0L else m.payload.length.toLong,
            mean, std, pixels)
        }
      }
      .toDF()
  }
}
