package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: opaque `binary` payloads + typed metadata, with
  * decode / feature-extraction / resize / frame-sampling as
  * partition-local batch passes (the `mapInPandas` shape in Scala: one
  * decoder per partition, rows streamed through it).
  *
  * The decode is REAL and JDK-only:
  *  - images: PNG encode/decode via `javax.imageio.ImageIO`
  *    (reference capability analogue: read_blob + per-row function
  *    surface, src/function/table/read_file.cpp)
  *  - audio: WAV (PCM16LE) encode/decode via
  *    `javax.sound.sampled.AudioSystem`
  *  - resize: real `java.awt.Graphics2D` bilinear scaling + PNG re-encode
  *  - video: an honest demux STUB — the JDK ships no video codec — the
  *    payload is a raw frame container (k concatenated w×h gray frames)
  *    and frame sampling slices + computes per-frame stats
  *
  * Payloads are synthesized deterministically from `doc_id`, so every
  * decoded statistic has a closed form an independent SQL oracle can
  * compute: if the codec roundtrip were wrong in any way, the stats would
  * not match. Plan topology everywhere: narrow maps, zero shuffles —
  * unchanged at any corpus size.
  */
object Multimodal {

  // deterministic synth parameters (shared with the DuckDB oracle SQL)
  def imgW(docId: Long): Int = (docId % 13).toInt + 4
  def imgH(docId: Long): Int = (docId % 11).toInt + 4
  def wavN(docId: Long): Int = (docId % 400).toInt + 100
  val WavRate = 8000
  /** gray pixel at (x,y) of image docId */
  def pix(docId: Long, x: Int, y: Int): Int = ((x * 7 + y * 13 + docId) % 256).toInt
  /** PCM16 sample i of audio docId (range [-1001, 1001]) */
  def pcm(docId: Long, i: Int): Int = ((docId * 31 + i.toLong * 17) % 2003).toInt - 1001
  /** raw video byte j of video docId */
  def vByte(docId: Long, j: Int): Int = ((docId * 31 + j) % 256).toInt

  private[pipeline] def newPngWriter(): javax.imageio.ImageWriter =
    ImageIO.getImageWritersByFormatName("png").next()

  /** Encode through a reusable writer over a memory-backed stream (the
    * ImageIO.write convenience path builds a fresh writer per call). */
  private[pipeline] def writePng(writer: javax.imageio.ImageWriter,
      img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { writer.setOutput(ios); writer.write(img); ios.flush() }
    finally ios.close()
    bos.toByteArray
  }

  /** Encode a real grayscale PNG with the deterministic pixel pattern. */
  def synthPng(docId: Long): Array[Byte] = synthPng(newPngWriter(), docId)

  def synthPng(writer: javax.imageio.ImageWriter, docId: Long): Array[Byte] = {
    val (w, h) = (imgW(docId), imgH(docId))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pix(docId, x, y)); x += 1 }
      y += 1
    }
    writePng(writer, img)
  }

  /** Encode a real WAV (PCM16LE mono 8 kHz) with the deterministic tone. */
  def synthWav(docId: Long): Array[Byte] = {
    val n = wavN(docId)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = pcm(docId, i)
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(WavRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Raw "video": k concatenated w×h gray frames (no JDK video codec —
    * the container is honest about being raw). */
  def synthVideo(docId: Long, k: Int): Array[Byte] = {
    val frame = imgW(docId) * imgH(docId)
    val bytes = new Array[Byte](k * frame)
    var j = 0
    while (j < bytes.length) { bytes(j) = vByte(docId, j).toByte; j += 1 }
    bytes
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  // NOT private: the encoder's generated projections instantiate these
  // from codegen'd classes, which cannot access private members.
  case class MediaRow(
      media_id: Long, modality: String, payload: Array[Byte],
      meta_width: Option[Int], meta_height: Option[Int], meta_format: String)
  case class MediaIn(media_id: Long, modality: String, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long, modality: String, width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], n_units: Long, mean_val: Double, std_val: Double)
  case class FrameStats(
      media_id: Long, frame_no: Int, frame_bytes: Long,
      mean_byte: Double, std_byte: Double)
  case class ResizedDims(media_id: Long, width: Int, height: Int, n_bytes: Long)

  /** Synthesize a media table from the documents fixture: even doc_ids
    * become real PNG images, odd ones real WAV clips. Encode runs in the
    * partition-local map — the same per-partition batch shape a real
    * ingest (decode) pass uses.
    */
  def fromDocuments(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        lazy val writer = newPngWriter() // one encoder per partition
        ids.map { id =>
          if (id % 2 == 0)
            MediaRow(id, "image", synthPng(writer, id), Some(imgW(id)), Some(imgH(id)), "png")
          else
            MediaRow(id, "audio", synthWav(id), None, None, "wav/pcm16")
        }
      }
      .toDF()
      .select(col("media_id"), col("modality"), col("payload"),
        struct(col("meta_width").as("width"), col("meta_height").as("height"),
          col("meta_format").as("format")).as("meta"))
  }

  /** Video table: raw frame containers (k frames per doc). */
  def videoFromDocuments(docs: DataFrame, k: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(ids => ids.map { id =>
        MediaRow(id, "video", synthVideo(id, k), Some(imgW(id)), Some(imgH(id)), "raw/gray8")
      })
      .toDF()
      .select(col("media_id"), col("modality"), col("payload"),
        struct(col("meta_width").as("width"), col("meta_height").as("height"),
          col("meta_format").as("format")).as("meta"))
  }

  private def stats(s1: Long, s2: Long, n: Long): (Double, Double) = {
    if (n == 0) return (0.0, 0.0)
    val mean = s1.toDouble / n
    (mean, math.sqrt(s2.toDouble / n - mean * mean))
  }

  // ImageIO's default read path creates a FRESH reader instance and a
  // disk-backed cache file per call — most of the per-image decode cost
  // at bench scale. Decode through one reusable per-partition
  // ImageReader over a memory-backed stream instead.
  ImageIO.setUseCache(false)

  private[pipeline] def newPngReader(): javax.imageio.ImageReader =
    ImageIO.getImageReadersByFormatName("png").next()

  private[pipeline] def readPng(reader: javax.imageio.ImageReader,
      payload: Array[Byte]): BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(payload))
    try { reader.setInput(iis, true, true); reader.read(0) }
    finally iis.close()
  }

  /** REAL image decode: PNG → dimensions + gray-intensity stats. */
  def decodeImage(payload: Array[Byte]): MediaFeatures =
    decodeImage(newPngReader(), payload)

  /** Partition-reused-reader variant (the hot path). */
  def decodeImage(reader: javax.imageio.ImageReader,
      payload: Array[Byte]): MediaFeatures = {
    val img = readPng(reader, payload)
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    var s1 = 0L; var s2 = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = raster.getSample(x, y, 0).toLong
        s1 += v; s2 += v * v; x += 1
      }
      y += 1
    }
    val (mean, std) = stats(s1, s2, w.toLong * h)
    MediaFeatures(0L, "image", Some(w), Some(h), None, w.toLong * h, mean, std)
  }

  /** REAL audio decode: WAV header parse + PCM16LE samples → stats. */
  def decodeWav(payload: Array[Byte]): MediaFeatures = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
      s"unexpected WAV format: $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    var s1 = 0L; var s2 = 0L
    var i = 0
    while (i < n) {
      val v = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
      s1 += v; s2 += v * v; i += 1
    }
    val (mean, std) = stats(s1, s2, n.toLong)
    MediaFeatures(0L, "audio", None, None, Some(fmt.getSampleRate.toInt), n.toLong, mean, std)
  }

  /** Feature extraction: modality-dispatched REAL decode as a typed
    * partition-local pass. Typed `Dataset.mapPartitions` (encoder-backed),
    * NOT `.rdd`: the RDD drop-out severed the SQL plan; the typed map
    * keeps one plan — codegen'd deserialize → per-partition iterator →
    * codegen'd serialize — and column pruning still reaches the scan.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("modality"), col("payload"))
      .as[MediaIn]
      .mapPartitions { rows =>
        lazy val reader = newPngReader() // one reader per partition
        rows.map { m =>
          val f = m.modality match {
            case "image" => decodeImage(reader, m.payload)
            case "audio" => decodeWav(m.payload)
            case other =>
              // opaque modality: byte stats (no codec claimed)
              var s1 = 0L; var s2 = 0L; var i = 0
              while (i < m.payload.length) {
                val v = (m.payload(i) & 0xff).toLong; s1 += v; s2 += v * v; i += 1
              }
              val (mean, std) = stats(s1, s2, m.payload.length.toLong)
              MediaFeatures(0L, other, None, None, None, m.payload.length.toLong, mean, std)
          }
          f.copy(media_id = m.media_id, modality = m.modality)
        }
      }
      .toDF()
  }

  /** REAL resize: decode PNG, Graphics2D-scale into a maxW×maxH box
    * (aspect preserved, never upscaled), re-encode PNG. Target dims use
    * ceil so the oracle has a closed form; only the pixel resampling is
    * codec work. Narrow map, no shuffle.
    */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("modality"), col("payload"))
      .as[MediaIn]
      .mapPartitions { rows =>
        lazy val reader = newPngReader()   // one reader per partition
        lazy val writer2 = newPngWriter()  // one encoder per partition
        rows.map { m =>
          val src = readPng(reader, m.payload)
          val scale = math.min(1.0,
            math.min(maxW.toDouble / src.getWidth, maxH.toDouble / src.getHeight))
          val tw = math.ceil(src.getWidth * scale).toInt
          val th = math.ceil(src.getHeight * scale).toInt
          val dst = new BufferedImage(tw, th, BufferedImage.TYPE_BYTE_GRAY)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, tw, th, null)
          } finally g.dispose()
          val out = writePng(writer2, dst)
          // decode the re-encoded payload: dims come from the roundtrip
          val back = readPng(reader, out)
          ResizedDims(m.media_id, back.getWidth, back.getHeight, out.length.toLong)
        }
      }
      .toDF()
  }

  /** Frame sampling: slice the raw container into k frames with Spark's
    * binary `substring` (declarative, codegen'd) — posexplode keeps
    * (media, frame_no) alignment and downstream per-frame operators
    * inherit the natural partitioning.
    */
  def sampleFrames(media: DataFrame, k: Int): DataFrame = {
    // Raw Catalyst Substring (via Bridge, not the SQL name): the engine's
    // function registry shadows `substring`/`substr` with the reference's
    // STRING semantics, which would reroute the byte slice through UTF-8.
    // The direct expression keeps BinaryType end-to-end and codegen's.
    import org.apache.spark.sql.catalyst.expressions.{Substring => CSubstring}
    import org.apache.spark.sql.graft.Bridge
    val flen = greatest(lit(1), floor(length(col("payload")) / k).cast("int"))
    val slices = array((0 until k).map { i =>
      Bridge.column(CSubstring(
        Bridge.expression(col("payload")),
        Bridge.expression(lit(1) + lit(i) * flen),
        Bridge.expression(flen)))
    }: _*)
    media
      .select(col("media_id"), col("meta"), posexplode(slices))
      .select(col("media_id"), col("pos").cast("int").as("frame_no"),
        col("col").as("frame_payload"), col("meta"))
  }

  /** Per-frame byte stats over the sliced frames (partition-local). */
  def frameStats(frames: DataFrame): DataFrame = {
    import frames.sparkSession.implicits._
    frames.select(col("media_id"), col("frame_no"), col("frame_payload"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, fno, bytes) =>
          var s1 = 0L; var s2 = 0L; var i = 0
          while (i < bytes.length) {
            val v = (bytes(i) & 0xff).toLong; s1 += v; s2 += v * v; i += 1
          }
          val (mean, std) = stats(s1, s2, bytes.length.toLong)
          FrameStats(id, fno, bytes.length.toLong, mean, std)
        }
      }
      .toDF()
  }
}
