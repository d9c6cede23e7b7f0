package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV dialect sniffing — the reference's read_csv auto-detection
  * (`/root/reference/src/execution/operator/csv_scanner/sniffer/`:
  * dialect_detection.cpp → header_detection.cpp → type_detection.cpp),
  * reduced to its Spark-shaped core: Spark's CSV reader infers TYPES but
  * not the DIALECT (delimiter/quote/header), so this helper closes that
  * gap and hands the winning options to `spark.read`.
  *
  * Like the reference, detection runs over a bounded sample of the file
  * (driver-side metadata work, same place schema inference happens — at
  * 100 TB the sample is still one small read of one file):
  *
  *  1. dialect: for each candidate delimiter, split the sample lines
  *     quote-aware and score = columns-per-row consistency first, column
  *     count second (reference dialect_detection.cpp scores candidates
  *     by consistent row width);
  *  2. header: the first row is a header when it fails the numeric parse
  *     that succeeds for the rows beneath it (header_detection.cpp's
  *     type-mismatch rule);
  *  3. types: delegated to Spark's own inferSchema.
  */
object CsvSniffer {

  final case class Dialect(delimiter: String, quote: String, header: Boolean)

  private val candidates = Seq(',', ';', '\t', '|')

  /** Quote-aware split of one line on `delim`. */
  private[graft] def splitLine(line: String, delim: Char, quote: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (inQ) {
        if (ch == quote) {
          if (i + 1 < line.length && line.charAt(i + 1) == quote) { cur += quote; i += 1 }
          else inQ = false
        } else cur += ch
      } else if (ch == quote && cur.isEmpty) inQ = true
      else if (ch == delim) { out += cur.toString(); cur.clear() }
      else cur += ch
      i += 1
    }
    out += cur.toString()
    out.toSeq
  }

  private def isNumeric(s: String): Boolean =
    s.nonEmpty && scala.util.Try(java.lang.Double.parseDouble(s)).isSuccess

  /** Detect the dialect from sample lines (pure — unit-testable). */
  private[graft] def sniffLines(lines: Seq[String]): Dialect = {
    val quote = '"'
    val scored = candidates.map { d =>
      val widths = lines.map(l => splitLine(l, d, quote).length)
      val modal = widths.groupBy(identity).maxBy { case (w, g) => (g.size, w) }._1
      val consistency = widths.count(_ == modal).toDouble / math.max(widths.size, 1)
      // single-column "consistency" is vacuous — a file with no delimiter
      // hits 100% on every candidate; demand width > 1 to count
      (d, modal, if (modal > 1) consistency else 0.0)
    }
    val (delim, width, score) = scored.maxBy { case (_, w, s) => (s, w) }
    val chosen = if (score == 0.0) ',' else delim // degenerate single-column file
    // header: a first-row cell that is NOT numeric above a column whose
    // data rows ARE numeric marks a header line
    val header = lines match {
      case first +: rest if rest.nonEmpty && width > 0 =>
        val h = splitLine(first, chosen, quote)
        val body = rest.map(splitLine(_, chosen, quote)).filter(_.length == h.length)
        body.nonEmpty && h.indices.exists { i =>
          !isNumeric(h(i)) && body.forall(r => isNumeric(r(i)))
        }
      case _ => false
    }
    Dialect(chosen.toString, quote.toString, header)
  }

  /** Read the first `maxLines` lines of the (lexicographically first)
    * file under `path` — mirrors the reference's bounded sample buffer.
    */
  def sample(spark: SparkSession, path: String, maxLines: Int = 64): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    // a PARTITION_BY write produces nested grp=X/ directories — descend
    // to the first DATA file (spark.read.csv then discovers the hive
    // partition columns from the directory names)
    def firstFile(dir: org.apache.hadoop.fs.Path): Option[org.apache.hadoop.fs.Path] = {
      val entries = fs.listStatus(dir)
        .filterNot(_.getPath.getName.startsWith("_"))
        .sortBy(_.getPath.getName)
      entries.find(_.isFile).map(_.getPath).orElse(
        entries.filter(_.isDirectory).iterator
          .flatMap(d => firstFile(d.getPath)).nextOption())
    }
    val file =
      if (fs.getFileStatus(p).isDirectory)
        firstFile(p).getOrElse(throw new IllegalArgumentException(
          s"IO Error: No files found that match the pattern \"$path\""))
      else p
    val in = fs.open(file)
    try {
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
        in, java.nio.charset.StandardCharsets.UTF_8))
      Iterator.continually(reader.readLine()).takeWhile(_ != null).take(maxLines).toSeq
    } finally in.close()
  }

  def sniff(spark: SparkSession, path: String): Dialect =
    sniffLines(sample(spark, path))

  /** read_csv with full auto-detection: dialect sniffed here, types
    * inferred by Spark's reader.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val d = sniff(spark, path)
    spark.read
      .option("sep", d.delimiter)
      .option("quote", d.quote)
      .option("header", d.header.toString)
      .option("inferSchema", "true")
      .csv(path)
  }
}
