package graft

import org.scalatest.funsuite.AnyFunSuite

/** sqllogictest-style runner — same record format as the reference's 3,855
  * `.test` files (`/root/reference/test/sql/...`): `statement ok` /
  * `statement error` / `query <types>` blocks with `----`-separated
  * expected rows. Cases live under `src/test/resources/sql` (.test), one file
  * per operator family, each self-contained (temp views from VALUES), so
  * expectations are engine-independent and scale-factor independent.
  */
class SqlLogicSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark

  private def cell(v: Any): String = v match {
    case null => "NULL"
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case d: Double => if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    case f: Float => cell(f.toDouble)
    case other => other.toString
  }

  private def runFile(name: String, text: String): Unit = {
    val lines = text.linesIterator.toVector
    var i = 0
    var caseNo = 0
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.isEmpty || line.startsWith("#")) i += 1
      else if (line.startsWith("statement")) {
        val expectError = line.contains("error")
        val sqlLines = lines.drop(i + 1).takeWhile(l => l.trim.nonEmpty)
        val sql = sqlLines.mkString("\n")
        caseNo += 1
        if (expectError) {
          val ok = scala.util.Try(spark.sql(sql).collect()).isFailure
          assert(ok, s"$name #$caseNo: expected error for: $sql")
        } else spark.sql(sql).collect()
        i += 1 + sqlLines.length
      } else if (line.startsWith("query")) {
        val sqlLines = lines.drop(i + 1).takeWhile(l => l.trim != "----")
        val sql = sqlLines.mkString("\n")
        val expLines = lines.drop(i + 1 + sqlLines.length + 1)
          .takeWhile(l => l.trim.nonEmpty)
          .map(_.trim)
        caseNo += 1
        val got = spark.sql(sql).collect()
          .map(r => (0 until r.length).map(j => cell(r.get(j))).mkString(" "))
          .toVector
        assert(got == expLines,
          s"$name #$caseNo:\n$sql\nexpected:\n${expLines.mkString("\n")}\ngot:\n${got.mkString("\n")}")
        i += 1 + sqlLines.length + 1 + expLines.length
      } else i += 1
    }
    assert(caseNo > 0, s"$name: no test records parsed")
  }

  private val files = Seq("join", "aggregate", "window", "setops", "string", "subquery", "types", "collation")
  for (f <- files) {
    test(s"sqllogic: $f.test") {
      val in = getClass.getResourceAsStream(s"/sql/$f.test")
      assert(in != null, s"missing resource /sql/$f.test")
      runFile(f, scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    }
  }
}
