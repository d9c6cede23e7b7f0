package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CsvSniffer

class SnifferSpec extends AnyFunSuite {
  lazy val spark = GraftTest.spark

  test("dialect detection picks the consistent delimiter, not the frequent one") {
    // commas appear inside the quoted field of every row; semicolons give
    // the only CONSISTENT width > 1
    val lines = Seq(
      "id;name;note",
      "1;\"a,b\";x",
      "2;\"c,d\";y",
      "3;\"e,f\";z")
    val d = CsvSniffer.sniffLines(lines)
    assert(d.delimiter == ";")
    assert(d.header)
  }

  test("headerless numeric file detects header=false") {
    val d = CsvSniffer.sniffLines(Seq("1,2.5,3", "4,5.5,6", "7,8.5,9"))
    assert(d.delimiter == ",")
    assert(!d.header)
  }

  test("tab and pipe dialects detect") {
    assert(CsvSniffer.sniffLines(Seq("a\tb", "1\t2", "3\t4")).delimiter == "\t")
    assert(CsvSniffer.sniffLines(Seq("a|b", "1|2", "3|4")).delimiter == "|")
  }

  test("quote-aware splitting honors doubled quotes") {
    assert(CsvSniffer.splitLine("1,\"a\"\"b\",c", ',', '"') == Seq("1", "a\"b", "c"))
  }

  test("end-to-end: sniffed read reproduces a semicolon-delimited write") {
    import org.apache.spark.sql.functions._
    val out = "/tmp/graft_sniffer_spec/csv"
    val src = graft.engine.Tables.nation(spark, GraftTest.sf)
      .select("n_nationkey", "n_name")
    src.write.mode("overwrite").option("header", "true").option("sep", ";").csv(out)
    val back = CsvSniffer.read(spark, out)
      .select(col("n_nationkey").cast("bigint"), col("n_name"))
    assert(back.count() == src.count())
    assert(back.columns.toSeq == Seq("n_nationkey", "n_name")) // header detected
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
  }
}
