package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables
import Q._

/** TPC-DS sample pack, batch 16
  * (`/root/reference/extension/tpcds/dsdgen/queries/{26,28,29,40,48,50}.sql`),
  * fixture-adapted like the earlier batches:
  *
  *  - q26: per-brand exact averages behind demographic + promo-channel
  *         gates.
  *  - q28: six quantity-band (avg, count, count-distinct) triples in ONE
  *         pass — conditional aggregates instead of the benchmark's six
  *         scalar subqueries cross-joined (same numbers, one scan).
  *  - q29: sold → returned → re-bought chain, three quantity sums per
  *         (brand, nation).
  *  - q40: before/after-pivot-date sales with refunds subtracted via a
  *         LEFT OUTER join against the aggregated returns.
  *  - q48: quantity total behind two AND-ed disjunctive band blocks
  *         (demo × geo).
  *  - q50: return-lag day buckets (30/60/90/120/120+) per nation.
  *
  * Scale shapes: q28's distinct aggregates run as one Expand pass over
  * the filtered scan (vs six separate scans); q40's refund side
  * aggregates per order BEFORE the left join; chain joins in q29 hop on
  * keys only; every money measure is an exact mantissa.
  */
object Tpcds16 extends Pack {

  private def favgIf(cond: Column, c: Column, dp: Int): Column =
    sum(when(cond, fx(c, dp))).cast("double") / math.pow(10, dp) /
      count(when(cond, lit(1)))
  private def favgIfSql(cond: String, e: String, dp: Int): String =
    s"(CAST(sum(CASE WHEN $cond THEN ${fxSql(e, dp)} END) AS DOUBLE) / " +
      s"${math.pow(10, dp).toLong}.0 / count(CASE WHEN $cond THEN 1 END))"

  // ---- DS Q26: demographic-gated per-brand averages ----------------------
  q("q_ds26_demo_averages",
    s"""SELECT p_brand,
       |  ${favgSql("l_quantity", 2)} AS agg1,
       |  ${favgSql("l_extendedprice", 2)} AS agg2,
       |  ${favgSql("l_discount", 2)} AS agg3,
       |  ${favgSql("l_tax", 2)} AS agg4
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN part ON l_partkey = p_partkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH')
       |  AND year(o_orderdate) = 1996
       |GROUP BY p_brand ORDER BY p_brand""") { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey",
        "o_orderdate", "o_orderpriority"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .filter(col("c_mktsegment") === "BUILDING" &&
        (col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH") &&
        year(col("o_orderdate")) === 1996)
      .groupBy("p_brand")
      .agg(favg(col("l_quantity"), 2).as("agg1"),
        favg(col("l_extendedprice"), 2).as("agg2"),
        favg(col("l_discount"), 2).as("agg3"),
        favg(col("l_tax"), 2).as("agg4"))
      .orderBy("p_brand")
  }

  // ---- DS Q28: six band triples in one conditional-aggregate pass --------
  // The benchmark cross-joins six single-row scalar subqueries; the same
  // numbers fall out of ONE filtered scan with conditional aggregates
  // (count-distincts share an Expand — 3 extra shuffle copies beats 6
  // full scans at any scale).
  q("q_ds28_band_triples", {
    val bands = Seq(
      ("b1", "l_quantity BETWEEN 0 AND 5", "l_discount BETWEEN 0.00 AND 0.04"),
      ("b2", "l_quantity BETWEEN 6 AND 10", "l_discount BETWEEN 0.02 AND 0.06"),
      ("b3", "l_quantity BETWEEN 11 AND 15", "l_discount BETWEEN 0.04 AND 0.08"))
    val cols = bands.map { case (n, qb, db) =>
      val cond = s"($qb AND ($db OR l_tax BETWEEN 0.02 AND 0.05))"
      s"""  ${favgIfSql(cond, "l_extendedprice", 2)} AS ${n}_lp,
         |  count(CASE WHEN $cond THEN 1 END) AS ${n}_cnt,
         |  count(DISTINCT CASE WHEN $cond
         |    THEN ${fxSql("l_extendedprice", 2)} END) AS ${n}_cntd""".stripMargin
    }
    s"SELECT\n${cols.mkString(",\n")}\nFROM lineitem"
  }) { (s, dir) =>
    def band(qlo: Int, qhi: Int, dlo: Double, dhi: Double): Column =
      col("l_quantity").between(qlo, qhi) &&
        (col("l_discount").between(dlo, dhi) ||
          col("l_tax").between(0.02, 0.05))
    val bands = Seq(
      ("b1", band(0, 5, 0.00, 0.04)),
      ("b2", band(6, 10, 0.02, 0.06)),
      ("b3", band(11, 15, 0.04, 0.08)))
    val aggs = bands.flatMap { case (n, cond) =>
      Seq(favgIf(cond, col("l_extendedprice"), 2).as(s"${n}_lp"),
        count(when(cond, lit(1))).as(s"${n}_cnt"),
        countDistinct(when(cond, fx(col("l_extendedprice"), 2))).as(s"${n}_cntd"))
    }
    Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
  }

  // ---- DS Q29: sold → returned → re-bought quantity chain ----------------
  q("q_ds29_return_rebuy_chain",
    s"""WITH ret AS (
       |  SELECT l_orderkey AS rk, l_partkey AS rp, l_quantity AS rq,
       |    l_linenumber AS rl
       |  FROM lineitem WHERE l_returnflag = 'R'),
       |rebuy AS (
       |  SELECT o2.o_custkey AS bk, l2.l_partkey AS bp,
       |    CAST(sum(${fxSql("l2.l_quantity", 2)}) AS BIGINT) AS bq
       |  FROM lineitem l2 JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
       |  WHERE year(o2.o_orderdate) >= 1997 GROUP BY 1, 2)
       |SELECT p_brand, c_nationkey,
       |  CAST(sum(${fxSql("l_quantity", 2)}) AS BIGINT) AS sold_qty,
       |  CAST(sum(${fxSql("rq", 2)}) AS BIGINT) AS ret_qty,
       |  CAST(sum(bq) AS BIGINT) AS rebuy_qty
       |FROM lineitem
       |JOIN ret ON rk = l_orderkey AND rl = l_linenumber
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN part ON l_partkey = p_partkey
       |JOIN rebuy ON bk = o_custkey AND bp = l_partkey
       |WHERE year(o_orderdate) <= 1996
       |GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val ret = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("rk"), col("l_partkey").as("rp"),
        col("l_quantity").as("rq"), col("l_linenumber").as("rl"))
    val rebuy = li.select(col("l_orderkey").as("lk2"), col("l_partkey").as("bp"),
        col("l_quantity").as("q2"))
      .join(Tables.orders(s, dir).select(col("o_orderkey").as("ok2"),
        col("o_custkey").as("bk"), col("o_orderdate").as("od2")),
        col("lk2") === col("ok2"))
      .filter(year(col("od2")) >= 1997)
      .groupBy("bk", "bp")
      .agg(sum(fx(col("q2"), 2)).cast("bigint").as("bq"))
    li.join(ret, col("rk") === col("l_orderkey") && col("rl") === col("l_linenumber"))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .join(rebuy, col("bk") === col("o_custkey") && col("bp") === col("l_partkey"))
      .filter(year(col("o_orderdate")) <= 1996)
      .groupBy("p_brand", "c_nationkey")
      .agg(sum(fx(col("l_quantity"), 2)).cast("bigint").as("sold_qty"),
        sum(fx(col("rq"), 2)).cast("bigint").as("ret_qty"),
        sum("bq").cast("bigint").as("rebuy_qty"))
      .orderBy("p_brand", "c_nationkey")
  }

  // ---- DS Q40: before/after pivot with refunds LEFT-joined ---------------
  q("q_ds40_pivot_refunds",
    s"""WITH ref AS (
       |  SELECT l_orderkey AS rk,
       |    CAST(sum(${fxSql("l_extendedprice", 2)}) AS BIGINT) AS refund
       |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1)
       |SELECT c_nationkey,
       |  CAST(sum(CASE WHEN o_orderdate < DATE '1997-01-01'
       |    THEN ${fxSql("o_totalprice", 2)} - coalesce(refund, 0)
       |    ELSE 0 END) AS BIGINT) AS sales_before,
       |  CAST(sum(CASE WHEN o_orderdate >= DATE '1997-01-01'
       |    THEN ${fxSql("o_totalprice", 2)} - coalesce(refund, 0)
       |    ELSE 0 END) AS BIGINT) AS sales_after
       |FROM orders
       |LEFT OUTER JOIN ref ON rk = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE o_orderdate BETWEEN DATE '1996-07-01' AND DATE '1997-06-30'
       |GROUP BY c_nationkey ORDER BY c_nationkey""") { (s, dir) =>
    val ref = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey").as("rk"))
      .agg(sum(fx(col("l_extendedprice"), 2)).cast("bigint").as("refund"))
    val net = fx(col("o_totalprice"), 2) - coalesce(col("refund"), lit(0L))
    Tables.orders(s, dir)
      .filter(col("o_orderdate").between("1996-07-01", "1997-06-30"))
      .join(ref, col("rk") === col("o_orderkey"), "left_outer")
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(sum(when(col("o_orderdate") < "1997-01-01", net).otherwise(0L))
          .cast("bigint").as("sales_before"),
        sum(when(col("o_orderdate") >= "1997-01-01", net).otherwise(0L))
          .cast("bigint").as("sales_after"))
      .orderBy("c_nationkey")
  }

  // ---- DS Q48: two AND-ed disjunctive band blocks ------------------------
  q("q_ds48_band_blocks",
    s"""SELECT CAST(sum(${fxSql("l_quantity", 2)}) AS BIGINT) AS qty_sum
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE ((c_mktsegment = 'MACHINERY'
       |        AND o_totalprice BETWEEN 100000 AND 150000)
       |    OR (c_mktsegment = 'HOUSEHOLD'
       |        AND o_totalprice BETWEEN 50000 AND 100000)
       |    OR (c_mktsegment = 'BUILDING'
       |        AND o_totalprice BETWEEN 150000 AND 200000))
       |  AND ((c_nationkey IN (1, 3, 5) AND l_quantity BETWEEN 0 AND 25)
       |    OR (c_nationkey IN (7, 9, 11) AND l_quantity BETWEEN 10 AND 40)
       |    OR (c_nationkey IN (2, 4, 6) AND l_quantity BETWEEN 25 AND 50))""") {
    (s, dir) =>
      Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select("c_custkey", "c_mktsegment", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .filter(
          ((col("c_mktsegment") === "MACHINERY" &&
              col("o_totalprice").between(100000, 150000)) ||
            (col("c_mktsegment") === "HOUSEHOLD" &&
              col("o_totalprice").between(50000, 100000)) ||
            (col("c_mktsegment") === "BUILDING" &&
              col("o_totalprice").between(150000, 200000))) &&
          ((col("c_nationkey").isin(1, 3, 5) && col("l_quantity").between(0, 25)) ||
            (col("c_nationkey").isin(7, 9, 11) && col("l_quantity").between(10, 40)) ||
            (col("c_nationkey").isin(2, 4, 6) && col("l_quantity").between(25, 50))))
        .agg(sum(fx(col("l_quantity"), 2)).cast("bigint").as("qty_sum"))
  }

  // ---- DS Q50: return-lag day buckets per nation -------------------------
  // lag = returned-line ship date minus its order's placement date
  q("q_ds50_return_lag_buckets",
    """SELECT c_nationkey,
      |  CAST(sum(CASE WHEN lag <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
      |  CAST(sum(CASE WHEN lag > 30 AND lag <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
      |  CAST(sum(CASE WHEN lag > 60 AND lag <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
      |  CAST(sum(CASE WHEN lag > 90 AND lag <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
      |  CAST(sum(CASE WHEN lag > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120plus
      |FROM (
      |  SELECT c_nationkey, datediff('day', o_orderdate, l_shipdate) AS lag
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  WHERE l_returnflag = 'R' AND year(o_orderdate) = 1996) t
      |GROUP BY c_nationkey ORDER BY c_nationkey""") { (s, dir) =>
    val lag = datediff(col("l_shipdate"), col("o_orderdate"))
    Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_shipdate")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(year(col("o_orderdate")) === 1996)
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), lag.as("lag"))
      .groupBy("c_nationkey")
      .agg(sum(when(col("lag") <= 30, 1).otherwise(0)).as("d30"),
        sum(when(col("lag") > 30 && col("lag") <= 60, 1).otherwise(0)).as("d60"),
        sum(when(col("lag") > 60 && col("lag") <= 90, 1).otherwise(0)).as("d90"),
        sum(when(col("lag") > 90 && col("lag") <= 120, 1).otherwise(0)).as("d120"),
        sum(when(col("lag") > 120, 1).otherwise(0)).as("d120plus"))
      .orderBy("c_nationkey")
  }
}
