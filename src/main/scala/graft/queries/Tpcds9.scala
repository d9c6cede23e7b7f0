package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables
import Q._

/** TPC-DS sample pack, batch 9
  * (`/root/reference/extension/tpcds/dsdgen/queries/{61,77,83,87}.sql`),
  * fixture-adapted like the earlier batches:
  *
  *  - q87: EXCEPT chain over per-period distinct key sets (set-op planner
  *         shape: two anti joins over pre-distinct projections).
  *  - q77: per-group profit-and-loss — two INDEPENDENT aggregate
  *         pipelines stitched FULL OUTER, plus the grand-total row
  *         (union of the re-aggregate).
  *  - q61: promotional-revenue ratio — join of two filtered aggregates,
  *         one division at render.
  *  - q83: keys returned in ALL periods (INTERSECT chain) joined back to
  *         the per-period counts.
  *
  * Scale shapes: set ops run over DISTINCT-projected key columns (tiny
  * vs the fact); the P&L stitch full-outers two already-aggregated
  * frames; the ratio join is dimension-sized. Money stays in exact fx
  * mantissas until the final render.
  */
object Tpcds9 extends Pack {

  // ---- DS Q87: EXCEPT chain over per-year customer sets ------------------
  q("q_ds87_except_chain",
    """SELECT count(*) AS n_lapsed FROM (
      |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)""") { (s, dir) =>
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
    def yrSet(y: Int) = o.filter(col("yr") === y).select("o_custkey").distinct()
    yrSet(1995).except(yrSet(1996)).except(yrSet(1997))
      .agg(count(lit(1)).as("n_lapsed"))
  }

  // ---- DS Q77: channel P&L full-outer stitch + grand total ---------------
  // sales channel = order totals per nation; returns channel = R-flagged
  // lineitem revenue per nation. Aggregated independently, stitched FULL
  // OUTER, then the grand-total row unioned on top (grouping-id style).
  q("q_ds77_channel_pl",
    s"""WITH sales AS (
       |  SELECT c_nationkey AS nk, sum(${fxSql("o_totalprice", 2)}) AS ms
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE year(o_orderdate) = 1995 GROUP BY 1),
       |ret AS (
       |  SELECT c_nationkey AS nk, sum(${fxSql("l_extendedprice", 2)}) AS mr
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  WHERE l_returnflag = 'R' AND year(o_orderdate) = 1995 GROUP BY 1),
       |pl AS (
       |  SELECT coalesce(sales.nk, ret.nk) AS nk,
       |    coalesce(ms, 0) AS ms, coalesce(mr, 0) AS mr
       |  FROM sales FULL OUTER JOIN ret ON sales.nk = ret.nk)
       |SELECT nk, CAST(ms AS DOUBLE) / 100.0 AS sales_total,
       |  CAST(mr AS DOUBLE) / 100.0 AS returns_total,
       |  CAST(ms - mr AS DOUBLE) / 100.0 AS net
       |FROM pl
       |UNION ALL
       |SELECT -1 AS nk, CAST(sum(ms) AS DOUBLE) / 100.0,
       |  CAST(sum(mr) AS DOUBLE) / 100.0, CAST(sum(ms - mr) AS DOUBLE) / 100.0
       |FROM pl
       |ORDER BY nk""") { (s, dir) =>
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val sales = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")) === 1995)
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"))
      .agg(sum(fx(col("o_totalprice"), 2)).as("ms"))
    val ret = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice")
      .join(Tables.orders(s, dir).filter(year(col("o_orderdate")) === 1995)
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("rnk"))
      .agg(sum(fx(col("l_extendedprice"), 2)).as("mr"))
    val pl = sales.join(ret, col("nk") === col("rnk"), "full_outer")
      .select(coalesce(col("nk"), col("rnk")).as("nk"),
        coalesce(col("ms"), lit(0L)).as("ms"),
        coalesce(col("mr"), lit(0L)).as("mr"))
    val detail = pl.select(col("nk"),
      (col("ms").cast("double") / 100.0).as("sales_total"),
      (col("mr").cast("double") / 100.0).as("returns_total"),
      ((col("ms") - col("mr")).cast("double") / 100.0).as("net"))
    val total = pl.agg(sum("ms").as("tms"), sum("mr").as("tmr"),
        sum(col("ms") - col("mr")).as("tnet"))
      .select(lit(-1).cast("int").as("nk"),
        (col("tms").cast("double") / 100.0).as("sales_total"),
        (col("tmr").cast("double") / 100.0).as("returns_total"),
        (col("tnet").cast("double") / 100.0).as("net"))
    detail.unionByName(total).orderBy("nk")
  }

  // ---- DS Q61: promotional-revenue ratio ---------------------------------
  q("q_ds61_promo_ratio",
    s"""WITH promo AS (
       |  SELECT c_nationkey AS nk,
       |    sum(${fxSql("l_extendedprice * (1 - l_discount)", 4)}) AS mp
       |  FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  WHERE p_type = 'PROMO' GROUP BY 1),
       |allrev AS (
       |  SELECT c_nationkey AS nk,
       |    sum(${fxSql("l_extendedprice * (1 - l_discount)", 4)}) AS ma
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1)
       |SELECT allrev.nk AS nk,
       |  CAST(coalesce(mp, 0) AS DOUBLE) / 10000.0 AS promo_rev,
       |  CAST(ma AS DOUBLE) / 10000.0 AS total_rev,
       |  CAST(coalesce(mp, 0) AS DOUBLE) * 100 / ma AS promo_pct
       |FROM allrev LEFT JOIN promo ON allrev.nk = promo.nk
       |ORDER BY nk""") { (s, dir) =>
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val m = fx(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
    val base = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
    val promoParts = Tables.part(s, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val promo = base.join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("c_nationkey").as("pnk")).agg(sum(m).as("mp"))
    val allrev = base.groupBy(col("c_nationkey").as("nk")).agg(sum(m).as("ma"))
    allrev.join(promo, col("nk") === col("pnk"), "left")
      .select(col("nk"),
        (coalesce(col("mp"), lit(0L)).cast("double") / 10000.0).as("promo_rev"),
        (col("ma").cast("double") / 10000.0).as("total_rev"),
        (coalesce(col("mp"), lit(0L)).cast("double") * 100 / col("ma")).as("promo_pct"))
      .orderBy("nk")
  }

  // ---- DS Q83: keys returned in every period, joined back ----------------
  q("q_ds83_returns_intersect",
    """WITH r95 AS (SELECT DISTINCT l_partkey AS pk FROM lineitem
      |             WHERE l_returnflag = 'R' AND year(l_shipdate) = 1995),
      |r96 AS (SELECT DISTINCT l_partkey AS pk FROM lineitem
      |        WHERE l_returnflag = 'R' AND year(l_shipdate) = 1996),
      |r97 AS (SELECT DISTINCT l_partkey AS pk FROM lineitem
      |        WHERE l_returnflag = 'R' AND year(l_shipdate) = 1997),
      |allyrs AS (SELECT pk FROM r95 INTERSECT SELECT pk FROM r96
      |           INTERSECT SELECT pk FROM r97)
      |SELECT year(l_shipdate) AS yr, count(*) AS n_returns,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ret_qty
      |FROM lineitem JOIN allyrs ON l_partkey = pk
      |WHERE l_returnflag = 'R' AND year(l_shipdate) IN (1995, 1996, 1997)
      |GROUP BY 1 ORDER BY 1""") { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    def rset(y: Int) = li
      .filter(col("l_returnflag") === "R" && year(col("l_shipdate")) === y)
      .select(col("l_partkey").as("pk")).distinct()
    val allyrs = rset(1995).intersect(rset(1996)).intersect(rset(1997))
    li.filter(col("l_returnflag") === "R" &&
        year(col("l_shipdate")).isin(1995, 1996, 1997))
      .join(allyrs, col("l_partkey") === col("pk"))
      .groupBy(year(col("l_shipdate")).as("yr"))
      .agg(count(lit(1)).as("n_returns"),
        sum(col("l_quantity").cast("bigint")).cast("bigint").as("ret_qty"))
      .orderBy("yr")
  }
}
