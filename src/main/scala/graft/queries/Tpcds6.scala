package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables
import Q._

/** TPC-DS sample pack, batch 6
  * (`/root/reference/extension/tpcds/dsdgen/queries/{01,35,41,44}.sql`),
  * fixture-adapted like the earlier batches:
  *
  *  - q1:  entities whose measure exceeds 1.2× their group's average —
  *         the correlated-aggregate-ratio gate (decorrelates to an
  *         aggregate self-join; the gate cross-multiplies, no division).
  *  - q44: best-k and worst-k ranked lists of the same aggregate, paired
  *         by rank — two windows over one aggregate, rank-equality
  *         self-join.
  *  - q41: deep DNF over dimension attributes feeding COUNT(DISTINCT) —
  *         predicate-simplification stress, single dim scan.
  *  - q35: EXISTS-gated customer set with per-group order statistics —
  *         semi join before aggregation, never materializing the
  *         subquery side.
  *
  * Scale shapes: every window/self-join runs over a per-part or per-
  * customer AGGREGATE (bounded by dimension cardinality, not fact rows);
  * the semi join keeps the orders side un-materialized; all money math
  * is exact BIGINT mantissas (fx) with DECIMAL(38,0) cross-multiplied
  * gates.
  */
object Tpcds6 extends Pack {

  // ---- DS Q1: returns above 1.2× the nation average ----------------------
  q("q_ds1_return_ratio",
    s"""WITH ctr AS (
       |  SELECT c_custkey AS ck, c_nationkey AS nk,
       |    sum(${fxSql("l_extendedprice * (1 - l_discount)", 4)}) AS ret
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  WHERE l_returnflag = 'R'
       |  GROUP BY 1, 2),
       |st AS (SELECT nk, sum(ret) AS tot, count(*) AS cnt FROM ctr GROUP BY nk)
       |SELECT ck, CAST(ret AS DOUBLE) / 10000.0 AS returned
       |FROM ctr JOIN st USING (nk)
       |WHERE CAST(10 AS DECIMAL(38,0)) * ret * cnt > CAST(12 AS DECIMAL(38,0)) * tot
       |ORDER BY ck""") { (s, dir) =>
    val li = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val ctr = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey").as("ck"), col("c_nationkey").as("nk"))
      .agg(sum(fx(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)).as("ret"))
    val st = ctr.groupBy(col("nk").as("nk2"))
      .agg(sum("ret").as("tot"), count(lit(1)).as("cnt"))
    val d38 = "decimal(38,0)"
    ctr.join(st, col("nk") === col("nk2"))
      .filter(lit(10).cast(d38) * col("ret") * col("cnt") >
        lit(12).cast(d38) * col("tot"))
      .select(col("ck"), (col("ret").cast("double") / 10000.0).as("returned"))
      .orderBy("ck")
  }

  // ---- DS Q44: best-k / worst-k paired by rank ---------------------------
  // The global windows run over the per-part aggregate (bounded by part
  // cardinality at any SF, not fact rows); pk tiebreaks make both ranks
  // total orders.
  q("q_ds44_best_worst",
    s"""WITH pp AS (
       |  SELECT l_partkey AS pk,
       |    sum(${fxSql("l_extendedprice * (1 - l_discount)", 4)}) AS msum,
       |    count(*) AS cnt
       |  FROM lineitem GROUP BY 1),
       |rk AS (
       |  SELECT pk, CAST(msum AS DOUBLE) / cnt AS avg_rev,
       |    rank() OVER (ORDER BY CAST(msum AS DOUBLE) / cnt DESC, pk) AS rb,
       |    rank() OVER (ORDER BY CAST(msum AS DOUBLE) / cnt ASC, pk) AS rw
       |  FROM pp)
       |SELECT b.rb AS rnk, b.pk AS best_pk, w.pk AS worst_pk,
       |  b.avg_rev AS best_avg, w.avg_rev AS worst_avg
       |FROM rk b JOIN rk w ON b.rb = w.rw
       |WHERE b.rb <= 10 ORDER BY rnk""") { (s, dir) =>
    val pp = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(fx(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)).as("msum"),
        count(lit(1)).as("cnt"))
    val avgRev = col("msum").cast("double") / col("cnt")
    val rk = pp.select(col("pk"), avgRev.as("avg_rev"),
      rank().over(Window.orderBy(avgRev.desc, col("pk"))).as("rb"),
      rank().over(Window.orderBy(avgRev.asc, col("pk"))).as("rw"))
    val b = rk.filter(col("rb") <= 10)
      .select(col("rb").as("rnk"), col("pk").as("best_pk"), col("avg_rev").as("best_avg"))
    val w = rk.select(col("rw"), col("pk").as("worst_pk"), col("avg_rev").as("worst_avg"))
    b.join(w, col("rnk") === col("rw"))
      .select(col("rnk"), col("best_pk"), col("worst_pk"), col("best_avg"), col("worst_avg"))
      .orderBy("rnk")
  }

  // ---- DS Q41: deep DNF over dimension attributes ------------------------
  q("q_ds41_dnf_dims",
    """SELECT p_brand,
      |  CAST(count(DISTINCT p_name) AS BIGINT) AS n_names,
      |  count(*) AS n_parts
      |FROM part
      |WHERE (p_size BETWEEN 1 AND 15 AND p_type IN ('ECONOMY', 'SMALL'))
      |   OR (p_size BETWEEN 20 AND 30 AND p_type LIKE '%TANDAR%')
      |   OR (p_retailprice > 980 AND p_type = 'PROMO')
      |GROUP BY p_brand ORDER BY p_brand""") { (s, dir) =>
    Tables.part(s, dir)
      .filter(
        (col("p_size").between(1, 15) && col("p_type").isin("ECONOMY", "SMALL")) ||
        (col("p_size").between(20, 30) && col("p_type").like("%TANDAR%")) ||
        (col("p_retailprice") > 980 && col("p_type") === "PROMO"))
      .groupBy("p_brand")
      .agg(countDistinct(col("p_name")).as("n_names"), count(lit(1)).as("n_parts"))
      .orderBy("p_brand")
  }

  // ---- DS Q35: EXISTS-gated per-group statistics -------------------------
  q("q_ds35_exists_stats",
    s"""SELECT c_nationkey, c_mktsegment,
       |  count(*) AS n_cust,
       |  min(c_acctbal) AS bal_min,
       |  max(c_acctbal) AS bal_max,
       |  ${fsumSql("c_acctbal", 2)} AS bal_sum
       |FROM customer
       |WHERE EXISTS (SELECT 1 FROM orders
       |              WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
       |GROUP BY 1, 2 ORDER BY 1, 2""") { (s, dir) =>
    val o = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")) === 1995)
      .select("o_custkey")
    Tables.customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n_cust"),
        min("c_acctbal").as("bal_min"),
        max("c_acctbal").as("bal_max"),
        fsum(col("c_acctbal"), 2).as("bal_sum"))
      .orderBy("c_nationkey", "c_mktsegment")
  }
}
