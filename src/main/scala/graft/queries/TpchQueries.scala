package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, QueryModule, Tables}

/** Headline relational pipelines in classic TPC-H shapes (beyond-survey
  * extensions, adapted to the testdata's column subset). Each exists to
  * pin one optimizer behavior the engine relies on at 100 TB:
  *
  *  - Q4: EXISTS rewritten to a left-semi join (never a count-distinct
  *    or a fact-side dedup)
  *  - Q5: a 6-table join spine where every dimension broadcasts and the
  *    only shuffle is the fact-side aggregation
  *  - Q10: fact-filter-first join order + top-k via TakeOrderedAndProject
  *  - Q12: join + conditional aggregation in one pass
  *  - Q14: conditional/total ratio in exact decimal, one scan
  *  - Q16: anti-join exclusion + distinct aggregation
  *  - Q19: disjunction of conjunctions evaluated on a single broadcast
  *    join (no union-of-three-joins blowup)
  *
  * All follow the QueryDef determinism contract: exact decimal
  * intermediates (matching expression shapes on the DuckDB side), total
  * ordering on a unique key set.
  */
object TpchQueries extends QueryModule {

  private val D2 = DecimalType(18, 2)

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def ts(lit0: String): Column =
    lit(lit0).cast(TimestampNTZType)

  /** revenue term: extendedprice * (1 - discount) in exact decimal —
    * the same shape q_q3 proved bit-stable against DuckDB.
    */
  private val revTerm: Column =
    col("l_extendedprice").cast(D2) *
      (lit(1).cast(D2) - col("l_discount").cast(D2))

  private val revTermSql: String =
    "CAST(l_extendedprice AS DECIMAL(18,2)) " +
      "* (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  def defs: Map[String, QueryDef] = Map(

    "q_q4_order_priority" -> QueryDef(
      (s, dir) => {
        // EXISTS(lineitem with a returned line) as a left-semi join: the
        // probe side stays the filtered fact scan, no dedup materialized
        val o = T(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
            col("o_orderdate") < ts("1997-01-01 00:00:00"))
          .select(col("o_orderkey"), col("o_orderpriority"))
        val returned = T(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"))
        o.join(returned, o("o_orderkey") === returned("l_orderkey"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
             | FROM orders
             | WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |   AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |   AND EXISTS (SELECT 1 FROM lineitem
             |     WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
             | GROUP BY o_orderpriority
             | ORDER BY o_orderpriority""".stripMargin),
      "headline: EXISTS → left-semi join + priority counts (TPC-H Q4 shape)"),

    "q_q5_local_supplier" -> QueryDef(
      (s, dir) => {
        // 6-table spine: region→nation (tiny, broadcast) gate supplier
        // and customer; the customer-nation == supplier-nation condition
        // rides the join; only the fact aggregation shuffles
        val r = T(s, dir, "region").filter(col("r_name") === "ASIA")
          .select(col("r_regionkey"))
        val n = T(s, dir, "nation")
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val sup = T(s, dir, "supplier")
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
        val c = T(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val o = T(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
            col("o_orderdate") < ts("1997-01-01 00:00:00"))
          .select(col("o_orderkey"), col("o_custkey"))
        val l = T(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
        l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .filter(col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(revTerm).cast(DoubleType).as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some(s"""SELECT n_name,
             | CAST(SUM($revTermSql) AS DOUBLE) AS revenue
             | FROM lineitem
             | JOIN supplier ON s_suppkey = l_suppkey
             | JOIN orders ON o_orderkey = l_orderkey
             | JOIN customer ON c_custkey = o_custkey
             | JOIN nation ON n_nationkey = s_nationkey
             | JOIN region ON r_regionkey = n_regionkey
             | WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
             |   AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |   AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             | GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      "headline: 6-table join spine, broadcast dims (TPC-H Q5 shape)"),

    "q_q10_returned_items" -> QueryDef(
      (s, dir) => {
        // returned-revenue per customer: lineitem filtered FIRST, then
        // joined up the key chain; nation broadcast; top-20 via
        // TakeOrderedAndProject with the unique custkey tiebreak
        val l = T(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount"))
        val o = T(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-07-01 00:00:00") &&
            col("o_orderdate") < ts("1996-10-01 00:00:00"))
          .select(col("o_orderkey"), col("o_custkey"))
        val c = T(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("c_nationkey"))
        val n = T(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("n_name"))
          .agg(sum(revTerm).cast(DoubleType).as("revenue"))
          .orderBy(desc("revenue"), col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
             | CAST(SUM($revTermSql) AS DOUBLE) AS revenue
             | FROM lineitem
             | JOIN orders ON o_orderkey = l_orderkey
             | JOIN customer ON c_custkey = o_custkey
             | JOIN nation ON n_nationkey = c_nationkey
             | WHERE l_returnflag = 'R'
             |   AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
             |   AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
             | GROUP BY c_custkey, c_name, c_acctbal, n_name
             | ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      "headline: returned-item revenue per customer, top-k (TPC-H Q10 shape)"),

    "q_q12_priority_by_status" -> QueryDef(
      (s, dir) => {
        // join + conditional aggregation in one pass (l_linestatus stands
        // in for l_shipmode, which the testdata lacks)
        val l = T(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
            col("l_shipdate") < ts("1997-01-01 00:00:00"))
          .select(col("l_orderkey"), col("l_linestatus"))
        val o = T(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
             | SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |   THEN 1 ELSE 0 END) AS high_line_count,
             | SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |   THEN 0 ELSE 1 END) AS low_line_count
             | FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             | WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |   AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             | GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),
      "headline: join + conditional aggregation (TPC-H Q12 shape)"),

    "q_q14_promo_effect" -> QueryDef(
      (s, dir) => {
        // promo revenue share: single broadcast join, numerator via a
        // null-skipping conditional sum over the SAME decimal term as the
        // denominator, division done once in double on both sides
        val l = T(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-09-01 00:00:00") &&
            col("l_shipdate") < ts("1996-10-01 00:00:00"))
          .select(col("l_partkey"), col("l_extendedprice"),
            col("l_discount"))
        val p = T(s, dir, "part").select(col("p_partkey"), col("p_type"))
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .agg(
            (lit(100.0) *
              sum(when(col("p_type") === "PROMO", revTerm))
                .cast(DoubleType) /
              sum(revTerm).cast(DoubleType)).as("promo_revenue_pct"))
      },
      Some(s"""SELECT 100.0
             |   * CAST(SUM(CASE WHEN p_type = 'PROMO'
             |       THEN $revTermSql END) AS DOUBLE)
             |   / CAST(SUM($revTermSql) AS DOUBLE) AS promo_revenue_pct
             | FROM lineitem JOIN part ON p_partkey = l_partkey
             | WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
             |   AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin),
      "headline: conditional/total revenue ratio (TPC-H Q14 shape)"),

    "q_q16_supplier_count" -> QueryDef(
      (s, dir) => {
        // distinct suppliers per part group, minus an excluded supplier
        // set (negative balance stands in for the complaints filter):
        // the part-supplier relation is derived from lineitem (the
        // testdata has no partsupp), exclusion is a broadcast anti join
        val ps = T(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val excluded = T(s, dir, "supplier")
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        val p = T(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#4" && col("p_size") <= 20)
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size"))
        ps.join(broadcast(excluded),
            ps("l_suppkey") === excluded("s_suppkey"), "left_anti")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
             | SELECT p_brand, p_type, p_size,
             |   COUNT(DISTINCT l_suppkey) AS supplier_cnt
             | FROM ps
             | JOIN part ON p_partkey = l_partkey
             | WHERE p_brand <> 'Brand#4' AND p_size <= 20
             |   AND NOT EXISTS (SELECT 1 FROM supplier
             |     WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
             | GROUP BY p_brand, p_type, p_size
             | ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
      "headline: anti-join exclusion + distinct agg (TPC-H Q16 shape)"),

    "q_q19_disjunctive_join" -> QueryDef(
      (s, dir) => {
        // OR-of-ANDs across the join: stays ONE broadcast hash join with
        // the disjunction as a post-join filter (never a union of three
        // scans); the shared l_quantity <= 30 envelope is pushed to the
        // lineitem scan
        val l = T(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"))
        val p = T(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        val disj =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#7" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))
        l.filter(col("l_quantity") <= 30)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(disj)
          .agg(sum(revTerm).cast(DoubleType).as("revenue"))
      },
      Some(s"""SELECT CAST(SUM($revTermSql) AS DOUBLE) AS revenue
             | FROM lineitem JOIN part ON p_partkey = l_partkey
             | WHERE l_quantity <= 30 AND (
             |   (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             |     AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             |     AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 15
             |     AND l_quantity BETWEEN 20 AND 30))""".stripMargin),
      "headline: disjunctive multi-predicate join (TPC-H Q19 shape)")
  )
}
