package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import Parity._

/** The delegated relational surface from SURVEY.md §2B — projections,
  * filters, joins (all flavors), aggregates, windows, grouping sets,
  * sorts/top-k, set ops, subqueries/CTEs, and the scalar function
  * families — each expressed Spark-first (DataFrame API; spark.sql only
  * for SQL-only syntax) with a DuckDB oracle.
  *
  * Reference behavior: lynx delegates all of this to DataFusion with a
  * single call (reference lynx.rs:141); Catalyst plays that role here.
  */
object Relational {

  private def T(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  // ---------------------------------------------------------------- scans

  /** Aggregate with map-side partial aggregation (TPC-H Q1 shape). */
  val q1Agg = QueryDef(
    "q1_agg",
    (s, dir) => {
      // spread: the single-row-group fixture scan is ONE task, so the
      // seven DECIMAL(28,10) partial sums — the expensive part of the
      // exact-parity discipline — would otherwise run serially in the
      // scan stage (guide §2.5 input skew). Decimal sums are exact and
      // order-independent, so repartitioning cannot change results.
      // Gated on footer-measured scan parallelism (r15): a
      // multi-row-group production table skips the exchange entirely.
      val li = Tables.spreadIfNarrow(s, dir, "lineitem")(
        T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .select("l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${dsumSql("l_quantity")} AS sum_qty,
        ${dsumSql("l_extendedprice")} AS sum_base_price,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
        ${davgSql("l_quantity")} AS avg_qty,
        ${davgSql("l_extendedprice")} AS avg_price,
        ${davgSql("l_discount")} AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Projection + filter; predicate and column pruning reach the scan. */
  val qFilter = QueryDef(
    "q_filter_project",
    (s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-03-01").cast("timestamp") &&
          col("l_quantity") < 5)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-03-01' AND l_quantity < 5
      ORDER BY l_orderkey, l_linenumber"""))

  /** IN / BETWEEN / LIKE predicate grammar. */
  val qPredicates = QueryDef(
    "q_predicates",
    (s, dir) =>
      T(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(100000, 200000) &&
          col("o_orderstatus").like("F%"))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey, o_orderpriority, o_totalprice
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        AND o_totalprice BETWEEN 100000 AND 200000
        AND o_orderstatus LIKE 'F%'
      ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- joins

  /** 3-way join + agg + top-k (TPC-H Q3 shape). No explicit broadcast
    * hints: customer/orders are fact-scale at 100 TB, so the join
    * strategy is left to AQE — runtime stats pick broadcast at small
    * SF and shuffle joins at scale, both correct.
    */
  val qJoin3 = QueryDef(
    "q_join3_topk",
    (s, dir) => {
      val c = T(s, dir, "customer").filter(col("c_mktsegment") === "MACHINERY")
      val o = T(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val l = T(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    },
    Some(s"""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'MACHINERY'
        AND o_orderdate < TIMESTAMP '1999-01-01'
        AND l_shipdate > TIMESTAMP '1999-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 20"""))

  /** 6-way star join (TPC-H Q5 shape). Only the bounded-cardinality
    * dimensions carry broadcast hints (region=5, nation=25 rows at
    * every SF); supplier/customer/orders grow with the data, so their
    * join strategy is AQE's call — broadcast at small SF, shuffle at
    * 100 TB.
    */
  val qJoin6 = QueryDef(
    "q_join6_star",
    (s, dir) => {
      val r = T(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = T(s, dir, "nation")
      val sup = T(s, dir, "supplier")
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      val l = T(s, dir, "lineitem")
      l.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(s"""
      SELECT n_name,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""))

  /** Left-semi join (EXISTS). */
  val qSemi = QueryDef(
    "q_join_semi",
    (s, dir) => {
      val o = T(s, dir, "orders")
      val l = T(s, dir, "lineitem").filter(col("l_discount") > 0.09)
        .select(col("l_orderkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_discount > 0.09)
      ORDER BY o_orderkey"""))

  /** Left-anti join (NOT EXISTS). */
  val qAnti = QueryDef(
    "q_join_anti",
    (s, dir) => {
      val o = T(s, dir, "orders")
      val l = T(s, dir, "lineitem").filter(col("l_quantity") >= 30)
        .select(col("l_orderkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_orderstatus FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM lineitem
                        WHERE l_orderkey = o_orderkey AND l_quantity >= 30)
      ORDER BY o_orderkey"""))

  /** Left-outer join + two-level aggregation (TPC-H Q13 shape). */
  val qOuter = QueryDef(
    "q_join_outer",
    (s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""))

  /** Full-outer join over two aggregated sides. */
  val qFullOuter = QueryDef(
    "q_join_full_outer",
    (s, dir) => {
      val hi = T(s, dir, "orders").filter(col("o_totalprice") > 400000)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_big"))
      val lo = T(s, dir, "orders").filter(col("o_totalprice") < 5000)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_small"))
      hi.join(lo, Seq("custkey"), "full_outer")
        .orderBy(col("custkey"))
    },
    Some("""
      SELECT coalesce(a.custkey, b.custkey) AS custkey, n_big, n_small FROM
        (SELECT o_custkey AS custkey, count(*) AS n_big FROM orders
         WHERE o_totalprice > 400000 GROUP BY 1) a
      FULL OUTER JOIN
        (SELECT o_custkey AS custkey, count(*) AS n_small FROM orders
         WHERE o_totalprice < 5000 GROUP BY 1) b
      USING (custkey)
      ORDER BY custkey"""))

  /** Self-join: pairs of lineitems of the same order shipped same day. */
  val qSelfJoin = QueryDef(
    "q_self_join",
    (s, dir) => {
      val l = T(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
      val a = l.toDF("okey", "ln_a", "ship")
      val b = l.toDF("okey", "ln_b", "ship_b")
      a.join(b, a("okey") === b("okey") && a("ship") === b("ship_b") &&
          a("ln_a") < b("ln_b"))
        .select(a("okey").as("l_orderkey"), col("ln_a"), col("ln_b"))
        .orderBy("l_orderkey", "ln_a", "ln_b")
    },
    Some("""
      SELECT a.l_orderkey, a.l_linenumber AS ln_a, b.l_linenumber AS ln_b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_shipdate = b.l_shipdate
        AND a.l_linenumber < b.l_linenumber
      ORDER BY a.l_orderkey, ln_a, ln_b"""))

  /** Bloom pre-filtered semi-join — the runtime-filter pattern for
    * the 100 TB case where the dim side is too large to
    * broadcast-hash-join (8+ bytes/key in a hash map) but a
    * ~1.2-byte/key bloom still ships: build the filter from the dim
    * keys with the public `stat.bloomFilter` tree-aggregate (one
    * distributed job), plant it on the fact scan via the same
    * `BloomFilterMightContain` expression Spark's InjectRuntimeFilter
    * uses, and drop non-members BEFORE the fact shuffle; the exact
    * semi-join then runs on the survivors. False positives are
    * removed by that join; false negatives are impossible, so the
    * result — and the oracle — is exactly the plain semi-join
    * regardless of fpp. Sized from the orders footer row count (no
    * selectivity guess). Past the point where even the bloom literal
    * is too fat to ship (~10^9 dim keys), flip to Spark's automatic
    * injection (spark.sql.optimizer.runtime.bloomFilter) whose
    * filter stays distributed as a scalar subquery.
    */
  val qBloomJoin = QueryDef(
    "q_bloom_join",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val dim = T(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("key"))
      val nKeys = math.max(64L, Tables.rowCount(s, dir, "orders"))
      val bloom = dim.stat.bloomFilter("key", nKeys, 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      val pre = T(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity")
        .filter(graft.functions.GraftFunctions.mightContain(
          lit(bos.toByteArray), col("l_orderkey")))
      pre.join(dim, pre("l_orderkey") === dim("key"), "left_semi")
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag,
        ${Parity.dsumSql("l_quantity")} AS sum_qty,
        count(*) AS n
      FROM lineitem
      WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT')
      GROUP BY 1 ORDER BY 1"""))

  /** Cross join (small × small) with a theta filter. */
  val qCross = QueryDef(
    "q_cross_theta",
    (s, dir) => {
      val n = T(s, dir, "nation").select("n_nationkey", "n_regionkey")
      val r = T(s, dir, "region").select("r_regionkey", "r_name")
      n.crossJoin(r)
        .filter(col("n_regionkey") =!= col("r_regionkey"))
        .select("n_nationkey", "r_name")
        .orderBy("n_nationkey", "r_name")
    },
    Some("""
      SELECT n_nationkey, r_name FROM nation CROSS JOIN region
      WHERE n_regionkey <> r_regionkey
      ORDER BY n_nationkey, r_name"""))

  /** Disjunction-of-conjunctions join predicate (TPC-H Q19 shape):
    * the OR branches each carry their own equi-part, so Catalyst can
    * still extract the common l_partkey = p_partkey equi-join and
    * push the residual disjunction as a post-join filter.
    */
  val qDisjunctJoin = QueryDef(
    "q_join_disjunct",
    (s, dir) => {
      val l = T(s, dir, "lineitem")
      val p = T(s, dir, "part")
      val joined = l.join(p, col("l_partkey") === col("p_partkey"))
      val b1 = col("p_brand") === "Brand#11" &&
        col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 15)
      val b2 = col("p_brand") === "Brand#22" &&
        col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 25)
      val b3 = col("p_brand") === "Brand#33" &&
        col("l_quantity") >= 20
      joined.filter(b1 || b2 || b3)
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n"))
    },
    Some(s"""
      SELECT ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             count(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#11'
             AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 15)
         OR (p_brand = 'Brand#22'
             AND p_size BETWEEN 10 AND 30
             AND l_quantity BETWEEN 10 AND 25)
         OR (p_brand = 'Brand#33' AND l_quantity >= 20)"""))

  /** Substring bucketing + anti-join + scalar subquery (TPC-H Q22
    * shape): customers with above-average balance and no orders,
    * grouped by a derived phone prefix.
    */
  val qQ22Shape = QueryDef(
    "q_subquery_q22",
    (s, dir) => {
      Tables.views(s, dir)
      s.sql(s"""
        SELECT cntrycode, count(*) AS numcust,
               ${dsumSparkSql("c_acctbal")} AS totacctbal
        FROM (
          SELECT substring(c_name, -1, 1) AS cntrycode, c_acctbal
          FROM customer
          WHERE substring(c_name, -1, 1) IN ('1','3','5','7','9')
            AND c_acctbal > (SELECT ${davgSparkSql("c_acctbal")}
                             FROM customer
                             WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_totalprice > 300000))
        GROUP BY cntrycode ORDER BY cntrycode""")
    },
    Some(s"""
      SELECT cntrycode, count(*) AS numcust,
             ${dsumSql("c_acctbal")} AS totacctbal
      FROM (
        SELECT substring(c_name, -1, 1) AS cntrycode, c_acctbal
        FROM customer
        WHERE substring(c_name, -1, 1) IN ('1','3','5','7','9')
          AND c_acctbal > (SELECT ${davgSql("c_acctbal")}
                           FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_totalprice > 300000))
      GROUP BY cntrycode ORDER BY cntrycode"""))

  // ------------------------------------------------ TPC-H headline shapes

  /** TPC-H Q3 (shipping priority): segment-filtered customer dim
    * broadcast into the orders⋈lineitem join, grouped revenue, top-10.
    * Date windows shifted into the fixture's 1995–2001 range.
    */
  val qTpchQ3 = QueryDef(
    "q_tpch_q3",
    (s, dir) => {
      val cust = T(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = T(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1997-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = T(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },
    Some(s"""
      SELECT l_orderkey, o_orderdate,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-03-15'
        AND l_shipdate > TIMESTAMP '1997-03-15'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"""))

  /** TPC-H Q5 (local supplier volume): the 6-way join with the
    * customer-and-supplier-same-nation constraint, region/nation dims
    * broadcast, grouped by nation. Date window fixture-shifted.
    */
  val qTpchQ5 = QueryDef(
    "q_tpch_q5",
    (s, dir) => {
      val asia = T(s, dir, "region").filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      val nat = T(s, dir, "nation")
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val ord = T(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      T(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(T(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(s"""
      SELECT n_name,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
        AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** TPC-H Q10 (returned-item reporting): quarter of returned
    * lineitems joined back to customers, top-20 by lost revenue.
    */
  val qTpchQ10 = QueryDef(
    "q_tpch_q10",
    (s, dir) => {
      val ord = T(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      T(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""
      SELECT c_custkey, c_name, c_acctbal, n_name,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  // ------------------------------------------------------------ aggregates

  /** count(DISTINCT …) — Catalyst expand + two-phase aggregate. */
  val qCountDistinct = QueryDef(
    "q_count_distinct",
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("dist_parts"),
          countDistinct(col("l_suppkey")).as("dist_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS dist_parts,
             count(DISTINCT l_suppkey) AS dist_supps, count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** HAVING over grouped aggregate. */
  val qHaving = QueryDef(
    "q_having",
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("total_qty"))
        .filter(col("n") > 40)
        .orderBy("l_partkey"),
    Some(s"""
      SELECT l_partkey, count(*) AS n, ${dsumSql("l_quantity")} AS total_qty
      FROM lineitem GROUP BY l_partkey HAVING count(*) > 40
      ORDER BY l_partkey"""))

  /** DISTINCT. */
  val qDistinct = QueryDef(
    "q_distinct",
    (s, dir) =>
      T(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""))

  /** ROLLUP with pinned NULL ordering. */
  val qRollup = QueryDef(
    "q_rollup",
    (s, dir) =>
      T(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
    Some(s"""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             ${dsumSql("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** CUBE. */
  val qCube = QueryDef(
    "q_cube",
    (s, dir) =>
      T(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
    Some(s"""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             ${dsumSql("o_totalprice")} AS sum_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST,
               o_orderpriority ASC NULLS FIRST"""))

  /** GROUPING SETS (SQL-only syntax → spark.sql over temp views). */
  val qGroupingSets = QueryDef(
    "q_grouping_sets",
    (s, dir) => {
      Tables.views(s, dir)
      s.sql(s"""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    },
    Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                              (l_returnflag), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** min/max/first-sorted aggregate over strings and timestamps. */
  val qMinMax = QueryDef(
    "q_minmax",
    (s, dir) =>
      T(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          min(col("o_orderdate")).as("first_date"),
          max(col("o_orderdate")).as("last_date"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("o_orderstatus"),
    Some("""
      SELECT o_orderstatus, min(o_orderdate) AS first_date,
             max(o_orderdate) AS last_date, min(o_totalprice) AS min_price,
             max(o_totalprice) AS max_price
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** string_agg / array_agg with deterministic element order. */
  val qStringAgg = QueryDef(
    "q_string_agg",
    (s, dir) =>
      T(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(concat_ws(",", array_sort(collect_list(col("n_name"))))
          .as("names"))
        .orderBy("n_regionkey"),
    Some("""
      SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""))

  /** bool_and/bool_or and bitwise aggregates. */
  val qBoolBit = QueryDef(
    "q_bool_bit_agg",
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_deep_disc"),
          bit_and(col("l_orderkey")).as("band"),
          bit_or(col("l_orderkey")).as("bor"),
          bit_xor(col("l_orderkey")).as("bxor"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag, bool_and(l_quantity > 0) AS all_pos,
             bool_or(l_discount > 0.09) AS any_deep_disc,
             CAST(bit_and(l_orderkey) AS BIGINT) AS band,
             CAST(bit_or(l_orderkey) AS BIGINT) AS bor,
             CAST(bit_xor(l_orderkey) AS BIGINT) AS bxor
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** max_by / min_by (arg_max/arg_min) + deterministic mode. The
    * value columns have unique extrema per group in the fixtures
    * (verified at all SFs), and mode uses the lowest-on-ties variant
    * on both sides.
    */
  val qArgExtremes = QueryDef(
    "q_argmax_mode",
    (s, dir) =>
      T(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"), col("o_totalprice")).as("best_order"),
          min_by(col("o_orderkey"), col("o_totalprice")).as("worst_order"),
          expr("mode(o_orderstatus, true)").as("common_status"))
        .orderBy("o_orderpriority"),
    Some("""
      WITH m AS (
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders GROUP BY 1, 2),
      md AS (
        SELECT o_orderpriority, o_orderstatus AS common_status
        FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                ORDER BY n DESC, o_orderstatus) AS rnk FROM m)
        WHERE rnk = 1)
      SELECT o.o_orderpriority,
        arg_max(o.o_orderkey, o.o_totalprice) AS best_order,
        arg_min(o.o_orderkey, o.o_totalprice) AS worst_order,
        any_value(md.common_status) AS common_status
      FROM orders o JOIN md ON md.o_orderpriority = o.o_orderpriority
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority"""))

  /** Exact median / interpolated percentiles (whole-valued doubles, so
    * the interpolation arithmetic is engine-independent).
    */
  val qPercentile = QueryDef(
    "q_percentile",
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("median(l_quantity)").as("med_qty"),
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.9)").as("p90"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag, median(l_quantity) AS med_qty,
             quantile_cont(l_quantity, 0.25) AS p25,
             quantile_cont(l_quantity, 0.9) AS p90
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Moment statistics via exact decimal power sums (order-independent
    * on both engines; see Parity). Built-in stddev/corr kernels are
    * exercised rows-only in q_stats_builtin.
    */
  val qStatsExact = QueryDef(
    "q_stats_exact",
    (s, dir) => {
      // spread: parallelize the five DECIMAL(28,10) partial sums out
      // of the one-task fixture scan (see q1_agg; exact sums are
      // order-independent, results unchanged; gated on footer-measured
      // scan parallelism — see q1_agg)
      val li = Tables.spreadIfNarrow(s, dir, "lineitem")(
        T(s, dir, "lineitem")
          .select("l_returnflag", "l_quantity", "l_extendedprice"))
      val n = count(lit(1)).cast("double")
      val sx = dsum(col("l_quantity"))
      val sxx = dsum(col("l_quantity") * col("l_quantity"))
      val sy = dsum(col("l_extendedprice"))
      val syy = dsum(col("l_extendedprice") * col("l_extendedprice"))
      val sxy = dsum(col("l_quantity") * col("l_extendedprice"))
      li.groupBy(col("l_returnflag"))
        .agg(n.as("n"), sx.as("sx"), sxx.as("sxx"), sy.as("sy"),
          syy.as("syy"), sxy.as("sxy"))
        .select(
          col("l_returnflag"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
            (col("n") - 1)).as("sd_qty"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"))
            .as("covp_qty_price"))
        .orderBy("l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag,
        sqrt((sxx - sx*sx/n) / (n - 1)) AS sd_qty,
        (sxy - sx*sy/n) / n AS covp_qty_price
      FROM (
        SELECT l_returnflag,
          CAST(count(*) AS DOUBLE) AS n,
          ${dsumSql("l_quantity")} AS sx,
          ${dsumSql("l_quantity * l_quantity")} AS sxx,
          ${dsumSql("l_extendedprice")} AS sy,
          ${dsumSql("l_extendedprice * l_extendedprice")} AS syy,
          ${dsumSql("l_quantity * l_extendedprice")} AS sxy
        FROM lineitem GROUP BY l_returnflag)
      ORDER BY l_returnflag"""))

  /** Built-in statistical aggregate kernels, oracle-checked. The two
    * engines' streaming-moment accumulations agree to ~1e-12 relative,
    * so rounding each statistic well above that noise floor (digits
    * chosen per magnitude: sd~14, vr~208, cvp up to ~1e4, ratios <2)
    * makes the results hash-identical. Spark's skewness/kurtosis are
    * the population formulas (m3/m2^1.5, m4/m2^2-3) while DuckDB
    * returns the sample-adjusted g1/G2; the oracle applies the exact
    * closed-form un-adjustment before rounding.
    */
  val qStatsBuiltin = QueryDef(
    "q_stats_builtin",
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 8).as("sd"),
          round(var_samp(col("l_quantity")), 7).as("vr"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 8)
            .as("cr"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4)
            .as("cvp"),
          round(skewness(col("l_quantity")), 7).as("skw"),
          round(kurtosis(col("l_quantity")), 7).as("krt"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag,
        round(stddev_samp(l_quantity), 8) AS sd,
        round(var_samp(l_quantity), 7) AS vr,
        round(corr(l_quantity, l_extendedprice), 8) AS cr,
        round(covar_pop(l_quantity, l_extendedprice), 4) AS cvp,
        round(skewness(l_quantity) * (count(*) - 2)
              / sqrt(CAST(count(*) AS DOUBLE) * (count(*) - 1)), 7)
          AS skw,
        round((kurtosis(l_quantity)
                 * (count(*) - 2) * (count(*) - 3)
                 / CAST(count(*) - 1 AS DOUBLE) - 6)
              / (count(*) + 1), 7) AS krt
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Approximate sketches: HLL distinct-count + quantile sketch.
    * Spark's HLL++/GK and DuckDB's HLL/t-digest are different
    * estimators, so the raw approximate values can't hash-match
    * cross-engine; what CAN is the accuracy contract itself. Each
    * engine runs its own sketch and asserts it against its own exact
    * values — approx distinct within 5% relative error, approx median
    * inside the exact p25–p90 envelope — and the booleans (plus the
    * exact distinct count, which does match) are the oracle-checked
    * output. SketchSpec keeps the tighter numeric assertions.
    */
  val qStatsSketch = QueryDef(
    "q_stats_sketch",
    (s, dir) => {
      // three separate two-phase aggregates joined on the 3-row group
      // key: countDistinct alongside imperative percentile/HLL buffers
      // in ONE aggregate forces an Expand and the object-hash slow
      // path over every expanded row (measured 10× slower at sf0.1)
      val li = T(s, dir, "lineitem")
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      val perc = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.90)").as("p90"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          expr("approx_percentile(l_quantity, 0.5)").as("approx_med"))
      exact.join(broadcast(perc), "l_returnflag")
        .join(broadcast(approx), "l_returnflag")
        .select(
          col("l_returnflag"),
          col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("cd_ok"),
          (col("approx_med") >= col("p25") &&
            col("approx_med") <= col("p90")).as("med_ok"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        abs(approx_count_distinct(l_partkey)
            - count(DISTINCT l_partkey))
          <= count(DISTINCT l_partkey) * 0.05 AS cd_ok,
        approx_quantile(l_quantity, 0.5)
          BETWEEN quantile_cont(l_quantity, 0.25)
              AND quantile_cont(l_quantity, 0.90) AS med_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // --------------------------------------------------------------- windows

  /** Ranking window: top-3 orders per customer. */
  val qWindowRank = QueryDef(
    "q_window_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, dir, "orders")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        FROM orders)
      WHERE rnk <= 3 ORDER BY o_custkey, rnk"""))

  /** rank / dense_rank / ntile / percent_rank / cume_dist. */
  val qWindowRankKinds = QueryDef(
    "q_window_rank_kinds",
    (s, dir) => {
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, dir, "orders")
        .filter(col("o_totalprice") > 450000)
        .select(
          col("o_orderkey"), col("o_totalprice"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("prk"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_totalprice,
        CAST(rank() OVER w AS BIGINT) AS rnk,
        CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        percent_rank() OVER w AS prk,
        cume_dist() OVER w AS cd
      FROM orders WHERE o_totalprice > 450000
      WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderkey"""))

  /** lag/lead/first_value/last_value/nth_value over event streams. */
  val qWindowAnalytic = QueryDef(
    "q_window_analytic",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wAll = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      T(s, dir, "events")
        .select(
          col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_v"),
          lead(col("value"), 1).over(w).as("next_v"),
          first(col("value")).over(w).as("first_v"),
          last(col("value")).over(wAll).as("last_v"),
          nth_value(col("value"), 2).over(w).as("second_v"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      SELECT user_id, event_id, value,
        lag(value, 1) OVER w AS prev_v,
        lead(value, 1) OVER w AS next_v,
        first_value(value) OVER w AS first_v,
        last_value(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS last_v,
        nth_value(value, 2) OVER w AS second_v
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id"""))

  /** Aggregates over ROWS frames: running sum + moving window sum. */
  val qWindowFrames = QueryDef(
    "q_window_frames",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val moving = w.rowsBetween(-3, Window.currentRow)
      T(s, dir, "events")
        .select(
          col("user_id"), col("event_id"),
          sum(col("value").cast(Dec)).over(running).cast("double")
            .as("running_sum"),
          sum(col("value").cast(Dec)).over(moving).cast("double")
            .as("moving_sum4"),
          count(lit(1)).over(moving).as("moving_n"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      SELECT user_id, event_id,
        CAST(CAST(sum(CAST(value AS DECIMAL(28,10)))
          OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS VARCHAR) AS DOUBLE) AS running_sum,
        CAST(CAST(sum(CAST(value AS DECIMAL(28,10)))
          OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
          AS VARCHAR) AS DOUBLE) AS moving_sum4,
        count(*) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
          AS moving_n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id"""))

  /** RANGE BETWEEN frame (value-based, vs the ROWS frames above):
    * per-user sum of event values within a trailing 10-minute
    * event-time window.
    */
  val qWindowRangeFrames = QueryDef(
    "q_window_range_frames",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"))
        .rangeBetween(-600000000L, Window.currentRow) // 10 min in µs
      T(s, dir, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(
          col("user_id"), col("event_id"),
          sum(col("value").cast(Dec)).over(w).cast("double")
            .as("sum_10min"),
          count(lit(1)).over(w).as("n_10min"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      SELECT user_id, event_id,
        CAST(CAST(sum(CAST(value AS DECIMAL(28,10))) OVER (
          PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
          AS VARCHAR) AS DOUBLE) AS sum_10min,
        count(*) OVER (
          PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS n_10min
      FROM events
      ORDER BY user_id, event_id"""))

  // ----------------------------------------------------------- sort/limit

  /** Global top-k → Catalyst TakeOrderedAndProject. */
  val qTopK = QueryDef(
    "q_topk",
    (s, dir) =>
      T(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(15),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 15"""))

  /** ORDER BY with NULLS placement + OFFSET pagination. */
  val qOffset = QueryDef(
    "q_sort_offset",
    (s, dir) => {
      Tables.views(s, dir)
      s.sql("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20""")
    },
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20"""))

  // --------------------------------------------------------------- set ops

  val qUnionAll = QueryDef(
    "q_union_all",
    (s, dir) => {
      val o = T(s, dir, "orders")
      val hi = o.filter(col("o_totalprice") > 450000)
        .select(lit("hi").as("src"), col("o_orderkey").as("k"))
      val lo = o.filter(col("o_totalprice") < 2000)
        .select(lit("lo").as("src"), col("o_orderkey").as("k"))
      hi.unionAll(lo).orderBy("src", "k")
    },
    Some("""
      SELECT 'hi' AS src, o_orderkey AS k FROM orders
      WHERE o_totalprice > 450000
      UNION ALL
      SELECT 'lo' AS src, o_orderkey AS k FROM orders
      WHERE o_totalprice < 2000
      ORDER BY src, k"""))

  val qIntersect = QueryDef(
    "q_intersect",
    (s, dir) => {
      val a = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val b = T(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("k"))
      a.intersect(b).orderBy("k")
    },
    Some("""
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
      ORDER BY k"""))

  val qExcept = QueryDef(
    "q_except",
    (s, dir) => {
      val a = T(s, dir, "customer").select(col("c_custkey").as("k"))
      val b = T(s, dir, "orders").filter(col("o_totalprice") > 350000)
        .select(col("o_custkey").as("k"))
      a.except(b).orderBy("k")
    },
    Some("""
      SELECT c_custkey AS k FROM customer
      EXCEPT
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 350000
      ORDER BY k"""))

  /** UNION with duplicate elimination (vs q_union_all). */
  val qUnionDedup = QueryDef(
    "q_union_dedup",
    (s, dir) => {
      val o = T(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("k"))
      val b = o.filter(col("o_orderpriority") === "1-URGENT")
        .filter(col("o_totalprice") > 350000)
        .select(col("o_custkey").as("k"))
      a.union(b).distinct().orderBy("k")
    },
    Some("""
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
      UNION
      SELECT o_custkey AS k FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000
      ORDER BY k"""))

  /** INTERSECT ALL / EXCEPT ALL (multiset semantics). */
  val qSetOpsAll = QueryDef(
    "q_setops_all",
    (s, dir) => {
      val l = T(s, dir, "lineitem")
      val a = l.filter(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("k"))
      val b = l.filter(col("l_discount") >= 0.08)
        .select(col("l_orderkey").as("k"))
      a.intersectAll(b).groupBy(col("k")).agg(count(lit(1)).as("n_inter"))
        .join(
          a.exceptAll(b).groupBy(col("k")).agg(count(lit(1)).as("n_exc")),
          Seq("k"), "full_outer")
        .orderBy("k")
    },
    Some("""
      WITH a AS (SELECT l_orderkey AS k FROM lineitem
                 WHERE l_quantity >= 45),
      b AS (SELECT l_orderkey AS k FROM lineitem WHERE l_discount >= 0.08),
      ia AS (SELECT k, count(*) AS n_inter
             FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
             GROUP BY k),
      ea AS (SELECT k, count(*) AS n_exc
             FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
             GROUP BY k)
      SELECT coalesce(ia.k, ea.k) AS k, n_inter, n_exc
      FROM ia FULL OUTER JOIN ea ON ia.k = ea.k
      ORDER BY k"""))

  // ---------------------------------------------------------- subqueries

  /** Uncorrelated scalar subquery (mean via exact sums). */
  val qScalarSubquery = QueryDef(
    "q_subquery_scalar",
    (s, dir) => {
      Tables.views(s, dir)
      s.sql(s"""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.8 * (SELECT ${davgSparkSql("o_totalprice")}
                                    FROM orders)
        ORDER BY o_orderkey""")
    },
    Some(s"""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 1.8 * (SELECT ${davgSql("o_totalprice")}
                                  FROM orders)
      ORDER BY o_orderkey"""))

  /** Correlated scalar subquery (TPC-H Q17 shape; inner avg over
    * whole-valued doubles is exact on both engines).
    */
  val qCorrelated = QueryDef(
    "q_subquery_correlated",
    (s, dir) => {
      Tables.views(s, dir)
      s.sql(s"""
        SELECT ${dsumSparkSql("l_extendedprice")} / 7.0 AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)""")
    },
    Some(s"""
      SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
        AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p_partkey)"""))

  /** IN-subquery. */
  val qInSubquery = QueryDef(
    "q_subquery_in",
    (s, dir) => {
      Tables.views(s, dir)
      s.sql("""
        SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey = 2)
        ORDER BY c_custkey""")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_regionkey = 2)
      ORDER BY c_custkey"""))

  /** NOT IN vs NOT EXISTS under NULLs — the three-valued-logic trap
    * both engines must agree on: one NULL in the NOT IN subquery's
    * output makes EVERY `x NOT IN (…)` UNKNOWN (x <> NULL is never
    * TRUE), so the count collapses to 0, while NOT EXISTS — the form
    * a pipeline should write — still anti-joins correctly, and the
    * NULL-free NOT IN equals it. One row with all three counts, so a
    * future engine upgrade that silently changed null-aware anti-join
    * planning (Spark's NAAJ path) would show up as a value diff, not
    * just a plan diff.
    */
  val qNotInNull = QueryDef(
    "q_not_in_null",
    (s, dir) => {
      Tables.views(s, dir)
      s.sql("""
        SELECT
          (SELECT count(*) FROM customer
           WHERE c_custkey NOT IN
             (SELECT nullif(o_custkey, 7) FROM orders))
            AS not_in_with_null,
          (SELECT count(*) FROM customer c
           WHERE NOT EXISTS
             (SELECT 1 FROM orders o
              WHERE nullif(o.o_custkey, 7) = c.c_custkey))
            AS not_exists,
          (SELECT count(*) FROM customer
           WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
            AS not_in_clean""")
    },
    Some("""
      SELECT
        (SELECT count(*) FROM customer
         WHERE c_custkey NOT IN
           (SELECT nullif(o_custkey, 7) FROM orders))
          AS not_in_with_null,
        (SELECT count(*) FROM customer c
         WHERE NOT EXISTS
           (SELECT 1 FROM orders o
            WHERE nullif(o.o_custkey, 7) = c.c_custkey))
          AS not_exists,
        (SELECT count(*) FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
          AS not_in_clean"""))

  /** CTE + derived table (rejected by the reference's gatekeeper —
    * documented improvement, SURVEY.md §2B subqueries row).
    */
  val qCte = QueryDef(
    "q_cte",
    (s, dir) => {
      Tables.views(s, dir)
      s.sql("""
        WITH big AS (
          SELECT o_custkey, o_totalprice FROM orders
          WHERE o_totalprice > 300000)
        SELECT c_mktsegment, count(*) AS n
        FROM big JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    Some("""
      WITH big AS (
        SELECT o_custkey, o_totalprice FROM orders
        WHERE o_totalprice > 300000)
      SELECT c_mktsegment, count(*) AS n
      FROM big JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // ------------------------------------------------------ scalar functions

  /** String function family. */
  val qStringFuncs = QueryDef(
    "q_string_funcs",
    (s, dir) =>
      T(s, dir, "part")
        .select(
          col("p_partkey"),
          lower(col("p_name")).as("lo"),
          upper(col("p_brand")).as("up"),
          substring(col("p_name"), 1, 8).as("prefix"),
          regexp_replace(col("p_type"), " ", "_").as("ty"),
          length(col("p_name")).cast("long").as("len"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          trim(concat(lit("  "), col("p_name"), lit(" "))).as("trimmed"),
          reverse(col("p_name")).as("rev"),
          instr(col("p_name"), "a").cast("long").as("pos_a"),
          split_part(col("p_type"), lit(" "), lit(1)).as("first_ty"),
          repeat(lit("ab"), 3).as("rep"),
          translate(col("p_brand"), "#", "-").as("tr"))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey, lower(p_name) AS lo, upper(p_brand) AS up,
        substr(p_name, 1, 8) AS prefix, replace(p_type, ' ', '_') AS ty,
        CAST(length(p_name) AS BIGINT) AS len,
        lpad(p_brand, 12, '*') AS padded,
        trim('  ' || p_name || ' ') AS trimmed, reverse(p_name) AS rev,
        CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a,
        split_part(p_type, ' ', 1) AS first_ty, repeat('ab', 3) AS rep,
        translate(p_brand, '#', '-') AS tr
      FROM part ORDER BY p_partkey"""))

  /** Regex family + hashing (md5/sha2 shared by both engines). */
  val qRegexHash = QueryDef(
    "q_regex_hash",
    (s, dir) =>
      T(s, dir, "part")
        .select(
          col("p_partkey"),
          regexp_extract(col("p_type"), "([A-Z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
          col("p_name").rlike("^[a-m]").as("starts_am"),
          md5(col("p_name")).as("name_md5"),
          sha2(col("p_brand"), 256).as("brand_sha"))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey,
        regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
        regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
        regexp_matches(p_name, '^[a-m]') AS starts_am,
        md5(p_name) AS name_md5,
        sha256(p_brand) AS brand_sha
      FROM part ORDER BY p_partkey"""))

  /** Date/time function family. */
  val qDateFuncs = QueryDef(
    "q_date_funcs",
    (s, dir) =>
      T(s, dir, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dy"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          last_day(col("o_orderdate")).as("month_end"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
        CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
        CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
        CAST(extract(day FROM o_orderdate) AS BIGINT) AS dy,
        CAST(extract(dow FROM o_orderdate) AS BIGINT) AS dow,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        last_day(o_orderdate) AS month_end,
        o_orderdate + INTERVAL 30 DAY AS plus30,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        strftime(o_orderdate, '%Y-%m-%d') AS iso_day
      FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey"""))

  /** date_bin parity: 15-minute buckets over the event stream
    * (floor arithmetic on microseconds — identical on both engines).
    */
  val qDateBin = QueryDef(
    "q_date_bin",
    (s, dir) =>
      T(s, dir, "events")
        .groupBy(timestamp_micros(
          (floor(unix_micros(col("ts")) / 900000000L) * 900000000L)
            .cast("long")).as("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("bucket"),
    Some(s"""
      SELECT make_timestamp(CAST(floor(epoch_us(ts) / 900000000) *
               900000000 AS BIGINT)) AS bucket,
             count(*) AS n, ${dsumSql("value")} AS sum_value
      FROM events GROUP BY 1 ORDER BY bucket"""))

  /** Math function family (thresholded to avoid decimal-boundary
    * rounding divergence; quantities are whole numbers).
    */
  val qMathFuncs = QueryDef(
    "q_math_funcs",
    (s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_orderkey") < 300)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("ad"),
          ceil(col("l_extendedprice")).cast("long").as("ce"),
          floor(col("l_extendedprice")).cast("long").as("fl"),
          sqrt(col("l_quantity")).as("sq"),
          round(exp(col("l_discount")), 9).as("ex"),
          round(log(col("l_extendedprice")), 9).as("ln_p"),
          round(log10(col("l_extendedprice")), 9).as("l10"),
          pow(col("l_quantity"), 2.0).as("pw"),
          pmod(col("l_orderkey"), lit(7)).as("md"),
          signum(col("l_discount") - 0.05).as("sg"),
          round(sin(col("l_quantity")), 9).as("sn"),
          round(atan2(col("l_quantity"), lit(10.0)), 9).as("at2"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber,
        abs(l_discount - 0.05) AS ad,
        CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        sqrt(l_quantity) AS sq,
        round(exp(l_discount), 9) AS ex,
        round(ln(l_extendedprice), 9) AS ln_p,
        round(log10(l_extendedprice), 9) AS l10,
        pow(l_quantity, 2.0) AS pw,
        CAST(l_orderkey % 7 AS BIGINT) AS md,
        CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
        round(sin(l_quantity), 9) AS sn,
        round(atan2(l_quantity, 10.0), 9) AS at2
      FROM lineitem WHERE l_orderkey < 300
      ORDER BY l_orderkey, l_linenumber"""))

  /** CASE WHEN / coalesce / nullif / greatest / least / casts. */
  val qConditional = QueryDef(
    "q_conditional",
    (s, dir) =>
      T(s, dir, "orders")
        .filter(col("o_orderkey") < 3000)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
            .as("st"),
          greatest(col("o_totalprice"), lit(50000.0)).as("g"),
          least(col("o_totalprice"), lit(50000.0)).as("l"),
          floor(col("o_totalprice")).cast("long").as("price_int"),
          col("o_orderkey").cast("string").as("key_str"),
          try_to_number(lit("123"), lit("999")).cast("long").as("tryc"))
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey,
        CASE WHEN o_totalprice > 300000 THEN 'big'
             WHEN o_totalprice > 100000 THEN 'mid'
             ELSE 'small' END AS bucket,
        coalesce(nullif(o_orderstatus, 'O'), 'open') AS st,
        greatest(o_totalprice, 50000.0) AS g,
        least(o_totalprice, 50000.0) AS l,
        CAST(floor(o_totalprice) AS BIGINT) AS price_int,
        CAST(o_orderkey AS VARCHAR) AS key_str,
        CAST(try_cast('123' AS INTEGER) AS BIGINT) AS tryc
      FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey"""))

  /** JSON extraction from the events.props payload. */
  val qJson = QueryDef(
    "q_json",
    (s, dir) =>
      T(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id"),
    Some("""
      SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events ORDER BY event_id"""))

  /** Array build / explode (UNNEST) / array functions. */
  val qExplode = QueryDef(
    "q_explode",
    (s, dir) =>
      T(s, dir, "part")
        .select(col("p_partkey"),
          explode(split(col("p_type"), " ")).as("word"))
        .orderBy("p_partkey", "word"),
    Some("""
      SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word
      FROM part ORDER BY p_partkey, word"""))

  /** Array expression family over a built array. */
  val qArrayFuncs = QueryDef(
    "q_array_funcs",
    (s, dir) =>
      T(s, dir, "nation")
        .select(
          col("n_nationkey"),
          array(col("n_nationkey"), col("n_regionkey"), lit(7)).as("arr"))
        .select(
          col("n_nationkey"),
          size(col("arr")).cast("long").as("alen"),
          element_at(col("arr"), 2).as("second"),
          array_contains(col("arr"), 7).as("has7"),
          concat_ws("-", transform(col("arr"), x => x.cast("string")))
            .as("joined"),
          aggregate(col("arr"), lit(0), (acc, x) => acc + x).cast("long")
            .as("asum"),
          sort_array(col("arr"), asc = false).getItem(0).as("amax"))
        .orderBy("n_nationkey"),
    Some("""
      SELECT n_nationkey,
        CAST(length(arr) AS BIGINT) AS alen,
        arr[2] AS second,
        list_contains(arr, 7) AS has7,
        array_to_string(arr, '-') AS joined,
        CAST(list_reduce(arr, (a, b) -> a + b) AS BIGINT) AS asum,
        list_max(arr) AS amax
      FROM (SELECT n_nationkey,
              [n_nationkey, n_regionkey, 7] AS arr FROM nation)
      ORDER BY n_nationkey"""))

  /** sequence / generate_series lateral expansion. */
  val qSequence = QueryDef(
    "q_sequence",
    (s, dir) =>
      T(s, dir, "region")
        .select(col("r_regionkey"),
          explode(sequence(lit(1), col("r_regionkey") + 1)).as("i0"))
        .select(col("r_regionkey"), col("i0").cast("long").as("i"))
        .orderBy("r_regionkey", "i"),
    Some("""
      SELECT r_regionkey, unnest(generate_series(1, r_regionkey + 1)) AS i
      FROM region ORDER BY r_regionkey, i"""))

  /** Struct build + field access. */
  val qStruct = QueryDef(
    "q_struct",
    (s, dir) =>
      T(s, dir, "nation")
        .select(col("n_nationkey"),
          struct(col("n_name").as("name"), col("n_regionkey").as("rk"))
            .as("st"))
        .select(
          col("n_nationkey"),
          col("st.name").as("nm"),
          (col("st.rk") * 10).cast("long").as("rk10"))
        .orderBy("n_nationkey"),
    Some("""
      SELECT n_nationkey, st.name AS nm, CAST(st.rk * 10 AS BIGINT) AS rk10
      FROM (SELECT n_nationkey,
              {'name': n_name, 'rk': n_regionkey} AS st FROM nation)
      ORDER BY n_nationkey"""))

  /** Map build / key access / map_keys / map_values. */
  val qMapFuncs = QueryDef(
    "q_map_funcs",
    (s, dir) =>
      T(s, dir, "nation")
        .select(col("n_nationkey"),
          map(lit("name"), col("n_name"),
            lit("rk"), col("n_regionkey").cast("string")).as("m"))
        .select(
          col("n_nationkey"),
          element_at(col("m"), "name").as("nm"),
          element_at(col("m"), "rk").cast("long").as("rk"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("keys"),
          size(map_values(col("m"))).cast("long").as("nvals"))
        .orderBy("n_nationkey"),
    Some("""
      SELECT n_nationkey,
        m['name'][1] AS nm,
        CAST(m['rk'][1] AS BIGINT) AS rk,
        array_to_string(list_sort(map_keys(m)), ',') AS keys,
        CAST(len(map_values(m)) AS BIGINT) AS nvals
      FROM (SELECT n_nationkey,
              map(['name', 'rk'],
                  [n_name, CAST(n_regionkey AS VARCHAR)]) AS m
            FROM nation)
      ORDER BY n_nationkey"""))

  /** PIVOT: order counts per (priority, status) as columns. */
  val qPivot = QueryDef(
    "q_pivot",
    (s, dir) =>
      T(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority"),
    Some("""
      SELECT o_orderpriority,
        coalesce("F", 0) AS F, coalesce("O", 0) AS O,
        coalesce("P", 0) AS P
      FROM (PIVOT (SELECT o_orderpriority, o_orderstatus FROM orders)
            ON o_orderstatus IN ('F', 'O', 'P')
            USING count(*) GROUP BY o_orderpriority)
      ORDER BY o_orderpriority"""))

  /** UNPIVOT: melt the lineitem measure columns into long form via
    * `stack` (the codegen'd row-expansion path — no shuffle, the
    * Generate runs inside the scan stage). The oracle keeps the
    * dialect-neutral UNION ALL form.
    */
  val qUnpivot = QueryDef(
    "q_unpivot",
    (s, dir) =>
      T(s, dir, "lineitem")
        .filter(col("l_orderkey") < 200)
        .selectExpr("l_orderkey", "l_linenumber",
          """stack(3, 'disc', l_discount, 'price', l_extendedprice,
             'qty', l_quantity) AS (metric, val)""")
        .orderBy("l_orderkey", "l_linenumber", "metric"),
    Some("""
      SELECT l_orderkey, l_linenumber, metric, val FROM (
        SELECT l_orderkey, l_linenumber, 'disc' AS metric,
               l_discount AS val FROM lineitem WHERE l_orderkey < 200
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
        FROM lineitem WHERE l_orderkey < 200
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'qty', l_quantity
        FROM lineitem WHERE l_orderkey < 200)
      ORDER BY l_orderkey, l_linenumber, metric"""))

  /** Recursive CTE (SQL:1999 WITH RECURSIVE, new in Spark 4.x as the
    * UnionLoop operator): an iterate-to-fixpoint computation — the
    * SQL shape behind hierarchy walks, transitive closure, and graph
    * reachability. Exercised here as Collatz chain lengths over the
    * fixture's distinct document lengths, depth-capped at 40 in the
    * WHERE (each level is one Spark job, so depth IS wall time — the
    * bench keeps this lean; RecursionSpec separately proves a
    * >100-level recursion past the default limit with the raised
    * cteRecursionLevelLimit). Each iteration is one narrow map over
    * the frontier
    * — rows leave the loop as they hit 1 or the cap, so the frontier
    * only shrinks.
    */
  val qCteRecursive = QueryDef(
    "q_cte_recursive",
    (s, dir) => {
      Tables.views(s, dir)
      s.conf.set("spark.sql.cteRecursionLevelLimit", "400")
      // r15 (guide §1.2 step 1 — remove driver round-trips): each
      // UnionLoop level used to cache-and-count its tiny frontier as
      // a distributed plan — 90 single-task jobs, pure scheduler
      // latency (profiled: 90 jobs / 90 stages / 90 tasks, 3.9 s).
      // With the anchor under this row gate Spark materializes the
      // loop frames as LocalRelations instead (9 jobs, 1.5 s). The
      // gate is size-adaptive, not a local[32] constant: a corpus
      // whose DISTINCT n_chars exceeds 100k rows (~2.4 MB driver
      // memory, the autoBroadcastJoinThreshold class) falls back to
      // the distributed path automatically. Results are identical
      // (oracle-verified); the declared recursive SQL is unchanged.
      s.conf.set(
        "spark.sql.cteRecursionAnchorRowsLimitToConvertToLocalRelation",
        "100000")
      s.sql("""
        WITH RECURSIVE c(n0, n, steps) AS (
          SELECT DISTINCT CAST(n_chars AS BIGINT),
                 CAST(n_chars AS BIGINT), CAST(0 AS BIGINT)
          FROM documents
          UNION ALL
          SELECT n0, CASE WHEN n % 2 = 0 THEN n DIV 2
                          ELSE 3 * n + 1 END, steps + 1
          FROM c WHERE n > 1 AND steps < 40)
        SELECT n0 AS n_chars, max(steps) AS collatz_steps
        FROM c GROUP BY n0 ORDER BY n0""")
    },
    Some("""
      WITH RECURSIVE c(n0, n, steps) AS (
        SELECT DISTINCT n_chars, n_chars, CAST(0 AS BIGINT)
        FROM documents
        UNION ALL
        SELECT n0, CASE WHEN n % 2 = 0 THEN n // 2
                        ELSE 3 * n + 1 END, steps + 1
        FROM c WHERE n > 1 AND steps < 40)
      SELECT n0 AS n_chars, max(steps) AS collatz_steps
      FROM c GROUP BY n0 ORDER BY n0"""))

  /** LATERAL correlated derived table (top-N-per-group as the SQL
    * standard writes it): each customer's 2 highest-value orders via
    * a LATERAL subquery with ORDER BY + LIMIT. Catalyst decorrelates
    * this into the same ranked-window plan a hand-written row_number
    * would produce — no per-customer re-execution — so the SQL-surface
    * convenience costs nothing at scale.
    */
  val qLateralTopK = QueryDef(
    "q_lateral_topk",
    (s, dir) => {
      Tables.views(s, dir)
      s.sql("""
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c_custkey <= 200
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
    },
    Some("""
      SELECT c_custkey, o_orderkey, o_totalprice
      FROM customer,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey = c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c_custkey <= 200
      ORDER BY c_custkey, o_totalprice DESC, o_orderkey"""))

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * match EACH OTHER instead of nothing — the record-linkage join
    * over incompletely-keyed data (two rows with an unknown region
    * are presumed linkable). Derived nullable key: region 0 → NULL.
    * Spark plans `<=>` as a HASH join key (EqualNullSafe is an
    * equi-join condition, not a filter), so the shape survives scale;
    * the caveat — documented because it's the operator's real hazard
    * at 100 TB — is that every NULL lands in ONE hash bucket, so a
    * null-heavy corpus needs the usual salt-the-null-bucket
    * treatment (q_join_salted). NULL ordering pinned explicitly
    * (Spark defaults NULLS FIRST ascending, DuckDB NULLS LAST).
    */
  val qJoinNullSafe = QueryDef(
    "q_join_nullsafe",
    (s, dir) => {
      val n = Tables.t(s, dir, "nation")
        .select(col("n_nationkey"),
          nullif(col("n_regionkey"), lit(0L)).as("rk"))
      n.as("a").join(n.as("b"),
          col("a.rk") <=> col("b.rk") &&
            col("a.n_nationkey") < col("b.n_nationkey"))
        .groupBy(col("a.rk").as("rk"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("a.n_nationkey")).as("min_nation"))
        .orderBy(col("rk").asc_nulls_first)
    },
    Some("""
      WITH n AS (
        SELECT n_nationkey, nullif(n_regionkey, 0) AS rk FROM nation)
      SELECT a.rk, count(*) AS n_pairs,
        min(a.n_nationkey) AS min_nation
      FROM n a JOIN n b
        ON a.rk IS NOT DISTINCT FROM b.rk
       AND a.n_nationkey < b.n_nationkey
      GROUP BY a.rk ORDER BY a.rk NULLS FIRST"""))

  val all: Seq[QueryDef] = Seq(
    q1Agg, qFilter, qPredicates, qJoinNullSafe,
    qJoin3, qJoin6, qSemi, qAnti, qOuter, qFullOuter, qSelfJoin, qCross,
    qDisjunctJoin, qBloomJoin, qQ22Shape, qTpchQ3, qTpchQ5, qTpchQ10,
    qCountDistinct, qHaving, qDistinct, qRollup, qCube, qGroupingSets,
    qMinMax, qStringAgg, qBoolBit, qArgExtremes, qPercentile, qStatsExact,
    qStatsBuiltin, qStatsSketch,
    qWindowRank, qWindowRankKinds, qWindowAnalytic, qWindowFrames,
    qWindowRangeFrames,
    qTopK, qOffset,
    qUnionAll, qUnionDedup, qIntersect, qExcept, qSetOpsAll,
    qScalarSubquery, qCorrelated, qInSubquery, qNotInNull, qCte,
    qStringFuncs, qRegexHash, qDateFuncs, qDateBin, qMathFuncs,
    qConditional, qJson, qExplode, qArrayFuncs, qSequence, qStruct,
    qMapFuncs, qPivot, qUnpivot, qLateralTopK, qCteRecursive)
}
