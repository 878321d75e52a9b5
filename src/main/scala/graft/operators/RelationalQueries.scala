package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.GraftQuery
import graft.sources.Tables

/** Relational query surface (SURVEY.md §2.3 "relational extension").
  *
  * Everything here is declarative DataFrame/Dataset code — no RDDs, no
  * collect-driven loops — so Catalyst supplies predicate pushdown, column
  * pruning, join selection (broadcast vs shuffle), partial aggregation and
  * AQE re-planning for free. Scale notes per query are inline.
  *
  * Numeric determinism: money/rate columns are summed as DECIMAL (exact,
  * order-independent) and the result cast to DOUBLE, so a DuckDB oracle
  * computes bit-identical values regardless of row order or partitioning.
  */
object RelationalQueries {

  private def dec12(c: Column): Column = c.cast(DecimalType(12, 2))
  private def dec8(c: Column): Column = c.cast(DecimalType(8, 2))

  // SQL fragments for the oracles (kept adjacent to the Spark code).
  private val D12 = "DECIMAL(12,2)"
  private val D8 = "DECIMAL(8,2)"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- q01
  // TPC-H Q1-style pricing summary. Scale: single shuffle on a 6-value
  // grouping key; partial aggregation map-side makes the shuffle tiny.
  private val q01 = GraftQuery(
    "q01_pricing_summary",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= to_timestamp(lit("1998-09-01 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec12($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec12($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec12($"l_extendedprice") * (lit(1) - dec8($"l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(dec12($"l_extendedprice") * (lit(1) - dec8($"l_discount"))
            * (lit(1) + dec8($"l_tax"))).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS $D12)) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS $D12)) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS $D12) * (1 - CAST(l_discount AS $D8))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS $D12) * (1 - CAST(l_discount AS $D8)) * (1 + CAST(l_tax AS $D8))) AS DOUBLE) AS sum_charge,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q02
  // Filter + computed projection. Scale: both predicates and the 5-column
  // read schema push down to the parquet scan (verify with .explain:
  // PushedFilters + ReadSchema) — no shuffle at all.
  private val q02 = GraftQuery(
    "q02_filter_project",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_quantity" > 45 && $"l_discount" >= 0.05)
        .select(
          $"l_orderkey", $"l_linenumber",
          (dec12($"l_extendedprice") * (lit(1) - dec8($"l_discount")))
            .cast("double").as("revenue"),
          upper($"l_returnflag").as("flag"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some(s"""
      SELECT l_orderkey, l_linenumber,
        CAST(CAST(l_extendedprice AS $D12) * (1 - CAST(l_discount AS $D8)) AS DOUBLE) AS revenue,
        UPPER(l_returnflag) AS flag
      FROM lineitem
      WHERE l_quantity > 45 AND l_discount >= 0.05
      ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------- q03
  // TPC-H Q3-style shipping priority: 3-way join + agg + top-k.
  // Scale: customer filter prunes before the join; orders⋈lineitem is the
  // big shuffle join on orderkey; AQE handles skew. Top-10 via sort+limit
  // is a TakeOrderedAndProject (no full sort materialization).
  private val q03 = GraftQuery(
    "q03_join_agg_topk",
    (s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      cust.join(ord, $"c_custkey" === $"o_custkey")
        .join(li, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey", $"o_orderdate")
        .agg(sum(dec12($"l_extendedprice") * (lit(1) - dec8($"l_discount")))
          .cast("double").as("revenue"))
        .select($"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"),
          $"revenue")
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    },
    Some(s"""
      SELECT o_orderkey,
        strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        CAST(SUM(CAST(l_extendedprice AS $D12) * (1 - CAST(l_discount AS $D8))) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10"""))

  // ---------------------------------------------------------------- q04
  // Broadcast dimension join: part is tiny relative to lineitem at every
  // SF, so we broadcast it explicitly — no shuffle of the fact table.
  private val q04 = GraftQuery(
    "q04_broadcast_join",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      li.join(broadcast(part), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(
          sum(dec12($"l_quantity")).cast("double").as("total_qty"),
          sum(dec12($"l_extendedprice")).cast("double").as("total_price"),
          count(lit(1)).as("n_items"))
        .orderBy($"p_brand")
    },
    Some(s"""
      SELECT p_brand,
        CAST(SUM(CAST(l_quantity AS $D12)) AS DOUBLE) AS total_qty,
        CAST(SUM(CAST(l_extendedprice AS $D12)) AS DOUBLE) AS total_price,
        COUNT(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand"""))

  // ---------------------------------------------------------------- q05
  // TPC-H Q5-style 6-table join. Scale: region/nation/supplier/customer
  // are broadcast dims; only orders⋈lineitem shuffles. Join order is left
  // to Catalyst (CBO/AQE) — the declarative plan lets it reorder.
  private val q05 = GraftQuery(
    "q05_multi_join",
    (s, dir) => {
      import s.implicits._
      val region = t(s, dir, "region")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val supp = t(s, dir, "supplier")
      cust.join(ord, $"c_custkey" === $"o_custkey")
        .join(li, $"o_orderkey" === $"l_orderkey")
        .join(supp, $"l_suppkey" === $"s_suppkey" &&
          $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(sum(dec12($"l_extendedprice") * (lit(1) - dec8($"l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name", $"n_name")
    },
    Some(s"""
      SELECT r_name, n_name,
        CAST(SUM(CAST(l_extendedprice AS $D12) * (1 - CAST(l_discount AS $D8))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""))

  // ---------------------------------------------------------------- q06
  // Left-semi join (EXISTS). Scale: semi joins never duplicate or widen
  // rows — Spark builds only the key set of the right side.
  private val q06 = GraftQuery(
    "q06_semi_join",
    (s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val bigOrders = t(s, dir, "orders").filter($"o_totalprice" > 100000.0)
      cust.join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q07
  // Left-anti join (NOT EXISTS): customers with no high-value orders.
  private val q07 = GraftQuery(
    "q07_anti_join",
    (s, dir) => {
      import s.implicits._
      val big = t(s, dir, "orders").filter($"o_totalprice" > 150000.0)
      t(s, dir, "customer")
        .join(big, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
      ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q08
  // Ranking window: top-3 orders per customer. Scale: one shuffle on the
  // partition key; rank pushdown (WindowGroupLimit) keeps per-key state
  // at 3 rows instead of sorting whole partitions.
  private val q08 = GraftQuery(
    "q08_window_topn",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
        .orderBy($"o_custkey", $"rn")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) x
      WHERE rn <= 3
      ORDER BY o_custkey, rn"""))

  // ---------------------------------------------------------------- q09
  // Analytic windows: running total + lag per customer over order time.
  private val q09 = GraftQuery(
    "q09_window_running",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .select(
          $"o_custkey", $"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("order_day"),
          sum(dec12($"o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_total"),
          lag($"o_orderkey", 1).over(w).as("prev_orderkey"),
          lead($"o_orderkey", 1).over(w).as("next_orderkey"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some(s"""
      SELECT o_custkey, o_orderkey,
        strftime(o_orderdate, '%Y-%m-%d') AS order_day,
        CAST(SUM(CAST(o_totalprice AS $D12)) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        LAG(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
        LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
      FROM orders
      ORDER BY o_custkey, o_orderkey"""))

  // ---------------------------------------------------------------- q10
  // ROLLUP hierarchy totals (grouping-set machinery, single pass).
  private val q10 = GraftQuery(
    "q10_rollup",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(sum(dec12($"l_quantity")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"sum_qty", $"n")
        .orderBy($"returnflag", $"linestatus")
    },
    Some(s"""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             CAST(SUM(CAST(l_quantity AS $D12)) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""))

  // ---------------------------------------------------------------- q11
  // CUBE over order status × priority.
  private val q11 = GraftQuery(
    "q11_cube",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(sum(dec12($"o_totalprice")).cast("double").as("total"),
          count(lit(1)).as("n"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"total", $"n")
        .orderBy($"status", $"priority")
    },
    Some(s"""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             CAST(SUM(CAST(o_totalprice AS $D12)) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""))

  // ---------------------------------------------------------------- q12
  // Explicit GROUPING SETS via the SQL surface (temp views).
  private val q12 = GraftQuery(
    "q12_grouping_sets",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(s"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(CAST(l_extendedprice AS $D12)) AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus""")
    },
    Some(s"""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             CAST(SUM(CAST(l_extendedprice AS $D12)) AS DOUBLE) AS sum_price,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY returnflag, linestatus"""))

  // ---------------------------------------------------------------- q13
  // Distinct aggregation. Scale: two count-distincts expand to a
  // two-level aggregate; Spark plans a single shuffle with expand.
  private val q13 = GraftQuery(
    "q13_distinct_agg",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_suppkey").as("n_supp"),
          countDistinct($"l_partkey").as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
        COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT l_partkey) AS n_part,
        COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q14
  // Top-k: orderBy+limit compiles to TakeOrderedAndProject — each task
  // keeps a 100-row heap; only 100×nPartitions rows reach the driver side
  // of the exchange. No full sort at any scale.
  private val q14 = GraftQuery(
    "q14_sort_limit",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(100)
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 100"""))

  // ---------------------------------------------------------------- q15
  // Set operations: symmetric difference of two customer-key sets.
  private val q15 = GraftQuery(
    "q15_setops",
    (s, dir) => {
      import s.implicits._
      val rich = t(s, dir, "customer").filter($"c_acctbal" > 5000.0)
        .select($"c_custkey".as("k"))
      val active = t(s, dir, "orders").select($"o_custkey".as("k"))
      rich.except(active).union(active.except(rich)).distinct()
        .orderBy($"k")
    },
    Some("""
      SELECT k FROM (
        (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0
         EXCEPT SELECT o_custkey AS k FROM orders)
        UNION
        (SELECT o_custkey AS k FROM orders
         EXCEPT SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0)
      ) x ORDER BY k"""))

  // ---------------------------------------------------------------- q16
  // Scalar string functions (all codegen'd built-ins, no UDFs).
  private val q16 = GraftQuery(
    "q16_string_fns",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .filter($"p_name".like("%widget%"))
        .select(
          $"p_partkey",
          upper($"p_name").as("name_upper"),
          length($"p_name").cast("long").as("name_len"),
          substring($"p_brand", 7, 10).as("brand_num"),
          concat($"p_type", lit("/"), $"p_brand").as("type_brand"),
          regexp_replace($"p_name", lit(" "), lit("_")).as("name_snake"),
          lpad($"p_partkey".cast("string"), 8, "0").as("key_padded"))
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey,
        UPPER(p_name) AS name_upper,
        CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        SUBSTRING(p_brand, 7, 10) AS brand_num,
        p_type || '/' || p_brand AS type_brand,
        REGEXP_REPLACE(p_name, ' ', '_', 'g') AS name_snake,
        LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded
      FROM part
      WHERE p_name LIKE '%widget%'
      ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- q17
  // Date/time functions + month-level aggregation.
  private val q17 = GraftQuery(
    "q17_date_fns",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy(
          year($"o_orderdate").cast("long").as("y"),
          month($"o_orderdate").cast("long").as("m"),
          date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd")
            .as("month_start"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec12($"o_totalprice")).cast("double").as("total"))
        .orderBy($"y", $"m")
    },
    Some(s"""
      SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS y,
             CAST(MONTH(o_orderdate) AS BIGINT) AS m,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS $D12)) AS DOUBLE) AS total
      FROM orders
      GROUP BY 1, 2, 3
      ORDER BY y, m"""))

  // ---------------------------------------------------------------- q18
  // Conditional (CASE WHEN) aggregation — classic pivot-style rollups.
  private val q18 = GraftQuery(
    "q18_case_when",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          sum(when($"l_discount" > 0.05, dec12($"l_quantity"))
            .otherwise(lit(0).cast(DecimalType(12, 2))))
            .cast("double").as("qty_high_disc"),
          sum(when($"l_discount" <= 0.05, dec12($"l_quantity"))
            .otherwise(lit(0).cast(DecimalType(12, 2))))
            .cast("double").as("qty_low_disc"),
          count(when($"l_tax" > 0.04, lit(1))).as("n_high_tax"))
        .orderBy($"l_returnflag")
    },
    Some(s"""
      SELECT l_returnflag,
        CAST(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_quantity AS $D12) ELSE CAST(0 AS $D12) END) AS DOUBLE) AS qty_high_disc,
        CAST(SUM(CASE WHEN l_discount <= 0.05 THEN CAST(l_quantity AS $D12) ELSE CAST(0 AS $D12) END) AS DOUBLE) AS qty_low_disc,
        COUNT(CASE WHEN l_tax > 0.04 THEN 1 END) AS n_high_tax
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q19
  // GROUP BY ... HAVING.
  private val q19 = GraftQuery(
    "q19_having",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec12($"o_totalprice")).cast("double").as("spend"))
        .filter($"n_orders" >= 5)
        .orderBy($"o_custkey")
    },
    Some(s"""
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS $D12)) AS DOUBLE) AS spend
      FROM orders
      GROUP BY o_custkey
      HAVING COUNT(*) >= 5
      ORDER BY o_custkey"""))

  // ---------------------------------------------------------------- q20
  // Scalar subquery: parts priced above the global average. The scalar
  // aggregate is a 1-row broadcast — no shuffle of `part`.
  private val q20 = GraftQuery(
    "q20_scalar_subquery",
    (s, dir) => {
      import s.implicits._
      val part = t(s, dir, "part")
      val avgDf = part.agg(
        (sum(dec12($"p_retailprice")).cast("double") / count(lit(1)))
          .as("avg_price"))
      part.crossJoin(broadcast(avgDf))
        .filter($"p_retailprice" > $"avg_price")
        .select($"p_partkey", $"p_name", $"p_retailprice")
        .orderBy($"p_partkey")
    },
    Some(s"""
      SELECT p_partkey, p_name, p_retailprice
      FROM part
      WHERE p_retailprice > (
        SELECT CAST(SUM(CAST(p_retailprice AS $D12)) AS DOUBLE) / COUNT(*)
        FROM part)
      ORDER BY p_partkey"""))

  // ---------------------------------------------------------------- q21
  // Correlated EXISTS with an extra predicate → left-semi with condition.
  private val q21 = GraftQuery(
    "q21_exists_corr",
    (s, dir) => {
      import s.implicits._
      val ord = t(s, dir, "orders")
      val heavy = t(s, dir, "lineitem").filter($"l_quantity" >= 48)
      ord.join(heavy, $"o_orderkey" === $"l_orderkey", "left_semi")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      ORDER BY o_orderkey"""))

  // ---------------------------------------------------------------- q22
  // Array functions over the embedding column. Element access and a
  // fixed-order (left-assoc) sum so doubles are bit-identical to DuckDB.
  private val q22 = GraftQuery(
    "q22_array_fns",
    (s, dir) => {
      import s.implicits._
      val first4 = (1 to 4).map(i => element_at($"embedding", i).cast("double"))
        .reduce(_ + _)
      t(s, dir, "embeddings")
        .select(
          $"vec_id",
          size($"embedding").cast("long").as("dim"),
          element_at($"embedding", 1).cast("double").as("e1"),
          first4.as("sum_first4"),
          $"label".cast("long").as("label"))
        .orderBy($"vec_id")
    },
    Some("""
      SELECT vec_id,
        CAST(LEN(embedding) AS BIGINT) AS dim,
        CAST(embedding[1] AS DOUBLE) AS e1,
        ((CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE))
          + CAST(embedding[3] AS DOUBLE)) + CAST(embedding[4] AS DOUBLE) AS sum_first4,
        CAST(label AS BIGINT) AS label
      FROM embeddings
      ORDER BY vec_id"""))

  val all: Seq[GraftQuery] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11,
    q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22)
}
