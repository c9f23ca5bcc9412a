package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational operator catalog over the harness star schema.
  *
  * Each query exercises one operator family from SURVEY.md §2 and ships
  * with a DuckDB oracle (SparkEntry.oracleSql). Determinism discipline
  * for oracle parity:
  *   - money/ratio arithmetic in exact `decimal`, cast to double at the
  *     very end (double summation order would otherwise diverge between
  *     Spark partitions and DuckDB);
  *   - counts stay integral;
  *   - every result has a total ORDER BY with tie-breakers.
  *
  * Scale notes (100 TB design): all dimension joins broadcast the small
  * side; fact-side aggregation is partial (map-side) by construction;
  * filters/projections are plain Catalyst expressions so they push into
  * the parquet scan.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact 2-dp decimal view of a double column (all harness money
    * columns are 2-dp clean; verified in FIXTURES.md §B).
    */
  private def dec2(c: Column): Column = c.cast("decimal(12,2)")

  // ---------------------------------------------------------------- q01
  /** A1/A2-style grouped aggregation: TPC-H Q1 pricing summary.
    * Reference analog: flip-count / rank aggregations
    * (triangles_method.py:376-396) — groupBy + sum/count.
    */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** P5 threshold predicates + pushdown: filtered revenue (TPC-H Q6
    * shape). Filters reach the parquet scan as PushedFilters.
    */
  def q02FilterRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.08 &&
        col("l_quantity") < 24)
      .agg(
        sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q02Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount >= 0.02 AND l_discount <= 0.08 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q03
  /** J2 broadcast FK equi-join (merge_sources analog, utils.py:13-30):
    * orders ⋈ customer, grouped by market segment. Customer is the
    * broadcast side (dimension).
    */
  def q03JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    // NO broadcast() hint: customer SCALES WITH SF (unlike nation /
    // region / the per-brand aggregates, which are bounded), and an
    // explicit hint never degrades — Catalyst auto-broadcasts below
    // the threshold and AQE falls back to a shuffled join above it
    // (degradation pinned in PlanQualitySpec)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("sum_total"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  val q03Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total,
      |  COUNT(DISTINCT c_custkey) AS n_customers
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q04
  /** J2 chain: 5-way star join (TPC-H Q5 shape), revenue per
    * region/nation. lineitem is the only fact-side shuffle; all
    * dimensions broadcast.
    */
  def q04RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec2(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q04Sql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q05
  /** P7 membership as a left-semi join: customers with at least one
    * order, counted per nation (EXISTS).
    */
  def q05SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val n = t(s, dir, "nation")
    c.join(o.select(col("o_custkey")), c("c_custkey") === col("o_custkey"), "left_semi")
      .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n_cust"))
      .orderBy(col("n_name"))
  }

  val q05Sql: String =
    """SELECT n_name, COUNT(*) AS n_cust
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Left-anti join (cf_summary antichain shape, A4): customers with no
    * urgent orders per nation (NOT EXISTS).
    */
  def q06AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    val n = t(s, dir, "nation")
    c.join(o.select(col("o_custkey")), c("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n_cust"))
      .orderBy(col("n_name"))
  }

  val q06Sql: String =
    """SELECT n_name, COUNT(*) AS n_cust
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q07
  /** O1/O2 similarity-ordered top-k analog: top-10 customers by exact
    * order revenue, ties broken by key (deterministic under the oracle).
    */
  def q07TopK(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.groupBy(col("o_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(c), col("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(10)
  }

  val q07Sql: String =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey ASC LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q08
  /** O9 max-value selection via window: top-3 customers by account
    * balance within each nation (row_number with full tie-break).
    */
  def q08WindowRank(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    c.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("c_nationkey"), col("rnk"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_nationkey"), col("rnk"))
  }

  val q08Sql: String =
    """SELECT c_nationkey, rnk, c_custkey, c_acctbal FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
      |  FROM customer)
      |WHERE rnk <= 3 ORDER BY c_nationkey, rnk""".stripMargin

  // ---------------------------------------------------------------- q09
  /** A8 dedup: distinct flag/status combinations. */
  def q09Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q09Sql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q10
  /** U1 union + A8 dedup: urgent ∪ high-value orders, deduplicated on
    * the full row, counted per status.
    */
  def q10UnionDedup(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
    val big = o.filter(col("o_totalprice") >= 300000.0)
    urgent.unionByName(big)
      .dropDuplicates("o_orderkey")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))
  }

  val q10Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders FROM (
      |  SELECT DISTINCT o_orderkey, o_orderstatus FROM (
      |    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
      |    UNION ALL
      |    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice >= 300000.0))
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q11
  /** G1/G3 Generator shape: tokenize + explode + grouped count (the
    * fan-out primitive behind the perturbation generators,
    * local_explain.py:200-215).
    */
  def q11ExplodeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)

  val q11Sql: String =
    """SELECT token, COUNT(*) AS cnt FROM (
      |  SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
      |GROUP BY token ORDER BY cnt DESC, token ASC""".stripMargin

  // ---------------------------------------------------------------- q12
  /** O8 argmax / threshold classification (local_explain.py:122-124):
    * two-way class assignment + per-class aggregates over events.
    */
  def q12ArgmaxClass(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("cls", when(col("value") >= 100.0, lit("high")).otherwise(lit("low")))
      .groupBy(col("event_type"), col("cls"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("event_type"), col("cls"))

  val q12Sql: String =
    """SELECT event_type,
      |  CASE WHEN value >= 100.0 THEN 'high' ELSE 'low' END AS cls,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type, cls ORDER BY event_type, cls""".stripMargin

  // ---------------------------------------------------------------- q13
  /** J3 broadcast nested-loop cross join (candidate generation,
    * local_explain.py:85-101): region × nation with a containment flag.
    */
  def q13CrossJoin(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region")
    val n = t(s, dir, "nation")
    r.crossJoin(broadcast(n))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("n_regionkey") === col("r_regionkey"), 1L).otherwise(0L)).as("n_in_region"))
      .orderBy(col("r_name"))
  }

  val q13Sql: String =
    """SELECT r_name, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN n_regionkey = r_regionkey THEN 1 ELSE 0 END) AS BIGINT) AS n_in_region
      |FROM region CROSS JOIN nation
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Grouped aggregation with HAVING: supplier balances per nation. */
  def q14GroupHaving(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(dec2(col("s_acctbal"))).cast("double").as("sum_bal"))
      .filter(col("n_supp") >= 2)
      .orderBy(col("s_nationkey"))

  val q14Sql: String =
    """SELECT s_nationkey, COUNT(*) AS n_supp,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
      |FROM supplier GROUP BY s_nationkey HAVING COUNT(*) >= 2
      |ORDER BY s_nationkey""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Event-time bucketing (batch analog of the streaming tumbling
    * window, SURVEY.md §2.10): per-month, per-type event rollup.
    */
  def q15MonthBuckets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("month", date_format(col("ts"), "yyyy-MM"))
      .groupBy(col("month"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("month"), col("event_type"))

  val q15Sql: String =
    """SELECT strftime(ts, '%Y-%m') AS month, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY month, event_type ORDER BY month, event_type""".stripMargin

  // ---------------------------------------------------------------- q16
  /** F4 composite-id codec round-trip ("0@<lid>#1@<rid>",
    * local_explain.py:44 / triangles_method.py:34-35): build, parse,
    * verify parse inverts build.
    */
  def q16CompositeId(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val withId = o.select(
      col("o_custkey"), col("o_orderkey"),
      concat(lit("0@"), col("o_custkey").cast("string"),
        lit("#1@"), col("o_orderkey").cast("string")).as("pair_id"))
    val parsed = withId
      .withColumn("parts", split(col("pair_id"), "[@#]"))
      .withColumn("lid", element_at(col("parts"), 2).cast("long"))
      .withColumn("rid", element_at(col("parts"), 4).cast("long"))
    parsed.agg(
      count(lit(1)).as("n_total"),
      sum(when(col("lid") === col("o_custkey") && col("rid") === col("o_orderkey"), 1L)
        .otherwise(0L)).as("n_roundtrip_ok"),
      countDistinct(col("pair_id")).as("n_distinct_ids"))
  }

  val q16Sql: String =
    """SELECT COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN CAST(parts[2] AS BIGINT) = o_custkey AND CAST(parts[4] AS BIGINT) = o_orderkey THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
      |  COUNT(DISTINCT pair_id) AS n_distinct_ids
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |    '0@' || CAST(o_custkey AS VARCHAR) || '#1@' || CAST(o_orderkey AS VARCHAR) AS pair_id,
      |    string_split_regex('0@' || CAST(o_custkey AS VARCHAR) || '#1@' || CAST(o_orderkey AS VARCHAR), '[@#]') AS parts
      |  FROM orders)""".stripMargin

  // ---------------------------------------------------------------- q17
  /** U4 token-set difference (reference diff, utils.py:75-81): per-brand
    * totals of tokens unique to each side across part-name pairs.
    */
  def q17TokenDiff(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"),
        array_distinct(split(col("p_name"), " ")).as("toks"))
    val a = p.select(col("p_partkey").as("lk"), col("p_brand").as("brand"),
      col("toks").as("lt"))
    val b = p.select(col("p_partkey").as("rk"), col("p_brand").as("rb"),
      col("toks").as("rt"))
    a.join(b, col("brand") === col("rb") && col("lk") < col("rk"))
      .groupBy(col("brand"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(size(array_except(col("lt"), col("rt"))).cast("long")).as("sum_left_only"),
        sum(size(array_except(col("rt"), col("lt"))).cast("long")).as("sum_right_only"))
      .orderBy(col("brand"))
  }

  val q17Sql: String =
    """WITH p AS (SELECT p_partkey, p_brand,
      |  list_distinct(string_split(p_name, ' ')) AS toks FROM part)
      |SELECT a.p_brand AS brand, COUNT(*) AS n_pairs,
      |  CAST(SUM(len(list_filter(a.toks, x -> NOT list_contains(b.toks, x)))) AS BIGINT) AS sum_left_only,
      |  CAST(SUM(len(list_filter(b.toks, x -> NOT list_contains(a.toks, x)))) AS BIGINT) AS sum_right_only
      |FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |GROUP BY a.p_brand ORDER BY brand""".stripMargin

  // ---------------------------------------------------------------- q90
  /** Hierarchical ROLLUP with grouping_id: the subtotal/grand-total
    * lattice over (returnflag, linestatus) in ONE pass — partial
    * aggregation handles all levels map-side, so the shuffle carries
    * at most (groups × levels) rows regardless of input size.
    */
  def q90Rollup(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"),
        count(lit(1)).as("n_items"))
      .select(col("gid"), col("l_returnflag"), col("l_linestatus"),
        col("sum_qty"), col("sum_price"), col("n_items"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  val q90Sql: String =
    """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n_items
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q91
  /** PIVOT: per-region order revenue spread across the five order
    * priorities as columns. Explicit pivot values avoid the
    * distinct-values pre-query (an extra job + collect); Spark then
    * aggregates in two bounded passes — (region, priority) partials,
    * then the pivot — whose shuffles carry only group-sized rows.
    */
  def q91Pivot(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
    val wide = joined.groupBy(col("r_name"))
      .pivot("o_orderpriority", pris)
      .agg(sum(dec2(col("o_totalprice"))).cast("double"))
    pris.zipWithIndex.foldLeft(wide) { case (df, (p, i)) =>
        df.withColumnRenamed(p, s"rev_p${i + 1}")
      }
      .select(col("r_name") +: pris.indices.map(i =>
        coalesce(col(s"rev_p${i + 1}"), lit(0.0)).as(s"rev_p${i + 1}")): _*)
      .orderBy(col("r_name"))
  }

  val q91Sql: String = {
    val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val cols = pris.zipWithIndex.map { case (p, i) =>
      s"  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) " +
        s"FILTER (WHERE o_orderpriority = '$p') AS DOUBLE), 0.0) AS rev_p${i + 1}"
    }.mkString(",\n")
    s"""SELECT r_name,
       |$cols
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name ORDER BY r_name""".stripMargin
  }

  // ---------------------------------------------------------------- q94
  /** CUBE over (priority, status): all four grouping-set combinations —
    * per-cell, per-priority, per-status, grand total — in ONE pass,
    * completing the grouping-set family next to q90's ROLLUP. Same
    * scale shape: the Expand multiplies rows map-side but partial
    * aggregation collapses them before the shuffle, which carries at
    * most (cells × 4) rows.
    */
  def q94Cube(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
      .select(col("gid"), col("o_orderpriority"), col("o_orderstatus"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("gid"), col("o_orderpriority"), col("o_orderstatus"))
  }

  val q94Sql: String =
    """SELECT CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
      |  o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
      |ORDER BY gid, o_orderpriority, o_orderstatus""".stripMargin

  /** Registry consumed by SparkEntry. */
  // ---------------------------------------------------------------- q133
  /** UNPIVOT (melt) — the inverse reshape completing the q91 pivot:
    * three per-flag measure columns fold into (measure, val) rows via
    * Spark's native `unpivot` (an Expand, scan-local — no
    * explode-of-structs UDF shape, no shuffle beyond the aggregate
    * that feeds it). Exact decimal sums cast to double at the very
    * end; oracle is the portable UNION ALL form.
    */
  def q133Unpivot(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "lineitem").groupBy(col("l_returnflag"))
      .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"),
        sum(dec2(col("l_discount"))).cast("double").as("sum_disc"))
    a.unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "val")
      .orderBy(col("l_returnflag"), col("measure"))
  }

  val q133Sql: String =
    """WITH a AS (SELECT l_returnflag,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |    AS sum_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, m AS measure, v AS val FROM (
      |  SELECT l_returnflag, 'sum_qty' AS m, sum_qty AS v FROM a
      |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
      |  UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM a)
      |ORDER BY l_returnflag, measure""".stripMargin

  // ---------------------------------------------------------------- q134
  /** TIME-RANGE ROLLING WINDOW — each event's trailing-1-hour value
    * sum per type (`RANGE BETWEEN 3600s PRECEDING AND CURRENT ROW`
    * over event-time micros): the sliding-window analytic q48 computes
    * with tumbling streaming windows, here as the batch range frame.
    * All integer (cents), so the rolling sums and their census are
    * engine-exact; RANGE peers (equal timestamps) aggregate together
    * by definition in both engines. One event_type shuffle + per-key
    * sorted runs, no join — the q126 skew note applies.
    */
  def q134RollingWindow(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("event_type"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    e.withColumn("roll", sum(col("cents")).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("roll")).as("max_roll"),
        min(col("roll")).as("min_roll"),
        sum(col("roll")).as("sum_roll"))
      .orderBy(col("event_type"))
  }

  val q134Sql: String =
    """WITH e AS (SELECT event_type, epoch_ns(ts) // 1000 AS us,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events),
      |r AS (SELECT event_type, SUM(cents) OVER (PARTITION BY event_type
      |    ORDER BY us RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |    AS roll FROM e)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(MAX(roll) AS BIGINT) AS max_roll,
      |  CAST(MIN(roll) AS BIGINT) AS min_roll,
      |  CAST(SUM(roll) AS BIGINT) AS sum_roll
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_revenue" -> (q02FilterRevenue _),
    "q03_join_agg" -> (q03JoinAgg _),
    "q04_region_revenue" -> (q04RegionRevenue _),
    "q05_semi_join" -> (q05SemiJoin _),
    "q06_anti_join" -> (q06AntiJoin _),
    "q07_topk" -> (q07TopK _),
    "q08_window_rank" -> (q08WindowRank _),
    "q09_distinct" -> (q09Distinct _),
    "q10_union_dedup" -> (q10UnionDedup _),
    "q11_explode_tokens" -> (q11ExplodeTokens _),
    "q12_argmax_class" -> (q12ArgmaxClass _),
    "q13_cross_join" -> (q13CrossJoin _),
    "q14_group_having" -> (q14GroupHaving _),
    "q15_month_buckets" -> (q15MonthBuckets _),
    "q16_composite_id" -> (q16CompositeId _),
    "q17_token_diff" -> (q17TokenDiff _),
    "q90_rollup" -> (q90Rollup _),
    "q91_pivot" -> (q91Pivot _),
    "q94_cube" -> (q94Cube _),
    "q133_unpivot" -> (q133Unpivot _),
    "q134_rolling_window" -> (q134RollingWindow _))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_revenue" -> q02Sql,
    "q03_join_agg" -> q03Sql,
    "q04_region_revenue" -> q04Sql,
    "q05_semi_join" -> q05Sql,
    "q06_anti_join" -> q06Sql,
    "q07_topk" -> q07Sql,
    "q08_window_rank" -> q08Sql,
    "q09_distinct" -> q09Sql,
    "q10_union_dedup" -> q10Sql,
    "q11_explode_tokens" -> q11Sql,
    "q12_argmax_class" -> q12Sql,
    "q13_cross_join" -> q13Sql,
    "q14_group_having" -> q14Sql,
    "q15_month_buckets" -> q15Sql,
    "q16_composite_id" -> q16Sql,
    "q17_token_diff" -> q17Sql,
    "q90_rollup" -> q90Sql,
    "q91_pivot" -> q91Sql,
    "q94_cube" -> q94Sql,
    "q133_unpivot" -> q133Sql,
    "q134_rolling_window" -> q134Sql)
}
