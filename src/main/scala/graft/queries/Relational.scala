package graft.queries

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Exact._

/** Relational query corpus over the driver's TPC-H-ish tables.
  *
  * Every method takes (spark, sfDir) and returns a DataFrame whose column
  * names match the DuckDB oracle SQL registered in [[graft.SparkEntry]].
  * Each query is the Spark-native expression of a capability the reference
  * system deferred to ArangoDB/AQL post-load (SURVEY.md §2.2): the
  * reference itself has no query operators (ParquetArangoLoader.java has
  * scan→encode→sink only), so these define the engine's native surface.
  *
  * Scale notes are inline per query; the common ones:
  *  - filters/projections reach the Parquet scan (PushedFilters);
  *  - dimension joins are broadcast;
  *  - aggregations are partial (map-side) + final — one shuffle on the
  *    group keys, no row explosion;
  *  - every ORDER BY is on a bounded result (post-aggregation) — a full
  *    sort of a 100 TB fact table never appears.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.table(s, dir, name)

  /** q1: pricing-summary aggregation (TPC-H Q1 shape).
    * One shuffle on (returnflag, linestatus) — 6 groups; partial agg does
    * nearly all the work map-side, so this scales linearly in input.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") >= 0)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q2: filter + projection; both are pushed into the Parquet scan
    * (PushedFilters + ReadSchema pruning), so at 100 TB only the matching
    * row groups and the 4 projected columns are read.
    */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 5)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** q6: selective scan + scalar aggregate (TPC-H Q6 shape) — fully
    * map-side; the "shuffle" is a single-row final agg.
    */
  def q6SelectiveAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_discount") >= 0.05 && col("l_quantity") < 24)
      .agg(
        dsum(col("l_extendedprice") * col("l_discount"), 8).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** q3: customer ⋈ orders ⋈ lineitem with group-by + top-k (TPC-H Q3
    * shape). customer is ~1/40 of lineitem — at 100 TB orders⋈lineitem is
    * the big shuffle join (AQE handles skew); the final top-10 is a
    * TakeOrderedAndProject, never a full sort.
    */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q4: semi-join — orders having at least one high-quantity lineitem,
    * counted per priority (TPC-H Q4 shape). left_semi avoids materializing
    * the join product entirely.
    */
  def q4SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val bigLines = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
    t(s, dir, "orders")
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** q5: anti-join — customers with no urgent orders, per market segment.
    * left_anti is the scalable NOT EXISTS: one shuffle, no product.
    */
  def q5AntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("c_mktsegment"))

  /** q7: per-supplier top-3 lineitems by price — windowed top-k. The
    * window shuffles once on l_suppkey; rank+filter keeps memory bounded
    * per partition (no global sort, no collect).
    */
  def q7TopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
    t(s, dir, "lineitem")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("l_suppkey"), col("rk"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_suppkey"), col("rk"))
  }

  /** q8: analytic window functions — running revenue + lag per supplier
    * over ship date.
    */
  def q8WindowAnalytic(s: SparkSession, dir: String): DataFrame = {
    val byShip = Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    t(s, dir, "lineitem")
      .filter(col("l_suppkey") <= 3)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"),
        sum(col("l_extendedprice").cast("decimal(38,4)"))
          .over(byShip.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_rev"),
        lag(col("l_extendedprice"), 1).over(byShip).as("prev_price"),
        row_number().over(byShip).as("rn"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** q9: sort + limit (global top-n orders by price). Spark plans this as
    * TakeOrderedAndProject: per-partition heap + driver merge of n rows —
    * O(n) driver memory at any scale.
    */
  def q9TopN(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(25)

  /** q10: set operations on derived key sets (EXCEPT / INTERSECT). Spark
    * plans these as aggregate/join — one shuffle each on the key.
    */
  def q10SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val big = o.filter(col("o_totalprice") > 100000).select(col("o_custkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    big.intersect(urgent)
      .withColumnRenamed("o_custkey", "custkey")
      .orderBy(col("custkey"))
  }

  /** q11: distinct aggregates per nation over customer. countDistinct
    * expands to a two-phase aggregate; approx_count_distinct (HLL) is the
    * 100 TB-scale variant and is also exposed (see qx in extensions).
    */
  def q11DistinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_customers"),
        countDistinct(col("c_mktsegment")).as("n_segments"),
        dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("c_nationkey"))

  /** q12: ROLLUP hierarchy aggregation (returnflag → linestatus). */
  def q12Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** q13: CUBE over orderstatus × orderpriority. */
  def q13Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** q14: scalar functions — string/date/math over orders (the category
    * the reference's A5/A6 hooks only hinted at; here codegen'd built-ins).
    */
  def q14ScalarFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 200)
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        length(col("o_orderpriority")).as("pri_len"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        concat_ws("#", col("o_orderstatus"), col("o_orderpriority"))
          .as("status_tag"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        round(col("o_totalprice") / 1000, 2).as("price_k"),
        (col("o_totalprice") > 150000).cast("int").as("is_big"))
      .orderBy(col("o_orderkey"))

  /** q15: HAVING — group filter after aggregation. */
  def q15Having(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_spent"))
      .filter(col("n_orders") >= 15)
      .orderBy(col("o_custkey"))

  /** q16: conditional aggregation (TPC-H Q12 shape) — CASE inside SUM. */
  def q16ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0)).as("low_line_count"))
      .orderBy(col("o_orderstatus"))

  /** q17: correlated-aggregate join (TPC-H Q17 shape): lineitems below
    * 20% of their part's average quantity. The per-part average is a
    * partial-agg'd subplan re-joined on partkey — at scale AQE turns the
    * small aggregated side into a broadcast.
    */
  def q17AvgCompareJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val partAvg = li.groupBy(col("l_partkey").as("pk"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    li.join(partAvg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(dsum(col("l_extendedprice"), 8).as("sum_price"),
        count(lit(1)).as("n_small"))
  }

  /** q18: star join through broadcast dimensions (supplier→nation→region):
    * revenue per region. nation/region are tiny → explicit broadcast; the
    * only real shuffle is lineitem's groupBy.
    */
  def q18StarJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region")
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 8)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))
  }

  /** q19: UNION ALL of two derived sets + aggregate — set-op plumbing
    * with no dedup shuffle (unionAll is a no-shuffle concat).
    */
  def q19UnionAll(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val cheap = o.filter(col("o_totalprice") < 50000)
      .select(col("o_orderkey"), lit("cheap").as("bucket"))
    val pricey = o.filter(col("o_totalprice") >= 150000)
      .select(col("o_orderkey"), lit("pricey").as("bucket"))
    cheap.unionAll(pricey)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  /** q26: scalar subquery — orders above the global average price. The
    * 1-row aggregate is cross-joined (broadcast) against the fact table;
    * Catalyst plans it as a BroadcastNestedLoopJoin over a single row.
    */
  def q26ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val avgPrice = o.agg(davg(col("o_totalprice")).as("avg_price"))
    o.crossJoin(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("avg_price"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_above"),
        dsum(col("o_totalprice")).as("sum_above"))
      .orderBy(col("o_orderstatus"))
  }

  /** q27: ordered string aggregation — sorted distinct segment list per
    * nation. collect_set is unordered; sort_array makes it deterministic.
    */
  def q27StringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(array_join(sort_array(collect_set(col("c_mktsegment"))), ",")
        .as("segments"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))

  /** q28: pivot — customer counts per nation × market segment. The value
    * list is fixed, so the plan is a single aggregate with one output
    * column per segment (no second shuffle).
    */
  def q28Pivot(s: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .pivot("c_mktsegment", segs)
      .agg(count(lit(1)))
      .na.fill(0, segs)
      .orderBy(col("c_nationkey"))
  }

  /** q29: generator/explode — token frequencies over documents (UDTF
    * category: explode of split; all codegen'd, no UDF). Top-20 with
    * deterministic tiebreak.
    */
  def q29ExplodeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** q20: GROUPING SETS via SQL — the general form of rollup/cube. */
  def q20GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n_rows
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        |""".stripMargin)
  }

  /** q30: left outer join + null-skipping COUNT — distribution of order
    * counts per customer, including zero-order customers (the rows an
    * inner join would lose). Shuffle join on custkey; the second
    * aggregation is over a tiny domain.
    */
  def q30LeftOuter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"))

  /** q31: IN-subquery (uncorrelated) → left-semi join against the
    * filtered, broadcast-small customer side.
    */
  def q31InSubquery(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(
        broadcast(t(s, dir, "customer").filter(col("c_acctbal") < 0)
          .select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** q32: exact interpolated percentiles per group (Spark `percentile` =
    * DuckDB `quantile_cont`, both linear interpolation at rank
    * (n−1)·p). At 100 TB exact percentiles need a full sort per group —
    * swap in approx_percentile (t-digest) where error tolerance allows;
    * the exact form is the oracle-checkable one.
    */
  def q32Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(expr("percentile(l_extendedprice, 0.95)"), 6).as("p95_price"),
        round(expr("percentile(l_discount, 0.25)"), 6).as("p25_disc"))
      .orderBy(col("l_returnflag"))

  /** q33: cross join (tiny × tiny — the only sane cardinality for one). */
  def q33CrossJoin(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").select(col("r_name"))
    r.select(col("r_name").as("name1"))
      .crossJoin(r.select(col("r_name").as("name2")))
      .orderBy(col("name1"), col("name2"))
  }

  /** q34: full outer join of two aggregates (customers and suppliers per
    * nation) — both sides shrink to ≤ nation-count rows before the join.
    */
  def q34FullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val sup = t(s, dir, "supplier").groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sup, col("ck") === col("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        col("n_cust"), col("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** q35: EXCEPT ALL — multiset difference keeps multiplicity. */
  def q35ExceptAll(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.filter(col("o_totalprice") > 100000).select(col("o_custkey").as("custkey"))
      .exceptAll(o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey")))
      .groupBy(col("custkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("custkey"))
  }

  /** q36: date/time arithmetic — datediff vs an epoch, interval add,
    * truncation; all codegen'd scalar ops, map-only.
    */
  def q36DateArith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 100)
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01"))
          .cast("int").as("days_since"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
        date_trunc("week", col("o_orderdate")).as("week_start"))
      .orderBy(col("o_orderkey"))

  /** q37: regexp extraction/replacement over documents — map-only. */
  def q37Regexp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
          .as("n_numbers"),
        substring(regexp_replace(lower(col("text")), "[aeiou]", ""), 1, 30)
          .as("devoweled_prefix"))
      .orderBy(col("doc_id"))

  /** q38: RANGE window frame (value-based, not row-based): for each
    * order, how many orders fall within 1000 of its price. One shuffle
    * + sort on the frame ordering.
    */
  def q38RangeFrame(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").filter(col("o_orderkey") <= 500)
      .createOrReplaceTempView("orders_rf")
    s.sql(
      """SELECT o_orderkey, o_totalprice,
        |  COUNT(*) OVER (ORDER BY o_totalprice
        |                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
        |    AS n_within_1k
        |FROM orders_rf ORDER BY o_orderkey
        |""".stripMargin)
  }

  /** q39: correlated LATERAL subquery — per-nation top-2 customers by
    * balance, expressed as a lateral derived table rather than a window
    * (the SQL-standard form; Catalyst decorrelates it into a ranked
    * join, so the physical cost matches the window formulation).
    */
  def q39Lateral(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("nation_lat")
    t(s, dir, "customer").createOrReplaceTempView("customer_lat")
    s.sql(
      """SELECT n_name, t.c_custkey, t.c_acctbal
        |FROM nation_lat,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer_lat
        |         WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n_name, c_acctbal DESC, c_custkey
        |""".stripMargin)
  }

  /** q40: recursive CTE calendar spine — gap-filled monthly order counts.
    * The classic "report every month, including the empty ones" pattern,
    * run NATIVELY through Spark 4.x `WITH RECURSIVE` (executed as a
    * `UnionLoop`: each iteration is a tiny driver-coordinated job).
    *
    * Scale shape: the recursion only ever materializes a YEAR spine
    * (one row per year between min and max order date), which then
    * explodes into months OUTSIDE the loop — so a corpus spanning Y
    * years costs Y driver-coordinated iterations, not 12·Y (each
    * UnionLoop iteration is a fixed-overhead driver job, so the
    * recursion depth IS the wall cost of this query), and the default
    * `spark.sql.cteRecursionLevelLimit` of 100 covers a century
    * instead of eight years. Multi-century ranges need the raised
    * engine-level limit [[graft.core.Graft.session]] sets at session
    * construction (the query itself never mutates session conf — a
    * sticky per-query raise would weaken the runaway-recursion guard
    * for every OTHER query on the session); on a foreign session with
    * the default limit, a >100-year range degrades to a loud error,
    * never a silent truncation. The 100 TB side is a single
    * partial+final aggregation of `orders`; the spine joins the
    * month-sized aggregate via broadcast. The fact table never
    * participates in the recursion.
    */
  private[graft] def q40OverView(s: SparkSession, view: String): DataFrame = {
    s.sql(
      s"""WITH RECURSIVE bounds AS (
        |  SELECT date_trunc('MONTH', MIN(o_orderdate)) AS lo,
        |         date_trunc('MONTH', MAX(o_orderdate)) AS hi
        |  FROM $view),
        |years(year_start) AS (
        |  SELECT date_trunc('YEAR', lo) FROM bounds
        |  UNION ALL
        |  SELECT year_start + INTERVAL '1' YEAR FROM years
        |  WHERE year_start < date_trunc('YEAR', (SELECT hi FROM bounds))),
        |spine AS (
        |  SELECT year_start + m.i * INTERVAL '1' MONTH AS month_start
        |  FROM years CROSS JOIN (SELECT explode(sequence(0, 11)) AS i) m
        |  WHERE year_start + m.i * INTERVAL '1' MONTH
        |        BETWEEN (SELECT lo FROM bounds) AND (SELECT hi FROM bounds)),
        |monthly AS (
        |  SELECT date_trunc('MONTH', o_orderdate) AS month_start,
        |         COUNT(*) AS n_orders,
        |         COUNT(DISTINCT o_custkey) AS n_customers
        |  FROM $view GROUP BY 1)
        |SELECT s.month_start,
        |       COALESCE(m.n_orders, 0) AS n_orders,
        |       COALESCE(m.n_customers, 0) AS n_customers
        |FROM spine s LEFT JOIN monthly m ON s.month_start = m.month_start
        |ORDER BY s.month_start
        |""".stripMargin)
  }

  def q40RecursiveSpine(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_rec")
    q40OverView(s, "orders_rec")
  }

  /** q41: recursive hierarchy traversal — depth, root path, and a
    * fact-side measure for every node of a dimension tree (org charts,
    * category taxonomies, BOM explosions). The tree here is the synthetic
    * binary heap-order hierarchy parent(n) = ⌊(n−1)/2⌋ over `nation`, so
    * both engines derive identical edges from the shared data.
    *
    * Scale shape: recursion depth = tree depth (log of the dimension
    * size), and each iteration joins the frontier against the
    * dimension table only — hierarchy traversal is dimension-sized work.
    * Fact-side customer counts aggregate once and join after the
    * closure, exactly how a 100 TB fact table should meet a recursive
    * dimension.
    */
  def q41RecursiveTree(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("nation_rec")
    t(s, dir, "customer").createOrReplaceTempView("customer_rec")
    s.sql(
      """WITH RECURSIVE tree(n_nationkey, n_name, depth, path) AS (
        |  SELECT n_nationkey, n_name, 0,
        |         CAST(n_nationkey AS STRING)
        |  FROM nation_rec WHERE n_nationkey = 0
        |  UNION ALL
        |  SELECT c.n_nationkey, c.n_name, t.depth + 1,
        |         CONCAT(t.path, '/', CAST(c.n_nationkey AS STRING))
        |  FROM nation_rec c JOIN tree t
        |    ON CAST(FLOOR((c.n_nationkey - 1) / 2) AS INT) = t.n_nationkey
        |   AND c.n_nationkey > 0),
        |cust AS (
        |  SELECT c_nationkey, COUNT(*) AS n_cust
        |  FROM customer_rec GROUP BY 1)
        |SELECT t.n_nationkey, t.n_name, t.depth, t.path,
        |       COALESCE(c.n_cust, 0) AS n_customers
        |FROM tree t LEFT JOIN cust c ON c.c_nationkey = t.n_nationkey
        |ORDER BY t.n_nationkey
        |""".stripMargin)
  }
}
