package graft.tools

import graft.core.Graft

/** Throwaway exploration main (kept out of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Graft.table(spark, dir, "orders").createOrReplaceTempView("orders_s")
    Graft.table(spark, dir, "nation").createOrReplaceTempView("nation_s")
    Graft.table(spark, dir, "customer").createOrReplaceTempView("customer_s")

    // q40 probe: recursive month spine + left join of monthly order counts
    val q40 = spark.sql(
      """WITH RECURSIVE bounds AS (
        |  SELECT trunc(MIN(o_orderdate), 'MM') AS lo,
        |         trunc(MAX(o_orderdate), 'MM') AS hi
        |  FROM orders_s),
        |spine(month_start) AS (
        |  SELECT lo FROM bounds
        |  UNION ALL
        |  SELECT add_months(month_start, 1) FROM spine
        |  WHERE month_start < (SELECT hi FROM bounds)),
        |monthly AS (
        |  SELECT trunc(o_orderdate, 'MM') AS month_start,
        |         COUNT(*) AS n_orders,
        |         COUNT(DISTINCT o_custkey) AS n_customers
        |  FROM orders_s GROUP BY 1)
        |SELECT s.month_start,
        |       COALESCE(m.n_orders, 0) AS n_orders,
        |       COALESCE(m.n_customers, 0) AS n_customers
        |FROM spine s LEFT JOIN monthly m ON s.month_start = m.month_start
        |ORDER BY s.month_start""".stripMargin)
    println("=== q40 rows=" + q40.count())
    q40.show(5, false)
    q40.explain("formatted")

    // q41 probe: recursive traversal of the synthetic nation tree
    val q41 = spark.sql(
      """WITH RECURSIVE tree(n_nationkey, n_name, depth, path) AS (
        |  SELECT n_nationkey, n_name, 0,
        |         CAST(n_nationkey AS STRING)
        |  FROM nation_s WHERE n_nationkey = 0
        |  UNION ALL
        |  SELECT c.n_nationkey, c.n_name, t.depth + 1,
        |         CONCAT(t.path, '/', CAST(c.n_nationkey AS STRING))
        |  FROM nation_s c JOIN tree t
        |    ON CAST(FLOOR((c.n_nationkey - 1) / 2) AS INT) = t.n_nationkey
        |   AND c.n_nationkey > 0),
        |cust AS (
        |  SELECT c_nationkey, COUNT(*) AS n_cust
        |  FROM customer_s GROUP BY 1)
        |SELECT t.n_nationkey, t.n_name, t.depth, t.path,
        |       COALESCE(c.n_cust, 0) AS n_customers
        |FROM tree t LEFT JOIN cust c ON c.c_nationkey = t.n_nationkey
        |ORDER BY t.n_nationkey""".stripMargin)
    println("=== q41 rows=" + q41.count())
    q41.show(30, false)
    spark.stop()
  }
}
