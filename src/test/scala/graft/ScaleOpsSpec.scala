package graft

import graft.operators.{Bucketing, SkewJoin}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Scale-path operators: bucketed co-located joins (shuffle elimination)
  * and salted joins for skew.
  */
class ScaleOpsSpec extends SparkSpec {

  test("joining two co-bucketed tables runs with no shuffle exchange") {
    // clean both the catalog entry and any orphaned warehouse directory
    // from a previous test run (the in-memory catalog forgets tables on
    // restart but their directories persist)
    Seq("orders_b", "customer_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(wh)
    }
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    Bucketing.writeBucketed(orders.select(col("o_custkey"),
      col("o_totalprice")), "orders_b", 8, Seq("o_custkey"))
    Bucketing.writeBucketed(customer.select(col("c_custkey"),
      col("c_mktsegment")), "customer_b", 8, Seq("c_custkey"))

    val joined = Bucketing.table(spark, "orders_b")
      .join(Bucketing.table(spark, "customer_b"),
        col("o_custkey") === col("c_custkey"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty,
      s"expected shuffle-free bucketed join, found: $shuffles")
    // and it's still the right answer
    val expected = orders.join(customer,
      col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() == expected)
  }

  test("salted inner join equals the plain inner join on skewed data") {
    import spark.implicits._
    // hot key: 10_000 rows of key 1; right side small
    val left = spark.range(10000).select(lit(1L).as("k"),
        col("id").as("payload"))
      .union(spark.range(100).select((col("id") + 2).as("k"),
        col("id").as("payload")))
    val right = Seq((1L, "hot"), (2L, "a"), (50L, "b")).toDF("k", "name")

    val plain = left.join(right, Seq("k"))
      .groupBy(col("k"), col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", salt = 8)
      .groupBy(col("k"), col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(salted == plain)
    assert(plain((1L, "hot")) == 10000L)
  }

  test("BloomJoin.bloomSemiJoin equals the plain semi join; the compiled " +
      "probe prefilters the big side before the join") {
    import org.apache.spark.sql.functions._
    val orders = graft.core.Graft.table(spark, sfDir, "orders")
    val keys = graft.core.Graft.table(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 45).select(col("l_orderkey"))

    val bloomed = graft.operators.BloomJoin
      .bloomSemiJoin(orders, "o_orderkey", keys, "l_orderkey")
    val plain = orders.join(keys.withColumnRenamed("l_orderkey",
        "o_orderkey"), Seq("o_orderkey"), "left_semi")

    val a = bloomed.select("o_orderkey").collect().map(_.getLong(0)).sorted
    val b = plain.select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq)

    // the Bloom probe sits in the plan (map-side, pre-join), and the
    // exact semi join still runs after it
    val p = bloomed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("graft_bloom_contains"), p)
    assert(p.contains("LeftSemi"), p)
  }
}
