package graft

import graft.core.Graft
import graft.queries.Extensions
import org.apache.spark.sql.functions._

/** Query-corpus invariants that the SQL oracle cannot express. */
class QueriesSpec extends SparkSpec {

  test("x15 approx_count_distinct is within 5% of the exact distinct count") {
    val exact = Graft.table(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Extensions.x15ApproxDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"flag $k: approx $a vs exact $e")
    }
  }

  test("every SparkEntry query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet),
      s"oracle without query: ${SparkEntry.oracleSql.keySet -- qs.keySet}")
    // smoke-run the ones not covered by a dedicated spec or the oracle
    val noOracle = qs.keySet -- SparkEntry.oracleSql.keySet
    noOracle.foreach { name =>
      val n = qs(name)(spark, sfDir).count()
      assert(n >= 0, name)
    }
  }
}
