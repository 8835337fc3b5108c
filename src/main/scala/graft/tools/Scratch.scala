package graft.tools

import graft.core.Graft
import graft.queries.Extensions

/** Throwaway exploration main (kept out of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val q = Extensions.x62IndexedIncremental(spark, dir)
    q.count()
    val plan = q.queryExecution.executedPlan.toString()
    println("=== x62 scan/exchange lines ===")
    plan.linesIterator.filter(l => l.contains("FileScan") ||
      l.contains("Exchange") || l.contains("Broadcast")).foreach(l =>
      println(l.trim.take(160)))
    spark.stop()
  }
}
