package graft.tools

import graft.core.Graft
import graft.queries.Extensions

/** Throwaway exploration main (kept out of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val q = Extensions.x67SeedDistance(spark, dir)
    val rows = q.collect()
    println("=== x67 rows=" + rows.length)
    println("dist histogram: " + rows.groupBy(_.getInt(1)).view
      .mapValues(_.length).toMap.toSeq.sorted.mkString(", "))
    rows.filter(_.getInt(1) > 0).take(10).foreach(println)
    spark.stop()
  }
}
