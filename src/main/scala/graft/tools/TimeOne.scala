package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a single SparkEntry query N times at a given sf dir.
  * `runMain graft.tools.TimeOne <sfDir> <queryName> [passes]`
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-time-one")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    for (p <- 0 until passes) {
      val t0 = System.nanoTime()
      val n = q(spark, dir).collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"pass $p: $sec%.2f s ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
