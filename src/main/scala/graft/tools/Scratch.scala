package graft.tools

import graft.core.Graft
import graft.queries.{Extensions, Relational}

/** Throwaway exploration main (kept out of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.queryExecution.executedPlan // force planning fresh each pass
        val n = f.count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"TIME $name%-14s min=${times.map(_._1).min}%8.2fs rows=${times.head._2}")
    }
    def plan(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $name")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    args.headOption.getOrElse("time") match {
      case "time" =>
        time("q10_set_ops", Relational.q10SetOps(spark, dir))
        time("x8_knn_lsh", Extensions.x8KnnLsh(spark, dir))
        time("x17_knn_ivf", Extensions.x17KnnIvf(spark, dir))
        time("x6_neardup", Extensions.x6EmbeddingNearDup(spark, dir))
      case "plan" =>
        plan("q10_set_ops", Relational.q10SetOps(spark, dir))
        plan("x8_knn_lsh", Extensions.x8KnnLsh(spark, dir))
        plan("x6_neardup", Extensions.x6EmbeddingNearDup(spark, dir))
    }
    spark.stop()
  }
}
