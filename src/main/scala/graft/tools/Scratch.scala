package graft.tools

import graft.core.Graft
import graft.queries.{Extensions, Relational}

/** Throwaway exploration main (kept out of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $name")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Scan parquet") || l.contains("Join") ||
        l.contains("WholeStageCodegen") || l.contains("Exchange"))
        .mkString("\n"))
    }
    audit("q2_filter_project", Relational.q2FilterProject(spark, dir))
    audit("q3_join_agg", Relational.q3JoinAgg(spark, dir))
    audit("q18_star_join", Relational.q18StarJoin(spark, dir))
    audit("x6_neardup", Extensions.x6EmbeddingNearDup(spark, dir))
    spark.stop()
  }
}
