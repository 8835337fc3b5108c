package graft.tools

import graft.core.Graft
import org.apache.spark.sql.functions._

/** Throwaway exploration main (kept out of the library surface).
  * Current experiment: where does x68's time go?
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val d = Graft.table(spark, dir, "documents")
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val delta = d.filter(col("doc_id") % 7 === 0)
    val basePairs = time("corpus pair gen (count)") {
      val p = graft.operators.Dedup.jaccardShinglePairs(corpus, "doc_id",
        "text", k = 3, threshold = 0.6)
      p.count(); p
    }
    val assignment = time("corpus CC (eager loop)") {
      graft.operators.ConnectedComponents.clusters(basePairs, "id1", "id2")
    }
    time("assignment count")(assignment.count())
    val deltaPairs = time("delta pair gen (count)") {
      val p = graft.operators.Dedup.jaccardShinglePairsAgainst(corpus,
        delta, "doc_id", "text", k = 3, threshold = 0.6)
      p.count(); p
    }
    val incr = time("incrementalClusters (eager part)") {
      graft.operators.ConnectedComponents.incrementalClusters(assignment,
        deltaPairs, "id1", "id2")
    }
    println("persistent RDDs: " +
      spark.sparkContext.getPersistentRDDs.size)
    val opt = incr.queryExecution.optimizedPlan.toString
    println("InMemoryRelation nodes in final plan: " +
      (opt.split("InMemoryRelation").length - 1))
    println("plan mentions documents source: " +
      opt.contains("documents"))
    time("incremental count 1st")(incr.count())
    time("incremental count 2nd")(incr.count())
    spark.stop()
  }
}
