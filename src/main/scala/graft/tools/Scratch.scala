package graft.tools

import graft.core.Graft
import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Throwaway exploration main (kept out of the library surface).
  * Current experiment: BPE train/encode wall clock at a given sf.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val d = Graft.table(spark, dir, "documents").filter(col("text").isNotNull)
    val t0 = System.nanoTime()
    val merges = Bpe.train(d, "text", 30)
    println(s"merges: ${merges.size} [${(System.nanoTime()-t0)/1e9} s]")
    merges.take(5).foreach(println)
    val t1 = System.nanoTime()
    val n = Bpe.encode(d, "doc_id", "text", merges)
      .agg(sum(col("n_tokens"))).head.getLong(0)
    println(s"total tokens: $n [${(System.nanoTime()-t1)/1e9} s]")
  }
}
