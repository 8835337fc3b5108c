package graft.tools

import graft.core.Graft
import graft.functions.TextFunctions
import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** Throwaway exploration main (kept out of the library surface).
  * Current experiment: quality-classifier train/score wall clock.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = Graft.table(spark, dir, "documents")
    val toks = TextFunctions.tokens(coalesce(col("text"), lit("")))
    val signed = size(filter(toks, t => t === "spark")) * 2 +
      size(filter(toks, t => t === "vector")) +
      size(filter(toks, t => t === "stream")) -
      size(filter(toks, t => t === "slow")) -
      size(filter(toks, t => t === "big"))
    val labeled = d.withColumn("y", (signed > 0).cast("int"))
    labeled.count()
    var t0 = System.nanoTime()
    val m = QualityClassifier.train(labeled, "text", "y",
      dim = 256, iters = 40, lr = 0.5)
    println(f"train: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val scored = QualityClassifier.score(labeled, "doc_id", "text", m)
      .join(labeled.select(col("doc_id"), col("y")), "doc_id")
      .select(col("doc_id"), (col("keep") === (col("y") === 1)).as("correct"))
    val acc = scored.agg(avg(col("correct").cast("double"))).head.getDouble(0)
    println(f"score+join: ${(System.nanoTime() - t0) / 1e9}%.2f s, acc $acc%.4f")
  }
}
