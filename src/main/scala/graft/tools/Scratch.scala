package graft.tools

import graft.core.Graft
import org.apache.spark.sql.functions._

/** Throwaway exploration main (kept out of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    // x18 experiment: does the winnowed fingerprint-Jaccard>=0.5 pair
    // set coincide with the EXACT char-20-gram-Jaccard>=0.5 pair set
    // on this corpus, and with what margin?
    val docs = Graft.table(spark, dir, "documents")
    val fp = docs.select(col("doc_id"),
      graft.expressions.GraftFunctions
        .winnowFingerprints(col("text"), 20, 16).as("fp"))
    val winnow = graft.operators.Dedup
      .jaccardSetPairs(fp, "doc_id", "fp", threshold = 0.5)
      .select(col("id1"), col("id2"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

    val g2 = docs.filter(length(col("text")) >= 20).select(col("doc_id"),
      expr("array_distinct(transform(sequence(1, length(text) - 19), " +
        "i -> substring(text, i, 20)))").as("g"))
    val exact = graft.operators.Dedup
      .jaccardSetPairs(g2, "doc_id", "g", threshold = 0.5)
      .select(col("id1"), col("id2"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

    println(s"=== winnow pairs: ${winnow.size}, exact20 pairs: ${exact.size}")
    println(s"winnow-only: ${winnow.keySet -- exact.keySet}")
    println(s"exact-only:  ${exact.keySet -- winnow.keySet}")
    val shared = winnow.keySet & exact.keySet
    if (shared.nonEmpty) {
      println(f"min exact J on shared pairs: ${shared.map(exact).min}%.4f")
      println(f"min winnow J on shared pairs: ${shared.map(winnow).min}%.4f")
    }
    // margin: exact-J distribution NEAR the 0.5 threshold from below —
    // run the exact pairs at 0.3 to see what lurks under the cut
    val near = graft.operators.Dedup
      .jaccardSetPairs(g2, "doc_id", "g", threshold = 0.3)
      .select(col("id1"), col("id2"), col("jaccard"))
      .collect().map(_.getDouble(2)).filter(j => j >= 0.3 && j < 0.5)
    println(s"exact pairs with J in [0.3, 0.5): ${near.length} " +
      (if (near.nonEmpty) f"max=${near.max}%.4f" else ""))
    spark.stop()
  }
}
