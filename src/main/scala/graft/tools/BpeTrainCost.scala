package graft.tools

import graft.functions.TextFunctions
import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Decompose x93's wall time into its two phases — fresh full-pattern
  * byte-BPE TRAINING vs the corpus ENCODE pass — at each scale, plus
  * the distinct-word histogram size that drives the training side.
  * Evidence for the scale-trend attribution: the synthesized sf1
  * corpus suffixes every token per replica, so its distinct-word
  * vocabulary grows ~10× with the data and per-merge affected-word
  * mass grows with it, while the encode pass stays linear in corpus
  * bytes.
  *
  * `runMain graft.tools.BpeTrainCost <sfDir> [sfDir...]`
  */
object BpeTrainCost {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("graft-bpe-cost")
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").isNotNull)
      d.count() // warm the scan
      val words = d.select(explode(regexp_extract_all(col("text"),
          lit(TextFunctions.bpeBytePatternFull), lit(0))).as("w"))
        .select(col("w")).distinct().count()
      val t0 = System.nanoTime()
      val merges = Bpe.trainBytes(d, "text", numMerges = 30,
        tokenPattern = TextFunctions.bpeBytePatternFull)
      val t1 = System.nanoTime()
      val n = Bpe.encodeBytes(d, "doc_id", "text", merges,
          tokenPattern = TextFunctions.bpeBytePatternFull)
        .agg(sum(col("n_tokens"))).head().getLong(0)
      val t2 = System.nanoTime()
      println(f"""{"dir":"$dir","distinct_words":$words,""" +
        f""""train_sec":${(t1 - t0) / 1e9}%.3f,""" +
        f""""encode_sec":${(t2 - t1) / 1e9}%.3f,"tokens":$n}""")
    }
    spark.stop()
  }
}
