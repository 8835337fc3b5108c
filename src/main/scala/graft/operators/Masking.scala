package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic token masking — the MLM/T5-style corruption step of a
  * pretraining pipeline, with the same reproducibility contract as the
  * sampling family ([[Sampling]], [[Mixing]]): whether token i of
  * document d is masked is a pure function of (d, i) via an md5
  * threshold, NOT an RNG — re-running the pipeline (or re-processing
  * one shard) regenerates byte-identical training examples, and the
  * mask decision is engine-exact (hex-prefix compare, integer-derived
  * threshold).
  *
  * Pure map-side: tokenize → per-index hash gate → rebuild. Zero
  * shuffles at any corpus size.
  */
object Masking {

  /** Mask each token independently at rate `rateNum/rateDen`.
    *
    * Output: input columns + `n_tokens`, `n_masked`, `masked_text`
    * (masked positions replaced by `maskToken`, space-joined).
    */
  def maskTokens(df: DataFrame, idCol: String, textCol: String,
      rateNum: Int, rateDen: Int, maskToken: String = "<MASK>")
      : DataFrame = {
    require(rateNum >= 0 && rateDen > 0, "rate must be a valid fraction")
    val threshold = (BigInt(16).pow(8) * rateNum / rateDen).toLong
    val thresholdHex = f"$threshold%08x"
    def masked(i: Column): Column =
      substring(md5(concat(col(idCol).cast("string"), lit(":"),
        i.cast("string"))), 1, 8) < lit(thresholdHex)
    df.withColumn("__tk", TextFunctions.tokens(col(textCol)))
      .withColumn("n_tokens", size(col("__tk")).cast("long"))
      .withColumn("n_masked",
        size(filter(transform(col("__tk"), (_, i) => masked(i)),
          c => c)).cast("long"))
      .withColumn("masked_text", array_join(
        transform(col("__tk"),
          (x, i) => when(masked(i), lit(maskToken)).otherwise(x)), " "))
      .drop("__tk")
  }
}
