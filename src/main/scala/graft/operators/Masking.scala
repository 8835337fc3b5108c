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
    // rate >= 1 masks unconditionally: the full threshold 16^8 is NINE
    // hex digits and would compare LOW against 8-char prefixes (same
    // pitfall Mixing.capPerStratum guards at its rate-1 clamp)
    def masked(i: Column): Column =
      if (rateNum >= rateDen) lit(true)
      else substring(md5(concat(col(idCol).cast("string"), lit(":"),
        i.cast("string"))), 1, 8) < lit(thresholdHex)
    // the mask array is defined once and feeds both the count and the
    // rewrite (a single logical md5 per token; post-collapse physical
    // duplication, if any, is a bounded map-side constant)
    df.withColumn("__tk", TextFunctions.tokens(col(textCol)))
      .withColumn("__msk", transform(col("__tk"), (_, i) => masked(i)))
      .withColumn("n_tokens", size(col("__tk")).cast("long"))
      .withColumn("n_masked",
        size(filter(col("__msk"), c => c)).cast("long"))
      .withColumn("masked_text", array_join(
        zip_with(col("__tk"), col("__msk"),
          (x, m) => when(m, lit(maskToken)).otherwise(x)), " "))
      .drop("__tk", "__msk")
  }
}
