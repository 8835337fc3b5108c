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

  /** Fill-in-the-middle transform — the FIM pretraining objective
    * (Bavarian et al., "Efficient Training of Language Models to Fill
    * in the Middle", 2022, public): a `rateNum/rateDen` fraction of
    * documents is split into (prefix, middle, suffix) so the model
    * learns infilling; the rest pass through unchanged. Like every
    * corruption in this family, the decision AND the cut points are
    * pure integer functions of the document id via md5 — no RNG, so
    * re-running any shard regenerates byte-identical examples and the
    * whole transform is engine-exact (x100's oracle restates gate,
    * cuts, and reassembly in DuckDB).
    *
    * Cut derivation (the [[graft.operators.Sampling]] hex
    * arithmetic): gate = 16-bit digits 1–4 under `⌊16⁴·rate⌋`; the CUT
    * slices are 32-bit — middle start `a = h₂ mod n` (0-based, digits
    * 5–12), middle length `1 + (h₃ mod (n − a))` (digits 13–20) — so
    * every split is reachable for documents up to 2³² chars (a 16-bit
    * slice would pin the middle inside the first 64Ki chars of long
    * documents and never cover their tail; residual modular bias is
    * ≤ n/2³², negligible at real document lengths). Prefix/suffix may
    * be empty (document-edge spans, which FIM training wants).
    * Documents shorter than 2 chars never transform. Untransformed
    * rows carry `(prefix, middle, suffix) = (text, "", "")`.
    *
    * Output: input columns + `fim`, `prefix`, `middle`, `suffix`.
    * Pure map — ZERO shuffles at any corpus size; rearranging into
    * PSM/SPM sentinel order is a `concat` the caller composes with
    * their sentinel ids ([[graft.operators.Bpe.vocabBytes]] special
    * tokens).
    */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
      rateNum: Int, rateDen: Int): DataFrame = {
    require(rateNum >= 0 && rateDen > 0, "rate must be a valid fraction")
    val threshold = (BigInt(16).pow(4) * rateNum / rateDen).toLong
    val h = md5(col(idCol).cast("string"))
    def hx(from: Int, digits: Int): Column =
      conv(substring(h, from, digits), 16, 10).cast("long")
    val n = length(col(textCol)).cast("long")
    val gate =
      if (rateNum >= rateDen) lit(true) // 16^4 is five hex digits
      else hx(1, 4) < lit(threshold)
    val isFim = gate && n >= 2
    val t = col(textCol)
    // 32-bit cut slices: a 16-bit slice caps the reachable start/length
    // at 64Ki, starving the tail of long documents (see scaladoc)
    val a = hx(5, 8) % n // 0-based middle start
    val lenMid = lit(1L) + hx(13, 8) % (n - a)
    // Substring takes IntegerType positions; the mod arithmetic stays
    // in longs, the cuts cast down (a single document longer than
    // 2^31 chars is a row-size impossibility upstream)
    val ai = a.cast("int")
    val li = lenMid.cast("int")
    df.withColumn("fim", isFim)
      .withColumn("prefix", when(col("fim"), t.substr(lit(1), ai))
        .otherwise(t))
      .withColumn("middle",
        when(col("fim"), t.substr(ai + 1, li)).otherwise(lit("")))
      .withColumn("suffix",
        when(col("fim"), t.substr(ai + 1 + li, n.cast("int")))
        .otherwise(lit("")))
  }
}
