package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Repetition-based quality signals for pretraining corpora — the
  * Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
  * Models", table A1): documents dominated by a single token or by
  * repeated n-grams are boilerplate/spam and get filtered before
  * training.
  *
  * Per document we compute, over whitespace tokens and word 2-grams:
  * total occurrences, distinct values, and the top value's occurrence
  * count. All repetition fractions are decided in INTEGER space by
  * cross-multiplication (`top·5 > total` ⇔ top/total > 1/5), so the
  * flag is engine-exact — no float division anywhere.
  *
  * Scale shape: two linear explode→groupBy passes keyed by
  * (doc, token) / (doc, 2-gram) with map-side partial aggregation, then
  * per-doc rollups and 1:1 joins on the doc id. No windows, no
  * driver-side state; each pass shuffles at most the tokenized corpus
  * once — the same shape as any word-count at 100 TB.
  */
object Repetition {

  /** Per-document repetition statistics.
    *
    * Output: idCol, `n_tokens`, `n_distinct_tokens`, `top_token_n`,
    * `n_2grams`, `n_distinct_2grams`, `top_2gram_n`, `repetitious`
    * (true when the top token exceeds 20% of all tokens or duplicate
    * 2-gram occurrences exceed 30% of all 2-gram occurrences).
    * Documents with no tokens report all-zero counts and are never
    * flagged.
    */
  def repetitionStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val base = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), col("__tk"),
        TextFunctions.shingles(col("__tk"), 2).as("__g2"))

    val tok = base.select(col(idCol), explode(col("__tk")).as("__t"))
      .groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(sum("__n").cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        max("__n").cast("long").as("top_token_n"))

    val gram = base.select(col(idCol), explode(col("__g2")).as("__g"))
      .groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(sum("__n").cast("long").as("n_2grams"),
        count(lit(1)).as("n_distinct_2grams"),
        max("__n").cast("long").as("top_2gram_n"))

    df.select(col(idCol))
      .join(tok, Seq(idCol), "left")
      .join(gram, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "n_distinct_tokens", "top_token_n",
        "n_2grams", "n_distinct_2grams", "top_2gram_n"))
      .withColumn("repetitious",
        (col("top_token_n") * 5 > col("n_tokens")) ||
          ((col("n_2grams") - col("n_distinct_2grams")) * 10 >
            col("n_2grams") * 3))
  }
}
