package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Supervised-fine-tuning example preparation — the step between a
  * chat-transcript corpus and a trainer: parse role-marked turns
  * (`<|user|>…<|assistant|>…`), tokenize each turn's content with the
  * byte-level tokenizer, and emit the token stream WITH ITS LOSS MASK
  * (loss on the target role's content only — the standard SFT recipe:
  * the model must not be trained to imitate the user or the role
  * markers themselves).
  *
  * Segment-wise tokenization is deliberate: each turn's content
  * encodes INDEPENDENTLY (markers are reserved special ids, never
  * byte-merged with content), so the mask aligns with token
  * boundaries by construction — masking can never split a token, the
  * failure mode of tokenize-then-project-spans pipelines.
  *
  * Scale shape: the whole transform is ONE map-side projection —
  * regex segment split, per-segment compiled BPE kernel, flatten —
  * zero shuffles at any corpus size, streaming-composable as a
  * `withColumn`.
  */
object Sft {

  /** Per-document SFT example: `token_ids` (each turn as its role's
    * reserved marker id followed by the turn content's byte-BPE ids)
    * and the aligned `loss_mask` (1 on `maskRole` content tokens, 0
    * on markers and every other role), plus `n_tokens`, `n_masked`,
    * `n_turns`. Text before the first marker (a bare preamble) is
    * dropped; transcripts with no markers produce empty examples —
    * both loud in `n_turns`.
    *
    * Marker ids come from [[Bpe.vocabBytes]] with the role markers as
    * special tokens (ids `256 + merges.size + roleIndex` — shared
    * with serving, so trainer and sampler can never disagree).
    */
  def lossMaskedExamples(df: DataFrame, idCol: String, textCol: String,
      roles: Seq[String], maskRole: String,
      merges: Seq[(Int, String, String, String, Long)],
      tokenPattern: String = TextFunctions.bpeTokenPattern): DataFrame = {
    require(roles.nonEmpty && roles.distinct == roles,
      s"roles must be non-empty and distinct: $roles")
    require(roles.contains(maskRole),
      s"maskRole '$maskRole' is not one of $roles")
    roles.foreach(r => require(r.matches("[A-Za-z0-9_]+"),
      s"role '$r' must be a word (it is spliced into a regex and a " +
        "marker literal)"))
    val markers = roles.map(r => s"<|$r|>")
    val vocab = Bpe.vocabBytes(merges, markers)
    val markerId: Map[String, Long] = roles.zip(markers.map(m =>
      vocab.find(_._1 == m).get._2)).toMap
    val alt = roles.mkString("|")
    // each segment starts at a marker (lookahead split keeps the
    // marker with its content); a marker-less head segment is the
    // preamble and is dropped by the role filter
    val segs = split(col(textCol), s"(?=<\\|(?:$alt)\\|>)")
    def roleOf(s: Column): Column =
      regexp_extract(s, s"^<\\|($alt)\\|>", 1)
    def contentOf(s: Column): Column =
      regexp_replace(s, s"^<\\|(?:$alt)\\|>", "")
    def idsOf(s: Column): Column =
      graft.expressions.GraftFunctions.tokenIds(
        graft.expressions.GraftFunctions.bpeEncode(contentOf(s),
          merges.sortBy(_._1).map(m => (m._1, m._2, m._3)),
          tokenPattern, byteLevel = true),
        vocab, unkId = -1L)
    def markerIdOf(role: Column): Column =
      roles.tail.foldLeft(
        when(role === roles.head, lit(markerId(roles.head)))) {
        (acc, r) => acc.when(role === r, lit(markerId(r)))
      }
    val turns = filter(transform(segs, s =>
      struct(roleOf(s).as("role"), idsOf(s).as("ids"))),
      t => t("role") =!= "")
    df.select(col(idCol),
        turns.as("__turns"))
      .select(col(idCol),
        flatten(transform(col("__turns"), t =>
          concat(array(markerIdOf(t("role"))), t("ids"))))
          .as("token_ids"),
        flatten(transform(col("__turns"), t =>
          concat(array(lit(0)), transform(t("ids"), _ =>
            when(t("role") === maskRole, lit(1)).otherwise(lit(0))))))
          .as("loss_mask"),
        size(col("__turns")).cast("long").as("n_turns"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
      .withColumn("n_masked", size(filter(col("loss_mask"),
        m => m === 1)).cast("long"))
  }
}
