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
  * Scale shape: the per-example transform is ONE map-side projection —
  * regex segment split, per-segment compiled BPE kernel, flatten —
  * zero shuffles at any corpus size, streaming-composable as a
  * `withColumn`. [[packExamples]] adds the batching step on top with
  * the no-straddle first-fit fold (one stratum-keyed shuffle plus one
  * bounded-state assembly — [[Packing]]'s scale shape).
  */
object Sft {

  private def validateRoles(roles: Seq[String], maskRole: String): Unit = {
    require(roles.nonEmpty && roles.distinct == roles,
      s"roles must be non-empty and distinct: $roles")
    require(roles.contains(maskRole),
      s"maskRole '$maskRole' is not one of $roles")
    roles.foreach(r => require(r.matches("[A-Za-z0-9_]+"),
      s"role '$r' must be a word (it is spliced into a regex and a " +
        "marker literal)"))
  }

  /** The shared turn parser: `(token_ids, loss_mask, n_turns)` columns
    * for a transcript column. Each segment starts at a role marker
    * (lookahead split keeps the marker with its content); a marker-less
    * head segment is a preamble and is dropped by the role filter.
    * Marker ids are looked up in `vocab` — callers build it with the
    * role markers (and any extra special tokens) so trainer, packer,
    * and sampler share one id space.
    */
  private def exampleCols(textCol: String, roles: Seq[String],
      maskRole: String, merges: Seq[(Int, String, String, String, Long)],
      tokenPattern: String,
      vocab: Seq[(String, Long)]): (Column, Column, Column) = {
    val markerId: Map[String, Long] = roles.map(r =>
      r -> vocab.find(_._1 == s"<|$r|>").get._2).toMap
    val alt = roles.mkString("|")
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
    val ids = flatten(transform(turns, t =>
      concat(array(markerIdOf(t("role"))), t("ids"))))
    val mask = flatten(transform(turns, t =>
      concat(array(lit(0)), transform(t("ids"), _ =>
        when(t("role") === maskRole, lit(1)).otherwise(lit(0))))))
    (ids, mask, size(turns).cast("long"))
  }

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
    validateRoles(roles, maskRole)
    val vocab = Bpe.vocabBytes(merges, roles.map(r => s"<|$r|>"))
    val (ids, mask, nTurns) =
      exampleCols(textCol, roles, maskRole, merges, tokenPattern, vocab)
    df.select(col(idCol), ids.as("token_ids"), mask.as("loss_mask"),
        nTurns.as("n_turns"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
      .withColumn("n_masked", size(filter(col("loss_mask"),
        m => m === 1)).cast("long"))
  }

  /** PACK loss-masked examples into fixed-length training sequences —
    * the sample-packing batching step real SFT trainers run: whole
    * examples placed first-fit in id order within a stratum (an SFT
    * example is never split across sequences — the no-straddle
    * discipline), the token stream, the loss mask, and fresh
    * `position_ids` that RESET TO 0 at every example boundary (the
    * packed-attention convention: each example attends as if it began
    * the sequence, so positions must restart or the model learns
    * phantom long-range offsets), padded to exactly `seqLen` with the
    * reserved pad id (mask 0, position 0 on padding).
    *
    * Over-long examples truncate to `seqLen` with the mask truncated
    * IDENTICALLY (the two arrays ride the same fold, so they cannot
    * disagree) and the span flagged `truncated`. `doc_spans` carries
    * placement provenance `(pos, doc, n, truncated)` per example.
    *
    * Scale shape: example construction is a pure projection; then the
    * [[Packing]] first-fit fold (ONE stratum-keyed shuffle, streamed
    * O(1) state) with ids and mask riding along, and ONE
    * `(strata, seq_id)`-keyed assembly whose per-group state is
    * bounded by `seqLen` tokens. The stratum is the parallelism unit
    * at 100 TB, exactly like every packing variant here.
    */
  def packExamples(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, seqLen: Int, roles: Seq[String],
      maskRole: String,
      merges: Seq[(Int, String, String, String, Long)],
      padToken: String = "<|pad|>",
      tokenPattern: String = TextFunctions.bpeTokenPattern): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    validateRoles(roles, maskRole)
    val markers = roles.map(r => s"<|$r|>")
    require(!markers.contains(padToken),
      s"padToken '$padToken' collides with a role marker")
    val vocab = Bpe.vocabBytes(merges, markers :+ padToken)
    val padId = vocab.find(_._1 == padToken).get._2
    val (ids, mask, _) =
      exampleCols(textCol, roles, maskRole, merges, tokenPattern, vocab)
    val ex = df.select(col(strataCol), col(idCol),
      ids.as("__ids"), mask.as("__mask"))
    val assigned = Packing.firstFit(ex, seqLen, carryArrays = 2)
    val pad = (lit(seqLen) - size(col("token_ids"))).cast("int")
    assigned
      .select(col(strataCol), col("seq_id"),
        struct(col("begin").as("pos"), col(idCol).as("doc"),
          col("n_tokens").as("n"), col("truncated"),
          col("__ids").as("ids"), col("__mask").as("mask")).as("__frag"))
      .groupBy(col(strataCol), col("seq_id"))
      .agg(array_sort(collect_list(col("__frag"))).as("__frags"))
      .select(col(strataCol), col("seq_id"),
        flatten(col("__frags.ids")).as("token_ids"),
        flatten(col("__frags.mask")).as("loss_mask"),
        expr("flatten(transform(__frags, f -> " +
          "transform(f.ids, (x, i) -> CAST(i AS BIGINT))))")
          .as("position_ids"),
        expr("transform(__frags, f -> named_struct('pos', f.pos, " +
          "'doc', f.doc, 'n', f.n, 'truncated', f.truncated))")
          .as("doc_spans"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
      .withColumn("n_masked", size(filter(col("loss_mask"),
        m => m === 1)).cast("long"))
      .withColumn("n_examples", size(col("doc_spans")).cast("long"))
      .withColumn("n_pad", lit(seqLen.toLong) - col("n_tokens"))
      .withColumn("padded_ids", concat(col("token_ids"),
        array_repeat(lit(padId), pad)))
      .withColumn("padded_mask", concat(col("loss_mask"),
        array_repeat(lit(0), pad)))
      .withColumn("padded_positions", concat(col("position_ids"),
        array_repeat(lit(0L), pad)))
  }

  /** BEST-OF-N preference construction — the rejection-sampling step
    * that turns scored candidate completions into the (chosen,
    * rejected) pairs [[preferencePairs]] tokenizes (the public recipe:
    * sample n completions per prompt, score with a reward model, keep
    * the argmax — InstructGPT/Llama-2-style RLHF data prep). Input is
    * one row per `(prompt, candidate)` with a numeric reward; output
    * is one row per prompt with the argmax candidate as `chosen`, the
    * argmin as `rejected`, the reward `margin`, and `n_candidates`.
    *
    * Ties are broken DETERMINISTICALLY by candidate id — highest id
    * wins the max, lowest id wins the min — so the pair is a pure
    * function of the data (reruns, partitionings, and engines agree).
    * When every reward ties, `margin` is 0 and chosen ≠ rejected only
    * through the id tiebreak; callers typically filter `margin > 0`
    * before training (kept visible rather than silently dropped).
    * Prompts with a single candidate yield chosen = rejected and
    * margin 0 — same policy: report, don't guess.
    *
    * Scale shape: ONE prompt-keyed aggregation. `max_by`/`min_by` on a
    * (reward, id) struct key are declarative Catalyst aggregates with
    * PARTIAL (map-side) combine — per-prompt candidate sets never
    * materialize anywhere, so n and the prompt count can both be
    * data-sized. No window, no sort, no join.
    */
  def bestOfN(df: DataFrame, promptCol: String, candIdCol: String,
      candTextCol: String, rewardCol: String): DataFrame = {
    val ordKey = struct(col(rewardCol).cast("double"), col(candIdCol))
    val cand = struct(col(candIdCol), col(candTextCol))
    df.groupBy(col(promptCol))
      .agg(
        count(lit(1)).as("n_candidates"),
        max_by(cand, ordKey).as("__best"),
        min_by(cand, ordKey).as("__worst"),
        (max(col(rewardCol).cast("double")) -
          min(col(rewardCol).cast("double"))).as("margin"))
      .select(col(promptCol), col("n_candidates"),
        col(s"__best.$candIdCol").as("chosen_id"),
        col(s"__best.$candTextCol").as("chosen"),
        col(s"__worst.$candIdCol").as("rejected_id"),
        col(s"__worst.$candTextCol").as("rejected"),
        col("margin"))
  }

  /** DPO/RLHF preference-pair preparation: tokenize `(prompt, chosen,
    * rejected)` into the two full streams a preference trainer
    * consumes — `chosen_ids` / `rejected_ids` are each
    * `prompt ++ completion (++ eos)` — with `n_prompt` marking the
    * shared prefix so the loss can exclude prompt tokens.
    *
    * The prompt is tokenized ONCE and prepended to both completions'
    * independently-tokenized streams, so the chosen and rejected
    * streams share an IDENTICAL prompt prefix by construction. That
    * is the point: tokenizing `prompt + completion` as one string
    * lets a byte merge cross the boundary, and then the two streams'
    * "shared" prefixes can differ — the silent mis-slice in DPO
    * logprob extraction. (Same boundary discipline as the turn
    * markers in [[lossMaskedExamples]].)
    *
    * `maxLen` clips each WHOLE stream (prompt included) to at most
    * `maxLen` tokens, flagged per side; the eos id survives only when
    * the unclipped stream fits. Scale shape: one map-side projection,
    * zero shuffles.
    */
  def preferencePairs(df: DataFrame, idCol: String, promptCol: String,
      chosenCol: String, rejectedCol: String,
      merges: Seq[(Int, String, String, String, Long)],
      maxLen: Int = Int.MaxValue, eosToken: Option[String] = None,
      specialTokens: Seq[String] = Nil,
      tokenPattern: String = TextFunctions.bpeTokenPattern): DataFrame = {
    require(maxLen > 0, "maxLen must be positive")
    eosToken.foreach(t => require(specialTokens.contains(t),
      s"eosToken '$t' is not in specialTokens — the eos id must come " +
        "from the shared vocabulary"))
    val vocab = Bpe.vocabBytes(merges, specialTokens)
    val eosArr = eosToken match {
      case Some(t) => array(lit(vocab.find(_._1 == t).get._2))
      case None => array().cast("array<bigint>")
    }
    def idsOf(c: String): Column =
      graft.expressions.GraftFunctions.tokenIds(
        graft.expressions.GraftFunctions.bpeEncode(col(c),
          merges.sortBy(_._1).map(m => (m._1, m._2, m._3)),
          tokenPattern, byteLevel = true),
        vocab, unkId = -1L)
    def clip(c: Column): Column =
      if (maxLen == Int.MaxValue) c else slice(c, 1, maxLen)
    df.select(col(idCol), idsOf(promptCol).as("__p"),
        concat(idsOf(chosenCol), eosArr).as("__c"),
        concat(idsOf(rejectedCol), eosArr).as("__r"))
      .select(col(idCol),
        least(size(col("__p")), lit(maxLen)).cast("long").as("n_prompt"),
        clip(concat(col("__p"), col("__c"))).as("chosen_ids"),
        clip(concat(col("__p"), col("__r"))).as("rejected_ids"),
        (size(col("__p")) + size(col("__c")) > maxLen)
          .as("chosen_truncated"),
        (size(col("__p")) + size(col("__r")) > maxLen)
          .as("rejected_truncated"))
      .withColumn("n_chosen", size(col("chosen_ids")).cast("long"))
      .withColumn("n_rejected", size(col("rejected_ids")).cast("long"))
  }
}
