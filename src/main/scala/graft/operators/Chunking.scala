package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Token-window chunking and segment-level deduplication.
  *
  * Chunking splits each document into overlapping fixed-size token
  * windows — the retrieval/embedding preprocessing step (every RAG
  * indexer and long-context packer needs it). Segment dedup is the
  * CCNet-style pass (Wenzek et al. 2020 dedup paragraphs by hash;
  * here the segmenter is a fixed token window, the right granularity
  * for single-line web text): drop every repeated segment except its
  * first occurrence corpus-wide, then rebuild documents from the
  * surviving segments.
  *
  * Both are built from the same primitive: a map-only
  * `sequence → transform → posexplode` over the token array — no joins,
  * no windows, no state. Chunking stays entirely map-side (a scan at
  * 100 TB). Segment dedup adds the one shuffle the semantics require
  * (first-occurrence choice is global, keyed by segment hash) plus a
  * per-doc rebuild agg; segment-hash groups are tiny (duplicate
  * counts), so the window inside each hash group never sorts more than
  * a handful of rows.
  */
object Chunking {

  /** Overlapping token windows: window `i` covers tokens
    * `[i·stride, i·stride + width)`, for every start strictly inside
    * the document; the last window may be short. Documents with no
    * tokens yield no rows.
    *
    * Output: idCol, `chunk_idx`, `chunk_tokens` (count), `chunk_text`
    * (space-joined window).
    */
  /** Shared tokenize prologue: (idCol, __tk, __n) for docs with at
    * least one token — the fixed-window and content-defined segmenters
    * must agree on tokenization and the empty-doc rule.
    */
  private def tokenized(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__tk"))
      .withColumn("__n", size(col("__tk")))
      .filter(col("__n") > 0)

  /** Evaluate `exprs` ONCE per row and hand the results to `body` as
    * bound lambda variables — the let-binding idiom every window
    * builder here needs twice over. A Generate used to carry the full
    * token array (and text view) into EVERY exploded window row —
    * O(n²/stride) bytes materialized per document — and the pushed-down
    * non-empty filter re-evaluated the (expensive) tokenize kernel up
    * to 3× per row on top of the projection's own evaluation. Binding
    * through a one-element array + `transform` makes the evaluation
    * count structural (exactly once, not CSE-dependent), and building
    * the finished per-window rows INSIDE the lambda lets the explode
    * emit only chunk-sized structs: linear bytes, kernel run once, and
    * empty docs yield an empty array (non-outer Generate drops them —
    * no filter needed, so nothing expensive gets pushed down).
    */
  private def bound1(exprs: Seq[(String, org.apache.spark.sql.Column)])(
      body: (String => org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.expressions.GraftFunctions.bindOnce(exprs)(body)

  /** Per-row array of window structs over a bound token array `tk`
    * (element type T): window i covers `[i·stride, i·stride + width)`;
    * `mk` builds the output struct from the window slice. Empty token
    * arrays yield an empty (typed) array.
    */
  private def windowsOf(tk: org.apache.spark.sql.Column, width: Int,
      stride: Int)(mk: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(
      when(size(tk) > 0,
        sequence(lit(0L), ((size(tk) - 1).cast("long") / stride)
          .cast("long"))).otherwise(array().cast("array<bigint>")),
      i => bound1(Seq(("w",
        slice(tk, (i.cast("int") * stride) + 1, lit(width)))))(f =>
        mk(f("w"))))

  def tokenWindows(df: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    val chunks = bound1(Seq(
      ("t", TextFunctions.tokens(col(textCol)))))(f =>
      windowsOf(f("t"), width, stride)(w =>
        struct(size(w).as("chunk_tokens"),
          array_join(w, " ").as("chunk_text"))))
    df.select(col(idCol),
        posexplode(chunks).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx"),
        col("__c.chunk_tokens").as("chunk_tokens"),
        col("__c.chunk_text").as("chunk_text"))
  }

  /** [[tokenWindows]] budgeted by the REAL tokenizer — the RAG/embedding
    * prep a model-facing pipeline actually needs: window `i` covers
    * TOKEN IDS `[i·stride, i·stride + width)` under the byte-level BPE
    * (map-side kernel + the shared vocabulary), and `chunk_text` is the
    * DECODED window — byte-exact reconstruction, because byte-level BPE
    * is lossless and a token boundary is always a byte boundary (the
    * regex form's space-rejoin can both miscount the embedding budget
    * ~2× and mangle whitespace; this form's count IS the model's and
    * its text round-trips). Under the full-fidelity pre-tokenization,
    * non-overlapping windows reassemble the document exactly.
    *
    * Output: idCol, `chunk_idx`, `chunk_tokens`, `chunk_ids` (the
    * window's token ids — what an embedding model consumes directly),
    * `chunk_text`. Pure map: encode, sequence, posexplode, slice,
    * decode — zero shuffles at any corpus size, streaming-composable.
    */
  def tokenWindowsBpe(df: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int,
      merges: Seq[(Int, String, String, String, Long)],
      specialTokens: Seq[String] = Nil,
      tokenPattern: String = TextFunctions.bpeTokenPattern): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    val vocab = graft.operators.Bpe.vocabBytes(merges, specialTokens)
    val ids = graft.expressions.GraftFunctions.tokenIds(
      graft.expressions.GraftFunctions.bpeEncode(col(textCol),
        merges.sortBy(_._1).map(m => (m._1, m._2, m._3)),
        tokenPattern, byteLevel = true),
      vocab, unkId = -1L)
    // encode once per row, window inside the lambda, explode finished
    // chunk structs only (see [[bound1]] — linear bytes, no re-encode)
    val chunks = bound1(Seq(("t", ids)))(f =>
      windowsOf(f("t"), width, stride)(w =>
        struct(size(w).cast("long").as("chunk_tokens"),
          w.as("chunk_ids"),
          graft.expressions.GraftFunctions.idsToText(w, vocab)
            .as("chunk_text"))))
    df.select(col(idCol),
        posexplode(chunks).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx"),
        col("__c.chunk_tokens").as("chunk_tokens"),
        col("__c.chunk_ids").as("chunk_ids"),
        col("__c.chunk_text").as("chunk_text"))
  }

  /** [[tokenWindowsBpe]]'s PROVENANCE-PRESERVING sibling: windows
    * budgeted by a WordPiece tokenizer WITH exact source spans — each
    * chunk carries `(char_start, char_end)` code-point offsets into
    * the Bert-NORMALIZED text plus the substring they delimit, so a
    * chunk embedded or retrieved at 100 TB can point BACK into its
    * source document (attribution, dedup receipts, span-level
    * contamination reports) instead of reconstructing text from ids
    * (the decode space-join loses the original spacing; the span
    * does not). The spans come from the offsets kernel and the
    * normalized view from the SAME [[graft.expressions.BertPipeline]]
    * — they cannot drift. Window `i` covers tokens
    * `[i·stride, i·stride + width)`; the last window may be short;
    * documents with no tokens yield no rows. The tokenizer must be
    * template- and padding-free (those ids carry no source span) —
    * refused loudly otherwise.
    *
    * Output: idCol, `chunk_idx`, `chunk_tokens`, `chunk_ids`,
    * `char_start`, `char_end`, `chunk_text`. Pure map: encode,
    * sequence, posexplode, slice, substr — zero shuffles at any
    * corpus size, streaming-composable.
    */
  def tokenWindowSpans(df: DataFrame, idCol: String, textCol: String,
      tok: graft.operators.WordPiece.WordPieceTokenizer,
      width: Int, stride: Int): DataFrame = {
    require(tok.prefixIds.isEmpty && tok.suffixIds.isEmpty &&
      tok.padding.isEmpty,
      "tokenWindowSpans needs a template-free, padding-free " +
        "tokenizer — template and pad ids carry no source span; " +
        "strip the post-processor/padding blocks to chunk")
    windowSpansFrom(df, idCol,
      graft.expressions.GraftFunctions.wordPieceEncodeOffsets(
        col(textCol), tok),
      graft.expressions.GraftFunctions.bertNormalize(col(textCol),
        tok), width, stride)
  }

  /** [[tokenWindowSpans]] for the BYTE-LEVEL lineage — provenance
    * chunking under a GPT-2/RoBERTa-family tokenizer (the common
    * production RAG/embedding case): spans index the tokenizer's
    * ENCODE-VIEW text (post-NFC, post-`add_prefix_space` — the
    * [[Bpe.encodeOffsetsColumn]] convention), the view travels with
    * each chunk's substring, and the offsets come from the SAME
    * [[graft.expressions.BpeWordMerge]] fold as the id kernel. Same
    * window arithmetic home as the WordPiece form — the two lineages
    * cannot drift on chunk shape. Template/padding blocks refused
    * (their ids carry no source span); a truncation block is NOT
    * applied — chunking consumes the untruncated stream, both
    * lineages alike.
    */
  def tokenWindowSpansBpe(df: DataFrame, idCol: String,
      textCol: String, tok: graft.operators.Bpe.BpeTokenizer,
      width: Int, stride: Int): DataFrame = {
    require(tok.prefixIds.isEmpty && tok.suffixIds.isEmpty &&
      tok.padding.isEmpty,
      "tokenWindowSpansBpe needs a template-free, padding-free " +
        "tokenizer — template and pad ids carry no source span; " +
        "strip the post-processor/padding blocks to chunk")
    val view = graft.operators.Bpe.encodeView(col(textCol), tok)
    windowSpansFrom(df, idCol,
      graft.expressions.GraftFunctions.bpeEncodeOffsets(view,
        tok.merges.sortBy(_._1).map(m => (m._1, m._2, m._3)),
        tok.tokenPattern, tok.vocab,
        ignoreMerges = tok.ignoreMerges,
        requireCover = tok.splitPre),
      view, width, stride)
  }

  /** The ONE window-arithmetic home both span-chunkers share: given
    * an `(id, start, end)` offsets column and the text VIEW its
    * spans index, emit the `(chunk_idx, chunk_tokens, chunk_ids,
    * char_start, char_end, chunk_text)` rows. Pure map —
    * sequence, posexplode, slice, substr — zero shuffles.
    */
  private def windowSpansFrom(df: DataFrame, idCol: String,
      toks: org.apache.spark.sql.Column,
      view: org.apache.spark.sql.Column,
      width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    // offsets kernel + normalized view evaluated ONCE per row ([[bound1]]),
    // all window structs built in-lambda, only finished chunks exploded —
    // the Generate no longer carries the O(n) token array and text view
    // into each of the n/stride window rows
    val chunks = bound1(Seq(("t", toks), ("v", view)))(f =>
      windowsOf(f("t"), width, stride) { w =>
        val start = element_at(w, 1).getField("start")
        val end = element_at(w, -1).getField("end")
        struct(size(w).cast("long").as("chunk_tokens"),
          transform(w, t => t.getField("id")).as("chunk_ids"),
          start.cast("long").as("char_start"),
          end.cast("long").as("char_end"),
          f("v").substr(start + 1, end - start).as("chunk_text"))
      })
    df.select(col(idCol),
        posexplode(chunks).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx"),
        col("__c.chunk_tokens").as("chunk_tokens"),
        col("__c.chunk_ids").as("chunk_ids"),
        col("__c.char_start").as("char_start"),
        col("__c.char_end").as("char_end"),
        col("__c.chunk_text").as("chunk_text"))
  }

  /** Corpus-wide segment dedup: cut each document into NON-overlapping
    * `width`-token segments, keep only the first occurrence of each
    * distinct segment text (ordered by (idCol, segment index)), and
    * rebuild each document from its surviving segments in order.
    *
    * Output: one row per input document — idCol, `n_segments`,
    * `n_kept`, `kept_text` (surviving segments re-joined; empty string
    * when every segment was a duplicate). Documents with no tokens
    * report 0/0 and an empty text.
    */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
      width: Int): DataFrame = {
    val segs = tokenWindows(df, idCol, textCol, width, width)
      .withColumnRenamed("chunk_idx", "seg_idx")
    dedupSegmentFrame(df, segs, idCol)
  }

  /** Global first-occurrence dedup + per-doc rebuild over any
    * (idCol, seg_idx, chunk_text) segmentation — shared by the
    * fixed-window and content-defined segmenters.
    */
  private def dedupSegmentFrame(df: DataFrame, segs: DataFrame,
      idCol: String): DataFrame = {
    // global first occurrence per distinct segment text: one shuffle on
    // the segment hash; each hash group holds only that segment's
    // duplicates, so the in-group sort is tiny
    val w = Window.partitionBy(md5(col("chunk_text")))
      .orderBy(col(idCol), col("seg_idx"))
    val kept = segs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__keep", col("__rn") === 1)
    val perDoc = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        // sort_array on (seg_idx, text) structs: deterministic rebuild
        // order without a second window
        array_join(expr(
          "transform(" +
            "sort_array(collect_list(CASE WHEN __keep THEN " +
            "struct(seg_idx, chunk_text) END))," +
            "s -> s.chunk_text)"), " ").as("kept_text"))
    // left join back so token-free documents still report 0/0/""
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Content-defined segmentation (the FastCDC idea over tokens): a
    * boundary falls AFTER position i when the md5 of the last
    * `window` tokens lands under `16^8 / avgLen` (plus a forced
    * boundary at the end), giving segments of expected length
    * `avgLen`. Because the boundary rule looks only at a LOCAL window,
    * an insertion near the front shifts segmentation for at most a few
    * positions and the rest of the document re-aligns — so
    * byte-shifted duplicates still share segments, which fixed-width
    * windows structurally cannot ([[dedupSegments]]'s limitation).
    * Same map-only shape as [[tokenWindows]].
    *
    * Output: idCol, `seg_idx`, `chunk_tokens`, `chunk_text`.
    */
  def contentDefinedSegments(df: DataFrame, idCol: String, textCol: String,
      window: Int, avgLen: Int): DataFrame = {
    require(window > 0, "window must be positive")
    // avgLen 1 would make the threshold 16^8 — NINE hex digits, which
    // compares LOW lexicographically (the Mixing/Masking rate-1
    // pitfall); "every position a boundary" is tokenWindows(width=1)
    require(avgLen >= 2, "avgLen must be >= 2")
    val thresholdHex =
      f"${(BigInt(16).pow(8) / avgLen).toLong}%08x"
    tokenized(df, idCol, textCol)
      // boundary positions (1-based, always including n)
      .withColumn("__b", expr(
        s"""filter(sequence(1, __n), i ->
           |  i = __n OR
           |  substring(md5(array_join(
           |    slice(__tk, greatest(1, i - ${window - 1}),
           |          least(i, $window)), ' ')), 1, 8)
           |    < '$thresholdHex')""".stripMargin))
      // segment j spans (prev boundary, boundary j]
      .withColumn("__seg", expr(
        """transform(sequence(1, size(__b)), j ->
          |  slice(__tk,
          |    (CASE WHEN j = 1 THEN 0 ELSE element_at(__b, j - 1) END) + 1,
          |    element_at(__b, j) -
          |      CASE WHEN j = 1 THEN 0 ELSE element_at(__b, j - 1) END))
          |""".stripMargin))
      .select(col(idCol),
        posexplode(col("__seg")).as(Seq("seg_idx", "__w")))
      .select(col(idCol), col("seg_idx"),
        size(col("__w")).as("chunk_tokens"),
        array_join(col("__w"), " ").as("chunk_text"))
  }

  /** Corpus-wide dedup over content-defined segments — shift-robust
    * segment dedup (see [[contentDefinedSegments]]); same output shape
    * as [[dedupSegments]].
    */
  def dedupSegmentsCdc(df: DataFrame, idCol: String, textCol: String,
      window: Int, avgLen: Int): DataFrame =
    dedupSegmentFrame(df,
      contentDefinedSegments(df, idCol, textCol, window, avgLen), idCol)
}
