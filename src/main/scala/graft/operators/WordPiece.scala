package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer support — the BERT lineage, completing the
  * engine's tokenizer trifecta (byte-BPE [[Bpe]], sentencepiece
  * [[Unigram]], WordPiece here): `tokenizer.json` files with
  * `model.type = "WordPiece"` (greedy longest-match-first encode with
  * `##` continuations, whole-word unk on any stuck position), the
  * serialization BERT-family models ship.
  *
  * Same contract as the other two loaders: exactly-reproducible
  * pipelines load, everything else refuses LOUDLY. Supported:
  *  - `WordPiece` models (object vocab, `unk_token` resolved against
  *    it, `continuing_subword_prefix`, `max_input_chars_per_word`);
  *  - normalizer: absent or `BertNormalizer` (clean_text /
  *    handle_chinese_chars / strip_accents — the published
  *    null-follows-lowercase default — / lowercase), reproduced
  *    in-kernel; other normalizers rejected;
  *  - pre-tokenizer: `BertPreTokenizer` REQUIRED (whitespace split +
  *    punctuation isolation — the split WordPiece's greedy match is
  *    defined over; an absent pre-tokenizer would make the whole
  *    text one word, a different artifact class);
  *  - post-processor: absent, single-sequence `TemplateProcessing`
  *    (BERT's `[CLS] $A [SEP]`), or the legacy `BertProcessing`
  *    (cls/sep pairs) — fixed ids around one sequence; pair
  *    templates rejected.
  *
  * Honest bound, documented on the kernel: Unicode category lookups
  * use the JDK's tables; a `tokenizers` build pinned to a different
  * Unicode version could classify an exotic codepoint differently.
  */
object WordPiece {

  /** The PAIR post-processing template (BERT's
    * `[CLS] $A [SEP] $B:1 [SEP]:1` shape): fixed (id, type_id)
    * tokens BEFORE A, BETWEEN A and B, and AFTER B, plus the type
    * ids the two sequences' content tokens carry.
    */
  case class PairTemplate(pre: Seq[(Long, Long)],
      mid: Seq[(Long, Long)], post: Seq[(Long, Long)],
      typeA: Long, typeB: Long)

  /** A loaded WordPiece tokenizer. `pair` is the two-sequence
    * template when the file defines one — [[encodePair]]'s contract;
    * single-sequence encode ignores it. `truncation` / `padding` are
    * the file's top-level blocks when present — HONORED by every
    * encode surface (the [[TokenizerTruncation]] semantics), never
    * silently ignored.
    */
  case class WordPieceTokenizer(vocab: Seq[(String, Long)],
      unkId: Long, contPrefix: String, maxInputCharsPerWord: Int,
      cleanText: Boolean, handleChineseChars: Boolean,
      stripAccents: Boolean, lowercase: Boolean,
      prefixIds: Seq[Long], suffixIds: Seq[Long],
      pair: Option[PairTemplate] = None,
      truncation: Option[TokenizerTruncation.Truncation] = None,
      padding: Option[TokenizerTruncation.Padding] = None,
      decoderCleanup: Option[Boolean] = None)

  /** Parse a TemplateProcessing PAIR template — fixed (id, type_id)
    * tokens before A, between A and B, and after B, plus the content
    * type ids — the ONE parser both template-carrying lineages use
    * (WordPiece here, [[Unigram.loadTokenizerJson]] for the
    * sentencepiece lineage), so the A-then-B state machine and its
    * refusals cannot drift between loaders. `idOf` resolves a
    * special-token name through the caller's special_tokens table
    * then its vocab.
    */
  private[operators] def parsePairTemplate(
      post: com.fasterxml.jackson.databind.JsonNode,
      idOf: String => Long, path: String): Option[PairTemplate] = {
    val pairNode = post.get("pair")
    if (pairNode == null || pairNode.isNull ||
        !pairNode.isArray || pairNode.size() == 0) None
    else {
      def typeOf(item: com.fasterxml.jackson.databind.JsonNode,
          key: String): Long = {
        val t = item.get(key).get("type_id")
        if (t == null || t.isNull) 0L else t.asLong()
      }
      val pre1 = Seq.newBuilder[(Long, Long)]
      val mid1 = Seq.newBuilder[(Long, Long)]
      val post1 = Seq.newBuilder[(Long, Long)]
      var typeA = 0L; var typeB = 1L
      var state = 0 // 0 = before A, 1 = between, 2 = after B
      val pit = pairNode.elements()
      while (pit.hasNext) {
        val item = pit.next()
        if (item.get("SpecialToken") != null) {
          val id = idOf(item.get("SpecialToken").get("id").asText())
          val ty = typeOf(item, "SpecialToken")
          state match {
            case 0 => pre1 += ((id, ty))
            case 1 => mid1 += ((id, ty))
            case _ => post1 += ((id, ty))
          }
        } else if (item.get("Sequence") != null) {
          val sid = item.get("Sequence").get("id").asText()
          val ty = typeOf(item, "Sequence")
          if (sid == "A") {
            require(state == 0,
              s"$path pair template references A out of " +
                "order — only A-then-B is reproducible")
            typeA = ty; state = 1
          } else if (sid == "B") {
            require(state == 1,
              s"$path pair template references B before A " +
                "or twice — only A-then-B is reproducible")
            typeB = ty; state = 2
          } else throw new IllegalArgumentException(
            s"$path pair template references sequence " +
              s"'$sid' — only A and B exist in a pair")
        } else throw new IllegalArgumentException(
          s"$path pair template item is neither " +
            "SpecialToken nor Sequence")
      }
      require(state == 2,
        s"$path pair template must reference A then B")
      Some(PairTemplate(pre1.result(), mid1.result(),
        post1.result(), typeA, typeB))
    }
  }

  /** Parse a full TemplateProcessing node — the SINGLE template's
    * fixed prefix/suffix ids (around exactly one A) plus the PAIR
    * template via [[parsePairTemplate]] — the one parser every
    * template-carrying lineage shares (WordPiece here, the
    * sentencepiece lineage's structurally-identical inline parse, and
    * [[Bpe.loadTokenizerJsonAssembled]] for the byte-level lineage),
    * so the A-only state machine and its refusals cannot drift
    * between loaders. `idOf` resolves a special-token name through
    * the processor's own `special_tokens` table then the caller's
    * vocab.
    */
  private[operators] def parseTemplateProcessing(
      post: com.fasterxml.jackson.databind.JsonNode,
      vocabIdOf: String => Option[Long], path: String)
      : (Seq[Long], Seq[Long], Option[PairTemplate]) = {
    val single = post.get("single")
    require(single != null && single.isArray,
      s"$path TemplateProcessing without a single template")
    val specialIds: Map[String, Long] = {
      val m = Map.newBuilder[String, Long]
      val st = post.get("special_tokens")
      if (st != null && st.isObject) {
        val it = st.fields()
        while (it.hasNext) {
          val e = it.next()
          val ids = e.getValue.get("ids")
          require(ids != null && ids.isArray && ids.size() == 1,
            s"$path template special '${e.getKey}' maps to " +
              "more than one id — not reproducible")
          m += (e.getKey -> ids.get(0).asLong())
        }
      }
      m.result()
    }
    def idOf(name: String): Long =
      specialIds.getOrElse(name, vocabIdOf(name).getOrElse(
        throw new IllegalArgumentException(
          s"$path template names special '$name' with no id")))
    val pre0 = Seq.newBuilder[Long]
    val post0 = Seq.newBuilder[Long]
    var seenA = false
    val it = single.elements()
    while (it.hasNext) {
      val item = it.next()
      if (item.get("SpecialToken") != null) {
        val id = idOf(item.get("SpecialToken").get("id").asText())
        if (seenA) post0 += id else pre0 += id
      } else if (item.get("Sequence") != null) {
        val sid = item.get("Sequence").get("id").asText()
        require(sid == "A" && !seenA,
          s"$path SINGLE template references '$sid' — the " +
            "single form takes exactly one A sequence (the " +
            "pair form is the separate `pair` template)")
        seenA = true
      } else throw new IllegalArgumentException(
        s"$path template item is neither SpecialToken nor " +
          "Sequence")
    }
    require(seenA, s"$path template never references sequence A")
    (pre0.result(), post0.result(),
      parsePairTemplate(post, idOf, path))
  }

  def loadTokenizerJson(spark: SparkSession, path: String)
      : WordPieceTokenizer = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    val tree =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
    val model = tree.get("model")
    require(model != null && model.isObject,
      s"$path has no tokenizer model object")
    val kind = Option(model.get("type")).map(_.asText()).getOrElse("")
    require(kind == "WordPiece",
      s"unsupported tokenizer model type '$kind' in $path — this " +
        "loader reads WordPiece (BERT-class) models; byte-level BPE " +
        "loads through Bpe.loadTokenizerJson, Unigram through " +
        "Unigram.loadTokenizerJson")

    val vocabNode = model.get("vocab")
    require(vocabNode != null && vocabNode.isObject,
      s"$path model.vocab is not a JSON object — not a WordPiece " +
        "serialization")
    val vocab = {
      val b = Seq.newBuilder[(String, Long)]
      val it = vocabNode.fields()
      while (it.hasNext) {
        val e = it.next()
        require(e.getValue.canConvertToLong,
          s"$path vocab id for '${e.getKey}' is not an integer")
        b += ((e.getKey, e.getValue.asLong()))
      }
      b.result()
    }
    require(vocab.map(_._2).distinct.size == vocab.size,
      s"$path carries duplicate token ids")
    val vocabMap = vocab.toMap
    val unkToken = {
      val v = model.get("unk_token")
      require(v != null && v.isTextual,
        s"$path WordPiece model without an unk_token — greedy " +
          "matching is undefined without one")
      v.asText()
    }
    val unkId = vocabMap.getOrElse(unkToken,
      throw new IllegalArgumentException(
        s"$path unk_token '$unkToken' is missing from the vocab"))
    val contPrefix = {
      val v = model.get("continuing_subword_prefix")
      if (v == null || v.isNull) "##" else v.asText()
    }
    val maxChars = {
      val v = model.get("max_input_chars_per_word")
      if (v == null || v.isNull) 100
      else {
        require(v.canConvertToInt && v.asInt() >= 1,
          s"$path max_input_chars_per_word is not a positive integer")
        v.asInt()
      }
    }

    val norm = tree.get("normalizer")
    val (cleanText, handleCjk, stripAccents, lowercase) =
      if (norm == null || norm.isNull) (false, false, false, false)
      else {
        require(Option(norm.get("type")).map(_.asText())
            .contains("BertNormalizer"),
          s"$path carries a normalizer (type '${Option(norm.get("type"))
            .map(_.asText()).getOrElse("?")}') this loader does not " +
            "reproduce — only absent or BertNormalizer is supported " +
            "for WordPiece; refusing to mis-encode")
        def flag(name: String, dflt: Boolean): Boolean = {
          val v = norm.get(name)
          if (v == null || v.isNull) dflt else v.asBoolean(dflt)
        }
        val lc = flag("lowercase", dflt = true)
        // the published default: strip_accents follows lowercase
        // when the file leaves it null
        val sa = {
          val v = norm.get("strip_accents")
          if (v == null || v.isNull) lc else v.asBoolean(lc)
        }
        (flag("clean_text", dflt = true),
          flag("handle_chinese_chars", dflt = true), sa, lc)
      }

    val pre = tree.get("pre_tokenizer")
    require(pre != null && !pre.isNull &&
      Option(pre.get("type")).map(_.asText())
        .contains("BertPreTokenizer"),
      s"$path pre-tokenizer is ${if (pre == null || pre.isNull)
        "absent" else s"'${Option(pre.get("type")).map(_.asText())
          .getOrElse("?")}'"} — WordPiece greedy matching is defined " +
        "over the BertPreTokenizer split (whitespace + punctuation " +
        "isolation); anything else is a different segmentation; " +
        "refusing to mis-encode")

    val post = tree.get("post_processor")
    val (prefixIds, suffixIds, pairTemplate)
        : (Seq[Long], Seq[Long], Option[PairTemplate]) =
      if (post == null || post.isNull) (Seq.empty, Seq.empty, None)
      else Option(post.get("type")).map(_.asText()) match {
        case Some("BertProcessing") =>
          // legacy shape: {"sep": ["[SEP]", id], "cls": ["[CLS]", id]}
          // — its pair form is FIXED by the format:
          // [CLS]:0 A:0 [SEP]:0 B:1 [SEP]:1
          def pairId(name: String): Long = {
            val v = post.get(name)
            require(v != null && v.isArray && v.size() == 2,
              s"$path BertProcessing.$name is not a [token, id] pair")
            v.get(1).asLong()
          }
          val (cls, sep) = (pairId("cls"), pairId("sep"))
          (Seq(cls), Seq(sep),
            Some(PairTemplate(Seq((cls, 0L)), Seq((sep, 0L)),
              Seq((sep, 1L)), typeA = 0L, typeB = 1L)))
        case Some("TemplateProcessing") =>
          parseTemplateProcessing(post, vocabMap.get, path)
        case other => throw new IllegalArgumentException(
          s"$path post-processor type '${other.getOrElse("?")}' is " +
            "not reproducible — only absent, BertProcessing, or " +
            "TemplateProcessing is supported")
      }

    // the `decoder` block — previously IGNORED silently (the last
    // loader-contract gap): verified structurally here. Absent →
    // None (the engine's space-join convention applies). A WordPiece
    // decoder must carry THIS tokenizer's continuation prefix (a
    // different prefix would re-attach the wrong tokens); its
    // `cleanup` flag is recorded — [[decodeColumn]] refuses
    // cleanup=true unless the caller explicitly accepts the
    // space-join form, because the published cleanup post-pass is a
    // convention this engine does not reproduce and silently
    // skipping it would diverge from the source tokenizer's decode
    // on punctuation. Any other decoder type refuses loudly.
    val decoderCleanup: Option[Boolean] = {
      val d = tree.get("decoder")
      if (d == null || d.isNull) None
      else {
        val kind = Option(d.get("type")).map(_.asText()).getOrElse("?")
        require(kind == "WordPiece",
          s"$path decoder type '$kind' is not the WordPiece " +
            "space-join convention this engine decodes with; " +
            "refusing to silently decode differently")
        val pfx = Option(d.get("prefix")).filterNot(_.isNull)
          .map(_.asText()).getOrElse("##")
        require(pfx == contPrefix,
          s"$path decoder prefix '$pfx' differs from the model's " +
            s"continuing_subword_prefix '$contPrefix' — the file " +
            "contradicts itself; refusing to guess")
        // the published default when the flag is absent is cleanup
        // ON — resolving absent to false would silently diverge
        Some(Option(d.get("cleanup")).filterNot(_.isNull)
          .map(_.asBoolean(true)).getOrElse(true))
      }
    }
    WordPieceTokenizer(vocab, unkId, contPrefix, maxChars, cleanText,
      handleCjk, stripAccents, lowercase, prefixIds, suffixIds,
      pairTemplate,
      TokenizerTruncation.parseTruncation(tree, path),
      TokenizerTruncation.parsePadding(tree, path, vocabMap.get),
      decoderCleanup)
  }

  /** Export a loaded WordPiece tokenizer back to the single-file
    * `tokenizer.json` serialization — save→load identity
    * (spec-asserted). The normalizer re-emits as a BertNormalizer
    * when any stage is on (strip_accents written EXPLICITLY so the
    * null-follows-lowercase default cannot re-resolve differently),
    * the pre-tokenizer is always BertPreTokenizer (the load
    * requirement), and templates re-emit as single-sequence
    * TemplateProcessing.
    */
  def saveTokenizerJson(spark: SparkSession, tok: WordPieceTokenizer,
      path: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", "1.0")
    TokenizerTruncation.emitTruncation(mapper, root, tok.truncation)
    TokenizerTruncation.emitPadding(mapper, root, tok.padding,
      id => tok.vocab.find(_._2 == id).map(_._1))
    if (!tok.cleanText && !tok.handleChineseChars &&
        !tok.stripAccents && !tok.lowercase)
      root.putNull("normalizer")
    else {
      val n = mapper.createObjectNode()
      n.put("type", "BertNormalizer")
      n.put("clean_text", tok.cleanText)
      n.put("handle_chinese_chars", tok.handleChineseChars)
      n.put("strip_accents", tok.stripAccents)
      n.put("lowercase", tok.lowercase)
      root.set[com.fasterxml.jackson.databind.JsonNode]("normalizer", n)
    }
    val pre = mapper.createObjectNode()
    pre.put("type", "BertPreTokenizer")
    root.set[com.fasterxml.jackson.databind.JsonNode]("pre_tokenizer",
      pre)
    if (tok.prefixIds.isEmpty && tok.suffixIds.isEmpty &&
        tok.pair.isEmpty)
      root.putNull("post_processor")
    else {
      emitTemplateProcessing(mapper, root, tok.prefixIds,
        tok.suffixIds, tok.pair, tok.vocab.map(_.swap).toMap)
    }
    tok.decoderCleanup match {
      case None => root.putNull("decoder")
      case Some(cu) =>
        val d = mapper.createObjectNode()
        d.put("type", "WordPiece")
        d.put("prefix", tok.contPrefix)
        d.put("cleanup", cu)
        root.set[com.fasterxml.jackson.databind.JsonNode]("decoder",
          d)
    }
    val model = mapper.createObjectNode()
    model.put("type", "WordPiece")
    val unkTok = tok.vocab.find(_._2 == tok.unkId).map(_._1)
      .getOrElse(throw new IllegalStateException(
        s"unk id ${tok.unkId} has no vocab entry"))
    model.put("unk_token", unkTok)
    model.put("continuing_subword_prefix", tok.contPrefix)
    model.put("max_input_chars_per_word", tok.maxInputCharsPerWord)
    val vocab = mapper.createObjectNode()
    tok.vocab.foreach { case (t, i) => vocab.put(t, i) }
    model.set[com.fasterxml.jackson.databind.JsonNode]("vocab", vocab)
    root.set[com.fasterxml.jackson.databind.JsonNode]("model", model)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
    finally out.close()
  }

  /** Emit a single+pair TemplateProcessing post-processor node from
    * loaded template state — the ONE emitter every template-carrying
    * save shares (WordPiece, Unigram's structurally-identical
    * emitter, [[Bpe.saveTokenizerJsonAssembled]]), the
    * [[parseTemplateProcessing]] inverse: load(save(tok)) carries
    * identical template ids (spec-asserted per lineage).
    */
  private[operators] def emitTemplateProcessing(
      mapper: com.fasterxml.jackson.databind.ObjectMapper,
      root: com.fasterxml.jackson.databind.node.ObjectNode,
      prefixIds: Seq[Long], suffixIds: Seq[Long],
      pair: Option[PairTemplate], idToTok: Map[Long, String]): Unit = {
    val post = mapper.createObjectNode()
    post.put("type", "TemplateProcessing")
    val specials = mapper.createObjectNode()
    def specialItem(arr: com.fasterxml.jackson.databind.node.ArrayNode,
        id: Long, typeId: Long): Unit = {
      val name = idToTok.getOrElse(id, s"<special:$id>")
      val it = mapper.createObjectNode()
      val st = mapper.createObjectNode()
      st.put("id", name); st.put("type_id", typeId)
      it.set[com.fasterxml.jackson.databind.JsonNode](
        "SpecialToken", st)
      arr.add(it)
      if (!specials.has(name)) {
        val entry = mapper.createObjectNode()
        entry.put("id", name)
        val ids = mapper.createArrayNode(); ids.add(id)
        entry.set[com.fasterxml.jackson.databind.JsonNode]("ids",
          ids)
        val toks = mapper.createArrayNode(); toks.add(name)
        entry.set[com.fasterxml.jackson.databind.JsonNode]("tokens",
          toks)
        specials.set[com.fasterxml.jackson.databind.JsonNode](name,
          entry)
      }
    }
    def seqItem(arr: com.fasterxml.jackson.databind.node.ArrayNode,
        name: String, typeId: Long): Unit = {
      val it = mapper.createObjectNode()
      val ref = mapper.createObjectNode()
      ref.put("id", name); ref.put("type_id", typeId)
      it.set[com.fasterxml.jackson.databind.JsonNode]("Sequence",
        ref)
      arr.add(it)
    }
    val single = mapper.createArrayNode()
    prefixIds.foreach(specialItem(single, _, 0L))
    seqItem(single, "A", 0L)
    suffixIds.foreach(specialItem(single, _, 0L))
    post.set[com.fasterxml.jackson.databind.JsonNode]("single",
      single)
    pair.foreach { pt =>
      val pairArr = mapper.createArrayNode()
      pt.pre.foreach { case (id, ty) => specialItem(pairArr, id, ty) }
      seqItem(pairArr, "A", pt.typeA)
      pt.mid.foreach { case (id, ty) => specialItem(pairArr, id, ty) }
      seqItem(pairArr, "B", pt.typeB)
      pt.post.foreach { case (id, ty) => specialItem(pairArr, id, ty) }
      post.set[com.fasterxml.jackson.databind.JsonNode]("pair",
        pairArr)
    }
    post.set[com.fasterxml.jackson.databind.JsonNode](
      "special_tokens", specials)
    root.set[com.fasterxml.jackson.databind.JsonNode](
      "post_processor", post)
  }

  /** The encode column: the compiled kernel, truncated to the
    * `truncation` block's content budget when the file carries one,
    * plus the template's fixed ids, padded to the `padding` block's
    * Fixed length when set. Zero shuffles.
    */
  /** Truncated content + template, UNPADDED — the pre-padding view
    * [[encodeColumn]] pads and [[encodeWithMask]] masks from.
    */
  private def assembledColumn(text: Column, tok: WordPieceTokenizer)
      : Column = {
    val core0 = graft.expressions.GraftFunctions.wordPieceEncode(
      text, tok)
    val core = tok.truncation match {
      case Some(t) => TokenizerTruncation.truncateSingle(core0, t,
        tok.prefixIds.size + tok.suffixIds.size)
      case None => core0
    }
    if (tok.prefixIds.isEmpty && tok.suffixIds.isEmpty) core
    else concat(typedLit(tok.prefixIds), core,
      typedLit(tok.suffixIds))
  }

  def encodeColumn(text: Column, tok: WordPieceTokenizer): Column = {
    val full = assembledColumn(text, tok)
    tok.padding match {
      case Some(p) => TokenizerTruncation.pad(full, p, p.padId)
      case None => full
    }
  }

  /** Distributed encode WITH the attention mask: `(idCol, token_ids,
    * attention_mask)` — the mask is POSITIONAL (1 for every
    * pre-padding position, 0 for pads, honoring the padding
    * direction), computed from the unpadded assembly materialized
    * once behind an intermediate projection — NEVER by matching
    * pad_id values, which would zero real tokens in files whose pad
    * id collides with a content id (`[UNK]`-as-pad). Without a
    * padding block the mask is all ones. Zero shuffles.
    */
  def encodeWithMask(df: DataFrame, idCol: String, textCol: String,
      tok: WordPieceTokenizer): DataFrame = {
    val enc = df.select(col(idCol),
      assembledColumn(col(textCol), tok).as("_graft_ids"))
    enc.select(col(idCol),
      (tok.padding match {
        case Some(p) =>
          TokenizerTruncation.pad(col("_graft_ids"), p, p.padId)
        case None => col("_graft_ids")
      }).as("token_ids"),
      TokenizerTruncation.attentionMask(col("_graft_ids"),
        tok.padding).as("attention_mask"))
  }

  /** Distributed encode: `(idCol, token_ids)` — zero-shuffle. */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
      tok: WordPieceTokenizer): DataFrame =
    df.select(col(idCol),
      encodeColumn(col(textCol), tok).as("token_ids"))

  /** Every fixed id any of the tokenizer's templates can emit —
    * the decode-time skip set.
    */
  private def templateIds(tok: WordPieceTokenizer): Seq[Long] =
    (tok.prefixIds ++ tok.suffixIds ++ tok.pair.toSeq.flatMap(pt =>
      (pt.pre ++ pt.mid ++ pt.post).map(_._1))).distinct

  /** The decode column — the published `decoders.WordPiece` join
    * convention (space-join, continuation prefix attaches), template
    * ids (single AND pair) dropped by default. Zero shuffles. Decode
    * is lossy across the Bert normalizer (case/accents/whitespace
    * discarded by the ENCODE); on pre-normalized in-coverage text
    * decode ∘ encode is the identity — the x124 oracle's statement.
    *
    * A tokenizer whose file carries a `cleanup = true` decoder block
    * decodes through the reference decoder's cleanup chain
    * ([[graft.expressions.WordPieceDecodeIds.cleanupChain]] — the
    * punctuation/contraction re-attachment replaces, applied in the
    * published order, quirks included), so decode matches the source
    * tokenizer on punctuation too — oracle-checked by x138, which
    * restates the ENTIRE chain as SQL `replace` calls. Pass
    * `acceptSpaceJoin = true` to take the PRE-cleanup space-join
    * form knowingly (the raw join, useful when downstream tooling
    * does its own detokenization).
    */
  def decodeColumn(ids: Column, tok: WordPieceTokenizer,
      skipTemplateIds: Boolean = true,
      acceptSpaceJoin: Boolean = false): Column =
    graft.expressions.GraftFunctions.wordPieceDecode(ids, tok,
      if (skipTemplateIds) templateIds(tok) else Seq.empty,
      cleanup = tok.decoderCleanup.contains(true) && !acceptSpaceJoin)

  /** Assemble the pair (token_ids, type_ids) from two ALREADY
    * MATERIALIZED content encodes — the one home for the template /
    * truncation arithmetic, shared by [[encodePair]] /
    * [[encodePairColumns]] / [[encodePairWithMask]] AND the Unigram
    * pair surface ([[Unigram.encodePair]]) — the assembly is
    * lineage-independent once the content encodes exist.
    */
  private[operators] def pairAssembled(ea: Column, eb: Column,
      trunc: Option[TokenizerTruncation.Truncation],
      pt: PairTemplate): (Column, Column) = {
    val nTemplate = pt.pre.size + pt.mid.size + pt.post.size
    val (ka, kb) = trunc match {
      case Some(t) =>
        val budget = TokenizerTruncation.contentBudget(t, nTemplate)
        val (fa, fb) = TokenizerTruncation.pairKeepLengths(
          size(ea), size(eb), budget, t.strategy)
        (TokenizerTruncation.keepSeq(ea, fa, t.direction),
          TokenizerTruncation.keepSeq(eb, fb, t.direction))
      case None => (ea, eb)
    }
    val ids = concat(typedLit(pt.pre.map(_._1)), ka,
      typedLit(pt.mid.map(_._1)), kb, typedLit(pt.post.map(_._1)))
    val types = concat(typedLit(pt.pre.map(_._2)),
      array_repeat(lit(pt.typeA), size(ka)),
      typedLit(pt.mid.map(_._2)),
      array_repeat(lit(pt.typeB), size(kb)),
      typedLit(pt.post.map(_._2)))
    (ids, types)
  }

  /** Apply the Fixed padding block (when set) to an assembled pair. */
  private def padPair(ids: Column, types: Column,
      tok: WordPieceTokenizer): (Column, Column) =
    tok.padding match {
      case Some(p) => (TokenizerTruncation.pad(ids, p, p.padId),
        TokenizerTruncation.pad(types, p, p.padTypeId))
      case None => (ids, types)
    }

  private def requirePair(tok: WordPieceTokenizer): PairTemplate =
    tok.pair.getOrElse(throw new IllegalArgumentException(
      "this tokenizer defines no PAIR template — single-sequence " +
        "encode is encodeColumn; refusing to fabricate segment " +
        "structure for a two-sequence input"))

  /** PAIR encode — the BERT two-sequence form: `(token_ids,
    * type_ids)` under the tokenizer's pair template (`[CLS] $A [SEP]
    * $B:1 [SEP]:1` and friends): fixed (id, type) tokens around and
    * between the two content encodes, content tokens carrying the
    * template's A/B type ids, truncation applied to the CONTENT
    * under the published longest-first / only-first / only-second
    * rules, Fixed padding after the template — exactly what an
    * NSP-style or sentence-pair training pipeline feeds the model.
    * Refuses LOUDLY when the tokenizer defines no pair template
    * (encoding a pair under a single-sequence template would
    * silently fabricate segment structure). Pure projection — zero
    * shuffles.
    *
    * NOTE: both returned columns reference the two encode kernels
    * directly, so a consumer projecting both may evaluate each
    * O(len²) encode more than once unless codegen subexpression
    * elimination fuses them — [[encodePair]] is the production path:
    * it materializes the encodes once behind an intermediate
    * projection the optimizer will not inline (non-cheap aliases
    * referenced more than once are never collapsed).
    */
  def encodePairColumns(a: Column, b: Column,
      tok: WordPieceTokenizer): (Column, Column) = {
    val (ids, types) = pairAssembled(
      graft.expressions.GraftFunctions.wordPieceEncode(a, tok),
      graft.expressions.GraftFunctions.wordPieceEncode(b, tok),
      tok.truncation, requirePair(tok))
    padPair(ids, types, tok)
  }

  /** Distributed pair encode: `(idCol, token_ids, type_ids)`. The
    * two content encodes land in an intermediate projection first,
    * so each O(len²) kernel runs exactly ONCE per row no matter how
    * many times the assembly arithmetic references it.
    */
  def encodePair(df: DataFrame, idCol: String, aCol: String,
      bCol: String, tok: WordPieceTokenizer): DataFrame = {
    val pt = requirePair(tok)
    val enc = df.select(col(idCol),
      graft.expressions.GraftFunctions.wordPieceEncode(col(aCol), tok)
        .as("_graft_ea"),
      graft.expressions.GraftFunctions.wordPieceEncode(col(bCol), tok)
        .as("_graft_eb"))
    val (ids, types) = pairAssembled(col("_graft_ea"),
      col("_graft_eb"), tok.truncation, pt)
    val (pids, ptypes) = padPair(ids, types, tok)
    enc.select(col(idCol), pids.as("token_ids"),
      ptypes.as("type_ids"))
  }

  /** [[encodePair]] plus the attention mask: `(idCol, token_ids,
    * type_ids, attention_mask)` — mask positional from the unpadded
    * assembly (see [[encodeWithMask]] for why never value-matched),
    * materialized once behind a second intermediate projection.
    */
  def encodePairWithMask(df: DataFrame, idCol: String, aCol: String,
      bCol: String, tok: WordPieceTokenizer): DataFrame = {
    val pt = requirePair(tok)
    val enc = df.select(col(idCol),
      graft.expressions.GraftFunctions.wordPieceEncode(col(aCol), tok)
        .as("_graft_ea"),
      graft.expressions.GraftFunctions.wordPieceEncode(col(bCol), tok)
        .as("_graft_eb"))
    val (ids, types) = pairAssembled(col("_graft_ea"),
      col("_graft_eb"), tok.truncation, pt)
    val mid = enc.select(col(idCol), ids.as("_graft_ids"),
      types.as("_graft_types"))
    val (pids, ptypes) = padPair(col("_graft_ids"),
      col("_graft_types"), tok)
    mid.select(col(idCol), pids.as("token_ids"),
      ptypes.as("type_ids"),
      TokenizerTruncation.attentionMask(col("_graft_ids"),
        tok.padding).as("attention_mask"))
  }

  /** The encode-with-OFFSETS column: `(id, start, end)` structs,
    * spans in code points into the normalized text (see
    * [[graft.expressions.WordPieceEncodeOffsets]] for the exact
    * convention and its documented divergence from the reference's
    * original-string byte offsets). Template specials carry the
    * published (0, 0) span; truncation and Fixed padding apply to
    * this surface exactly as to [[encodeColumn]] (pad entries are
    * `(pad_id, 0, 0)`). Zero shuffles.
    */
  def encodeOffsetsColumn(text: Column, tok: WordPieceTokenizer)
      : Column = {
    def fixed(ids: Seq[Long]): Column = array(ids.map(id =>
      struct(lit(id).as("id"), lit(0).as("start"),
        lit(0).as("end"))): _*)
    val core0 =
      graft.expressions.GraftFunctions.wordPieceEncodeOffsets(text,
        tok)
    val core = tok.truncation match {
      case Some(t) => TokenizerTruncation.truncateSingle(core0, t,
        tok.prefixIds.size + tok.suffixIds.size)
      case None => core0
    }
    val full =
      if (tok.prefixIds.isEmpty && tok.suffixIds.isEmpty) core
      else concat(fixed(tok.prefixIds), core, fixed(tok.suffixIds))
    tok.padding match {
      case Some(p) =>
        val padRow = struct(lit(p.padId).as("id"),
          lit(0).as("start"), lit(0).as("end"))
        val fill = array_repeat(padRow, lit(p.length) - size(full))
        when(size(full) >= p.length, full).otherwise(
          if (p.direction == "left") concat(fill, full)
          else concat(full, fill))
      case None => full
    }
  }

  /** Distributed encode with offsets: `(idCol, tokens)` where
    * `tokens` is the `(id, start, end)` struct array — the span
    * surface PII token-masking and contamination span reporting
    * consume. The kernel lands in an intermediate projection so
    * consumers referencing it repeatedly never re-run the O(len²)
    * matcher.
    */
  def encodeWithOffsets(df: DataFrame, idCol: String,
      textCol: String, tok: WordPieceTokenizer): DataFrame =
    df.select(col(idCol),
      encodeOffsetsColumn(col(textCol), tok).as("tokens"))

  /** Distributed decode: `(idCol, text)` — [[encodeIds]]'s inverse
    * shape (template ids dropped).
    */
  def decodeIdsDf(df: DataFrame, idCol: String, idsCol: String,
      tok: WordPieceTokenizer): DataFrame =
    df.select(col(idCol), decodeColumn(col(idsCol), tok).as("text"))

  // ---- training -----------------------------------------------------

  /** The trainer's corpus view: Bert pre-tokens (the SAME compiled
    * [[graft.expressions.BertPreTokens]] pipeline the encode kernel
    * runs — histogram and encoder can never drift) → (word, weight).
    * One distributed shuffle, vocabulary-sized result.
    */
  def wordHistogram(df: DataFrame, textCol: String,
      cleanText: Boolean = true, handleChineseChars: Boolean = true,
      stripAccents: Option[Boolean] = None, lowercase: Boolean = true)
      : DataFrame =
    df.select(explode(graft.expressions.GraftFunctions.bertPreTokens(
        col(textCol), cleanText, handleChineseChars,
        stripAccents.getOrElse(lowercase), lowercase)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("weight"))

  /** Train a WordPiece vocabulary from a raw corpus — the published
    * wordcount builder (the HF `WordPieceTrainer` algorithm): words
    * split into a word-start symbol plus `contPrefix`-marked
    * continuations; merges pick the pair maximizing the LIKELIHOOD
    * score `count(pair) / (count(left) · count(right))` (the
    * WordPiece criterion — BPE's raw-count argmax is [[Bpe.train]]'s
    * job), merged token = left + right-minus-prefix, until the
    * vocabulary reaches `vocabSize` or no pair has
    * `count ≥ minFrequency`. Ids are insertion order: specials, the
    * corpus alphabet (sorted), then merges — the HF layout.
    * Deterministic: score ties compare EXACTLY (cross-multiplied
    * integers, never floats) and then break (left, right) ascending,
    * so training is a pure function of the corpus. (HF's own heap
    * order is insertion-dependent on exact ties; the engine pins a
    * total order instead — documented divergence, fixture-pinned.)
    *
    * Scale shape, the [[Bpe.train]] split: the corpus-sized work (the
    * pre-token histogram and the alphabet scan) is DISTRIBUTED; the
    * merge loop runs on the driver over the collected histogram when
    * it fits `maxDriverWords` (≈0.5 GB heap per 10⁶ distinct words),
    * and falls back to the DISTRIBUTED per-merge loop above the
    * bound — loudly (the ~10⁵× per-merge latency cliff is warned
    * with the exact heap arithmetic and the `histogramMinCount`
    * lever), with `maxDriverWords = 0` forcing it (the spec device
    * proving both homes pick identical merge sequences). The
    * ALPHABET always comes from the FULL histogram (never pruned), so
    * a trained tokenizer covers every character the corpus contains —
    * no word can go unk for coverage reasons; `histogramMinCount > 1`
    * only thins the MERGE statistics (documented approximation:
    * pair mass from sub-threshold words is ignored).
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      minFrequency: Long = 2L,
      specials: Seq[String] = Seq("[UNK]"),
      unkToken: String = "[UNK]", contPrefix: String = "##",
      maxInputCharsPerWord: Int = 100,
      cleanText: Boolean = true, handleChineseChars: Boolean = true,
      stripAccents: Option[Boolean] = None, lowercase: Boolean = true,
      histogramMinCount: Long = 1L,
      maxDriverWords: Long = 1000000L,
      maxTieWindow: Int = 100000): WordPieceTokenizer = {
    require(maxTieWindow >= 1,
      s"maxTieWindow must be >= 1: $maxTieWindow")
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    require(minFrequency >= 1,
      s"minFrequency must be >= 1: $minFrequency")
    require(histogramMinCount >= 1,
      s"histogramMinCount must be >= 1: $histogramMinCount")
    require(specials.contains(unkToken),
      s"unkToken '$unkToken' must be among the specials " +
        s"${specials.mkString("[", ", ", "]")}")
    require(specials.distinct == specials,
      s"duplicate specials: ${specials.mkString(", ")}")
    val sa = stripAccents.getOrElse(lowercase)
    val hist = wordHistogram(df, textCol, cleanText,
      handleChineseChars, Some(sa), lowercase).localCheckpoint()
    // the alphabet from the FULL histogram — full character coverage
    // regardless of any merge-side pruning; char-sized result
    val firstSyms = hist
      .select(regexp_extract(col("word"), "^.", 0).as("sym"))
      .distinct()
    val contSyms = hist
      .select(explode(regexp_extract_all(
        regexp_replace(col("word"), "^.", ""), lit("."), lit(0)))
        .as("ch"))
      .distinct()
      .select(concat(lit(contPrefix), col("ch")).as("sym"))
    val alphabet = firstSyms.union(contSyms).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val pruned =
      if (histogramMinCount <= 1L) hist
      else hist.filter(col("weight") >= histogramMinCount)
    val n = pruned.count()
    // the Bpe.train dispatch: in-memory driver loop when the
    // histogram fits, the distributed per-merge loop otherwise
    // (maxDriverWords = 0 forces it — the spec device proving both
    // homes identical); crossing the cliff is VISIBLE, never silent
    val tokens =
      if (n <= maxDriverWords && maxDriverWords > 0) {
        val rows = pruned.select(col("word"), col("weight")).collect()
          .map(r => (r.getString(0), r.getLong(1)))
        trainDriver(rows, alphabet, vocabSize, minFrequency,
          specials, contPrefix)
      } else {
        if (maxDriverWords > 0)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"WordPiece histogram has $n distinct words > " +
              s"maxDriverWords=$maxDriverWords; using the " +
              "DISTRIBUTED merge loop (~4 Spark jobs per merge). " +
              "Raising maxDriverWords to cover it costs " +
              f"~${n / 1e6 * 0.5}%.1f GB of driver heap and keeps " +
              "training in-memory; histogramMinCount prunes the " +
              "rare-word tail first.")
        trainDistributed(pruned, alphabet, vocabSize, minFrequency,
          specials, contPrefix, maxTieWindow)
      }
    val unkId = tokens.indexOf(unkToken).toLong
    WordPieceTokenizer(
      tokens.zipWithIndex.map { case (t, i) => (t, i.toLong) },
      unkId, contPrefix, maxInputCharsPerWord, cleanText,
      handleChineseChars, sa, lowercase, Seq.empty, Seq.empty)
  }

  /** The driver merge loop — package-private so the spec can pin the
    * hand-computed likelihood argmax directly. Returns the token list
    * in id order: specials, alphabet (as given), then merges.
    */
  private[graft] def trainDriver(histRows: Array[(String, Long)],
      alphabet: Seq[String], vocabSize: Int, minFrequency: Long,
      specials: Seq[String], contPrefix: String): Seq[String] = {
    import scala.collection.mutable

    def codePoints(w: String): Array[String] = {
      val b = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + n)
        i += n
      }
      b.result()
    }
    def splitWord(w: String): Array[String] = {
      val cps = codePoints(w)
      var i = 1
      while (i < cps.length) { cps(i) = contPrefix + cps(i); i += 1 }
      cps
    }

    val syms: Array[Array[String]] = histRows.map(r => splitWord(r._1))
    val weights: Array[Long] = histRows.map(_._2)
    val symCount = mutable.HashMap.empty[String, Long]
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords =
      mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]

    def addWord(wi: Int): Unit = {
      val s = syms(wi); val w = weights(wi)
      var i = 0
      while (i < s.length) {
        symCount.updateWith(s(i))(c => Some(c.getOrElse(0L) + w))
        if (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          pairCount.updateWith(p)(c => Some(c.getOrElse(0L) + w))
          pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
        }
        i += 1
      }
    }
    def removeWord(wi: Int): Unit = {
      val s = syms(wi); val w = weights(wi)
      var i = 0
      while (i < s.length) {
        val left = symCount(s(i)) - w
        if (left == 0L) symCount.remove(s(i)) else symCount(s(i)) = left
        if (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          val c = pairCount(p) - w
          if (c == 0L) { pairCount.remove(p); pairWords.remove(p) }
          else { pairCount(p) = c; pairWords.get(p).foreach(_ -= wi) }
        }
        i += 1
      }
    }
    def mergeSyms(s: Array[String], l: String, r: String,
        merged: String): Array[String] = {
      val b = Array.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
          b += merged; i += 2
        } else { b += s(i); i += 1 }
      }
      b.result()
    }

    var wi = 0
    while (wi < syms.length) { addWord(wi); wi += 1 }

    val vocab = mutable.ArrayBuffer.empty[String]
    val seen = mutable.HashSet.empty[String]
    (specials ++ alphabet).foreach(t => if (seen.add(t)) vocab += t)
    require(vocab.size <= vocabSize,
      s"vocabSize $vocabSize cannot hold the ${specials.size} " +
        s"specials + ${alphabet.size}-symbol corpus alphabet " +
        s"(${vocab.size} tokens before any merge) — raise vocabSize")

    var continue = true
    while (vocab.size < vocabSize && continue) {
      // the likelihood argmax: count(pair) / (count(l)·count(r)).
      // Scan once with cheap doubles to find the ceiling, then hand
      // the near-tie window to the EXACT selector shared with the
      // distributed home ([[argmaxPair]]). Equal rationals always
      // land on equal doubles, so no true tie can escape the window;
      // the epsilon only admits false candidates for the exact pass
      // to reject.
      var ceil = -1.0
      pairCount.foreach { case (p, c) =>
        if (c >= minFrequency) {
          val s = c.toDouble /
            (symCount(p._1).toDouble * symCount(p._2).toDouble)
          if (s > ceil) ceil = s
        }
      }
      val window = Seq.newBuilder[(String, String, Long, Long, Long)]
      if (ceil >= 0.0) {
        val floor = ceil * (1.0 - 1e-12)
        pairCount.foreach { case (p, c) =>
          if (c >= minFrequency) {
            val l = symCount(p._1); val r = symCount(p._2)
            if (c.toDouble / (l.toDouble * r.toDouble) >= floor)
              window += ((p._1, p._2, c, l, r))
          }
        }
      }
      argmaxPair(window.result()) match {
        case None => continue = false
        case Some((bl, br, _)) =>
          val best = (bl, br)
          val merged = mergedToken(bl, br, contPrefix)
          // two merge paths can produce the same string (a+##bc and
          // ab+##c both yield "abc") — the id is assigned once, the
          // rewrite still happens
          if (seen.add(merged)) vocab += merged
          val affected = pairWords.get(best).map(_.toArray)
            .getOrElse(Array.empty[Int])
          affected.foreach { w =>
            removeWord(w)
            syms(w) = mergeSyms(syms(w), best._1, best._2, merged)
            addWord(w)
          }
      }
    }
    vocab.toSeq
  }

  /** The DISTRIBUTED merge loop — the [[Bpe.trainDistributed]] shape
    * for likelihood scores: the histogram never leaves the cluster;
    * each merge runs pair counts + symbol counts (vocab-sized aggs),
    * joins the likelihood score, pulls only the NEAR-TIE WINDOW of
    * the double-score maximum to the driver, and selects exactly via
    * the shared [[argmaxPair]] — so this home and the driver loop
    * provably pick the same merge sequence (spec-asserted on the
    * fixture corpus with `maxDriverWords = 0`). ~4 Spark jobs per
    * merge — the documented ~10⁵× per-merge latency cliff vs the
    * in-memory loop; it exists for histograms the driver heap cannot
    * hold, not for speed.
    *
    * The window collect is BOUNDED by `maxTieWindow` (the maxStrata
    * idiom): on a pathological corpus where a corpus-sized set of
    * pairs shares the exact maximum score, a naive collect would be
    * corpus-sized — instead the loop refuses LOUDLY at the cap (the
    * exact argmax is undecidable without the full tie set, and
    * guessing would silently fork the two homes' merge sequences).
    * Superseded `localCheckpoint` generations are unpersisted
    * explicitly ([[graft.core.Checkpoints.release]]) so the block
    * manager holds at most two histogram generations at any moment,
    * not one per completed merge.
    */
  private def trainDistributed(hist: DataFrame, alphabet: Seq[String],
      vocabSize: Int, minFrequency: Long, specials: Seq[String],
      contPrefix: String, maxTieWindow: Int): Seq[String] = {
    def quote(s: String): String = java.util.regex.Pattern.quote(s)
    def quoteRepl(s: String): String =
      java.util.regex.Matcher.quoteReplacement(s)
    // padded symbol string " h ##u ##g " — word-start char bare,
    // continuations prefixed; the space-joined form one regexp pass
    // per merge can rewrite (the Bpe.applyMerge idiom)
    val restSyms = transform(
      regexp_extract_all(regexp_replace(col("word"), "^.", ""),
        lit("."), lit(0)),
      ch => concat(lit(contPrefix), ch))
    var h = hist.select(col("weight"),
      concat(lit(" "), array_join(
        concat(array(regexp_extract(col("word"), "^.", 0)), restSyms),
        " "), lit(" ")).as("syms"))
      .localCheckpoint()

    val vocab = scala.collection.mutable.ArrayBuffer.empty[String]
    val seen = scala.collection.mutable.HashSet.empty[String]
    (specials ++ alphabet).foreach(t => if (seen.add(t)) vocab += t)
    require(vocab.size <= vocabSize,
      s"vocabSize $vocabSize cannot hold the ${specials.size} " +
        s"specials + ${alphabet.size}-symbol corpus alphabet " +
        s"(${vocab.size} tokens before any merge) — raise vocabSize")

    var continue = true
    while (vocab.size < vocabSize && continue) {
      val symArr = split(trim(col("syms")), " ")
      val symCounts = h
        .select(explode(symArr).as("sym"), col("weight"))
        .groupBy(col("sym")).agg(sum(col("weight")).as("scnt"))
      val pairCounts = h
        .select(col("weight"), symArr.as("a"))
        .select(col("weight"), col("a"),
          posexplode(col("a")).as(Seq("i", "left")))
        .withColumn("right", try_element_at(col("a"), col("i") + 2))
        .filter(col("right").isNotNull)
        .groupBy(col("left"), col("right"))
        .agg(sum(col("weight")).as("pc"))
        .filter(col("pc") >= minFrequency)
      val scored = pairCounts
        .join(broadcast(symCounts
          .withColumnRenamed("sym", "left")
          .withColumnRenamed("scnt", "lc")), Seq("left"))
        .join(broadcast(symCounts
          .withColumnRenamed("sym", "right")
          .withColumnRenamed("scnt", "rc")), Seq("right"))
        .withColumn("score", col("pc").cast("double") /
          (col("lc").cast("double") * col("rc").cast("double")))
        .localCheckpoint()
      val mx = scored.agg(max(col("score"))).head()
      if (mx.isNullAt(0)) continue = false
      else {
        // only the double-score near-tie window reaches the driver —
        // BOUNDED: limit(cap + 1) and refuse loudly on saturation
        // (an all-tie corpus makes the window the entire pair table;
        // a truncated window could pick a different exact winner
        // than the driver home, a silent fork this loop refuses)
        val window = scored
          .filter(col("score") >= mx.getDouble(0) * (1.0 - 1e-12))
          .select(col("left"), col("right"), col("pc"), col("lc"),
            col("rc"))
          .limit(maxTieWindow + 1)
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSeq
        if (window.size > maxTieWindow)
          throw new IllegalStateException(
            s"WordPiece distributed merge loop: more than " +
              s"maxTieWindow=$maxTieWindow pairs tie at the maximum " +
              "likelihood score (a near-uniform corpus — every pair " +
              "equally likely). Collecting the full tie set would " +
              "be corpus-sized; refusing. Raise maxTieWindow to " +
              "cover the tie set, prune the histogram with " +
              "histogramMinCount, or raise maxDriverWords so the " +
              "in-memory loop (which holds all pairs anyway) " +
              "handles this corpus.")
        argmaxPair(window) match {
          case None => continue = false
          case Some((l, r, _)) =>
            val merged = mergedToken(l, r, contPrefix)
            if (seen.add(merged)) vocab += merged
            val prev = h
            h = h.withColumn("syms", regexp_replace(col("syms"),
              s"(?<= )${quote(l)} ${quote(r)}(?= )",
              quoteRepl(merged))).localCheckpoint()
            graft.core.Checkpoints.release(prev)
        }
      }
      graft.core.Checkpoints.release(scored)
    }
    vocab.toSeq
  }

  /** left + right-minus-continuation-prefix — the published merged
    * token shape, shared by both merge-loop homes.
    */
  private def mergedToken(l: String, r: String,
      contPrefix: String): String =
    l + (if (contPrefix.nonEmpty && r.startsWith(contPrefix))
           r.substring(contPrefix.length)
         else r)

  /** The EXACT likelihood argmax over a candidate window — shared by
    * the driver loop and the distributed loop so the two homes can
    * never disagree: the winner maximizes count/(lc·rc) compared via
    * BigInt cross-multiplication (counts can overflow a Long
    * product), ties broken (left, right) ascending. Input tuples are
    * (left, right, pairCount, leftCount, rightCount).
    */
  private[graft] def argmaxPair(
      cands: Seq[(String, String, Long, Long, Long)])
      : Option[(String, String, Long)] = {
    var best: (String, String, Long, Long, Long) = null
    cands.foreach { cand =>
      val better =
        if (best == null) true
        else {
          val lhs = BigInt(cand._3) * BigInt(best._4) * BigInt(best._5)
          val rhs = BigInt(best._3) * BigInt(cand._4) * BigInt(cand._5)
          if (lhs != rhs) lhs > rhs
          else {
            val cl = cand._1.compareTo(best._1)
            if (cl != 0) cl < 0 else cand._2.compareTo(best._2) < 0
          }
        }
      if (better) best = cand
    }
    Option(best).map(b => (b._1, b._2, b._3))
  }
}
