package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.operators.WordPiece
import org.apache.spark.sql.functions._

/** WordPiece (BERT-class) tokenizer: hand-computed greedy
  * longest-match fixtures pin the encode semantics, the Bert
  * normalizer/pre-tokenizer stages are exercised one by one, and the
  * loader's rejection matrix refuses what the engine cannot
  * reproduce — the UnigramSpec pattern for the third lineage.
  */
class WordPieceSpec extends SparkSpec {

  private def writeJson(body: String): String = {
    val f = Files.createTempFile("graft_wordpiece", ".json")
    Files.write(f, body.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  private val baseVocab =
    """{"[UNK]": 0, "[CLS]": 1, "[SEP]": 2, "the": 3, "cat": 4,
      | "un": 5, "##aff": 6, "##able": 7, "##s": 8, "a": 9,
      | "cafe": 10, ",": 11, "中": 12, "play": 13, "##ing": 14}"""
      .stripMargin

  private def tokJson(vocab: String = baseVocab,
      normalizer: String =
        """{"type": "BertNormalizer", "clean_text": true,
          | "handle_chinese_chars": true, "strip_accents": null,
          | "lowercase": true}""".stripMargin,
      preTokenizer: String = """{"type": "BertPreTokenizer"}""",
      postProcessor: String = "null",
      maxChars: String = "100",
      decoder: String = "null") =
    s"""{"version": "1.0",
       | "normalizer": $normalizer,
       | "pre_tokenizer": $preTokenizer,
       | "post_processor": $postProcessor,
       | "decoder": $decoder,
       | "model": {"type": "WordPiece", "unk_token": "[UNK]",
       |   "continuing_subword_prefix": "##",
       |   "max_input_chars_per_word": $maxChars,
       |   "vocab": $vocab}}""".stripMargin

  private def encode(tok: WordPiece.WordPieceTokenizer, text: String)
      : Seq[Long] = {
    import spark.implicits._
    Seq(("d", text)).toDF("id", "t")
      .transform(df => WordPiece.encodeIds(df, "id", "t", tok))
      .collect()(0).getSeq[Long](1)
  }

  test("greedy longest-match-first with ## continuations (hand-" +
      "computed): a stuck position fails the WHOLE word to unk, " +
      "over-long words go unk, and the plan is a pure projection") {
    val tok = WordPiece.loadTokenizerJson(spark,
      writeJson(tokJson(maxChars = "10")))
    assert(tok.unkId == 0L && tok.contPrefix == "##")
    // un ##aff ##able — the canonical WordPiece example
    assert(encode(tok, "unaffable") == Seq(5L, 6L, 7L))
    // the | cat ##s
    assert(encode(tok, "the cats") == Seq(3L, 4L, 8L))
    // greedy: "cat" matches but "##xx" never does → whole word unk
    assert(encode(tok, "catxx") == Seq(0L))
    // unknown word entirely
    assert(encode(tok, "zzz") == Seq(0L))
    // longer than max_input_chars_per_word (10) → unk without matching
    assert(encode(tok, "unaffableunaffable") == Seq(0L))
    // zero shuffles
    import spark.implicits._
    val plan = WordPiece.encodeIds(
      Seq(("d", "the cats")).toDF("id", "t"), "id", "t", tok)
      .queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.isEmpty, "wordpiece encode introduced a shuffle")
  }

  test("Bert pipeline stages: punctuation isolates, CJK chars become " +
      "their own pre-tokens, lowercase + strip_accents (null follows " +
      "lowercase) fold 'Café' to 'cafe', clean_text drops controls " +
      "and rewrites exotic whitespace") {
    val tok = WordPiece.loadTokenizerJson(spark, writeJson(tokJson()))
    assert(tok.lowercase && tok.stripAccents && tok.cleanText &&
      tok.handleChineseChars)
    // punctuation isolation: playing , the
    assert(encode(tok, "playing, the") == Seq(13L, 14L, 11L, 3L))
    // CJK isolation without surrounding spaces
    assert(encode(tok, "the中cat") == Seq(3L, 12L, 4L))
    // Café → cafe (lowercase + NFD-strip of the combining acute);
    // the DECOMPOSED spelling folds identically
    assert(encode(tok, "Café") == Seq(10L))
    assert(encode(tok, "Café") == Seq(10L))
    // controls drop, NBSP rewrites to a plain space split
    assert(encode(tok, "the\u0000\u0007 cat") == Seq(3L, 4L))
    assert(encode(tok, "the cat") == Seq(3L, 4L))
    // strip_accents=false keeps the accent → café is unknown
    val keepAccents = WordPiece.loadTokenizerJson(spark,
      writeJson(tokJson(normalizer =
        """{"type": "BertNormalizer", "clean_text": true,
          | "handle_chinese_chars": true, "strip_accents": false,
          | "lowercase": true}""".stripMargin)))
    assert(encode(keepAccents, "Café") == Seq(0L))
  }

  test("templates: TemplateProcessing [CLS] $A [SEP] and the legacy " +
      "BertProcessing cls/sep pairs both wrap the encode with fixed " +
      "ids") {
    val tp = WordPiece.loadTokenizerJson(spark, writeJson(tokJson(
      postProcessor =
        """{"type": "TemplateProcessing",
          | "single": [
          |   {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
          |   {"Sequence": {"id": "A", "type_id": 0}},
          |   {"SpecialToken": {"id": "[SEP]", "type_id": 0}}],
          | "special_tokens": {
          |   "[CLS]": {"id": "[CLS]", "ids": [1], "tokens": ["[CLS]"]},
          |   "[SEP]": {"id": "[SEP]", "ids": [2], "tokens": ["[SEP]"]}}}"""
          .stripMargin)))
    assert(tp.prefixIds == Seq(1L) && tp.suffixIds == Seq(2L))
    assert(encode(tp, "the cats") == Seq(1L, 3L, 4L, 8L, 2L))
    val legacy = WordPiece.loadTokenizerJson(spark, writeJson(tokJson(
      postProcessor =
        """{"type": "BertProcessing",
          | "sep": ["[SEP]", 2], "cls": ["[CLS]", 1]}""".stripMargin)))
    assert(legacy.prefixIds == Seq(1L) && legacy.suffixIds == Seq(2L))
    assert(encode(legacy, "the cats") == Seq(1L, 3L, 4L, 8L, 2L))
  }

  test("saveTokenizerJson: save -> load is the identity (normalizer " +
      "flags written explicitly so the null-follows-lowercase " +
      "default cannot re-resolve, templates re-emitted), and the " +
      "re-loaded tokenizer encodes identically") {
    val shapes = Seq(
      tokJson(),
      tokJson(normalizer =
        """{"type": "BertNormalizer", "clean_text": true,
          | "handle_chinese_chars": true, "strip_accents": false,
          | "lowercase": true}""".stripMargin),
      tokJson(postProcessor =
        """{"type": "BertProcessing",
          | "sep": ["[SEP]", 2], "cls": ["[CLS]", 1]}""".stripMargin))
    shapes.foreach { body =>
      val tok = WordPiece.loadTokenizerJson(spark, writeJson(body))
      val out = Files.createTempFile("graft_wordpiece_save", ".json")
        .toString
      WordPiece.saveTokenizerJson(spark, tok, out)
      val re = WordPiece.loadTokenizerJson(spark, out)
      assert(re == tok, s"save->load forked the tokenizer for $body")
      assert(encode(re, "the unaffable Café, 中 cats") ==
        encode(tok, "the unaffable Café, 中 cats"))
    }
  }

  test("rejection matrix: non-WordPiece models point at their " +
      "loaders, non-Bert normalizers/pre-tokenizers refuse, an " +
      "absent pre-tokenizer refuses, a $B in the SINGLE template " +
      "refuses, and a " +
      "missing unk_token refuses") {
    def rejects(body: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        WordPiece.loadTokenizerJson(spark, writeJson(body))
      }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    rejects(tokJson().replace("\"WordPiece\"", "\"BPE\""),
      "Bpe.loadTokenizerJson")
    rejects(tokJson(normalizer = """{"type": "Lowercase"}"""),
      "BertNormalizer")
    rejects(tokJson(preTokenizer = """{"type": "Whitespace"}"""),
      "BertPreTokenizer")
    rejects(tokJson(preTokenizer = "null"), "absent")
    rejects(tokJson(postProcessor =
      """{"type": "TemplateProcessing",
        | "single": [{"Sequence": {"id": "B", "type_id": 0}}],
        | "special_tokens": {}}""".stripMargin),
      "single form takes exactly one A")
    rejects(tokJson().replace("\"[UNK]\": 0, ", ""),
      "missing from the vocab")
  }

  private def decodeDistributed(tok: WordPiece.WordPieceTokenizer,
      ids: Seq[Long], skipTemplate: Boolean = true): String = {
    import spark.implicits._
    Seq(("d", ids)).toDF("id", "ids")
      .select(WordPiece.decodeColumn(col("ids"), tok, skipTemplate)
        .as("text"))
      .collect()(0).getString(0)
  }

  test("decode: the published join convention — space-join with " +
      "continuation attach, template specials dropped (kept on " +
      "request), unknown ids refuse loudly, and the plan is a pure " +
      "projection") {
    val tok = WordPiece.loadTokenizerJson(spark, writeJson(tokJson(
      postProcessor =
        """{"type": "BertProcessing",
          | "sep": ["[SEP]", 2], "cls": ["[CLS]", 1]}""".stripMargin)))
    // un ##aff ##able attaches; words join with one space; the
    // template's [CLS]/[SEP] drop by default
    assert(encode(tok, "the unaffable cat") ==
      Seq(1L, 3L, 5L, 6L, 7L, 4L, 2L))
    assert(decodeDistributed(tok, Seq(1L, 3L, 5L, 6L, 7L, 4L, 2L)) ==
      "the unaffable cat")
    // punctuation decodes as its own space-joined token (the exact
    // join form — no cleanup respacing pass)
    assert(decodeDistributed(tok, Seq(3L, 11L, 4L)) == "the , cat")
    // skipTemplateIds = false keeps the specials
    assert(decodeDistributed(tok, Seq(1L, 3L, 2L),
      skipTemplate = false) == "[CLS] the [SEP]")
    // decode ∘ encode is the identity on pre-normalized in-coverage
    // text — the x124 statement
    val ids = encode(tok, "the cat plays, a cat")
    assert(decodeDistributed(tok, ids) == "the cat plays , a cat")
    // unknown ids refuse loudly
    val e = intercept[Exception](decodeDistributed(tok, Seq(999L)))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("no vocab entry")))
    // zero shuffles: decode is a projection
    import spark.implicits._
    val plan = Seq(("d", Seq(3L, 4L))).toDF("id", "ids")
      .select(WordPiece.decodeColumn(col("ids"), tok).as("text"))
      .queryExecution.executedPlan
    assert(plan.collect {
      case x: org.apache.spark.sql.execution.exchange.Exchange => x
    }.isEmpty, "wordpiece decode introduced a shuffle")
  }

  test("pair templates: [CLS] $A [SEP] $B:1 [SEP]:1 encodes " +
      "(token_ids, type_ids) hand-computed; BertProcessing implies " +
      "the same fixed pair; single-sequence encode is unchanged; " +
      "decode skips pair specials; save -> load identity; loud " +
      "refusals (no pair template, B before A)") {
    val pairPost =
      """{"type": "TemplateProcessing",
        | "single": [
        |   {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
        |   {"Sequence": {"id": "A", "type_id": 0}},
        |   {"SpecialToken": {"id": "[SEP]", "type_id": 0}}],
        | "pair": [
        |   {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
        |   {"Sequence": {"id": "A", "type_id": 0}},
        |   {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
        |   {"Sequence": {"id": "B", "type_id": 1}},
        |   {"SpecialToken": {"id": "[SEP]", "type_id": 1}}],
        | "special_tokens": {
        |   "[CLS]": {"id": "[CLS]", "ids": [1], "tokens": ["[CLS]"]},
        |   "[SEP]": {"id": "[SEP]", "ids": [2], "tokens": ["[SEP]"]}}}"""
        .stripMargin
    val tok = WordPiece.loadTokenizerJson(spark,
      writeJson(tokJson(postProcessor = pairPost)))
    assert(tok.pair.contains(WordPiece.PairTemplate(
      Seq((1L, 0L)), Seq((2L, 0L)), Seq((2L, 1L)), 0L, 1L)))
    import spark.implicits._
    def pair(a: String, b: String): (Seq[Long], Seq[Long]) = {
      val r = WordPiece.encodePair(
        Seq(("d", a, b)).toDF("id", "a", "b"), "id", "a", "b", tok)
        .collect()(0)
      (r.getSeq[Long](1), r.getSeq[Long](2))
    }
    // A = [the, cat] = [3, 4]; B = [play, ##ing] = [13, 14]
    val (ids, types) = pair("the cat", "playing")
    assert(ids == Seq(1L, 3L, 4L, 2L, 13L, 14L, 2L))
    assert(types == Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L))
    // the legacy BertProcessing pair is the same fixed shape
    val bert = WordPiece.loadTokenizerJson(spark, writeJson(tokJson(
      postProcessor = """{"type": "BertProcessing",
        | "sep": ["[SEP]", 2], "cls": ["[CLS]", 1]}""".stripMargin)))
    assert(bert.pair == tok.pair)
    // the single-sequence encode ignores the pair template
    assert(encode(tok, "the cat") == Seq(1L, 3L, 4L, 2L))
    // decode skips pair specials too
    assert(decodeDistributed(tok, ids) == "the cat playing")
    // pair encode is a pure projection — zero shuffles
    val plan = WordPiece.encodePair(
      Seq(("d", "the", "cat")).toDF("id", "a", "b"), "id", "a", "b",
      tok).queryExecution.executedPlan
    assert(plan.collect {
      case x: org.apache.spark.sql.execution.exchange.Exchange => x
    }.isEmpty, "pair encode introduced a shuffle")
    // save -> load identity with the pair template
    val f = Files.createTempFile("graft_wp_pair", ".json")
    WordPiece.saveTokenizerJson(spark, tok, f.toString)
    assert(WordPiece.loadTokenizerJson(spark, f.toString) == tok)
    // refusals: no pair template; B before A
    val noPair = WordPiece.loadTokenizerJson(spark,
      writeJson(tokJson()))
    assert(intercept[IllegalArgumentException] {
      WordPiece.encodePairColumns(col("a"), col("b"), noPair)
    }.getMessage.contains("no PAIR template"))
    assert(intercept[IllegalArgumentException] {
      WordPiece.loadTokenizerJson(spark, writeJson(tokJson(
        postProcessor = pairPost.replace(
          """{"Sequence": {"id": "A", "type_id": 0}},
            |   {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
            |   {"Sequence": {"id": "B", "type_id": 1}}""".stripMargin,
          """{"Sequence": {"id": "B", "type_id": 1}},
            |   {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
            |   {"Sequence": {"id": "A", "type_id": 0}}""".stripMargin))))
    }.getMessage.contains("before A"))
  }

  test("train: hand-computed likelihood merges — the hug/pug/hugs " +
      "fixture derives every merge and every EXACT rational tie on " +
      "paper; the end-to-end distributed train matches; the trained " +
      "tokenizer encodes greedily, roundtrips, and survives " +
      "save -> load; refusals are loud") {
    // weights 10/5/5. Initial symbols h:15 p:5 ##u:20 ##g:20 ##s:5;
    // ALL four pair scores tie at exactly 1/20 → tiebreak (left asc)
    // picks (##g,##s) → ##gs. Second round ties at 1/20 again →
    // (##u,##g) → ##ug. Third: (##u,##gs) wins at 1/5 → ##ugs.
    // Fourth: (p,##ug) and (h,##ugs) tie at 1/15 → (h,##ugs) → hugs.
    val hist = Array(("hug", 10L), ("pug", 5L), ("hugs", 5L))
    val alphabet = Seq("##g", "##s", "##u", "h", "p")
    val expected = Seq("[UNK]", "##g", "##s", "##u", "h", "p",
      "##gs", "##ug", "##ugs", "hugs")
    assert(WordPiece.trainDriver(hist, alphabet, vocabSize = 10,
      minFrequency = 2L, specials = Seq("[UNK]"),
      contPrefix = "##") == expected)
    // minFrequency above every pair count → no merges, alphabet only
    assert(WordPiece.trainDriver(hist, alphabet, vocabSize = 10,
      minFrequency = 100L, specials = Seq("[UNK]"),
      contPrefix = "##") == Seq("[UNK]") ++ alphabet)
    // end-to-end: the distributed histogram + alphabet scan feed the
    // same loop — identical vocabulary, ids in insertion order
    import spark.implicits._
    val corpus = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(5)("hugs")).toDF("text")
    val tok = WordPiece.train(corpus, "text", vocabSize = 10,
      minFrequency = 2L)
    assert(tok.vocab.map(_._1) == expected && tok.unkId == 0L)
    // greedy encode under the trained vocab: "pug" never merged
    // fully, so "pugs" = p + ##ugs; unknown chars fail the word
    assert(encode(tok, "hugs pugs") == Seq(9L, 5L, 8L))
    assert(encode(tok, "zap") == Seq(0L))
    // decode ∘ encode on in-coverage text
    assert(decodeDistributed(tok, encode(tok, "hugs pug hug")) ==
      "hugs pug hug")
    // save -> load is the identity on the trained artifact
    val f = Files.createTempFile("graft_wp_train", ".json")
    WordPiece.saveTokenizerJson(spark, tok, f.toString)
    assert(WordPiece.loadTokenizerJson(spark, f.toString) == tok)
    // both merge-loop homes pick the IDENTICAL sequence: force the
    // distributed loop (maxDriverWords = 0, the Bpe.train device) —
    // every exact rational tie in the fixture must break the same way
    val tokDist = WordPiece.train(corpus, "text", vocabSize = 10,
      minFrequency = 2L, maxDriverWords = 0L)
    assert(tokDist == tok,
      "distributed merge loop diverged from the driver loop")
    // refusal: a vocabSize the alphabet cannot fit
    assert(intercept[IllegalArgumentException] {
      WordPiece.train(corpus, "text", vocabSize = 3)
    }.getMessage.contains("cannot hold"))
  }

  test("truncation + padding blocks: honored exactly (single + pair, " +
      "closed form == the published iterative longest-first rule on " +
      "an exhaustive grid, Left direction keeps the tail, Fixed " +
      "padding pads with pad_id/pad_type_id), save -> load identity, " +
      "and everything non-reproducible refuses loudly") {
    import graft.operators.TokenizerTruncation
    // closed form vs the published iterative rule (remove one token
    // at a time from the LONGER sequence, ties from the SECOND) —
    // exhaustive over la, lb in [0,10], budget in [0,12]
    def iterative(la: Int, lb: Int, n: Int): (Int, Int) = {
      var (a, b) = (la, lb)
      while (a + b > n) { if (a > b) a -= 1 else b -= 1 }
      (a, b)
    }
    for (la <- 0 to 10; lb <- 0 to 10; n <- 0 to 12)
      assert(TokenizerTruncation.pairKeep(la, lb, n) ==
        iterative(la, lb, n),
        s"closed form diverged at la=$la lb=$lb n=$n")
    // the Column form equals the int form (one DataFrame sweep)
    locally {
      import spark.implicits._
      val grid = for (la <- 0 to 6; lb <- 0 to 6) yield (la, lb)
      val df = grid.toDF("la", "lb")
      val (fa, fb) = TokenizerTruncation.pairKeepLengths(
        col("la"), col("lb"), budget = 5, strategy = "longest_first")
      val rows = df.select(col("la"), col("lb"),
        fa.as("fa"), fb.as("fb")).collect()
      rows.foreach { r =>
        val exp = TokenizerTruncation.pairKeep(r.getInt(0), r.getInt(1), 5)
        assert((r.getInt(2), r.getInt(3)) == exp,
          s"column form diverged at la=${r.getInt(0)} lb=${r.getInt(1)}")
      }
    }
    // single-sequence truncation under a template: max_length 5 with
    // [CLS] $A [SEP] leaves a content budget of 3
    val truncJson = (strategy: String, direction: String,
        maxLen: Int) =>
      s"""{"direction": "$direction", "max_length": $maxLen,
         | "strategy": "$strategy", "stride": 0}""".stripMargin
    def withBlocks(trunc: String, padding: String,
        postProcessor: String = "null"): String =
      tokJson(postProcessor = postProcessor)
        .replaceFirst("\\{",
          s"""{"truncation": $trunc, "padding": $padding, """)
    val cls = """{"type": "TemplateProcessing",
      | "single": [
      |   {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
      |   {"Sequence": {"id": "A", "type_id": 0}},
      |   {"SpecialToken": {"id": "[SEP]", "type_id": 0}}],
      | "special_tokens": {
      |   "[CLS]": {"id": "[CLS]", "ids": [1], "tokens": ["[CLS]"]},
      |   "[SEP]": {"id": "[SEP]", "ids": [2], "tokens": ["[SEP]"]}}}"""
      .stripMargin
    val tokR = WordPiece.loadTokenizerJson(spark, writeJson(
      withBlocks(truncJson("LongestFirst", "Right", 5), "null", cls)))
    assert(tokR.truncation ==
      Some(TokenizerTruncation.Truncation(5, "longest_first", "right")))
    // content of "the unaffable cat" is [3, 5, 6, 7, 4]; keep 3 from
    // the head, then the template
    assert(encode(tokR, "the unaffable cat") == Seq(1L, 3L, 5L, 6L, 2L))
    // Left direction keeps the TAIL
    val tokL = WordPiece.loadTokenizerJson(spark, writeJson(
      withBlocks(truncJson("LongestFirst", "Left", 5), "null", cls)))
    assert(encode(tokL, "the unaffable cat") == Seq(1L, 6L, 7L, 4L, 2L))
    // Fixed padding pads token ids with pad_id AFTER the template
    val padJson =
      """{"strategy": {"Fixed": 8}, "direction": "Right",
        | "pad_to_multiple_of": null, "pad_id": 0, "pad_type_id": 0,
        | "pad_token": "[UNK]"}""".stripMargin
    val tokP = WordPiece.loadTokenizerJson(spark, writeJson(
      withBlocks("null", padJson, cls)))
    assert(tokP.padding ==
      Some(TokenizerTruncation.Padding(8, 0L, 0L, "right")))
    assert(encode(tokP, "the cat") ==
      Seq(1L, 3L, 4L, 2L, 0L, 0L, 0L, 0L))
    // an already-long sequence is NOT truncated by padding
    assert(encode(tokP, "the unaffable unaffable cat").length > 8)
    // save -> load identity with both blocks set
    val tokBoth = WordPiece.loadTokenizerJson(spark, writeJson(
      withBlocks(truncJson("LongestFirst", "Right", 5), padJson, cls)))
    val f = Files.createTempFile("graft_wp_trunc", ".json")
    WordPiece.saveTokenizerJson(spark, tokBoth, f.toString)
    assert(WordPiece.loadTokenizerJson(spark, f.toString) == tokBoth)
    // loud refusals: stride, BatchLongest, pad_to_multiple_of, a
    // contradictory pad_token, an unknown strategy
    def rejects(body: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        WordPiece.loadTokenizerJson(spark, writeJson(body))
      }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    rejects(withBlocks(
      """{"max_length": 5, "strategy": "LongestFirst", "stride": 7}""",
      "null"), "stride")
    rejects(withBlocks("null", """{"strategy": "BatchLongest"}"""),
      "BatchLongest")
    rejects(withBlocks("null",
      """{"strategy": {"Fixed": 8}, "pad_to_multiple_of": 16}"""),
      "pad_to_multiple_of")
    rejects(withBlocks("null",
      """{"strategy": {"Fixed": 8}, "pad_id": 7,
        | "pad_token": "[UNK]"}""".stripMargin),
      "contradicts itself")
    rejects(withBlocks(
      """{"max_length": 5, "strategy": "Sliding"}""", "null"),
      "not a published strategy")
  }

  test("pair truncation + padding end to end: longest-first kept " +
      "lengths, type ids follow the kept content, pads carry " +
      "pad_type_id, and only_second on a pair truncates only B") {
    import graft.operators.TokenizerTruncation
    val pairPost =
      """{"type": "TemplateProcessing",
        | "single": [
        |   {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
        |   {"Sequence": {"id": "A", "type_id": 0}},
        |   {"SpecialToken": {"id": "[SEP]", "type_id": 0}}],
        | "pair": [
        |   {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
        |   {"Sequence": {"id": "A", "type_id": 0}},
        |   {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
        |   {"Sequence": {"id": "B", "type_id": 1}},
        |   {"SpecialToken": {"id": "[SEP]", "type_id": 1}}],
        | "special_tokens": {
        |   "[CLS]": {"id": "[CLS]", "ids": [1], "tokens": ["[CLS]"]},
        |   "[SEP]": {"id": "[SEP]", "ids": [2], "tokens": ["[SEP]"]}}}"""
        .stripMargin
    def load(trunc: String, padding: String = "null") =
      WordPiece.loadTokenizerJson(spark, writeJson(
        tokJson(postProcessor = pairPost).replaceFirst("\\{",
          s"""{"truncation": $trunc, "padding": $padding, """)))
    def encodePair(tok: WordPiece.WordPieceTokenizer, a: String,
        b: String): (Seq[Long], Seq[Long]) = {
      import spark.implicits._
      val r = Seq(("d", a, b)).toDF("id", "a", "b")
        .transform(df => WordPiece.encodePair(df, "id", "a", "b", tok))
        .collect()(0)
      (r.getSeq[Long](1), r.getSeq[Long](2))
    }
    // max_length 7 over the 3-id pair template leaves budget 4;
    // A = "the cat" (2 tokens), B = "a cat a cat" (4 tokens):
    // iterative longest-first keeps (2, 2)
    val tok = load(
      """{"max_length": 7, "strategy": "LongestFirst",
        | "direction": "Right", "stride": 0}""".stripMargin)
    val (ids, types) = encodePair(tok, "the cat", "a cat a cat")
    assert(ids == Seq(1L, 3L, 4L, 2L, 9L, 4L, 2L), s"ids $ids")
    assert(types == Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L), s"types $types")
    // only_second truncates B alone
    val tokOS = load(
      """{"max_length": 7, "strategy": "OnlySecond",
        | "direction": "Right", "stride": 0}""".stripMargin)
    val (ids2, _) = encodePair(tokOS, "the cat", "a cat a cat")
    assert(ids2 == Seq(1L, 3L, 4L, 2L, 9L, 4L, 2L))
    // ... and refuses loudly (per row) when A alone exceeds the budget
    val e = intercept[Exception] {
      encodePair(tokOS, "the cat the cat the cat", "a")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("only_second")))
    // padding on a pair: ids pad with pad_id, types with pad_type_id
    val tokPad = load("null",
      """{"strategy": {"Fixed": 9}, "direction": "Right",
        | "pad_id": 0, "pad_type_id": 0}""".stripMargin)
    val (ids3, types3) = encodePair(tokPad, "the cat", "a")
    assert(ids3 == Seq(1L, 3L, 4L, 2L, 9L, 2L, 0L, 0L, 0L))
    assert(types3 == Seq(0L, 0L, 0L, 0L, 1L, 1L, 0L, 0L, 0L))
  }

  test("encodeWithOffsets: (id, start, end) code-point spans into the " +
      "normalized text — continuations, whole-word unk, punctuation, " +
      "astral plane, template specials at (0,0), truncation honored") {
    import spark.implicits._
    def offsets(tok: WordPiece.WordPieceTokenizer, text: String)
        : Seq[(Long, Int, Int)] =
      Seq(("d", text)).toDF("id", "t")
        .transform(df => WordPiece.encodeWithOffsets(df, "id", "t", tok))
        .collect()(0).getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val tok = WordPiece.loadTokenizerJson(spark, writeJson(tokJson()))
    // normalized("The unaffable cat") = "the unaffable cat"
    //  the(0,3) un(4,6) ##aff(6,9) ##able(9,14) cat(14,17)
    assert(offsets(tok, "The unaffable cat") == Seq(
      (3L, 0, 3), (5L, 4, 6), (6L, 6, 9), (7L, 9, 13), (4L, 14, 17)))
    // a stuck word goes unk over the WHOLE word's span; punctuation
    // isolates with its own 1-char span
    assert(offsets(tok, "the zzz, cat") == Seq(
      (3L, 0, 3), (0L, 4, 7), (11L, 7, 8), (4L, 9, 12)))
    // astral-plane characters count as ONE code point each: the
    // normalized string is "a <unk-word> cat" with the clef at cp 2
    assert(offsets(tok, "a 𝄞 cat") == Seq(
      (9L, 0, 1), (0L, 2, 3), (4L, 4, 7)))
    // template specials carry the published (0, 0) span
    val tokT = WordPiece.loadTokenizerJson(spark, writeJson(tokJson(
      postProcessor = """{"type": "BertProcessing",
        | "sep": ["[SEP]", 2], "cls": ["[CLS]", 1]}""".stripMargin)))
    assert(offsets(tokT, "the cat") == Seq(
      (1L, 0, 0), (3L, 0, 3), (4L, 4, 7), (2L, 0, 0)))
    // truncation applies to the offsets surface identically
    val tokTr = WordPiece.loadTokenizerJson(spark, writeJson(
      tokJson().replaceFirst("\\{",
        """{"truncation": {"max_length": 2,
          | "strategy": "LongestFirst", "stride": 0}, """.stripMargin)))
    assert(offsets(tokTr, "the unaffable cat") == Seq(
      (3L, 0, 3), (5L, 4, 6)))
    // ids agree with the id-only kernel on every fixture
    for (t <- Seq("The unaffable cat", "the zzz, cat", "a cat"))
      assert(offsets(tok, t).map(_._1) == encode(tok, t),
        s"offsets ids diverged from encode on '$t'")
  }

  test("distributed merge loop: the near-tie window collect is " +
      "BOUNDED — an all-tie corpus refuses loudly at the cap instead " +
      "of collecting the whole pair table") {
    import spark.implicits._
    // a perfectly uniform corpus: every pair has the same likelihood
    // score, so the near-tie window is the ENTIRE pair table
    val corpus = Seq("ab", "cd", "ef", "gh").toDF("text")
    val e = intercept[IllegalStateException] {
      WordPiece.train(corpus, "text", vocabSize = 100,
        minFrequency = 1L, maxDriverWords = 0L, maxTieWindow = 2)
    }
    assert(e.getMessage.contains("tie") &&
      e.getMessage.contains("maxTieWindow"),
      s"unexpected: ${e.getMessage}")
    // the same corpus trains fine when the window fits the cap, and
    // identically in both homes
    val a = WordPiece.train(corpus, "text", vocabSize = 100,
      minFrequency = 1L, maxDriverWords = 0L, maxTieWindow = 100)
    val b = WordPiece.train(corpus, "text", vocabSize = 100,
      minFrequency = 1L)
    assert(a.vocab == b.vocab)
  }

  test("tokenWindowSpans: provenance chunks — every chunk's span " +
      "re-extracts exactly its text from the normalized view, the " +
      "last window may be short, a templated tokenizer refuses, and " +
      "the plan is a pure projection") {
    import spark.implicits._
    val tok = WordPiece.loadTokenizerJson(spark, writeJson(tokJson()))
    // "the unaffable cat": the(0,3) un(4,6) ##aff(6,9) ##able(9,13)
    // cat(14,17) — width 3 / stride 2 makes starts 0, 2, 4
    val rows = graft.operators.Chunking.tokenWindowSpans(
      Seq(("d", "The unaffable cat")).toDF("id", "t"),
      "id", "t", tok, width = 3, stride = 2)
      .orderBy(col("chunk_idx"))
      .collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getSeq[Long](3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    assert(rows.toSeq == Seq(
      (0, 3L, Seq(3L, 5L, 6L), 0L, 9L, "the unaff"),
      (1, 3L, Seq(6L, 7L, 4L), 6L, 17L, "affable cat"),
      (2, 1L, Seq(4L), 14L, 17L, "cat")))
    // the span IS the text: re-substr over the normalized view
    // equals chunk_text for every chunk of a real corpus line
    val doc = Seq(("d", "The quick, brown fox! jumps 42 times."))
      .toDF("id", "t")
    val again = graft.operators.Chunking.tokenWindowSpans(
      doc, "id", "t", tok, width = 4, stride = 3)
    val norm = graft.expressions.GraftFunctions.bertNormalize(
      col("t"), tok)
    val mismatch = again
      .join(doc, "id")
      .filter(col("chunk_text") =!=
        norm.substr(col("char_start").cast("int") + 1,
          (col("char_end") - col("char_start")).cast("int")))
      .count()
    assert(mismatch == 0L, "a chunk span failed to re-extract its text")
    // templated tokenizer refuses loudly
    val tokT = WordPiece.loadTokenizerJson(spark, writeJson(tokJson(
      postProcessor = """{"type": "BertProcessing",
        | "sep": ["[SEP]", 2], "cls": ["[CLS]", 1]}""".stripMargin)))
    val e = intercept[IllegalArgumentException] {
      graft.operators.Chunking.tokenWindowSpans(
        Seq(("d", "x")).toDF("id", "t"), "id", "t", tokT, 3, 2)
    }
    assert(e.getMessage.contains("template-free"))
    // zero shuffles: chunking is a pure map
    val plan = graft.operators.Chunking.tokenWindowSpans(
      Seq(("d", "the cat")).toDF("id", "t"), "id", "t", tok, 3, 2)
      .queryExecution.executedPlan
    assert(plan.collect {
      case x: org.apache.spark.sql.execution.exchange.Exchange => x
    }.isEmpty, "tokenWindowSpans introduced a shuffle")
  }

  test("attention mask: POSITIONAL from the pre-padding length — a " +
      "pad_id colliding with a content id ([UNK]-as-pad) still masks " +
      "correctly, Left padding zero-prefixes, no padding block means " +
      "all ones, and the pair surface masks its pads too") {
    import spark.implicits._
    def single(tok: WordPiece.WordPieceTokenizer, text: String)
        : (Seq[Long], Seq[Long]) = {
      val r = Seq(("d", text)).toDF("id", "t")
        .transform(df => WordPiece.encodeWithMask(df, "id", "t", tok))
        .collect()(0)
      (r.getSeq[Long](1), r.getSeq[Long](2))
    }
    def withPad(dir: String) = tokJson().replaceFirst("\\{",
      s"""{"padding": {"strategy": {"Fixed": 7},
         | "direction": "$dir", "pad_id": 0, "pad_type_id": 0,
         | "pad_token": "[UNK]"}, """.stripMargin)
    // pad_id 0 IS [UNK], and "zzz" produces a REAL unk (id 0) in
    // content — a value match against pad_id would zero it; the
    // positional mask keeps it
    val tokR = WordPiece.loadTokenizerJson(spark,
      writeJson(withPad("Right")))
    assert(single(tokR, "the zzz cat") ==
      ((Seq(3L, 0L, 4L, 0L, 0L, 0L, 0L),
        Seq(1L, 1L, 1L, 0L, 0L, 0L, 0L))))
    // Left padding: zeros FIRST
    val tokL = WordPiece.loadTokenizerJson(spark,
      writeJson(withPad("Left")))
    assert(single(tokL, "the zzz cat") ==
      ((Seq(0L, 0L, 0L, 0L, 3L, 0L, 4L),
        Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L))))
    // no padding block: all ones
    val tokNone = WordPiece.loadTokenizerJson(spark,
      writeJson(tokJson()))
    assert(single(tokNone, "the cat") ==
      ((Seq(3L, 4L), Seq(1L, 1L))))
    // pair surface: encodePairWithMask pads ids/types and masks the
    // pad tail
    val pairPost =
      """{"type": "TemplateProcessing",
        | "single": [
        |   {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
        |   {"Sequence": {"id": "A", "type_id": 0}},
        |   {"SpecialToken": {"id": "[SEP]", "type_id": 0}}],
        | "pair": [
        |   {"SpecialToken": {"id": "[CLS]", "type_id": 0}},
        |   {"Sequence": {"id": "A", "type_id": 0}},
        |   {"SpecialToken": {"id": "[SEP]", "type_id": 0}},
        |   {"Sequence": {"id": "B", "type_id": 1}},
        |   {"SpecialToken": {"id": "[SEP]", "type_id": 1}}],
        | "special_tokens": {
        |   "[CLS]": {"id": "[CLS]", "ids": [1], "tokens": ["[CLS]"]},
        |   "[SEP]": {"id": "[SEP]", "ids": [2], "tokens": ["[SEP]"]}}}"""
        .stripMargin
    val tokPair = WordPiece.loadTokenizerJson(spark, writeJson(
      tokJson(postProcessor = pairPost).replaceFirst("\\{",
        """{"padding": {"strategy": {"Fixed": 9},
          | "direction": "Right", "pad_id": 0, "pad_type_id": 0}, """
          .stripMargin)))
    val r = Seq(("d", "the cat", "a")).toDF("id", "a", "b")
      .transform(df =>
        WordPiece.encodePairWithMask(df, "id", "a", "b", tokPair))
      .collect()(0)
    assert(r.getSeq[Long](1) ==
      Seq(1L, 3L, 4L, 2L, 9L, 2L, 0L, 0L, 0L))
    assert(r.getSeq[Long](2) ==
      Seq(0L, 0L, 0L, 0L, 1L, 1L, 0L, 0L, 0L))
    assert(r.getSeq[Long](3) ==
      Seq(1L, 1L, 1L, 1L, 1L, 1L, 0L, 0L, 0L))
  }

  test("decoder block verified, never silently ignored: the " +
      "WordPiece space-join convention loads (prefix must match the " +
      "model's), cleanup=true refuses decode unless the space-join " +
      "form is accepted explicitly, mismatched prefixes and foreign " +
      "decoder types refuse at load, absent cleanup defaults ON, " +
      "and save -> load carries the block") {
    import spark.implicits._
    // cleanup=false: decode works unchanged
    val clean = WordPiece.loadTokenizerJson(spark, writeJson(tokJson(
      decoder = """{"type": "WordPiece", "prefix": "##",
        | "cleanup": false}""".stripMargin)))
    assert(clean.decoderCleanup == Some(false))
    val dec = Seq(("d", Seq(3L, 4L))).toDF("id", "ids")
      .select(WordPiece.decodeColumn(col("ids"), clean).as("t"))
      .collect()(0).getString(0)
    assert(dec == "the cat")
    // cleanup=true: decode applies the reference chain — punctuation
    // re-attaches ("the , cat" → "the, cat"); acceptSpaceJoin gives
    // the raw pre-cleanup join
    val cu = WordPiece.loadTokenizerJson(spark, writeJson(tokJson(
      decoder = """{"type": "WordPiece", "prefix": "##",
        | "cleanup": true}""".stripMargin)))
    assert(cu.decoderCleanup == Some(true))
    val cleaned = Seq(("d", Seq(3L, 11L, 4L))).toDF("id", "ids")
      .select(WordPiece.decodeColumn(col("ids"), cu).as("t"))
      .collect()(0).getString(0)
    assert(cleaned == "the, cat")
    val raw = Seq(("d", Seq(3L, 11L, 4L))).toDF("id", "ids")
      .select(WordPiece.decodeColumn(col("ids"), cu,
        acceptSpaceJoin = true).as("t")).collect()(0).getString(0)
    assert(raw == "the , cat")
    // the chain itself, pinned verbatim (order + the published
    // " do not"→" don't" quirk, reproduced not corrected)
    import graft.expressions.WordPieceDecodeIds.cleanupChain
    assert(cleanupChain("the , cat .") == "the, cat.")
    assert(cleanupChain("he 's here !") == "he's here!")
    assert(cleanupChain("don ' t stop") == "don't stop")
    assert(cleanupChain("we 've , they 're , i 'm") ==
      "we've, they're, i'm")
    assert(cleanupChain("is n't it ?") == "isn't it?")
    assert(cleanupChain("i do not know") == "i don't know",
      "the reference quirk is reproduced, not corrected")
    // absent cleanup flag defaults ON (the published default)
    val dflt = WordPiece.loadTokenizerJson(spark, writeJson(tokJson(
      decoder = """{"type": "WordPiece", "prefix": "##"}""")))
    assert(dflt.decoderCleanup == Some(true))
    // mismatched prefix / foreign type refuse at LOAD
    val e2 = intercept[IllegalArgumentException](
      WordPiece.loadTokenizerJson(spark, writeJson(tokJson(
        decoder = """{"type": "WordPiece", "prefix": "@@"}"""))))
    assert(e2.getMessage.contains("prefix"))
    val e3 = intercept[IllegalArgumentException](
      WordPiece.loadTokenizerJson(spark, writeJson(tokJson(
        decoder = """{"type": "ByteLevel"}"""))))
    assert(e3.getMessage.contains("decoder type"))
    // save -> load identity carries the block
    val out = java.nio.file.Files
      .createTempDirectory("graft_wp_dec")
      .resolve("tokenizer.json").toString
    WordPiece.saveTokenizerJson(spark, cu, out)
    assert(WordPiece.loadTokenizerJson(spark, out) == cu)
  }
}
