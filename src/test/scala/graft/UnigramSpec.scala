package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.operators.Unigram
import org.apache.spark.sql.functions._

/** Unigram (sentencepiece-class) tokenizer: hand-computed Viterbi
  * lattices pin the encode semantics (every expected id sequence
  * below is derived on paper from the published max-likelihood
  * segmentation rule), plus the loader's rejection matrix — the
  * BpeSpec parity-harness pattern with constructed fixtures.
  */
class UnigramSpec extends SparkSpec {

  private def writeJson(body: String): String = {
    val f = Files.createTempFile("graft_unigram", ".json")
    Files.write(f, body.getBytes(StandardCharsets.UTF_8))
    f.toString
  }

  // vocab ids are ARRAY POSITIONS: 0 <unk>, 1 ▁, 2 a, 3 b, 4 ab,
  // 5 ▁a, 6 abc — scores chosen so every expected segmentation below
  // is the unique lattice optimum (verified by hand)
  private val baseVocab =
    """[["<unk>", 0.0], ["▁", -1.0], ["a", -2.0], ["b", -2.0],
      | ["ab", -3.5], ["▁a", -1.5], ["abc", -4.0]]"""
      .stripMargin
  private val llamaNorms =
    """{"type": "Sequence", "normalizers": [
      |  {"type": "Prepend", "prepend": "▁"},
      |  {"type": "Replace", "pattern": {"String": " "},
      |   "content": "▁"}]}""".stripMargin

  private def tokJson(vocab: String = baseVocab, unkId: String = "0",
      byteFallback: Boolean = false, normalizer: String = llamaNorms,
      preTokenizer: String = "null", postProcessor: String = "null",
      decoder: String = "null") =
    s"""{"version": "1.0",
       | "normalizer": $normalizer,
       | "pre_tokenizer": $preTokenizer,
       | "post_processor": $postProcessor,
       | "decoder": $decoder,
       | "model": {"type": "Unigram", "unk_id": $unkId,
       |   "byte_fallback": ${if (byteFallback) "true" else "false"},
       |   "vocab": $vocab}}""".stripMargin

  private def encode(tok: Unigram.UnigramTokenizer, text: String)
      : Seq[Long] = {
    import spark.implicits._
    Seq(("d", text)).toDF("id", "t")
      .transform(df => Unigram.encodeIds(df, "id", "t", tok))
      .collect()(0).getSeq[Long](1)
  }

  test("Viterbi encode: the max-likelihood segmentation wins (hand-" +
      "computed lattices), the Prepend+Replace normalizer runs in " +
      "file order, ties fall to the earliest start, unknown code " +
      "points fuse to one unk id, and the plan is a pure projection") {
    val tok = Unigram.loadTokenizerJson(spark, writeJson(tokJson()))
    assert(tok.unkId == 0 && !tok.byteFallback && !tok.needsNfc)
    // "a ab" normalizes to ▁a▁ab; the optimum is ▁a(−1.5) ▁a(−1.5)
    // b(−2.0) = −5.0, strictly better than ▁a ▁ ab (−6.0) and every
    // other path
    assert(encode(tok, "a ab") == Seq(5L, 5L, 3L))
    // "abc" → ▁abc; ▁(−1) abc(−4) = −5 beats ▁a(−1.5) b(−2) + unk c
    // (unk = min−10 = −14) by construction
    assert(encode(tok, "abc") == Seq(1L, 6L))
    // two unknown code points between known pieces FUSE into one unk
    // (the fuse ⇔ unk_id rule): ▁a [zz] b
    assert(encode(tok, "azzb") == Seq(5L, 0L, 3L))
    // empty input → NOTHING: the reference Prepend (HF tokenizers /
    // sentencepiece) no-ops on an empty string, so encode("") yields
    // no content ids (only template ids, when a template exists)
    assert(encode(tok, "") == Seq.empty[Long])
    // deterministic tie-break: x(−2) y(−2) xy(−4) ties x+y against
    // xy; the earliest-start (longest) piece must win, always
    val tieTok = Unigram.loadTokenizerJson(spark, writeJson(tokJson(
      vocab = """[["<unk>", 0.0], ["x", -2.0], ["y", -2.0],
                | ["xy", -4.0]]""".stripMargin,
      normalizer = "null")))
    assert(encode(tieTok, "xy") == Seq(3L))
    // zero shuffles: the encode is a projection
    import spark.implicits._
    val plan = Unigram.encodeIds(
      Seq(("d", "a ab")).toDF("id", "t"), "id", "t", tok)
      .queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.isEmpty, "unigram encode introduced a shuffle")
  }

  test("byte fallback: an unknown span resolves to its <0xNN> pieces " +
      "when all exist (fused spans fall back as whole UTF-8 runs), " +
      "falls to unk_id when any byte piece is missing, and a model " +
      "with neither path refuses loudly instead of dropping input") {
    val vocabBf =
      """[["<unk>", 0.0], ["▁", -1.0], ["a", -2.0], ["b", -2.0],
        | ["ab", -3.5], ["▁a", -1.5], ["abc", -4.0],
        | ["<0xC3>", -9.0], ["<0xA9>", -9.0]]""".stripMargin
    val tok = Unigram.loadTokenizerJson(spark,
      writeJson(tokJson(vocab = vocabBf, byteFallback = true)))
    // é = C3 A9: both byte pieces exist → ids 7, 8
    assert(encode(tok, "aé") == Seq(5L, 7L, 8L))
    // a FUSED unknown span falls back as one UTF-8 run: éé → 4 bytes
    assert(encode(tok, "aéé") == Seq(5L, 7L, 8L, 7L, 8L))
    // µ = C2 B5 and <0xC2> is missing → the span falls to unk_id
    assert(encode(tok, "aµ") == Seq(5L, 0L))
    // decode inverts the byte run (and drops the prepended space)
    assert(Unigram.decodeIds(Seq(5L, 7L, 8L), tok) == "aé")
    assert(Unigram.decodeIds(encode(tok, "a ab"), tok) == "a ab")
    // no unk_id, no byte fallback → loud refusal naming the span
    val noEscape = Unigram.loadTokenizerJson(spark, writeJson(tokJson(
      vocab = baseVocab, unkId = "null")))
    val err = intercept[Exception] {
      encode(noEscape, "az")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(err).exists(m => m != null &&
      m.contains("refusing to drop input silently")),
      s"wrong refusal: ${chain(err)}")
  }

  test("leading pure-NFC stage composes upstream of the kernel: a " +
      "decomposed accent encodes identically to its composed form") {
    val vocabNfc =
      """[["<unk>", 0.0], ["▁", -1.0], ["é", -2.0],
        | ["a", -2.0]]""".stripMargin
    val norm =
      """{"type": "Sequence", "normalizers": [
        |  {"type": "NFC"},
        |  {"type": "Prepend", "prepend": "▁"},
        |  {"type": "Replace", "pattern": {"String": " "},
        |   "content": "▁"}]}""".stripMargin
    val tok = Unigram.loadTokenizerJson(spark,
      writeJson(tokJson(vocab = vocabNfc, normalizer = norm)))
    assert(tok.needsNfc)
    // e + COMBINING ACUTE (decomposed) must hit the composed é piece
    assert(encode(tok, "e\u0301") == encode(tok, "é"))
    assert(encode(tok, "é") == Seq(1L, 2L))
  }

  test("TemplateProcessing: the single-sequence BOS template's fixed " +
      "ids wrap every encode (the Llama '<s> $A' shape)") {
    val post =
      """{"type": "TemplateProcessing",
        | "single": [
        |   {"SpecialToken": {"id": "<s>", "type_id": 0}},
        |   {"Sequence": {"id": "A", "type_id": 0}}],
        | "special_tokens": {
        |   "<s>": {"id": "<s>", "ids": [42], "tokens": ["<s>"]}}}"""
        .stripMargin
    val tok = Unigram.loadTokenizerJson(spark,
      writeJson(tokJson(postProcessor = post)))
    assert(tok.prefixIds == Seq(42L) && tok.suffixIds.isEmpty)
    assert(encode(tok, "a ab") == Seq(42L, 5L, 5L, 3L))
  }

  test("independent reference parity: a plain-Scala Viterbi decoder " +
      "(disjoint implementation — immutable maps, no gate, no " +
      "kernel) agrees with the engine encode on real corpus text " +
      "under a byte-fallback vocab") {
    // the x121 vocab shape: letters + bigrams + the full <0xNN>
    // alphabet, so every input is representable
    val letterPieces = Seq(
      "e" -> -2.8, "t" -> -2.9, "a" -> -3.0, "o" -> -3.1,
      "n" -> -3.2, "i" -> -3.3, "s" -> -3.4, "r" -> -3.5,
      "h" -> -3.6, "l" -> -3.7, "d" -> -3.8, "▁the" -> -5.0,
      "▁a" -> -3.9, "▁to" -> -5.2, "the" -> -6.0, "ing" -> -6.2,
      "er" -> -5.4, "an" -> -5.5, "on" -> -5.6, "at" -> -5.7)
    val vocabJson = (Seq("\"<unk>\"" -> 0.0, "\"▁\"" -> -2.5) ++
      (0 until 256).map(b => f""""<0x$b%02X>"""" -> -12.0) ++
      letterPieces.map { case (px, sc) => s""""$px"""" -> sc })
      .map { case (px, sc) => s"[$px, $sc]" }.mkString("[", ",", "]")
    val tok = Unigram.loadTokenizerJson(spark, writeJson(tokJson(
      vocab = vocabJson, byteFallback = true)))

    // independent reference: the DOCUMENTED semantics (forward DP,
    // starts ascending, strict >, earliest-start tie-break, per-code-
    // point unk edge) in a naive disjoint implementation — immutable
    // Maps, no first-char gate, no maxLen bound, no kernel code. The
    // tie-break and addition order are part of the spec, so the
    // reference states them too; everything else differs.
    def refEncode(text: String): Seq[Long] = {
      val t = "▁" + text.replace(" ", "▁")
      val pieces = tok.pieces
      val idx = pieces.map(_._1).zipWithIndex.toMap
      val unkScore = pieces.map(_._2).min - 10.0
      val n = t.length
      val maxPieceLen = pieces.map(_._1.length).max
      var bestAt = Map(0 -> 0.0)
      var backAt = Map.empty[Int, (Int, String, Boolean)]
      for (i <- 0 until n if bestAt.contains(i)) {
        for (len <- 1 to math.min(n - i, maxPieceLen)) {
          val cand = t.substring(i, i + len)
          if (idx.contains(cand)) {
            val sc = bestAt(i) + pieces(idx(cand))._2
            if (!bestAt.contains(i + len) || sc > bestAt(i + len)) {
              bestAt += (i + len) -> sc
              backAt += (i + len) -> ((i, cand, false))
            }
          }
        }
        val step = Character.charCount(t.codePointAt(i))
        val usc = bestAt(i) + unkScore
        if (!bestAt.contains(i + step) || usc > bestAt(i + step)) {
          bestAt += (i + step) -> usc
          backAt += (i + step) -> ((i, t.substring(i, i + step), true))
        }
      }
      var spans = List.empty[(String, Boolean)]
      var pos = n
      while (pos > 0) {
        val (prev, px, isUnk) = backAt(pos)
        spans = (px, isUnk) :: spans
        pos = prev
      }
      // fuse unk runs, then byte-fallback them
      val fusedB = List.newBuilder[(String, Boolean)]
      var run: StringBuilder = null
      spans.foreach { case (px, isUnk) =>
        if (isUnk) { if (run == null) run = new StringBuilder; run ++= px }
        else {
          if (run != null) { fusedB += ((run.toString, true)); run = null }
          fusedB += ((px, false))
        }
      }
      if (run != null) fusedB += ((run.toString, true))
      fusedB.result().flatMap {
        case (px, false) => Seq(idx(px).toLong)
        case (span, true) =>
          span.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .map(b => idx(f"<0x${b & 0xff}%02X>").toLong).toSeq
      }
    }

    import spark.implicits._
    val texts = graft.core.Graft.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = Unigram.encodeIds(
      texts.toSeq.toDF("doc_id", "text"), "doc_id", "text", tok)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.foreach { case (id, text) =>
      assert(got(id) == refEncode(text),
        s"doc $id diverged from the independent reference")
    }
  }

  test("Metaspace pre-tokenizer (T5 lineage): split cuts the lattice " +
      "at pre-token boundaries so a multi-word piece can never " +
      "match; split=false equals the whole-sentence lattice; the " +
      "prepend scheme gates the leading marker and never doubles it") {
    // ▁the▁cat (-3.0) would dominate any split segmentation — with
    // split=true it must be UNREACHABLE (pieces cannot span the cut
    // before the second ▁)
    val vocab =
      """[["<unk>", 0.0], ["▁", -1.0], ["▁the", -2.0],
        | ["▁cat", -2.5], ["▁the▁cat", -3.0], ["the", -2.2],
        | ["cat", -2.6]]""".stripMargin
    def ms(split: Boolean, scheme: String) =
      s"""{"type": "Metaspace", "replacement": "▁",
         | "split": $split, "prepend_scheme": "$scheme"}"""
        .stripMargin
    val tokSplit = Unigram.loadTokenizerJson(spark, writeJson(tokJson(
      vocab = vocab, normalizer = "null",
      preTokenizer = ms(split = true, "always"))))
    assert(tokSplit.metaspace.contains(("▁", true, "always")))
    // "the cat" → ▁the▁cat → segments [▁the, ▁cat] → ids 2, 3
    assert(encode(tokSplit, "the cat") == Seq(2L, 3L))
    val tokJoin = Unigram.loadTokenizerJson(spark, writeJson(tokJson(
      vocab = vocab, normalizer = "null",
      preTokenizer = ms(split = false, "always"))))
    // whole-sentence lattice: ▁the▁cat (-3.0) beats ▁the + ▁cat (-4.5)
    assert(encode(tokJoin, "the cat") == Seq(4L))
    // scheme "never": no leading marker → "the" matches the bare
    // piece, "cat" still gets its ▁ from the space rewrite
    val tokNever = Unigram.loadTokenizerJson(spark, writeJson(tokJson(
      vocab = vocab, normalizer = "null",
      preTokenizer = ms(split = true, "never"))))
    assert(encode(tokNever, "the cat") == Seq(5L, 3L))
    // already-marked input is never double-prepended
    assert(encode(tokSplit, "▁the") == Seq(2L))
  }

  test("saveTokenizerJson: save -> load is the identity across every " +
      "pipeline shape (norms, NFC, Metaspace, byte fallback, " +
      "templates), and the re-loaded tokenizer encodes identically") {
    val post =
      """{"type": "TemplateProcessing",
        | "single": [
        |   {"SpecialToken": {"id": "<unk>", "type_id": 0}},
        |   {"Sequence": {"id": "A", "type_id": 0}}],
        | "special_tokens": {
        |   "<unk>": {"id": "<unk>", "ids": [0], "tokens": ["<unk>"]}}}"""
        .stripMargin
    val shapes = Seq(
      tokJson(),
      tokJson(normalizer =
        """{"type": "Sequence", "normalizers": [
          |  {"type": "NFC"},
          |  {"type": "Prepend", "prepend": "▁"},
          |  {"type": "Replace", "pattern": {"String": " "},
          |   "content": "▁"}]}""".stripMargin),
      tokJson(byteFallback = true, postProcessor = post),
      tokJson(normalizer = "null", preTokenizer =
        """{"type": "Metaspace", "replacement": "▁",
          | "split": true, "prepend_scheme": "always"}""".stripMargin))
    shapes.foreach { body =>
      val tok = Unigram.loadTokenizerJson(spark, writeJson(body))
      val out = Files.createTempFile("graft_unigram_save", ".json")
        .toString
      Unigram.saveTokenizerJson(spark, tok, out)
      val re = Unigram.loadTokenizerJson(spark, out)
      assert(re == tok, s"save->load forked the tokenizer for $body")
      assert(encode(re, "a ab z") == encode(tok, "a ab z"))
    }
  }

  test("rejection matrix: everything the engine cannot reproduce " +
      "exactly refuses LOUDLY at load — BPE models point at the BPE " +
      "loader, pre-tokenizers, regex Replace, Lowercase, NFC after a " +
      "rewrite stage, pair templates, and out-of-range unk_id") {
    def rejects(body: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Unigram.loadTokenizerJson(spark, writeJson(body))
      }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    rejects(tokJson().replace("\"Unigram\"", "\"BPE\""),
      "Bpe.loadTokenizerJson")
    rejects(tokJson(preTokenizer = """{"type": "Whitespace"}"""),
      "pre-tokenizer")
    rejects(tokJson(preTokenizer =
      """{"type": "Metaspace", "replacement": "▁",
        | "prepend_scheme": "exotic"}""".stripMargin),
      "prepend_scheme")
    rejects(tokJson(normalizer =
      """{"type": "Replace", "pattern": {"Regex": " +"},
        | "content": " "}""".stripMargin),
      "non-literal pattern")
    rejects(tokJson(normalizer = """{"type": "Lowercase"}"""),
      "does not reproduce")
    rejects(tokJson(normalizer =
      """{"type": "Sequence", "normalizers": [
        |  {"type": "Prepend", "prepend": "▁"},
        |  {"type": "NFC"}]}""".stripMargin),
      "LEADING pure-NFC")
    rejects(tokJson(postProcessor =
      """{"type": "TemplateProcessing",
        | "single": [{"Sequence": {"id": "B", "type_id": 0}}],
        | "special_tokens": {}}""".stripMargin),
      "single form takes exactly one A")
    rejects(tokJson(postProcessor = """{"type": "RobertaProcessing"}"""),
      "TemplateProcessing")
    rejects(tokJson(unkId = "99"), "outside")
    rejects(tokJson(vocab =
      """[["a", -1.0], ["a", -2.0]]"""), "duplicate pieces")
  }

  private def decodeDistributed(tok: Unigram.UnigramTokenizer,
      ids: Seq[Long]): String = {
    import spark.implicits._
    Seq(("d", ids)).toDF("id", "ids")
      .transform(df => Unigram.decodeIdsDf(df, "id", "ids", tok))
      .collect()(0).getString(1)
  }

  test("decode: the distributed kernel inverts the encode — byte " +
      "pieces fuse as UTF-8, the pipeline's marker un-renders, one " +
      "prepended marker drops; driver decodeIds shares the same " +
      "core; the plan is a pure projection") {
    val bytePieces = (0 until 256)
      .map(b => f"""["<0x$b%02X>", -12.0]""").mkString(", ")
    val tok = Unigram.loadTokenizerJson(spark, writeJson(tokJson(
      vocab = s"""[["<unk>", 0.0], ["▁", -1.0], ["a", -2.0],
                 | ["b", -2.0], $bytePieces]""".stripMargin,
      byteFallback = true)))
    // full byte coverage ⇒ decode(encode(x)) == replace(x, '▁', ' ')
    // — exactly the x123 oracle's statement
    for (t <- Seq("a b", "züö €9", "ab  ba", " a", "a▁b", "",
        "😀 ok")) {
      val ids = encode(tok, t)
      val want = t.replace('▁', ' ')
      assert(decodeDistributed(tok, ids) == want,
        s"distributed decode of '$t'")
      assert(Unigram.decodeIds(ids, tok) == want,
        s"driver decode of '$t'")
    }
    // zero shuffles: decode is a projection
    import spark.implicits._
    val plan = Unigram.decodeIdsDf(
      Seq(("d", Seq(1L, 2L))).toDF("id", "ids"), "id", "ids", tok)
      .queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.isEmpty, "unigram decode introduced a shuffle")
  }

  test("decode: a Metaspace tokenizer decodes through its OWN " +
      "replacement and prepend scheme — custom markers un-render, " +
      "always/first drop the leading space, never keeps it") {
    // custom replacement '+': pieces carry it, decode must un-render
    // it (not the conventional ▁) and drop the scheme's prepend
    val vocab =
      """[["<unk>", 0.0], ["+", -1.0], ["+the", -2.0],
        | ["+cat", -2.5], ["the", -2.2], ["cat", -2.6]]""".stripMargin
    def tokOf(scheme: String) =
      Unigram.loadTokenizerJson(spark, writeJson(tokJson(
        vocab = vocab, normalizer = "null",
        preTokenizer =
          s"""{"type": "Metaspace", "replacement": "+",
             | "split": true, "prepend_scheme": "$scheme"}"""
            .stripMargin)))
    val always = tokOf("always")
    assert(encode(always, "the cat") == Seq(2L, 3L))
    assert(decodeDistributed(always, Seq(2L, 3L)) == "the cat")
    assert(Unigram.decodeIds(Seq(2L, 3L), always) == "the cat")
    // never: no prepend on encode, no drop on decode
    val never = tokOf("never")
    assert(encode(never, "the cat") == Seq(4L, 3L))
    assert(decodeDistributed(never, Seq(4L, 3L)) == "the cat")
    // ids outside the vocab refuse loudly
    val e = intercept[Exception](decodeDistributed(always, Seq(99L)))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("outside")))
  }

  test("train/EM: the forward-backward expected counts equal the " +
      "hand-computed posterior fixture exactly; corpus log-likelihood " +
      "is non-decreasing across EM iterations (the EM theorem, " +
      "observed); pruning keeps required singles") {
    // fixture: words {aa:1, ab:1}, pieces {a, b, aa} at uniform 1/3.
    //  "aa": [a,a] p=1/9, [aa] p=1/3, Z=4/9 → posterior(aa)=3/4,
    //        posterior([a,a])=1/4 contributing 2·(1/4) to E(a)
    //  "ab": only [a,b], Z=1/9 → E(a)+=1, E(b)+=1
    //  ⇒ E = (a: 3/2, b: 1, aa: 3/4); loglik = ln(4/9)+ln(1/9)
    val words = Array("aa", "ab")
    val weights = Array(1L, 1L)
    val pieces = Array("a", "b", "aa")
    val logp = Array.fill(3)(math.log(1.0 / 3.0))
    val (exp0, ll0) = Unigram.emStep(words, weights, pieces, logp,
      maxPieceLen = 2)
    assert(math.abs(exp0(0) - 1.5) < 1e-12 &&
      math.abs(exp0(1) - 1.0) < 1e-12 &&
      math.abs(exp0(2) - 0.75) < 1e-12,
      s"expected counts ${exp0.toSeq}")
    assert(math.abs(ll0 - (math.log(4.0 / 9.0) + math.log(1.0 / 9.0)))
      < 1e-12)
    // EM monotonicity on a larger corpus: loglik(θ_{k+1}) ≥ loglik(θ_k)
    val w2 = Array("▁the", "▁thin", "▁tin", "▁he", "▁hint")
    val c2 = Array(5L, 3L, 2L, 4L, 1L)
    var ps = (w2.flatMap(w => w.toSeq.map(_.toString)).distinct ++
      Seq("▁th", "th", "he", "in", "▁t", "hi")).distinct
    var lp = Array.fill(ps.length)(math.log(1.0 / ps.length))
    var last = Double.NegativeInfinity
    for (_ <- 1 to 5) {
      val (ex, ll) = Unigram.emStep(w2, c2, ps, lp, maxPieceLen = 4)
      assert(ll >= last - 1e-9, s"EM log-likelihood regressed: $ll < $last")
      last = ll
      val tot = ex.sum
      lp = ex.map(x => if (x <= 0.0) -1e9 else math.log(x / tot))
    }
    // pruning: singles survive any budget; the learned set fits it
    val singles = w2.flatMap(w => w.toSeq.map(_.toString)).toSet
    val seed = ps.map(p => (p, 5L))
    val learned = Unigram.trainDriver(w2, c2, seed, singles,
      budget = singles.size + 2, maxPieceLen = 4, emIters = 2,
      pruneFraction = 0.25)
    assert(learned.length <= singles.size + 2)
    assert(singles.forall(s => learned.exists(_._1 == s)),
      "a required single was pruned")
    // LIKELIHOOD-LOSS pruning (the sentencepiece criterion), pinned
    // by a fixture where it DISAGREES with expected-count ranking:
    // "th" is frequent (E ≈ high) but its constituents t,h are
    // themselves common, so rerouting th → t·h is cheap; "qz" is
    // rare but q,z appear ONLY inside it, so its alternative
    // segmentation is ruinously expensive. Count-ranking would prune
    // qz (the rarer piece); loss-ranking must prune th.
    val w3 = Array("th", "t", "h", "qz")
    val c3 = Array(50L, 50L, 50L, 3L)
    val s3 = Set("t", "h", "q", "z")
    val learned3 = Unigram.trainDriver(w3, c3,
      Array(("t", 50L), ("h", 50L), ("q", 3L), ("z", 3L),
        ("th", 50L), ("qz", 3L)),
      s3, budget = s3.size + 1, maxPieceLen = 4, emIters = 2,
      pruneFraction = 0.25)
    assert(learned3.exists(_._1 == "qz") &&
      !learned3.exists(_._1 == "th"),
      s"loss pruning picked ${learned3.map(_._1).toSeq} — expected " +
        "qz kept (expensive alternative) and th pruned (cheap " +
        "alternative)")
  }

  test("train end-to-end: the trained tokenizer carries <unk>, the " +
      "byte alphabet, and score-ordered learned pieces; encodes " +
      "zero-shuffle; roundtrips distributed decode∘encode back to " +
      "the marker rewrite; survives save -> load; refusals are loud") {
    import spark.implicits._
    val corpus = (Seq.fill(8)("the thin cat") ++
      Seq.fill(4)("a thin hat") ++ Seq.fill(2)("the cat sat"))
      .toDF("text")
    val tok = Unigram.train(corpus, "text", vocabSize = 300,
      maxPieceLen = 6)
    assert(tok.pieces.head == (("<unk>", 0.0)) && tok.unkId == 0)
    assert(tok.byteFallback &&
      tok.pieces.slice(1, 257).map(_._1) ==
        (0 until 256).map(x => f"<0x$x%02X>"))
    assert(tok.pieces.size <= 300)
    // learned pieces are score-descending after the byte block
    val learned = tok.pieces.drop(257)
    assert(learned.map(_._2).sliding(2).forall(s =>
      s.length < 2 || s(0) >= s(1)))
    // every corpus single survives as a piece
    assert("the thin cat".replace(" ", "▁").toSeq.map(_.toString)
      .forall(ch => learned.exists(_._1 == ch) ||
        tok.pieces.exists(_._1 == ch)))
    // the roundtrip identity the x126 oracle states
    for (t <- Seq("the thin cat", "a thin hat", "unseen words zq!"))
      assert(Unigram.decodeIds(encode(tok, t), tok) ==
        t.replace('▁', ' '))
    // save -> load identity
    val f = Files.createTempFile("graft_uni_train", ".json")
    Unigram.saveTokenizerJson(spark, tok, f.toString)
    assert(Unigram.loadTokenizerJson(spark, f.toString) == tok)
    // both EM homes agree: force the DISTRIBUTED E-step
    // (maxDriverWords = 0) — same trainLoop, same per-word core, so
    // pieces must match exactly and scores to aggregation-order
    // rounding
    val tokDist = Unigram.train(corpus, "text", vocabSize = 300,
      maxPieceLen = 6, maxDriverWords = 0L)
    assert(tokDist.pieces.map(_._1) == tok.pieces.map(_._1),
      "distributed E-step diverged from the driver E-step on pieces")
    tokDist.pieces.zip(tok.pieces).foreach { case ((p, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9, s"score drift on '$p': $a vs $b")
    }
    // refusal: a budget the singles cannot fit
    assert(intercept[IllegalArgumentException] {
      Unigram.train(corpus, "text", vocabSize = 260)
    }.getMessage.contains("raise vocabSize"))
  }

  test("Bayesian (digamma) M-step: psi matches its closed forms and " +
      "recurrence, the M-step is exactly Digamma(e_i) - Digamma(sum) " +
      "(hand-computed at half-integer expected counts), and plain ML " +
      "stays reachable") {
    val gamma = 0.5772156649015329 // Euler–Mascheroni
    // closed forms: psi(1) = −γ, psi(1/2) = −γ − 2 ln 2,
    // psi(3/2) = 2 − γ − 2 ln 2, psi(2) = 1 − γ, psi(3) = 3/2 − γ
    assert(math.abs(Unigram.digamma(1.0) + gamma) < 1e-10)
    assert(math.abs(Unigram.digamma(0.5) +
      gamma + 2 * math.log(2)) < 1e-10)
    assert(math.abs(Unigram.digamma(1.5) -
      (2.0 - gamma - 2 * math.log(2))) < 1e-10)
    assert(math.abs(Unigram.digamma(2.0) - (1.0 - gamma)) < 1e-10)
    assert(math.abs(Unigram.digamma(3.0) - (1.5 - gamma)) < 1e-10)
    // the recurrence psi(x+1) = psi(x) + 1/x across both branches of
    // the implementation (below and above the series cutoff)
    for (x <- Seq(0.1, 0.37, 0.5, 1.0, 2.3, 5.0, 6.9, 7.5, 40.0))
      assert(math.abs(Unigram.digamma(x + 1.0) -
        (Unigram.digamma(x) + 1.0 / x)) < 1e-9, s"recurrence at $x")
    // the M-step: expected (1, 1/2, 3/2), total 3 ⇒ logp =
    // (psi(1)−psi(3), psi(1/2)−psi(3), psi(3/2)−psi(3)) — the γs
    // cancel into pure closed forms: (−3/2, −2ln2 − 3/2, 1/2 − 2ln2)
    val lp = Unigram.mStepBayes(Array(1.0, 0.5, 1.5))
    assert(math.abs(lp(0) + 1.5) < 1e-10)
    assert(math.abs(lp(1) + 2 * math.log(2) + 1.5) < 1e-10)
    assert(math.abs(lp(2) - (0.5 - 2 * math.log(2))) < 1e-10)
    // zero expected mass floors at the −1e9 sentinel, not −Infinity
    assert(Unigram.mStepBayes(Array(0.0, 3.0))(0) == -1e9)
    // both M-steps produce trained artifacts whose roundtrip
    // identity holds; pieces may differ (that is the point) but the
    // required-singles invariant cannot
    import spark.implicits._
    val corpus = (Seq.fill(6)("the thin cat") ++
      Seq.fill(3)("a thin hat")).toDF("text")
    val bayes = Unigram.train(corpus, "text", vocabSize = 300,
      maxPieceLen = 6)
    val ml = Unigram.train(corpus, "text", vocabSize = 300,
      maxPieceLen = 6, bayesianMStep = false)
    for (tok <- Seq(bayes, ml); t <- Seq("the thin cat", "zq!"))
      assert(Unigram.decodeIds(encode(tok, t), tok) ==
        t.replace('▁', ' '))
  }

  test("truncation + padding blocks on the Unigram surface: honored " +
      "on encode (budget under the template), Fixed padding pads " +
      "with pad_id, save -> load identity, only_second refuses at " +
      "load (no pair surface), stride refuses") {
    import graft.operators.TokenizerTruncation
    def withBlocks(trunc: String, padding: String,
        postProcessor: String = "null"): String =
      tokJson(postProcessor = postProcessor).replaceFirst("\\{",
        s"""{"truncation": $trunc, "padding": $padding, """)
    // "a ab" encodes to [5, 5, 3]; max_length 2 with no template
    // keeps the head 2
    val tok = Unigram.loadTokenizerJson(spark, writeJson(withBlocks(
      """{"max_length": 2, "strategy": "LongestFirst", "stride": 0}""",
      "null")))
    assert(tok.truncation ==
      Some(TokenizerTruncation.Truncation(2, "longest_first", "right")))
    assert(encode(tok, "a ab") == Seq(5L, 5L))
    // under a BOS template the content budget shrinks by the
    // template id; padding fills to the Fixed length after it
    val bos = """{"type": "TemplateProcessing",
      | "single": [
      |   {"SpecialToken": {"id": "<unk>", "type_id": 0}},
      |   {"Sequence": {"id": "A", "type_id": 0}}],
      | "special_tokens": {
      |   "<unk>": {"id": "<unk>", "ids": [0],
      |     "tokens": ["<unk>"]}}}""".stripMargin
    val tokT = Unigram.loadTokenizerJson(spark, writeJson(withBlocks(
      """{"max_length": 3, "strategy": "LongestFirst", "stride": 0}""",
      """{"strategy": {"Fixed": 6}, "direction": "Right",
        | "pad_id": 1, "pad_type_id": 0}""".stripMargin, bos)))
    assert(encode(tokT, "a ab") == Seq(0L, 5L, 5L, 1L, 1L, 1L))
    // save -> load identity with both blocks
    val f = Files.createTempFile("graft_uni_trunc", ".json")
    Unigram.saveTokenizerJson(spark, tokT, f.toString)
    assert(Unigram.loadTokenizerJson(spark, f.toString) == tokT)
    // refusals
    def rejects(body: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Unigram.loadTokenizerJson(spark, writeJson(body))
      }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    locally {
      // only_second LOADS now that the pair surface exists; the
      // SINGLE-sequence encode under it refuses at plan time
      val tokOS = Unigram.loadTokenizerJson(spark, writeJson(
        withBlocks("""{"max_length": 4, "strategy": "OnlySecond",
          | "stride": 0}""".stripMargin, "null")))
      val e = intercept[IllegalArgumentException] {
        Unigram.encodeColumn(col("t"), tokOS)
      }
      assert(e.getMessage.contains("only_second"))
    }
    rejects(withBlocks(
      """{"max_length": 4, "strategy": "LongestFirst", "stride": 3}""",
      "null"), "stride")
    rejects(withBlocks("null", """{"strategy": "BatchLongest"}"""),
      "BatchLongest")
  }

  test("encodeWithOffsets: spans index the lattice string in CODE " +
      "POINTS — pieces, fused unk, byte-fallback spans (whole-span " +
      "offsets, per-code-point without fusing), astral plane, " +
      "template (0,0), truncation honored, and the ids agree with " +
      "the id kernel on every fixture") {
    import spark.implicits._
    def offsets(tok: Unigram.UnigramTokenizer, text: String)
        : Seq[(Long, Int, Int)] =
      Seq(("d", text)).toDF("id", "t")
        .transform(df => Unigram.encodeWithOffsets(df, "id", "t", tok))
        .collect()(0).getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val tok = Unigram.loadTokenizerJson(spark, writeJson(tokJson()))
    // "a ab" -> lattice "▁a▁ab": ▁a(0,2) ▁a(2,4) b(4,5)
    assert(offsets(tok, "a ab") ==
      Seq((5L, 0, 2), (5L, 2, 4), (3L, 4, 5)))
    // consecutive unknowns FUSE: "azzb" -> ▁a(0,2) unk(2,4) b(4,5)
    assert(offsets(tok, "azzb") ==
      Seq((5L, 0, 2), (0L, 2, 4), (3L, 4, 5)))
    // astral plane counts ONE code point: "a𝄞b" -> lattice ▁a𝄞b,
    // clef = chars 2-3 but cp 2; b lands at cp 3
    assert(offsets(tok, "a\uD834\uDD1Eb") ==
      Seq((5L, 0, 2), (0L, 2, 3), (3L, 3, 4)))
    // byte fallback WITHOUT an unk id: no fusing, each unknown code
    // point resolves alone — its byte tokens carry that span
    val tokB = Unigram.loadTokenizerJson(spark, writeJson(tokJson(
      vocab = """[["▁", -1.0], ["a", -2.0], ["b", -2.0],
                 | ["<0x7A>", -9.0]]""".stripMargin,
      unkId = "null", byteFallback = true)))
    assert(offsets(tokB, "azb") ==
      Seq((0L, 0, 1), (1L, 1, 2), (3L, 2, 3), (2L, 3, 4)))
    // byte fallback WITH an unk id: the fused span prices as a unit,
    // so EVERY byte token of it carries the whole span's offsets
    val tokBF = Unigram.loadTokenizerJson(spark, writeJson(tokJson(
      vocab = """[["<unk>", 0.0], ["▁", -1.0], ["a", -2.0],
                 | ["b", -2.0], ["<0x7A>", -9.0]]""".stripMargin,
      byteFallback = true)))
    assert(offsets(tokBF, "azzb") ==
      Seq((1L, 0, 1), (2L, 1, 2), (4L, 2, 4), (4L, 2, 4),
        (3L, 4, 5)))
    // template specials carry the published (0, 0) span
    val bos = """{"type": "TemplateProcessing",
      | "single": [
      |   {"SpecialToken": {"id": "<unk>", "type_id": 0}},
      |   {"Sequence": {"id": "A", "type_id": 0}}],
      | "special_tokens": {
      |   "<unk>": {"id": "<unk>", "ids": [0],
      |     "tokens": ["<unk>"]}}}""".stripMargin
    val tokT = Unigram.loadTokenizerJson(spark, writeJson(
      tokJson(postProcessor = bos)))
    assert(offsets(tokT, "a ab") ==
      Seq((0L, 0, 0), (5L, 0, 2), (5L, 2, 4), (3L, 4, 5)))
    // truncation applies to the offsets surface identically
    val tokTr = Unigram.loadTokenizerJson(spark, writeJson(
      tokJson().replaceFirst("\\{",
        """{"truncation": {"max_length": 2,
          | "strategy": "LongestFirst", "stride": 0}, """.stripMargin)))
    assert(offsets(tokTr, "a ab") == Seq((5L, 0, 2), (5L, 2, 4)))
    // the ONE-matcher guarantee, asserted behaviorally too: ids from
    // the offsets kernel equal the id kernel on every fixture
    for ((tk, t) <- Seq((tok, "a ab"), (tok, "azzb"),
        (tokB, "azb"), (tokBF, "azzb"), (tok, "abc")))
      assert(offsets(tk, t).map(_._1) == encode(tk, t),
        s"offsets ids diverged from encode on '$t'")
  }

  test("pair templates on the Unigram surface: (token_ids, type_ids) " +
      "hand-computed under <s> $A </s> $B:1 </s>:1, truncation and " +
      "padding + mask apply, save -> load identity, and a tokenizer " +
      "without a pair template refuses pair encode loudly") {
    import spark.implicits._
    val pairPost =
      """{"type": "TemplateProcessing",
        | "single": [
        |   {"SpecialToken": {"id": "<s>", "type_id": 0}},
        |   {"Sequence": {"id": "A", "type_id": 0}}],
        | "pair": [
        |   {"SpecialToken": {"id": "<s>", "type_id": 0}},
        |   {"Sequence": {"id": "A", "type_id": 0}},
        |   {"SpecialToken": {"id": "</s>", "type_id": 0}},
        |   {"Sequence": {"id": "B", "type_id": 1}},
        |   {"SpecialToken": {"id": "</s>", "type_id": 1}}],
        | "special_tokens": {
        |   "<s>": {"id": "<s>", "ids": [42], "tokens": ["<s>"]},
        |   "</s>": {"id": "</s>", "ids": [43], "tokens": ["</s>"]}}}"""
        .stripMargin
    def encodePair(tok: Unigram.UnigramTokenizer, a: String,
        b: String): (Seq[Long], Seq[Long]) = {
      val r = Seq(("d", a, b)).toDF("id", "a", "b")
        .transform(df => Unigram.encodePair(df, "id", "a", "b", tok))
        .collect()(0)
      (r.getSeq[Long](1), r.getSeq[Long](2))
    }
    val tok = Unigram.loadTokenizerJson(spark, writeJson(
      tokJson(postProcessor = pairPost)))
    assert(tok.pair.isDefined && tok.prefixIds == Seq(42L))
    // A = "a ab" -> [5, 5, 3]; B = "abc" -> [1, 6]
    assert(encodePair(tok, "a ab", "abc") ==
      ((Seq(42L, 5L, 5L, 3L, 43L, 1L, 6L, 43L),
        Seq(0L, 0L, 0L, 0L, 0L, 1L, 1L, 1L))))
    // truncation: max_length 7 over the 3 template ids leaves budget
    // 4; longest-first on (3, 2) keeps (2, 2)
    val tokTr = Unigram.loadTokenizerJson(spark, writeJson(
      tokJson(postProcessor = pairPost).replaceFirst("\\{",
        """{"truncation": {"max_length": 7,
          | "strategy": "LongestFirst", "stride": 0}, """.stripMargin)))
    assert(encodePair(tokTr, "a ab", "abc") ==
      ((Seq(42L, 5L, 5L, 43L, 1L, 6L, 43L),
        Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L))))
    // padding + positional mask through encodePairWithMask
    val tokP = Unigram.loadTokenizerJson(spark, writeJson(
      tokJson(postProcessor = pairPost).replaceFirst("\\{",
        """{"padding": {"strategy": {"Fixed": 10},
          | "direction": "Right", "pad_id": 0, "pad_type_id": 0}, """
          .stripMargin)))
    val r = Seq(("d", "a ab", "abc")).toDF("id", "a", "b")
      .transform(df =>
        Unigram.encodePairWithMask(df, "id", "a", "b", tokP))
      .collect()(0)
    assert(r.getSeq[Long](1) ==
      Seq(42L, 5L, 5L, 3L, 43L, 1L, 6L, 43L, 0L, 0L))
    assert(r.getSeq[Long](2) ==
      Seq(0L, 0L, 0L, 0L, 0L, 1L, 1L, 1L, 0L, 0L))
    assert(r.getSeq[Long](3) ==
      Seq(1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 0L, 0L))
    // save -> load identity includes the pair template and blocks
    val f = Files.createTempFile("graft_uni_pair", ".json")
    Unigram.saveTokenizerJson(spark, tokP, f.toString)
    assert(Unigram.loadTokenizerJson(spark, f.toString) == tokP)
    // no pair template -> loud refusal
    val tokSingle = Unigram.loadTokenizerJson(spark,
      writeJson(tokJson()))
    val e = intercept[IllegalArgumentException] {
      Unigram.encodePair(Seq(("d", "a", "b")).toDF("id", "a", "b"),
        "id", "a", "b", tokSingle)
    }
    assert(e.getMessage.contains("no PAIR template"))
  }

  test("encodeWithMask: the attention mask is POSITIONAL — a pad_id " +
      "colliding with a content piece still masks correctly") {
    import spark.implicits._
    // pad_id 1 is the ▁ piece — a value match against pad_id would
    // zero any real ▁ token; the positional mask cannot
    val tokP = Unigram.loadTokenizerJson(spark, writeJson(
      tokJson().replaceFirst("\\{",
        """{"padding": {"strategy": {"Fixed": 6},
          | "direction": "Right", "pad_id": 1, "pad_type_id": 0}, """
          .stripMargin)))
    val r = Seq(("d", "a b")).toDF("id", "t")
      .transform(df => Unigram.encodeWithMask(df, "id", "t", tokP))
      .collect()(0)
    // "a b" -> ▁a▁b -> [▁a, ▁, b] = [5, 1, 3]: a REAL ▁ token (id 1)
    // sits in content while the pads are also id 1
    assert(r.getSeq[Long](1) == Seq(5L, 1L, 3L, 1L, 1L, 1L))
    assert(r.getSeq[Long](2) == Seq(1L, 1L, 1L, 0L, 0L, 0L))
  }


  test("decoder block verified, never silently ignored: the Llama " +
      "Replace-ByteFallback-Fuse-Strip Sequence and the T5 Metaspace " +
      "decoder ACCEPT when their marker matches this tokenizer's, " +
      "mismatched markers and foreign decoder types refuse at load") {
    // the published Llama decoder chain IS the engine's decode
    val llama = Unigram.loadTokenizerJson(spark, writeJson(tokJson(
      decoder = """{"type": "Sequence", "decoders": [
        | {"type": "Replace", "pattern": {"String": "▁"},
        |  "content": " "},
        | {"type": "ByteFallback"}, {"type": "Fuse"},
        | {"type": "Strip", "content": " ", "start": 1,
        |  "stop": 0}]}""".stripMargin)))
    assert(encode(llama, "a b").nonEmpty)
    // the T5 Metaspace decoder with the matching replacement
    Unigram.loadTokenizerJson(spark, writeJson(tokJson(
      decoder =
        """{"type": "Metaspace", "replacement": "▁"}""")))
    // a mismatched Replace marker contradicts the tokenizer
    val e1 = intercept[IllegalArgumentException](
      Unigram.loadTokenizerJson(spark, writeJson(tokJson(
        decoder = """{"type": "Sequence", "decoders": [
          | {"type": "Replace", "pattern": {"String": "@"},
          |  "content": " "}]}""".stripMargin))))
    assert(e1.getMessage.contains("marker"))
    // a mismatched Metaspace replacement
    val e2 = intercept[IllegalArgumentException](
      Unigram.loadTokenizerJson(spark, writeJson(tokJson(
        decoder = """{"type": "Metaspace", "replacement": "@"}"""))))
    assert(e2.getMessage.contains("marker") ||
      e2.getMessage.contains("replacement"))
    // a foreign decoder type refuses
    val e3 = intercept[IllegalArgumentException](
      Unigram.loadTokenizerJson(spark, writeJson(tokJson(
        decoder = """{"type": "WordPiece"}"""))))
    assert(e3.getMessage.contains("decoder type"))
    // a foreign Sequence member refuses
    val e4 = intercept[IllegalArgumentException](
      Unigram.loadTokenizerJson(spark, writeJson(tokJson(
        decoder = """{"type": "Sequence", "decoders": [
          | {"type": "CTC"}]}""".stripMargin))))
    assert(e4.getMessage.contains("member"))
  }
}
