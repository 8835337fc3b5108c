package graft

import graft.functions.TextFunctions
import graft.operators.{Bpe, Sft}
import org.apache.spark.sql.functions._

/** SFT example preparation: turn parsing, mask alignment, marker ids,
  * preamble handling, and the trained-merge path against per-turn
  * map-side encoding. The zero-merge byte configuration is
  * additionally oracle-checked end-to-end by x103.
  */
class SftSpec extends SparkSpec {

  private def byteIds(s: String): Seq[Long] =
    s.getBytes("UTF-8").map(b => (b & 0xff).toLong).toSeq

  test("lossMaskedExamples: hand transcript — three turns in order, " +
      "mask 1 on assistant content only, markers as reserved ids, " +
      "preamble before the first marker dropped, markerless doc empty") {
    import spark.implicits._
    val df = Seq(
      (1L, "PRE<|user|>hi<|assistant|>yes ok<|user|>bye"),
      (2L, "no markers here")).toDF("doc_id", "chat")
    val got = Sft.lossMaskedExamples(df, "doc_id", "chat",
        roles = Seq("user", "assistant"), maskRole = "assistant",
        merges = Nil,
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect().map(r => r.getLong(0) -> r).toMap
    val userId = 256L // zero merges: specials follow the byte alphabet
    val asstId = 257L
    val r1 = got(1L)
    val ids = r1.getSeq[Long](r1.fieldIndex("token_ids"))
    val mask = r1.getSeq[Int](r1.fieldIndex("loss_mask"))
    assert(ids == (userId +: byteIds("hi")) ++
      (asstId +: byteIds("yes ok")) ++ (userId +: byteIds("bye")),
      "PRE must be dropped; turns must keep order")
    assert(mask == Seq(0, 0, 0) ++ (0 +: Seq.fill(6)(1)) ++
      Seq(0, 0, 0, 0), "mask must cover assistant content only")
    assert(r1.getLong(r1.fieldIndex("n_turns")) == 3L)
    assert(r1.getLong(r1.fieldIndex("n_tokens")) == ids.length.toLong)
    assert(r1.getLong(r1.fieldIndex("n_masked")) == 6L)
    val r2 = got(2L)
    assert(r2.getLong(r2.fieldIndex("n_turns")) == 0L)
    assert(r2.getSeq[Long](r2.fieldIndex("token_ids")).isEmpty)

    // guards: unknown maskRole, non-word role
    intercept[IllegalArgumentException] {
      Sft.lossMaskedExamples(df, "doc_id", "chat", Seq("user"),
        "assistant", Nil)
    }
    intercept[IllegalArgumentException] {
      Sft.lossMaskedExamples(df, "doc_id", "chat", Seq("us er"),
        "us er", Nil)
    }
  }

  test("lossMaskedExamples under TRAINED merges: each turn's ids " +
      "equal the map-side encoder on that turn's content — " +
      "segment-wise tokenization never crosses a marker") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull).limit(60)
    val merges = Bpe.trainBytes(corpus, "text", numMerges = 20,
      tokenPattern = TextFunctions.bpeBytePatternFull)
    val markers = Seq("<|user|>", "<|assistant|>")
    val vocab = Bpe.vocabBytes(merges, markers)
    val userId = vocab.find(_._1 == markers.head).get._2
    val asstId = vocab.find(_._1 == markers(1)).get._2
    val chats = corpus.select(col("doc_id"),
      col("text").substr(lit(1), (length(col("text")) / 2).cast("int"))
        .as("u"),
      col("text").substr((length(col("text")) / 2).cast("int") + 1,
        length(col("text")).cast("int")).as("a"))
    val got = Sft.lossMaskedExamples(
        chats.select(col("doc_id"), concat(lit("<|user|>"), col("u"),
          lit("<|assistant|>"), col("a")).as("chat")),
        "doc_id", "chat", Seq("user", "assistant"), "assistant",
        merges, tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](r.fieldIndex("token_ids")),
          r.getSeq[Int](r.fieldIndex("loss_mask")))).toMap
    val vocabIdx = vocab.toMap
    def enc(dfc: org.apache.spark.sql.DataFrame, c: String) =
      Bpe.encodeMapSide(dfc.withColumnRenamed(c, "t"), "doc_id", "t",
          merges, byteLevel = true,
          tokenPattern = TextFunctions.bpeBytePatternFull)
        .collect().map(r => r.getLong(0) ->
          r.getSeq[String](1).map(vocabIdx)).toMap
    val uIds = enc(chats.select(col("doc_id"), col("u")), "u")
    val aIds = enc(chats.select(col("doc_id"), col("a")), "a")
    got.foreach { case (id, (ids, mask)) =>
      val want = (userId +: uIds(id)) ++ (asstId +: aIds(id))
      assert(ids == want, s"doc $id token stream diverged")
      val wantMask = (0 +: Seq.fill(uIds(id).length)(0)) ++
        (0 +: Seq.fill(aIds(id).length)(1))
      assert(mask == wantMask, s"doc $id mask diverged")
    }
  }

  test("packExamples: hand fixture — whole examples first-fit, mask " +
      "and position ids ride the same fold (positions reset per " +
      "example, truncation clips all three identically), pad fill to " +
      "seqLen with mask 0 / position 0, zero-token example kept in " +
      "provenance") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, "<|user|>hi<|assistant|>yo!"), // 7 tokens
      ("a", 2L, "<|user|>ab<|assistant|>cdef"), // 8 tokens
      ("a", 3L, "<|user|>0123456789ABCDEF<|assistant|>XYZ"), // 21 > 16
      ("b", 4L, "no markers")) // 0 tokens
      .toDF("lang", "doc_id", "chat")
    val got = Sft.packExamples(df, "doc_id", "chat", "lang",
        seqLen = 16, roles = Seq("user", "assistant"),
        maskRole = "assistant", merges = Nil,
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val (userId, asstId, padId) = (256L, 257L, 258L)

    // (a, 0): docs 1 (begin 0) and 2 (begin 7), 15 tokens + 1 pad
    val a0 = got(("a", 0L))
    val ids0 = a0.getSeq[Long](a0.fieldIndex("token_ids"))
    assert(ids0 == (userId +: byteIds("hi")) ++
      (asstId +: byteIds("yo!")) ++ (userId +: byteIds("ab")) ++
      (asstId +: byteIds("cdef")))
    assert(a0.getSeq[Int](a0.fieldIndex("loss_mask")) ==
      Seq(0, 0, 0, 0, 1, 1, 1) ++ Seq(0, 0, 0, 0, 1, 1, 1, 1))
    assert(a0.getSeq[Long](a0.fieldIndex("position_ids")) ==
      (0L until 7L) ++ (0L until 8L), "positions must reset at the " +
        "second example's boundary")
    assert(a0.getLong(a0.fieldIndex("n_examples")) == 2L)
    assert(a0.getLong(a0.fieldIndex("n_tokens")) == 15L)
    assert(a0.getLong(a0.fieldIndex("n_masked")) == 7L)
    assert(a0.getLong(a0.fieldIndex("n_pad")) == 1L)
    assert(a0.getSeq[Long](a0.fieldIndex("padded_ids")) ==
      ids0 :+ padId)
    assert(a0.getSeq[Int](a0.fieldIndex("padded_mask")).length == 16)
    assert(a0.getSeq[Int](a0.fieldIndex("padded_mask")).last == 0)
    assert(a0.getSeq[Long](a0.fieldIndex("padded_positions")).last == 0L)

    // (a, 1): doc 3 truncated at 16 — marker + 15 user bytes, no
    // assistant content survives, so the mask is all zero and the
    // span is flagged
    val a1 = got(("a", 1L))
    val ids1 = a1.getSeq[Long](a1.fieldIndex("token_ids"))
    assert(ids1 == userId +: byteIds("0123456789ABCDE"))
    assert(a1.getSeq[Int](a1.fieldIndex("loss_mask")) ==
      Seq.fill(16)(0))
    assert(a1.getSeq[Long](a1.fieldIndex("position_ids")) ==
      (0L until 16L))
    assert(a1.getLong(a1.fieldIndex("n_masked")) == 0L)
    assert(a1.getLong(a1.fieldIndex("n_pad")) == 0L)
    val spans1 = a1.getSeq[org.apache.spark.sql.Row](
      a1.fieldIndex("doc_spans"))
    assert(spans1.map(s => (s.getLong(0), s.getLong(1), s.getLong(2),
      s.getBoolean(3))) == Seq((0L, 3L, 16L, true)))

    // (b, 0): the markerless doc — empty stream, all pad, provenance
    // span with n = 0
    val b0 = got(("b", 0L))
    assert(b0.getLong(b0.fieldIndex("n_tokens")) == 0L)
    assert(b0.getSeq[Long](b0.fieldIndex("padded_ids")) ==
      Seq.fill(16)(padId))
    assert(b0.getSeq[org.apache.spark.sql.Row](
      b0.fieldIndex("doc_spans")).map(s => (s.getLong(0), s.getLong(1),
      s.getLong(2))) == Seq((0L, 4L, 0L)))

    // pad token must not collide with a marker
    intercept[IllegalArgumentException] {
      Sft.packExamples(df, "doc_id", "chat", "lang", 16,
        Seq("user", "assistant"), "assistant", Nil,
        padToken = "<|user|>")
    }
  }

  test("packExamples under TRAINED merges: each sequence's stream is " +
      "the placement-ordered concat of lossMaskedExamples' clipped " +
      "streams — packing can never re-tokenize differently") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull).limit(60)
    val merges = Bpe.trainBytes(corpus, "text", numMerges = 20,
      tokenPattern = TextFunctions.bpeBytePatternFull)
    val chats = corpus.select(col("lang"), col("doc_id"),
      concat(lit("<|user|>"),
        col("text").substr(lit(1), (length(col("text")) / 2).cast("int")),
        lit("<|assistant|>"),
        col("text").substr((length(col("text")) / 2).cast("int") + 1,
          length(col("text")).cast("int"))).as("chat"))
    val seqLen = 256
    val perDoc = Sft.lossMaskedExamples(chats, "doc_id", "chat",
        Seq("user", "assistant"), "assistant", merges,
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](r.fieldIndex("token_ids")),
          r.getSeq[Int](r.fieldIndex("loss_mask")))).toMap
    val packed = Sft.packExamples(chats, "doc_id", "chat", "lang",
        seqLen, Seq("user", "assistant"), "assistant", merges,
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect()
    assert(packed.nonEmpty)
    packed.foreach { r =>
      val spans = r.getSeq[org.apache.spark.sql.Row](
        r.fieldIndex("doc_spans")).sortBy(_.getLong(0))
      val wantIds = spans.flatMap(s =>
        perDoc(s.getLong(1))._1.take(seqLen))
      val wantMask = spans.flatMap(s =>
        perDoc(s.getLong(1))._2.take(seqLen))
      assert(r.getSeq[Long](r.fieldIndex("token_ids")) == wantIds)
      assert(r.getSeq[Int](r.fieldIndex("loss_mask")) == wantMask)
      val wantPos = spans.flatMap(s => 0L until math.min(
        perDoc(s.getLong(1))._1.length, seqLen).toLong)
      assert(r.getSeq[Long](r.fieldIndex("position_ids")) == wantPos)
    }
  }

  test("preferencePairs: the prompt prefix is IDENTICAL across both " +
      "streams even when a trained merge would cross the prompt/" +
      "completion boundary; eos, clipping, and flags behave") {
    import spark.implicits._
    // merge "ab" is the trap: tokenizing prompt+completion jointly
    // would merge the prompt's trailing 'a' with the completion's
    // leading 'b'; per-piece tokenization must not
    val merges = Seq((0, "a", "b", "ab", 5L))
    val df = Seq((1L, "xa", "bcd", "bz")).toDF("id", "p", "c", "r")
    val got = Sft.preferencePairs(df, "id", "p", "c", "r", merges,
        eosToken = Some("<|eos|>"), specialTokens = Seq("<|eos|>"),
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect().head
    val eos = 257L // 256 bytes + 1 merge ⇒ specials start at 257
    val chosen = got.getSeq[Long](got.fieldIndex("chosen_ids"))
    val rejected = got.getSeq[Long](got.fieldIndex("rejected_ids"))
    // prompt "xa" must stay [x, a] — never merged into the completion
    assert(chosen == Seq('x'.toLong, 'a'.toLong, 'b'.toLong,
      'c'.toLong, 'd'.toLong, eos),
      "the boundary 'a'+'b' must NOT merge across prompt/completion")
    assert(rejected == Seq('x'.toLong, 'a'.toLong, 'b'.toLong,
      'z'.toLong, eos))
    assert(chosen.take(got.getLong(got.fieldIndex("n_prompt")).toInt) ==
      rejected.take(got.getLong(got.fieldIndex("n_prompt")).toInt))
    assert(!got.getBoolean(got.fieldIndex("chosen_truncated")))

    // but a merge INSIDE one piece does apply
    val df2 = Seq((1L, "q", "ab", "cc")).toDF("id", "p", "c", "r")
    val got2 = Sft.preferencePairs(df2, "id", "p", "c", "r", merges,
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect().head
    assert(got2.getSeq[Long](got2.fieldIndex("chosen_ids")) ==
      Seq('q'.toLong, 256L), "'ab' inside the completion must merge")

    // clipping: maxLen cuts the whole stream, flags fire, eos is lost
    val got3 = Sft.preferencePairs(df, "id", "p", "c", "r", merges,
        maxLen = 4, eosToken = Some("<|eos|>"),
        specialTokens = Seq("<|eos|>"),
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect().head
    assert(got3.getSeq[Long](got3.fieldIndex("chosen_ids")) ==
      Seq('x'.toLong, 'a'.toLong, 'b'.toLong, 'c'.toLong))
    assert(got3.getBoolean(got3.fieldIndex("chosen_truncated")))
    assert(got3.getLong(got3.fieldIndex("n_chosen")) == 4L)
    assert(got3.getLong(got3.fieldIndex("n_prompt")) == 2L)

    // eos not registered as a special token is rejected loudly
    intercept[IllegalArgumentException] {
      Sft.preferencePairs(df, "id", "p", "c", "r", merges,
        eosToken = Some("<|eos|>"))
    }
  }

  test("bestOfN: argmax → chosen, argmin → rejected, margin and count " +
      "right; reward ties break by candidate id deterministically; a " +
      "single candidate yields chosen = rejected with margin 0") {
    import spark.implicits._
    val df = Seq(
      ("p1", 1L, "a", 1.0), ("p1", 2L, "b", 5.0), ("p1", 3L, "c", 3.0),
      // all-tied rewards: highest id wins max, lowest wins min
      ("p2", 4L, "d", 2.0), ("p2", 5L, "e", 2.0), ("p2", 6L, "f", 2.0),
      // single candidate
      ("p3", 7L, "g", 9.0))
      .toDF("prompt", "cand_id", "cand", "reward")
    val got = Sft.bestOfN(df, "prompt", "cand_id", "cand", "reward")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getString(5), r.getDouble(6))).toMap
    assert(got("p1") == ((3L, 2L, "b", 1L, "a", 4.0)))
    assert(got("p2") == ((3L, 6L, "f", 4L, "d", 0.0)))
    assert(got("p3") == ((1L, 7L, "g", 7L, "g", 0.0)))
    // pure function of the data: repartitioning changes nothing
    val re = Sft.bestOfN(df.repartition(5, col("cand_id")), "prompt",
        "cand_id", "cand", "reward")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(re == got.view.mapValues(_._2).toMap)
  }
}
