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
}
