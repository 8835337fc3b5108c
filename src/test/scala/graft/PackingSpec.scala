package graft

import graft.functions.TextFunctions
import graft.operators.{Bpe, Dedup, Packing}
import org.apache.spark.sql.functions._

/** Materialized-sequence packing: the document-boundary straddle
  * arithmetic (where the off-by-ones live), provenance spans, the
  * trained-merge configuration, and sequence-level decontamination's
  * planted cross-boundary catch. The zero-merge byte configuration is
  * additionally oracle-checked end-to-end by x96/x97.
  */
class PackingSpec extends SparkSpec {

  private def byteIds(s: String): Seq[Long] =
    s.getBytes("UTF-8").map(b => (b & 0xff).toLong).toSeq

  test("materializeSequences: hand-computed fixture — straddling doc " +
      "splits across two sequences, spans carry exact positions, only " +
      "the stratum tail is incomplete, zero-token docs vanish") {
    import spark.implicits._
    val df = Seq(
      ("s1", 0L, ""), //       0 tokens → no fragment anywhere
      ("s1", 1L, "abcd"), //   [0,4)
      ("s1", 2L, "efghij"), // [4,10) — straddles the 5-cut
      ("s1", 3L, "kl"), //     [10,12) — partial tail
      ("s2", 9L, "zz") //      fresh stratum, partial
    ).toDF("lang", "doc_id", "text")
    val got = Packing.materializeSequences(df, "doc_id", "text", "lang",
        seqLen = 5, merges = Nil,
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r)
      .toMap
    assert(got.keySet == Set(("s1", 0L), ("s1", 1L), ("s1", 2L),
      ("s2", 0L)))

    def ids(k: (String, Long)): Seq[Long] =
      got(k).getSeq[Long](got(k).fieldIndex("token_ids"))
    def spans(k: (String, Long)): Seq[(Long, Long, Long)] =
      got(k).getSeq[org.apache.spark.sql.Row](
        got(k).fieldIndex("doc_spans"))
        .map(s => (s.getLong(0), s.getLong(1), s.getLong(2)))
    def complete(k: (String, Long)): Boolean =
      got(k).getBoolean(got(k).fieldIndex("complete"))

    // seq 0 = "abcd" + first byte of the straddler
    assert(ids(("s1", 0L)) == byteIds("abcde"))
    assert(spans(("s1", 0L)) == Seq((0L, 1L, 4L), (4L, 2L, 1L)))
    assert(complete(("s1", 0L)))
    // seq 1 = the straddler's remaining five bytes, one span
    assert(ids(("s1", 1L)) == byteIds("fghij"))
    assert(spans(("s1", 1L)) == Seq((0L, 2L, 5L)))
    assert(complete(("s1", 1L)))
    // stratum tail: partial, never padded
    assert(ids(("s1", 2L)) == byteIds("kl"))
    assert(spans(("s1", 2L)) == Seq((0L, 3L, 2L)))
    assert(!complete(("s1", 2L)))
    assert(ids(("s2", 0L)) == byteIds("zz") && !complete(("s2", 0L)))

    // dropIncomplete removes exactly the two partial tails
    val kept = Packing.materializeSequences(df, "doc_id", "text",
        "lang", seqLen = 5, merges = Nil, dropIncomplete = true,
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .select(col("lang"), col("seq_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept == Set(("s1", 0L), ("s1", 1L)))
  }

  test("materializeSequences under TRAINED merges: flattened sequence " +
      "ids equal the map-side encoder's concatenated per-document ids " +
      "in id order — materialization never re-tokenizes differently") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
    val merges = Bpe.trainBytes(d.limit(80), "text", numMerges = 20,
      tokenPattern = TextFunctions.bpeBytePatternFull)
    val seqs = Packing.materializeSequences(d, "doc_id", "text", "lang",
      seqLen = 128, merges = merges,
      tokenPattern = TextFunctions.bpeBytePatternFull)
    val gotStream = seqs.collect()
      .groupBy(_.getString(0)).view.mapValues(rows =>
        rows.sortBy(_.getLong(1))
          .flatMap(r => r.getSeq[Long](r.fieldIndex("token_ids"))).toSeq)
      .toMap
    val vocab = Bpe.vocabBytes(merges)
    val vocabIdx = vocab.map { case (t, i) => (t, i) }.toMap
    val wantStream = Bpe.encodeMapSide(
        d.select(col("lang"), col("doc_id"), col("text")),
        "doc_id", "text", merges, byteLevel = true,
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
      .collect()
      .groupBy(_.getString(3)).view.mapValues(rows =>
        rows.sortBy(_.getLong(0))
          .flatMap(_.getSeq[String](1).map(vocabIdx)).toSeq)
      .toMap
    assert(gotStream.keySet == wantStream.keySet)
    gotStream.keySet.foreach { lang =>
      assert(gotStream(lang) == wantStream(lang),
        s"token stream diverged for lang=$lang")
    }
  }

  test("materializeSequences with docSeparator: every document ends " +
      "with the reserved id (empty docs contribute their lone " +
      "separator), the separator consumes budget and can itself " +
      "straddle a cut into the next sequence") {
    import spark.implicits._
    val eot = "<|endoftext|>"
    val sep = 256L // zero merges + one special ⇒ first reserved id
    val df = Seq(
      ("s1", 1L, "abcd"), //  content [0,4), sep at 4 → seq 0 exactly
      ("s1", 2L, ""), //      EMPTY: its separator alone at [5,6)
      ("s1", 3L, "efghi"), // [6,11) + sep at 11 — spans seqs 1 and 2
      ("s2", 7L, "vwxyz") //  content fills seq 0; the SEP straddles
    ).toDF("lang", "doc_id", "text")
    val got = Packing.materializeSequences(df, "doc_id", "text", "lang",
        seqLen = 5, merges = Nil, specialTokens = Seq(eot),
        docSeparator = Some(eot),
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap

    def ids(k: (String, Long)): Seq[Long] =
      got(k).getSeq[Long](got(k).fieldIndex("token_ids"))
    def spans(k: (String, Long)): Seq[(Long, Long, Long)] =
      got(k).getSeq[org.apache.spark.sql.Row](
        got(k).fieldIndex("doc_spans"))
        .map(s => (s.getLong(0), s.getLong(1), s.getLong(2)))

    assert(ids(("s1", 0L)) == byteIds("abcd") :+ sep)
    assert(spans(("s1", 0L)) == Seq((0L, 1L, 5L)))
    // the empty document survives as its separator, span included
    assert(ids(("s1", 1L)) == sep +: byteIds("efgh"))
    assert(spans(("s1", 1L)) == Seq((0L, 2L, 1L), (1L, 3L, 4L)))
    assert(ids(("s1", 2L)) == byteIds("i") :+ sep)
    assert(spans(("s1", 2L)) == Seq((0L, 3L, 2L)))
    // s2: content fills sequence 0 exactly; the separator ALONE
    // straddles into sequence 1
    assert(ids(("s2", 0L)) == byteIds("vwxyz"))
    assert(ids(("s2", 1L)) == Seq(sep))
    assert(spans(("s2", 1L)) == Seq((0L, 7L, 1L)))
    // an unregistered separator fails loudly, never a silent -1 id
    val ex = intercept[RuntimeException] {
      Packing.materializeSequences(df, "doc_id", "text", "lang", 5,
        Nil, docSeparator = Some(eot))
    }
    assert(ex.getMessage.contains("not in specialTokens"),
      ex.getMessage)
  }

  test("tokenFrequencyBytes under TRAINED merges equals a driver-side " +
      "count over the map-side encoder's tokens, ids from the shared " +
      "vocabulary") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
    val merges = Bpe.trainBytes(d.limit(100), "text", numMerges = 25)
    val got = Bpe.tokenFrequencyBytes(d, "text", merges)
      .select(col("token"), col("n"), col("id"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val vocabIdx = Bpe.vocabBytes(merges).toMap
    val want = Bpe.encodeMapSide(d, "doc_id", "text", merges,
        byteLevel = true)
      .collect().flatMap(_.getSeq[String](1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (tok, (n, id)) =>
      assert(n == want(tok), s"count diverged for '$tok'")
      assert(id == vocabIdx(tok), s"id diverged for '$tok'")
    }
  }

  test("packNoStraddle: whole-document first-fit — hand fixture, " +
      "truncation clamp, budget property on real data, and " +
      "partitioning independence of the sequential fold") {
    import spark.implicits._
    val df = Seq(
      ("s1", 0L, ""), //        0 tokens → rides at seq 0, begin 0
      ("s1", 1L, "aaa"), //     3 → seq 0
      ("s1", 2L, "bbbb"), //    4 → does not fit (3+4>5) → seq 1
      ("s1", 3L, "c"), //       1 → fits beside it (4+1≤5) → seq 1 @4
      ("s1", 4L, "x" * 9), //   9 > 5 → TRUNCATED to 5, alone in seq 2
      ("s2", 9L, "zz") //       fresh stratum resets the fold
    ).toDF("lang", "doc_id", "text")
    val got = Packing.packNoStraddle(df, "doc_id", "text", "lang",
        seqLen = 5, merges = Nil,
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got(("s1", 0L)) == ((0L, false, 0L, 0L)))
    assert(got(("s1", 1L)) == ((3L, false, 0L, 0L)))
    assert(got(("s1", 2L)) == ((4L, false, 1L, 0L)))
    assert(got(("s1", 3L)) == ((1L, false, 1L, 4L)))
    assert(got(("s1", 4L)) == ((5L, true, 2L, 0L)))
    assert(got(("s2", 9L)) == ((2L, false, 0L, 0L)))

    // real corpus: per-sequence budgets hold, offsets are the running
    // sums of the documents placed before them, nothing straddles
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
    val real = Packing.packNoStraddle(d, "doc_id", "text", "lang",
        seqLen = 512, merges = Nil,
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5)))
    assert(real.nonEmpty)
    real.groupBy(r => (r._1, r._4)).foreach { case (key, rows) =>
      assert(rows.map(_._3).sum <= 512L, s"budget exceeded in $key")
      var expect = 0L
      rows.sortBy(_._2).foreach { case (_, id, n, _, begin) =>
        assert(begin == expect, s"offset gap at doc $id in $key")
        expect += n
      }
    }
    // the fold is a pure function of (stratum, id order, counts)
    val re = Packing.packNoStraddle(d.repartition(7), "doc_id", "text",
        "lang", seqLen = 512, merges = Nil,
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    real.foreach { case (lang, id, n, sid, begin) =>
      assert(re((lang, id)) == ((n, sid, begin)))
    }
  }

  test("materializeNoStraddle: placement-ordered ids, truncation " +
      "slices, pad fill to exactly seqLen, spans carry truncation " +
      "flags, unregistered pad token rejected") {
    import spark.implicits._
    val pad = "<pad>"
    val padId = 256L
    val df = Seq(
      ("s1", 1L, "aaa"), //   3 → seq 0
      ("s1", 2L, "c"), //     1 → seq 0 @3
      ("s1", 3L, "bbbb"), //  4 → 4+4>5 → seq 1
      ("s1", 4L, "x" * 9) //  TRUNCATED to 5 → seq 2
    ).toDF("lang", "doc_id", "text")
    val got = Packing.materializeNoStraddle(df, "doc_id", "text",
        "lang", seqLen = 5, merges = Nil, specialTokens = Seq(pad),
        padToken = Some(pad),
        tokenPattern = TextFunctions.bpeBytePatternFull)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    def seqOf(k: (String, Long), c: String): Seq[Long] =
      got(k).getSeq[Long](got(k).fieldIndex(c))
    def lng(k: (String, Long), c: String): Long =
      got(k).getLong(got(k).fieldIndex(c))
    assert(seqOf(("s1", 0L), "token_ids") == byteIds("aaac"))
    assert(seqOf(("s1", 0L), "padded_ids") == byteIds("aaac") :+ padId)
    assert(lng(("s1", 0L), "n_pad") == 1L)
    assert(seqOf(("s1", 1L), "padded_ids") == byteIds("bbbb") :+ padId)
    // the truncated doc: exactly the first five bytes, flag in span
    assert(seqOf(("s1", 2L), "token_ids") == byteIds("xxxxx"))
    assert(lng(("s1", 2L), "n_pad") == 0L)
    val k2 = ("s1", 2L)
    val spans2 = got(k2).getSeq[org.apache.spark.sql.Row](
        got(k2).fieldIndex("doc_spans"))
      .map(s => (s.getLong(0), s.getLong(1), s.getLong(2), s.getBoolean(3)))
    assert(spans2 == Seq((0L, 4L, 5L, true)))
    // every padded row is exactly seqLen long
    got.values.foreach { r =>
      assert(r.getSeq[Long](r.fieldIndex("padded_ids")).length == 5)
    }
    val ex = intercept[RuntimeException] {
      Packing.materializeNoStraddle(df, "doc_id", "text", "lang", 5,
        Nil, padToken = Some(pad))
    }
    assert(ex.getMessage.contains("not in specialTokens"), ex.getMessage)
  }

  test("lengthGroupedBatches: descending-length chunks of batchSize, " +
      "each padding to its own max; grouped padding never exceeds " +
      "arrival-order padding on real data") {
    import spark.implicits._
    val df = Seq(("a", 1L, "0123456789"), ("a", 2L, "012345678"),
      ("a", 3L, "012"), ("a", 4L, "01"), ("a", 5L, "0"))
      .toDF("lang", "doc_id", "text")
    val got = graft.operators.Packing.lengthGroupedBatches(df,
        "doc_id", "text", "lang", batchSize = 2, merges = Nil,
        tokenPattern = graft.functions.TextFunctions.bpeBytePatternFull)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(r.fieldIndex("batch_id")),
          r.getLong(r.fieldIndex("batch_max")),
          r.getLong(r.fieldIndex("padding")))).toMap
    assert(got(1L) == (0L, 10L, 0L) && got(2L) == (0L, 10L, 1L))
    assert(got(3L) == (1L, 3L, 0L) && got(4L) == (1L, 3L, 1L))
    assert(got(5L) == (2L, 1L, 0L), "the tail batch pads to itself")

    // property on real data: batches are ≤ batchSize; total padding
    // beats batching in id order (the reason the operator exists)
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
    val b = 8
    val grouped = graft.operators.Packing.lengthGroupedBatches(corpus,
      "doc_id", "text", "lang", b, Nil,
      tokenPattern = graft.functions.TextFunctions.bpeBytePatternFull)
    val sizes = grouped.groupBy(col("lang"), col("batch_id")).count()
      .agg(max(col("count"))).head.getLong(0)
    assert(sizes <= b)
    val groupedPad = grouped.agg(sum(col("padding"))).head.getLong(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
    val naive = corpus
      .select(col("lang"), col("doc_id"),
        octet_length(col("text")).cast("long").as("n"))
      .withColumn("bid", expr(s"(row_number() over (partition by lang " +
        s"order by doc_id) - 1) div $b"))
    val naivePad = naive.groupBy(col("lang"), col("bid"))
      .agg((max(col("n")) * count(lit(1)) - sum(col("n"))).as("p"))
      .agg(sum(col("p"))).head.getLong(0)
    assert(groupedPad <= naivePad,
      s"length grouping must not pad more than arrival order: " +
        s"$groupedPad vs $naivePad")
  }

  test("sequenceContamination: a benchmark shingle SPANNING a document" +
      "boundary flags the packed sequence while document-level " +
      "screening sees nothing — the gap this operator exists for") {
    import spark.implicits._
    // doc 1 ends "eee fff", doc 2 begins "ggg hhh": the benchmark
    // trigram crosses the boundary, so neither document contains it —
    // only the packed stream does (doc 1's trailing space keeps the
    // words separated in the concatenation)
    val docsDf = Seq(
      (1L, "train", "aaa bbb ccc ddd eee fff "),
      (2L, "train", "ggg hhh iii jjj kkk lll")).toDF(
      "doc_id", "lang", "text")
    val bench = Seq(Tuple1("eee fff ggg hhh")).toDF("text")

    // document-level screening: clean on both docs
    val docReport = Dedup.contaminationReport(
      bench.select(lit(0L).as("doc_id"), col("text")), docsDf,
      "doc_id", "text", k = 3, num = 1, den = 10)
    assert(docReport.filter(col("contaminated")).count() == 0,
      "planted contamination must be invisible at document level")

    // sequence-level: the single packed sequence is flagged
    val seqs = Packing.materializeSequences(docsDf, "doc_id", "text",
      "lang", seqLen = 64, merges = Nil,
      tokenPattern = TextFunctions.bpeBytePatternFull)
    assert(seqs.count() == 1)
    val report = Packing.sequenceContamination(seqs, "lang", bench,
      "text", merges = Nil, k = 3, num = 1, den = 10).collect()
    assert(report.length == 1)
    val r = report(0)
    assert(r.getBoolean(r.fieldIndex("contaminated")),
      "cross-boundary contamination must be flagged at sequence level")
    assert(r.getLong(r.fieldIndex("n_shared")) == 2L,
      "both boundary-spanning benchmark trigrams must count as shared")
  }
}
