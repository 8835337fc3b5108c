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

  test("sequenceContamination: a benchmark shingle SPANNING a document " +
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
