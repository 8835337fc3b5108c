package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Concatenate-and-chunk sequence packing — the standard pretraining
  * batching step: documents are concatenated in a deterministic order
  * within a stratum and the token stream is cut into fixed-budget
  * training sequences; a document may straddle a cut (GPT-style packing,
  * as opposed to padding each document to the budget).
  *
  * The assignment is a pure function of (stratum, id order, token
  * counts): every offset is an exact integer running sum, so shards can
  * be packed independently, re-runs are byte-stable, and a downstream
  * loader can seek any sequence id directly.
  *
  * Scale shape: one shuffle keyed by the stratum column, then a
  * per-stratum prefix sum (ordered window). The stratum IS the
  * parallelism unit — at 100 TB you pack per shard/language/source (the
  * x22 shard assignment produces exactly such strata), never globally:
  * a single global token stream would serialize the scan.
  */
object Packing {

  /** Assign each document its `[begin_offset, begin_offset + n_bpe)`
    * token interval in its stratum's packed stream, plus the first/last
    * training-sequence ids it lands in under `seqLen`-token cuts and a
    * `straddles` flag (document crosses a cut). Zero-token documents
    * carry the offset where they sit and never straddle.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, seqLen: Int): DataFrame =
    packCounts(df.select(col(strataCol), col(idCol),
        TextFunctions.bpeTokenCount(col(textCol)).cast("long")
          .as("n_bpe")),
      idCol, strataCol, seqLen)

  /** [[packSequences]] budgeted by the REAL tokenizer: `n_bpe` comes
    * from the map-side BPE kernel ([[graft.expressions
    * .BpeEncodeTokens]]) under a trained merge table, so the packing
    * currency is actual model tokens, not the regex approximation —
    * at 100 TB a 2× count mismatch is a 2× sequence-budget error, so
    * real pipelines pack by the tokenizer they train with. Same
    * deterministic offsets, same one-shuffle-per-stratum shape (the
    * count itself is a pure projection — zero extra shuffles).
    *
    * With `merges = Nil` under [[TextFunctions.bpeBytePatternFull]]
    * and `byteLevel`, `n_bpe` is EXACTLY the document's UTF-8 byte
    * count (every byte its own token) — the oracle-checkable identity
    * x95 uses to certify the whole offset/cut/straddle chain
    * relationally; trained-merge counts are gated by BpeSpec's
    * kernel ≡ join-encoder equality instead.
    */
  def packSequencesBpe(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, seqLen: Int,
      merges: Seq[(Int, String, String, String, Long)],
      byteLevel: Boolean = true,
      tokenPattern: String = TextFunctions.bpeTokenPattern): DataFrame =
    packCounts(df.select(col(strataCol), col(idCol),
        size(graft.expressions.GraftFunctions.bpeEncode(col(textCol),
          merges.sortBy(_._1).map(m => (m._1, m._2, m._3)),
          tokenPattern, byteLevel)).cast("long").as("n_bpe")),
      idCol, strataCol, seqLen)

  /** The shared offset/cut/straddle chain over a (strata, id, n_bpe)
    * frame — every packing variant differs only in how it counts.
    */
  private def packCounts(counts: DataFrame, idCol: String,
      strataCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
    counts
      .withColumn("end_offset", sum(col("n_bpe")).over(w))
      .withColumn("begin_offset", col("end_offset") - col("n_bpe"))
      .withColumn("seq_id", expr(s"begin_offset div $seqLen"))
      .withColumn("seq_last",
        when(col("n_bpe") > 0, expr(s"(end_offset - 1) div $seqLen"))
          .otherwise(col("seq_id")))
      .withColumn("straddles", col("seq_id") =!= col("seq_last"))
      .drop("end_offset")
  }
}
