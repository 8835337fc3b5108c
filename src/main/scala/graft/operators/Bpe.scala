package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application — the
  * tokenization leg of a training-data pipeline (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016).
  *
  * Scale design: training NEVER iterates over the corpus. One shuffle
  * builds the word HISTOGRAM (vocab-sized — grows sublinearly in corpus
  * bytes, the reason corpus-scale BPE training is feasible at all), and
  * every merge iteration runs on that cached histogram: pair counts are
  * weighted by word frequency, so the result is identical to counting
  * over the raw corpus. Applying a merge rewrites the histogram's
  * symbol strings with one non-overlapping leftmost-first regexp pass —
  * the same convention reference BPE implementations use — and each
  * iteration materializes the tiny frame so plan depth stays O(1), not
  * O(iterations).
  *
  * Encoding mirrors the trick: distinct words are encoded ONCE (again
  * vocab-sized work) and broadcast-joined back to the corpus — the
  * per-document cost is a map-side join probe, independent of the
  * merge-table size.
  *
  * Words are [[TextFunctions.bpeTokenPattern]] matches (letter runs,
  * digit runs, single marks) — the same pre-tokenization the rest of
  * the engine uses. Symbols within a word start as single characters;
  * merges apply within words only, in rank order, leftmost-first.
  */
object Bpe {

  /** Regex-literal quote for a symbol (symbols can be `.`/`+`/... from
    * punctuation words).
    */
  private def q(s: String): String = java.util.regex.Pattern.quote(s)

  /** Replacement-literal quote (`$` and `\` are group refs otherwise). */
  private def qr(s: String): String =
    java.util.regex.Matcher.quoteReplacement(s)

  /** Word histogram with each word exploded into space-joined,
    * space-padded single-character symbols (`" h i "`): the padded form
    * makes "adjacent pair" a regexp-visible property with zero-width
    * boundaries, so merge application is one codegen'd regexp_replace.
    */
  def wordHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol),
        lit(TextFunctions.bpeTokenPattern), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("weight"))
      .withColumn("syms", charPad(col("word")))

  /** `"hi"` → `" h i "`: single-char symbols, space-joined and padded.
    * regexp_extract_all('.') rather than split("") — the latter leaves
    * a trailing empty element under Spark's limit=-1 semantics.
    */
  private def charPad(word: org.apache.spark.sql.Column) =
    concat(lit(" "),
      array_join(regexp_extract_all(word, lit("."), lit(0)), " "),
      lit(" "))

  /** One iteration's pair counts over the histogram: adjacent symbol
    * pairs weighted by word frequency. Exposed for the oracle-side
    * story and specs; `train` uses it internally.
    */
  def pairCounts(hist: DataFrame): DataFrame = {
    val syms = split(trim(col("syms")), " ")
    hist.select(col("weight"), syms.as("a"))
      .select(col("weight"), col("a"),
        posexplode(col("a")).as(Seq("i", "left")))
      .withColumn("right", try_element_at(col("a"), col("i") + 2))
      .filter(col("right").isNotNull)
      .groupBy(col("left"), col("right"))
      .agg(sum(col("weight")).as("pair_count"))
  }

  /** The trained merge table: `numMerges` rows of (rank, left, right,
    * merged, pair_count), rank 1 first. Ties break deterministically
    * (count desc, then left asc, right asc) so training is a pure
    * function of the corpus. Stops early when no adjacent pair occurs
    * at least `minCount` times (default 2 — merging singletons only
    * bloats the vocab).
    *
    * Driver work per iteration: ONE collected row (the argmax). Each
    * iteration TRUNCATES LINEAGE with `localCheckpoint` — a persisted
    * chain keeps the full logical plan, and because both cache printing
    * and pair-count expression inlining reference the previous
    * iteration's symbols more than once, the composed plan DOUBLES per
    * merge (measured: 376 MB of plan text by merge 18 on a 31-word
    * vocabulary, then driver OOM). Truncation makes each histogram a
    * plan leaf: constant-size plans for any merge count, and the
    * materialized frame stays vocab-sized — same device as
    * [[ConnectedComponents]]' per-round truncation. Blocks are
    * reclaimed by the context cleaner as frames are dereferenced.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L): Seq[(Int, String, String, String, Long)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var hist = wordHistogram(df, textCol).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = pairCounts(hist)
        .filter(col("pair_count") >= minCount)
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((rank, l, r, l + r, c))
        hist = applyMerge(hist, l, r).localCheckpoint()
        rank += 1
      }
    }
    merges.result()
  }

  /** Rewrite the histogram's padded symbol strings for one merge:
    * leftmost-first non-overlapping replacement of adjacent (l, r),
    * zero-width space boundaries so back-to-back occurrences all merge
    * in one pass (`" a b a b "` → `" ab ab "`).
    */
  private[operators] def applyMerge(hist: DataFrame, l: String,
      r: String): DataFrame =
    hist.withColumn("syms", regexp_replace(col("syms"),
      s"(?<= )${q(l)} ${q(r)}(?= )", qr(l + r)))

  /** Encode a corpus with a trained merge table: every row gets
    * `tokens` (the word's subword symbols, in order, words
    * concatenated) and `n_tokens`. Distinct words are encoded once by
    * folding the ranked merges into a chain of regexp passes over the
    * padded symbol form, then broadcast-joined back onto the exploded
    * corpus — per-document work is a map-side probe, so encoding cost
    * scales with corpus size + vocab size, never their product.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(Int, String, String, String, Long)]): DataFrame = {
    val words = df.select(col(idCol),
        posexplode(regexp_extract_all(col(textCol),
          lit(TextFunctions.bpeTokenPattern), lit(0)))
          .as(Seq("word_pos", "word")))
    val distinctWords = words.select(col("word")).distinct()
      .withColumn("syms", charPad(col("word")))
    val encoded = merges.sortBy(_._1).foldLeft(distinctWords) {
      case (acc, (_, l, r, _, _)) => applyMerge(acc, l, r)
    }.withColumn("word_tokens", split(trim(col("syms")), " "))
      .select(col("word").as("__w"), col("word_tokens"))
    words.join(broadcast(encoded), col("word") === col("__w"))
      .groupBy(col(idCol))
      .agg(flatten(array_sort(collect_list(
          struct(col("word_pos"), col("word_tokens"))))
          .getField("word_tokens")).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }
}
