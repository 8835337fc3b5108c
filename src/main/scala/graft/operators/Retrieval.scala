package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-retrieval operators over an (id, text) corpus: term statistics,
  * TF-IDF scoring, BM25 ranking (Robertson/Sparck Jones weighting as
  * published in the Okapi BM25 literature), and inverted-index
  * construction. These are the indexing/scoring primitives of a
  * training-data curation stack (rare-term surfacing, query-driven doc
  * selection, postings for contamination lookups).
  *
  * Scale shape: everything is built from ONE explode of the tokenized
  * corpus followed by (id, term) / (term) aggregations — linear shuffles
  * keyed by term or doc, no self-joins. The per-term dictionary
  * (vocabulary-sized) joins back to the per-(doc,term) frequencies via a
  * plain equi-join that AQE broadcasts when small; corpus-scalar stats
  * (N, avg doc length) ride in as broadcast one-row frames, never
  * driver-side collected.
  *
  * Determinism: IDF-bearing scores are quantized to 1e-8 by
  * floor(score·10⁸) and compared/summed as exact longs, so rankings and
  * oracle compares are independent of partitioning, summation order, and
  * engine (the same construction as the x23 centroids; a raw double
  * `sum` is order-dependent, and cross-engine `ln` may differ in the
  * last ulp — quantization absorbs both).
  *
  * Caching: operators cache frames that feed multiple branches (e.g.
  * the BM25 term frequencies) and never unpersist them — the returned
  * frames are lazy and depend on the cache. Long-lived sessions scoring
  * many distinct corpora should `spark.catalog.clearCache()` between
  * corpora (the same contract as the dedup/similarity operators).
  */
object Retrieval {

  /** Per-(doc, term) frequencies from whitespace tokenization:
    * (id, token, tf). One explode + one aggregation.
    */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** One-row corpus scalar (broadcast, never collected): doc count. */
  private def corpusSize(df: DataFrame, idCol: String): DataFrame =
    broadcast(df.agg(count(lit(1)).as("n_total")))

  /** Smoothed IDF, quantized: floor(ln((N+1)/(df+1)) · 10⁸) as a long.
    * Shared by TF-IDF and the inverted index so the two agree exactly.
    */
  private def idfQ(nTotal: Column, docFreq: Column): Column =
    floor(log((nTotal.cast("double") + lit(1.0)) /
      (docFreq.cast("double") + lit(1.0))) * lit(1e8)).cast("long")

  /** Top-`topK` terms per document by TF-IDF (smoothed IDF), ties broken
    * by token. Output: (id, token, tf, score) where
    * score = tf·floor(idf·10⁸)/10⁸ — the ranking happens in exact
    * integer space.
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    val tf = termFrequencies(df, idCol, textCol)
    val docFreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val scored = tf.join(docFreq, "token")
      .crossJoin(corpusSize(df, idCol))
      .withColumn("score_q", col("tf") * idfQ(col("n_total"), col("df")))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score_q").desc, col("token"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("id"), col("token"), col("tf"),
        (col("score_q").cast("double") / lit(1e8)).as("score"))
  }

  /** Top-`topK` documents for a bag of query terms under BM25
    * (k1 = 1.2, b = 0.75). Per-term contributions are quantized to
    * 1e-8 longs BEFORE the per-doc sum, so the doc score is an exact
    * integer sum (order-independent) and the ranking is deterministic.
    * Output: (id, n_hit, score) — n_hit = how many query terms matched.
    */
  def bm25TopDocs(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // ONE tokenization pass feeds both the per-term frequencies and the
    // doc lengths (dl = Σ tf per doc; token-less docs rejoin with dl = 0
    // so N and avgdl still count the whole corpus) — tokenizing is the
    // expensive kernel, and a separate size(tokens) projection would
    // run it a second time over every document
    val tfAll = graft.core.CacheScope.cached(
      termFrequencies(df, idCol, textCol))
    val docLen = df.select(col(idCol).as("id"))
      .join(tfAll.groupBy(col("id")).agg(sum(col("tf")).as("dl")),
        Seq("id"), "left")
      .withColumn("dl", coalesce(col("dl"), lit(0L)))
    val stats = broadcast(docLen.agg(count(lit(1)).as("n_total"),
      sum(col("dl")).as("sum_dl")))
    val tf = tfAll.filter(col("token").isin(queryTerms: _*))
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_total").cast("double")
    // Robertson idf: ln(1 + (N − df + 0.5)/(df + 0.5))
    val idf = log(lit(1.0) +
      (col("n_total").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val contrib = idf * ((col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl))))
    tf.join(docFreq, "token")
      .join(docLen, "id")
      .crossJoin(stats)
      .withColumn("contrib_q", floor(contrib * lit(1e8)).cast("long"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("contrib_q")).as("score_q"))
      .orderBy(col("score_q").desc, col("id"))
      .limit(topK)
      .select(col("id"), col("n_hit"),
        (col("score_q").cast("double") / lit(1e8)).as("score"))
  }

  /** Inverted index: one row per term with document frequency, corpus
    * frequency, and the first `postingsCap` doc ids (ascending) as a
    * comma-joined postings preview. df/cf aggregate over ALL postings;
    * only the preview string is capped (the cap is part of the output
    * contract, not silent truncation).
    *
    * ONE aggregation keyed by term, and the postings cap runs through
    * the bounded-state [[graft.functions.Aggregators.TopKRows]] buffer
    * (score = −id ⇒ rank order = ascending id) — NOT a per-term ranking
    * window: stopword-class terms have corpus-sized posting lists, and
    * a window would sort each of them in full under the exchange, while
    * the top-k buffer carries at most `postingsCap` rows per (term,
    * partition) and merges in O(cap).
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      postingsCap: Int): DataFrame = {
    val tf = termFrequencies(df, idCol, textCol)
    val firstIds = udaf(new graft.functions.Aggregators.TopKRows(postingsCap))
    tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        firstIds(-col("id").cast("double"), col("id"), lit(0L)).as("top"))
      .withColumn("postings",
        array_join(transform(col("top.key1"), _.cast("string")), ","))
      .drop("top")
  }
}
