package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Learned data SELECTION by importance weighting — the DSIR recipe
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023 — public): score each raw document by
  * `log p_target(doc) − p_raw(doc)` under two bag-of-hashed-n-gram
  * unigram models, one fit on a small target corpus (the distribution
  * you WANT — e.g. curated reference text) and one on the raw pool.
  * Documents whose hashed-bigram profile looks target-like score high;
  * resampling the pool ∝ these weights shifts the training mix toward
  * the target distribution without a learned classifier.
  *
  * This is the third selection family in the engine, complementing the
  * heuristic scorers ([[graft.functions.TextFunctions]] quality) and
  * the trained classifier ([[QualityClassifier]]): model-based, but
  * fit by COUNTING — no gradient, no iteration, so the whole chain is
  * oracle-statable.
  *
  * Determinism/exactness: features are word bigrams hashed to
  * `numBuckets` buckets through the engine's md5 device (16-bit prefix
  * scaled by `numBuckets`, the [[Sampling.shuffleShards]] arithmetic
  * — statable in any engine with md5); bucket probabilities are
  * add-one smoothed `(c + 1)/(N + B)`; each bucket's log term is
  * quantized to a 1e-10 fixed-point long BEFORE the per-document sum
  * (the x24/x25/x44 pattern — cross-engine ln agrees to ~1 ulp, so
  * quantize-then-sum keeps the aggregate engine-exact). The score is
  * the long `score_q` = Σ (q_target − q_raw); divide by 1e10 for
  * nats.
  *
  * Scale shape: both model fits are ONE bucket-keyed aggregate whose
  * output is ≤ `numBuckets` rows by construction (map-side partial
  * combine does the heavy lifting; nothing corpus-sized crosses the
  * exchange). The term table is `numBuckets` rows — bounded by the
  * caller-capped parameter, never by the data — so its join back onto
  * the exploded features is an explicit broadcast; the per-document
  * sum is one id-keyed aggregate. At 100 TB: two linear scans for the
  * models (the target one is small by definition), one linear scoring
  * scan. Selection on the weights composes with the existing samplers
  * ([[Sampling.weightedSample]] for sampled DSIR, the x30 bounded
  * top-k for hard selection).
  */
object Selection {

  /** Per-document importance weights: `(idCol, n_features, score_q)`
    * for every raw document with at least one bigram (single-token and
    * empty documents have no features under a bigram model — they are
    * excluded rather than given a fake neutral score; callers decide
    * their fate explicitly). `score_q` is Σ over the document's
    * bigrams of the 1e-10-quantized smoothed log-ratio — positive =
    * target-like. Duplicate bigrams in a document count each
    * occurrence, exactly like the paper's bag model.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, numBuckets: Int = 1024): DataFrame = {
    require(numBuckets >= 2 && numBuckets <= 65536,
      s"numBuckets must be in [2, 65536], got $numBuckets")
    // ONE tokenize+bigram+md5 pass over the raw pool serves BOTH the
    // raw-side fit and the scoring pass (they used to be two full
    // scans); only the narrow (id, bucket) rows are cached. The target
    // fit is its own (target-sized) pass, as before.
    val rb = graft.core.CacheScope.cached(
      bigramBuckets(raw, textCol, numBuckets, col(idCol))
        .select(col(idCol), col("__bucket")))
    val terms = dsirTermsFromRawModel(
      rb.groupBy(col("__bucket")).agg(count(lit(1)).as("__c")),
      target, textCol, numBuckets, raw.sparkSession)
    rb.join(broadcast(terms), col("__bucket") === terms("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
        sum(col("term_q")).as("score_q"))
  }

  private def bigramBuckets(df: DataFrame, textCol: String, b: Int,
      extra: Column*): DataFrame = {
    // tokens bound ONCE per row (bindOnce): the old non-empty filter +
    // collapsed generator re-evaluated the tokenize kernel up to 4x per
    // row; the when-guard inside the binding keeps the same "< 2 tokens
    // emit nothing" semantics with zero pushable predicate
    val bg = graft.expressions.GraftFunctions.bindOnce(Seq(
      ("t", TextFunctions.tokens(col(textCol)))))( f =>
      when(size(f("t")) >= 2,
        transform(slice(f("t"), lit(1), size(f("t")) - 1),
          (x, i) => concat(x, lit(" "), element_at(f("t"), i + 2))))
        .otherwise(array().cast("array<string>")))
    df.select((extra :+ explode(bg).as("__bg")): _*)
      .withColumn("__bucket", expr(
        s"(CAST(conv(substring(md5(__bg), 1, 4), 16, 10) AS BIGINT)" +
          s" * $b) div 65536"))
  }

  /** FIT the two bucket models and return the frozen term table:
    * `(bucket, term_q)`, exactly `numBuckets` rows — `term_q` is the
    * 1e-10-quantized `log p_target(bucket) − log p_raw(bucket)` under
    * add-one smoothing. This is the model artifact of the DSIR split:
    * fit once here, score forever with [[dsirScore]] — including over
    * a STREAM (the scorer is a broadcast stream-static join + one
    * aggregation), and persist/reload as a plain `numBuckets`-row
    * parquet like any dimension table.
    */
  def dsirTerms(raw: DataFrame, target: DataFrame, textCol: String,
      numBuckets: Int = 1024): DataFrame = {
    require(numBuckets >= 2 && numBuckets <= 65536,
      s"numBuckets must be in [2, 65536], got $numBuckets")
    dsirTermsFromRawModel(
      bigramBuckets(raw, textCol, numBuckets).groupBy(col("__bucket"))
        .agg(count(lit(1)).as("__c")),
      target, textCol, numBuckets, raw.sparkSession)
  }

  /** [[dsirTerms]] body over a PRE-AGGREGATED raw bucket model
    * (`mr0`: (__bucket, __c)) — lets [[dsirWeights]] derive the raw fit
    * from the same cached bucket rows its scorer consumes instead of
    * re-scanning the raw pool.
    */
  private def dsirTermsFromRawModel(mr0: DataFrame, target: DataFrame,
      textCol: String, b: Int,
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    // full bucket table (buckets absent from a corpus still carry
    // their smoothed term), both counts, both totals — numBuckets
    // rows end to end, bounded by the caller's require, hence the
    // explicit broadcasts; models cached so each corpus is scanned
    // once for its fit (≤ numBuckets cached rows)
    val mt = graft.core.CacheScope.cached(
      bigramBuckets(target, textCol, b).groupBy(col("__bucket"))
        .agg(count(lit(1)).as("__c")))
    val mr = graft.core.CacheScope.cached(mr0)
    def q(c: Column, n: Column): Column =
      floor(log((c + 1).cast("double") / (n + b).cast("double"))
        * lit(1e10)).cast("long")
    spark.range(0, b).select(col("id").as("bucket"))
      .join(mt.withColumnRenamed("__c", "__ct"),
        col("bucket") === col("__bucket"), "left").drop("__bucket")
      .join(mr.withColumnRenamed("__c", "__cr"),
        col("bucket") === col("__bucket"), "left").drop("__bucket")
      .na.fill(0L, Seq("__ct", "__cr"))
      // empty corpora degrade to the uniform smoothed model (N = 0)
      // instead of null scores
      .crossJoin(broadcast(mt.agg(
        coalesce(sum(col("__c")), lit(0L)).as("__nt"))))
      .crossJoin(broadcast(mr.agg(
        coalesce(sum(col("__c")), lit(0L)).as("__nr"))))
      .select(col("bucket"),
        (q(col("__ct"), col("__nt")) - q(col("__cr"), col("__nr")))
          .as("term_q"))
  }

  /** SCORE documents under a frozen [[dsirTerms]] table: features →
    * broadcast term join → one id-keyed sum. `numBuckets` must be the
    * value the terms were fit with (the bucket hash must agree).
    * Works unchanged on a streaming frame — the join is stream-static
    * against the bounded broadcast table and the aggregation is the
    * per-micro-batch grouped sum a `foreachBatch` scorer runs; the
    * batch form is what [[dsirWeights]] delegates to.
    */
  def dsirScore(df: DataFrame, idCol: String, textCol: String,
      terms: DataFrame, numBuckets: Int = 1024): DataFrame = {
    require(numBuckets >= 2 && numBuckets <= 65536,
      s"numBuckets must be in [2, 65536], got $numBuckets")
    bigramBuckets(df, textCol, numBuckets, col(idCol))
      .join(broadcast(terms),
        col("__bucket") === terms("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
        sum(col("term_q")).as("score_q"))
  }
}
