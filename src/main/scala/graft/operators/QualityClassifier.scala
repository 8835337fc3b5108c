package graft.operators

import graft.expressions.HashedBucket
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned quality filtering — a hashed-feature logistic-regression
  * classifier, the model-based document filter of the public
  * training-data pipelines (CCNet's fastText LM filter, Wenzek et al.
  * LREC'20; the GPT-3 and DCLM quality classifiers): train a linear
  * model on a LABELED SAMPLE, then apply the frozen weights to the
  * whole corpus as a pure map-side pass. Complements the heuristic
  * scorers (x11) with the learned family. No counterpart in the
  * reference (it has no query/scoring surface — SURVEY §0).
  *
  * Exactness contract (the repo's quantized-long idiom):
  *  - Features are hashed token counts — bucket = first 16 md5 bits of
  *    the token scaled to [0, dim), statable in Spark SQL and DuckDB
  *    alike ([[HashedBucket.bucketOf]]).
  *  - Weights are LONGS in units of 1e-9. A document's logit is
  *    `biasQ + Σ_tokens weightsQ(bucket)` — exact integer arithmetic,
  *    so scoring is deterministic, partitioning-independent, and
  *    bit-for-bit statable as a SQL oracle (x81).
  *  - Training accumulates per-document gradient contributions
  *    quantized to 1e-9 longs and sums them exactly, so the trained
  *    weights are ALSO partitioning-independent and equal an
  *    independent driver-side reference trainer verbatim (the x75/x76
  *    gating style — asserted in QualityClassifierSpec). The σ link is
  *    transcendental and every iteration's gradient depends on the
  *    previous weights through it, so no SQL oracle can restate
  *    training (the x75 argument); x82 is spec-gated.
  *
  * Scale shape: INFERENCE — the 100 TB pass — is one compiled
  * map-side kernel per document, zero exchanges (PlanSpec-pinned).
  * TRAINING runs on the labeled sample (quality labels exist for
  * thousands-to-millions of documents, never the full corpus);
  * per iteration it is one `treeAggregate` pass producing dim+1 longs
  * on the driver — no shuffle, state O(dim). Exact-long gradient
  * accumulation is loudly bounded: Σ tokens over the sample must stay
  * below `maxExactTokens` (default 8e9 — far above any real labeled
  * set) so quantized contributions cannot overflow a long.
  */
object QualityClassifier {

  /** Weight/gradient quantum: longs carry units of 1e-9. */
  val Quant: Long = 1000000000L

  /** A trained (or frozen reference) model: quantized bias + per-bucket
    * quantized weights, dim = weightsQ.length.
    */
  case class Model(biasQ: Long, weightsQ: Array[Long]) {
    def dim: Int = weightsQ.length
  }

  /** Deterministic frozen reference weights (splitmix64 per bucket,
    * the [[graft.expressions.HyperplaneBucket.coef]] device) —
    * uniform in [-1, 1) quantized; bias fixed at -0.05. The x81
    * oracle emits exactly these longs as SQL literals.
    */
  def refModel(seed: Int, dim: Int = 64): Model = {
    val wq = Array.tabulate(dim) { b =>
      var z = (seed.toLong * 0x9E3779B97F4A7C15L) +
        ((b.toLong + 1L) * 0xBF58476D1CE4E5B9L)
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      val u = (z >>> 11).toDouble / (1L << 52).toDouble // [0, 2)
      math.floor((u - 1.0) * Quant).toLong
    }
    Model(-Quant / 20, wq)
  }

  /** Score every document under frozen weights: `(id, n_tokens,
    * logit_q, keep)` with logit_q = biasQ + Σ_tokens wq(bucket) and
    * keep = logit_q > 0. Pure map-side compiled pass — zero exchanges;
    * null text scores as empty (bias-only).
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val st = logitColumn(coalesce(col(textCol), lit("")), model).as("st")
    df.select(col(idCol), st)
      .select(col(idCol),
        element_at(col("st"), 1).as("n_tokens"),
        element_at(col("st"), 2).as("logit_q"),
        (element_at(col("st"), 2) > 0L).as("keep"))
  }

  /** The `[n_tokens, logit_q]` kernel as a Column (exposed for specs). */
  def logitColumn(text: Column, model: Model): Column =
    graft.expressions.GraftFunctions.hashedLinearLogit(text,
      model.weightsQ.toSeq, model.biasQ)

  /** Calibration sweep over a labeled sample — the step between
    * training and deployment: a quality filter ships with a THRESHOLD,
    * and picking it needs the exact confusion counts at each
    * candidate. One scoring pass (the compiled logit kernel) explodes
    * against the threshold list (human-sized, ≤ 1024) and aggregates
    * map-side, so the only exchange carries |thresholds| rows; counts
    * are exact longs (logits are exact integers — x81's contract) and
    * precision/recall are emitted in integer BASIS POINTS
    * (`floor(10⁴·tp/(tp+fp))`), so the whole report is bit-for-bit
    * statable in SQL (x86's oracle). Undefined ratios (empty
    * denominator) report -1, never a division error.
    */
  def calibrationReport(df: DataFrame, textCol: String, labelCol: String,
      model: Model, thresholdsQ: Seq[Long]): DataFrame = {
    require(thresholdsQ.nonEmpty && thresholdsQ.size <= 1024,
      s"threshold list must have 1..1024 entries, got ${thresholdsQ.size}")
    require(thresholdsQ.distinct.size == thresholdsQ.size,
      "threshold list has duplicates")
    val st = logitColumn(coalesce(col(textCol), lit("")), model)
    val scored = df.select(col(labelCol).cast("long").as("__y"),
      element_at(st, 2).as("__logit"))
    val counts = scored
      .select(col("__y"), col("__logit"),
        explode(lit(thresholdsQ.toArray)).as("threshold_q"))
      .groupBy(col("threshold_q"))
      .agg(
        sum(when(col("__y") === 1L && col("__logit") > col("threshold_q"),
          1L).otherwise(0L)).as("tp"),
        sum(when(col("__y") =!= 1L && col("__logit") > col("threshold_q"),
          1L).otherwise(0L)).as("fp"),
        sum(when(col("__y") =!= 1L && col("__logit") <= col("threshold_q"),
          1L).otherwise(0L)).as("tn"),
        sum(when(col("__y") === 1L && col("__logit") <= col("threshold_q"),
          1L).otherwise(0L)).as("fn"))
    counts
      .withColumn("precision_bp",
        when(col("tp") + col("fp") > 0,
          expr("(tp * 10000) div (tp + fp)")).otherwise(-1L))
      .withColumn("recall_bp",
        when(col("tp") + col("fn") > 0,
          expr("(tp * 10000) div (tp + fn)")).otherwise(-1L))
  }

  /** Hashed bucket counts as a Column (the training feature vector). */
  def countsColumn(text: Column, dim: Int): Column =
    graft.expressions.GraftFunctions.hashedBucketCounts(text, dim)

  /** Train by full-batch gradient descent over the labeled sample.
    *
    * Per iteration: one pass over the cached feature vectors computes
    * the exact quantized gradient (`treeAggregate` of dim+1 longs —
    * per-document logits are exact longs under the current weights, so
    * σ and the residual are deterministic doubles, and each document's
    * contribution `floor(r·cnt_b·1e9)` is an exact long summed in ANY
    * order). Updates apply classical momentum on the driver
    * (`v = μ·v + gradQ/n; wq -= round(lr·v)`) — scalar double ops over
    * exact sums, so the whole trajectory is reproducible across runs,
    * partitionings, and executor counts, and equals the driver-side
    * reference trainer verbatim.
    *
    * @param labelCol 0/1 integer-castable label column
    * @param maxExactTokens loud overflow bound on Σ sample tokens
    * @param docsPerPartition iteration-partition sizing (docs per
    *   task, capped at cluster parallelism) — exposed so tests can
    *   force a genuinely multi-partition treeAggregate; the default
    *   keeps per-job task-scheduling overhead below the per-row
    *   arithmetic on small labeled samples
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
      dim: Int = 64, iters: Int = 40, lr: Double = 0.5,
      momentum: Double = 0.9,
      maxExactTokens: Long = 8000000000L,
      docsPerPartition: Long = 50000L): Model = {
    require(docsPerPartition > 0,
      s"docsPerPartition must be positive, got $docsPerPartition")
    val spark = df.sparkSession
    import spark.implicits._
    // cache the DESERIALIZED feature tuples, not the Dataset: every
    // iteration re-reads them, and per-pass row decode would dominate
    // the dim-long arithmetic. Persist FIRST and derive n + the token
    // total from ONE pass over the cached tuples, so the sample is
    // tokenized and bucketed exactly once (the stats pass is also the
    // cache-materializing pass).
    val base = df.select(col(labelCol).cast("long").as("y"),
        countsColumn(coalesce(col(textCol), lit("")), dim).as("cnts"))
    val feat0 = base.as[(Long, Array[Long])].rdd.persist()
    try {
      val (n, totalTokens) = feat0.treeAggregate((0L, 0L))(
        seqOp = (acc, row) => {
          val c = row._2
          var s = 0L
          var i = 0
          while (i < c.length) { s += c(i); i += 1 }
          (acc._1 + 1L, acc._2 + s)
        },
        combOp = (a, b) => (a._1 + b._1, a._2 + b._2))
      require(n > 0, "training requires at least one labeled document")
      require(totalTokens <= maxExactTokens,
        s"training sample has $totalTokens tokens > maxExactTokens=" +
          s"$maxExactTokens: exact-long gradient accumulation could " +
          "overflow — train on a smaller labeled sample (inference " +
          "has no such bound)")
      // iteration partitioning sized to the SAMPLE: an iteration is a
      // full-sample job, so a thousand-task fan-out over a 5k-doc
      // labeled set costs more in scheduling than in math. coalesce
      // over the persisted parent reuses the cached blocks.
      val parts = math.max(1L, math.min(
        spark.sparkContext.defaultParallelism.toLong,
        n / docsPerPartition + 1L)).toInt
      val feat = feat0.coalesce(parts)
      var biasQ = 0L
      val wq = new Array[Long](dim)
      // classical momentum, driver-side: velocities are scalar double
      // ops over the EXACT long gradient sums, so the whole trajectory
      // stays deterministic and partitioning-independent; it converges
      // ~3x faster than plain GD on these count features (fewer corpus
      // passes is the win at sample scale too)
      var vBias = 0.0
      val vW = new Array[Double](dim)
      for (_ <- 0 until iters) {
        val w = wq.clone() // closure-captured; dim longs per task binary
        val bq = biasQ
        val grad = feat.treeAggregate(new Array[Long](dim + 1))(
          seqOp = (acc, row) => {
            val y = row._1
            val cnts = row._2
            var logitQ = bq
            var b = 0
            while (b < dim) { logitQ += w(b) * cnts(b); b += 1 }
            val p = 1.0 / (1.0 + math.exp(-logitQ.toDouble / Quant.toDouble))
            val r = p - y.toDouble
            acc(0) += math.floor(r * Quant.toDouble).toLong
            b = 0
            while (b < dim) {
              if (cnts(b) != 0L)
                acc(b + 1) +=
                  math.floor(r * cnts(b).toDouble * Quant.toDouble).toLong
              b += 1
            }
            acc
          },
          combOp = (a, b) => {
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            a
          })
        vBias = momentum * vBias + grad(0).toDouble / n.toDouble
        biasQ -= math.round(lr * vBias)
        var b = 0
        while (b < dim) {
          vW(b) = momentum * vW(b) + grad(b + 1).toDouble / n.toDouble
          wq(b) -= math.round(lr * vW(b))
          b += 1
        }
      }
      Model(biasQ, wq)
    } finally feat0.unpersist()
  }
}
