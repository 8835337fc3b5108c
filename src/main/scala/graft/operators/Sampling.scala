package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Randomness comes from a cryptographic hash of the row key, never an
  * RNG: the sample is a pure function of the data, so it is identical
  * across runs, engines, partitionings, and incremental re-ingests —
  * the property that makes dataset splits and ablation samples
  * reproducible (same rationale as the x21 hash split).
  */
object Sampling {

  /** Exact-rate stratified sample: EXACTLY ⌈n_g · num/den⌉ rows from
    * each group, chosen by md5-hash order of the id (uniform within the
    * group, deterministic). All rank arithmetic is integer, so the
    * selection is engine-exact.
    *
    * Scale shape: one shuffle keyed by the group column; each group is
    * ranked independently (partitioned window, no global sort). For
    * groups big enough that a per-group sort hurts, the approximate-rate
    * alternative is a pure map-side hash-threshold filter
    * (md5(id) < rate·2¹²⁸) — this operator is the exact-count form.
    */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
      rateNum: Int, rateDen: Int): DataFrame = {
    require(rateNum >= 0 && rateDen > 0, "rate must be a valid fraction")
    val h = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col(groupCol)).orderBy(h, col(idCol))
    val cw = Window.partitionBy(col(groupCol))
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__cnt", count(lit(1)).over(cw))
      // keep rn <= ceil(cnt·num/den), computed as (cnt·num + den−1) div den
      .filter(col("__rn") <=
        expr(s"(__cnt * $rateNum + ${rateDen - 1}) div $rateDen"))
      .drop("__rn", "__cnt")
  }

  /** Approximate-rate hash-threshold sample: keep a row iff the first 8
    * hex digits of md5(id) fall below rate·16⁸ — a PURE MAP-SIDE filter
    * (no shuffle, no window, no per-group state), the sampling form that
    * actually runs at 100 TB. The kept count is binomial around
    * rate·n rather than exact (use [[stratifiedSample]] when the exact
    * per-group count matters); selection is still a pure function of the
    * id — reproducible across runs, engines, and partitionings, and
    * NESTED for monotone rates under a common denominator: the p₁-sample
    * is a subset of the p₂-sample whenever p₁ ≤ p₂ (the property that
    * makes growing ablation subsets consistent).
    *
    * The threshold compare is lexicographic on the lowercase hex prefix
    * (equal-length hex strings order identically to their numeric
    * values), so the oracle is the same one-line predicate in any
    * engine with md5().
    */
  def hashSample(df: DataFrame, idCol: String, rateNum: Int,
      rateDen: Int): DataFrame = {
    require(rateNum >= 0 && rateDen > 0, "rate must be a valid fraction")
    if (rateNum >= rateDen) df // rate ≥ 1 keeps everything; the 16⁸
    // threshold would need 9 hex digits and the 8-char lexicographic
    // compare would silently keep only the '0'-prefixed ~1/16 of rows
    else {
      val threshold = (BigInt(16).pow(8) * rateNum / rateDen).toLong
      val thresholdHex = f"$threshold%08x"
      df.filter(substring(md5(col(idCol).cast("string")), 1, 8)
        < lit(thresholdHex))
    }
  }

  /** Deterministic weighted sample of exactly `k` rows WITHOUT
    * replacement, inclusion probability ∝ `weightCol` — Efraimidis &
    * Spirakis ("Weighted random sampling with a reservoir", IPL 2006)
    * with the uniform draw derived from md5(id) instead of an RNG:
    * each row gets the exponential key e = −ln(u)/w (u from the first
    * 12 hex digits of md5, shifted into (0,1]) and the k smallest keys
    * win. Like every sampler here, the result is a pure function of
    * the data — identical across runs, engines, and partitionings.
    *
    * Inclusion probability is SCALE-FREE in the weights (P ∝ w is
    * invariant under multiplying every weight by a constant), so keys
    * are computed against the RELATIVE weight w/max(w): e stays in
    * [0, 33.3·max(w)/w] regardless of the weights' absolute scale, and
    * the 1e-9 fixed-point quantization (the x24/x32 pattern — ln may
    * differ cross-engine in the last ulp, a floor-boundary flip has
    * probability ~1e-9 per row) never overflows a long while the
    * heaviest-to-lightest weight ratio stays under ~2·10⁸. Rows with a
    * null id or null/non-positive weight never qualify (no identity →
    * no deterministic draw; zero weight = zero inclusion probability).
    *
    * Scale shape: one max(w) scalar broadcast, then map-only scoring +
    * bounded global top-k (TakeOrderedAndProject) — no full sort,
    * nothing corpus-sized on the driver but the k winners.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val m = BigInt(16).pow(12).toLong
    val v = expr(
      s"CAST(conv(substring(md5(CAST(`$idCol` AS STRING)), 1, 12), 16, 10) AS BIGINT)")
    val u = (v + lit(1L)).cast("double") / lit((m + 1).toDouble)
    val eligible = df.filter(col(idCol).isNotNull &&
      col(weightCol).isNotNull && col(weightCol) > 0)
    val wmax = broadcast(eligible
      .agg(max(col(weightCol).cast("double")).as("__wmax")))
    val e = -log(u) * col("__wmax") / col(weightCol).cast("double")
    eligible.crossJoin(wmax)
      .withColumn("__wkey", floor(e * lit(1e9)).cast("long"))
      .orderBy(col("__wkey"), col(idCol))
      .limit(k)
      .drop("__wkey", "__wmax")
  }

  /** Deterministic corpus shuffle: assign every row a pseudo-random
    * `shard` in [0, numShards) and a within-shard sort key, both pure
    * functions of (seed, id) via md5 — the global shuffle a training
    * run needs before writing example shards, with the reproducibility
    * a RNG-based `repartition` can never give (same seed → the same
    * shards on any cluster, any partitioning, any engine; new seed →
    * an independent permutation).
    *
    * `shard` comes from the first 16 bits of md5(seed:id) scaled to
    * numShards — a PURE MAP-SIDE expression: the assignment itself
    * shuffles nothing, so pipelines that only need membership (shard
    * counts, per-shard stats, partitioned writes through
    * `partitionBy(shard)`) never pay a corpus shuffle at all. Shards
    * are exactly balanced in expectation (md5 uniformity); sizing is
    * exact when numShards divides 2¹⁶. `__shuffle_key` (the full hash)
    * orders rows WITHIN a shard: writing with
    * `repartition(shard).sortWithinPartitions(shuffle_key)` yields
    * byte-stable shard files. No global row index is materialized on
    * purpose — a corpus-wide row_number needs either a single-reducer
    * window (the classic scale bug) or a two-phase offset join, and
    * training shards only ever need (shard, within-shard order).
    */
  def shuffleShards(df: DataFrame, idCol: String, seed: String,
      numShards: Int): DataFrame = {
    require(numShards > 0 && numShards <= 65536,
      s"numShards must be in [1, 65536], got $numShards")
    val seedLit = seed.replace("'", "''")
    val hSql = s"md5(concat_ws(':', '$seedLit', CAST(`$idCol` AS STRING)))"
    df.withColumn("shard", expr(
        s"CAST((CAST(conv(substring($hSql, 1, 4), 16, 10) AS BIGINT)" +
        s" * $numShards) DIV 65536 AS INT)"))
      .withColumn("__shuffle_key", expr(hSql))
  }

  /** RESUME a [[shuffleShards]] epoch from a mid-epoch checkpoint —
    * the trainer-restart operator: a synchronous data-parallel run
    * with `numShards` workers consumes one row per worker per step,
    * each worker reading ITS shard in `__shuffle_key` order, so a
    * checkpoint at global step G means every shard's first
    * `skipPerShard = G` rows are already consumed. This emits exactly
    * the unconsumed remainder — each surviving row with its `shard`
    * and 0-based within-shard `position` — so a restarted run sees
    * every example exactly once per epoch across the checkpoint
    * boundary (the property a naive "reshuffle and continue" restart
    * silently destroys: it re-draws the permutation and both repeats
    * and drops examples).
    *
    * Determinism is inherited: shard and order are pure md5 functions
    * of (seed, id), so the SAME (seed, numShards, skipPerShard) names
    * the same remainder on any cluster, any partitioning, any engine
    * — which is what makes the checkpoint portable.
    *
    * Scale shape: the shard assignment is map-side ([[shuffleShards]]);
    * the within-shard position is ONE shard-keyed window (the shuffle
    * any per-shard ordering must pay, amortized across the whole
    * restart); the skip is a map-side filter on the rank. No global
    * row index is ever materialized — positions are per-shard by
    * construction, exactly like the files a trainer actually reads.
    */
  def resumeShuffle(df: DataFrame, idCol: String, seed: String,
      numShards: Int, skipPerShard: Long): DataFrame = {
    require(skipPerShard >= 0,
      s"skipPerShard must be >= 0, got $skipPerShard")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__shuffle_key"), col(idCol))
    shuffleShards(df, idCol, seed, numShards)
      .withColumn("position", row_number().over(w).cast("long") - 1)
      .filter(col("position") >= skipPerShard)
      .drop("__shuffle_key")
  }
}
