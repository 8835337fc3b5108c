package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixture balancing for training corpora — downsample over-represented
  * strata (language, source domain, crawl snapshot) so no stratum
  * dominates the training mix. This is the corpus-balancing step that
  * multilingual/multi-source pipelines run between filtering and
  * sharding (the deterministic-cap form of temperature sampling: a
  * stratum with n_g documents keeps ~min(n_g, cap) of them).
  *
  * Selection is a pure function of the row id, like the other sampling
  * operators ([[Sampling]]): a row survives iff the first 8 hex digits
  * of md5(id) fall below the stratum's threshold
  * `floor(16^8 · min(1, cap/n_g))`, computed entirely in INTEGER
  * arithmetic (`(16^8 · cap) div n_g`, clamped) so the kept set is
  * engine-exact and reproducible across runs, partitionings, and
  * engines. Per-stratum kept counts are binomial around min(n_g, cap)
  * — the price of a map-only filter; [[Sampling.stratifiedSample]] is
  * the exact-count alternative when a per-group sort is affordable.
  *
  * Scale shape: one tiny groupBy to count each stratum (output is
  * |strata| rows — broadcast by AQE), then the threshold join and hash
  * compare are map-side over the corpus scan. Nothing corpus-sized
  * shuffles: THE form that survives 100 TB.
  */
object Mixing {

  /** Deterministically downsample each stratum to ≈`cap` rows.
    *
    * `16^8 · cap` must fit a long ⇒ cap < 2^31 — plenty: caps are
    * human-chosen budgets, not data-sized.
    */
  def capPerStratum(df: DataFrame, stratumCol: String, idCol: String,
      cap: Long): DataFrame = {
    require(cap >= 0 && cap < (1L << 31), s"cap out of range: $cap")
    val full = BigInt(16).pow(8).toLong
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
      // integer threshold: full·cap div n, clamped to full (rate 1);
      // `div` (not `/`): Spark's / on longs is double division
      .withColumn("__thr",
        least(lit(full), expr(s"(${full}L * ${cap}L) div __n")))
      .withColumn("__thr_hex", format_string("%08x", col("__thr")))
      .select(col(stratumCol), col("__thr"), col("__thr_hex"))
    df.join(counts, stratumCol)
      // rate-1 strata keep everything outright: their threshold 16^8 is
      // nine hex digits and would compare LOW lexicographically
      .filter(col("__thr") === lit(full) ||
        substring(md5(col(idCol).cast("string")), 1, 8) < col("__thr_hex"))
      .drop("__thr", "__thr_hex")
  }

  /** The UPSAMPLING half of the mixture recipe: replicate each
    * stratum's rows by its "epochs" factor — the public LLM-mix device
    * (LLaMA/Pile-style: high-quality sources see >1 epoch per pass
    * over the mix, e.g. Wikipedia ×2.5, crawl ×0.67). A row with
    * factor r emits ⌊r⌋ copies plus one more iff the first 8 md5 hex
    * digits of its id fall under `floor(16^8·frac(r))` — the engine's
    * established integer-exact hash gate ([[Sampling.hashSample]]'s
    * device), so the emitted multiset is a PURE FUNCTION of (id,
    * factor): reproducible across runs, partitionings, and engines,
    * and statable bit-for-bit by a SQL oracle. Factors < 1 degrade to
    * plain deterministic downsampling (0 base copies + the fractional
    * gate), so ONE operator expresses the whole mixture row.
    *
    * Each copy carries `copy_idx` (0-based) — downstream shuffling
    * ([[Sampling.shuffleShards]] keyed by (id, copy_idx)) spreads
    * replicas across shards so no training batch sees a document
    * twice.
    *
    * Scale shape: factors are a tiny driver map compiled into the
    * projection; the replication is a pure map-side
    * `explode(sequence(...))` — ZERO shuffles at any corpus size, and
    * the output is at most ⌈max factor⌉ × input rows.
    */
  def epochsPerStratum(df: DataFrame, stratumCol: String, idCol: String,
      factors: Map[String, Double], defaultFactor: Double = 1.0)
      : DataFrame = {
    require(defaultFactor >= 0 && factors.values.forall(_ >= 0),
      "epoch factors must be >= 0")
    require(factors.values.forall(_ < 1000) && defaultFactor < 1000,
      "epoch factors above 1000 are a corpus explosion, not a mix")
    val full = BigInt(16).pow(8).toLong
    // integer-exact split: base copies + 16^8-scaled fractional gate,
    // computed on the DRIVER so the executor-side arithmetic is pure
    // long compares (no float anywhere in the row path)
    def base(r: Double): Long = math.floor(r).toLong
    def fracThr(r: Double): Long =
      math.floor((r - math.floor(r)) * full.toDouble).toLong
    val baseCol = factors.foldLeft(lit(base(defaultFactor))) {
      case (acc, (s, r)) =>
        when(col(stratumCol) === s, lit(base(r))).otherwise(acc)
    }
    val thrCol = factors.foldLeft(lit(fracThr(defaultFactor))) {
      case (acc, (s, r)) =>
        when(col(stratumCol) === s, lit(fracThr(r))).otherwise(acc)
    }
    val copies = (baseCol +
      when(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long") < thrCol, 1L).otherwise(0L)).as("__copies")
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** [[epochsPerStratum]] with the factors as a TABLE instead of a
    * literal map — the form for data-sized factor inventories (e.g. a
    * per-domain mix over 10⁵ registered domains, where a literal CASE
    * chain would explode the expression tree). Base copies and the
    * 16^8-scaled fractional threshold are computed ONCE per factor row
    * (longs from that point on — same integer-exact row path as the
    * literal form, and provably the same output: asserted in the
    * spec). Strata absent from the table take `defaultFactor`.
    *
    * Two guards on the factor frame, both cheap against its intended
    * tiny size and load-bearing when a caller passes something bigger:
    * duplicate stratum rows are REJECTED loudly (the join would
    * otherwise fan each corpus row out once per duplicate — a silently
    * wrong multiset, the worst failure class), and the join-back is
    * broadcast only when the frame's MEASURED cached bytes fit
    * `broadcastMaxBytes` (shuffle join above — the same measured gate
    * as [[Bpe.encode]] / [[Curation.domainQuotaApprox]], insurance
    * against a data-sized factor inventory OOMing the driver).
    */
  def epochsPerStratumTable(df: DataFrame, stratumCol: String,
      idCol: String, factors: DataFrame, factorCol: String = "factor",
      defaultFactor: Double = 1.0,
      broadcastMaxBytes: Long = Dedup.VerifyBroadcastMaxBytes)
      : DataFrame = {
    require(defaultFactor >= 0 && defaultFactor < 1000,
      s"defaultFactor out of range: $defaultFactor")
    val full = BigInt(16).pow(8).toLong
    val fBase = graft.core.CacheScope.cached(factors
      .select(col(stratumCol), col(factorCol).cast("double").as("__r"))
      .withColumn("__base", floor(col("__r")).cast("long"))
      .withColumn("__thr",
        floor((col("__r") - floor(col("__r"))) * lit(full.toDouble))
          .cast("long"))
      .drop("__r"))
    val nRows = fBase.count() // also materializes the measured size
    val nStrata = fBase.select(col(stratumCol)).distinct().count()
    require(nRows == nStrata,
      s"factors has $nRows rows but only $nStrata distinct " +
        s"'$stratumCol' values — duplicate strata would silently " +
        "multiply their rows; aggregate to one factor per stratum first")
    val f: DataFrame =
      if (graft.core.Graft.estimatedBytes(fBase) <= broadcastMaxBytes)
        broadcast(fBase)
      else fBase
    val defBase = math.floor(defaultFactor).toLong
    val defThr = math.floor(
      (defaultFactor - math.floor(defaultFactor)) * full.toDouble).toLong
    df.join(f, Seq(stratumCol), "left")
      .withColumn("__copies",
        coalesce(col("__base"), lit(defBase)) +
          when(conv(substring(md5(col(idCol).cast("string")), 1, 8),
            16, 10).cast("long") < coalesce(col("__thr"), lit(defThr)),
            1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies", "__base", "__thr")
  }
}
