package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Bloom-pruned joins — the standard shuffle-reduction move for a
  * selective join at cluster scale: build a fixed-size Bloom filter
  * over the SMALL side's join keys (one mergeable bitset, broadcast as
  * a single row), drop non-matching BIG-side rows map-side with the
  * compiled [[graft.expressions.BloomContains]] kernel BEFORE anything
  * shuffles, then run the exact join over the survivors. The Bloom
  * filter has no false negatives, so the result is identical to the
  * plain join; false positives only cost a little extra shuffle.
  *
  * At 100 TB this is the difference between shuffling the full fact
  * table and shuffling ~the matching fraction: the prefilter runs
  * inside whole-stage codegen on the scan, and the bitset (2^log2Bits
  * bits, default 1 MiB) rides one broadcast regardless of key count.
  * (Spark's AQE injects a similar runtime filter for some shapes; this
  * operator makes the plan explicit, tunable, and usable from any
  * composition.)
  */
object BloomJoin {

  /** `big LEFT SEMI JOIN small ON big(bigKey) = small(smallKey)`,
    * Bloom-pruned. Rows with null keys never match and are dropped
    * map-side like the join would.
    */
  def bloomSemiJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, log2Bits: Int = 23, numHashes: Int = 5)
      : DataFrame = {
    require(log2Bits >= 6 && log2Bits <= 30, s"log2Bits: $log2Bits")
    // xxhash64 is TYPE-sensitive (xxhash64(5: int) != xxhash64(5L)),
    // while a plain semi join would implicitly cast — mismatched key
    // types would silently prune every true match, so refuse them
    require(big.schema(bigKey).dataType == small.schema(smallKey).dataType,
      s"key types must match: $bigKey is ${big.schema(bigKey).dataType}, " +
        s"$smallKey is ${small.schema(smallKey).dataType} — cast one side")
    val bloomAgg = udaf(
      new graft.functions.Aggregators.BloomBuild(1 << log2Bits, numHashes),
      Encoders.scalaLong)
    // cached: feeds both the bitset build and the verification join —
    // without it the small side's lineage runs twice per action
    // (released by clearCache()/session end, same contract as the
    // dedup operator caches)
    val smallKeys = graft.core.CacheScope.cached(small
      .filter(col(smallKey).isNotNull)
      .select(col(smallKey)))
    val bloom = smallKeys
      .agg(bloomAgg(xxhash64(col(smallKey))).as("__bloom"))
    val pruned = big
      .filter(col(bigKey).isNotNull)
      .crossJoin(broadcast(bloom))
      .filter(GraftFunctions.bloomContains(col("__bloom"),
        xxhash64(col(bigKey)), numHashes))
      .drop("__bloom")
    // exact verification: the semi join removes Bloom false positives
    pruned.join(
      smallKeys.select(col(smallKey).as(bigKey)),
      Seq(bigKey), "left_semi")
  }
}
