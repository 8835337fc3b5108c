package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document corpora.
  *
  * Four families, in increasing fuzziness:
  *  - exact (full-content hash)
  *  - fingerprint (normalized / prefix hash)
  *  - n-gram Jaccard (exact set similarity — quadratic candidate space,
  *    use for verification or small corpora)
  *  - MinHash-LSH and SimHash (sub-quadratic candidate generation — the
  *    100 TB path; candidates are then verified with the exact measure)
  *
  * All hash families are deterministic (xxhash64 + fixed affine
  * constants), so results are reproducible across runs and partitionings.
  */
object Dedup {

  /** Keep exactly one row (the minimum id) per distinct value of
    * `fingerprintCol`. One shuffle on the fingerprint — uniformly
    * distributed by construction, so no skew at any scale.
    */
  def keepFirst(df: DataFrame, idCol: String, fingerprintCol: String)
      : DataFrame = {
    val w = Window.partitionBy(col(fingerprintCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact dedup on md5 of the raw text. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    keepFirst(df.withColumn("fingerprint", md5(col(textCol))), idCol,
      "fingerprint")

  /** Fingerprint dedup on the normalized text prefix — catches
    * case/punctuation/suffix variants of the same front matter.
    */
  def byPrefixFingerprint(df: DataFrame, idCol: String, textCol: String,
      prefixLen: Int): DataFrame =
    keepFirst(
      df.withColumn("fingerprint", prefixFingerprint(col(textCol), prefixLen)),
      idCol, "fingerprint")

  /** (id, distinct word-k-shingle) rows — the posting list both exact
    * Jaccard and MinHash verification build on.
    */
  private def shinglePostings(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(array_distinct(shingles(tokens(col(textCol)), k))).as("s"))

  /** Exact n-gram Jaccard near-dup pairs: id1 < id2, J(S₁,S₂) ≥ threshold.
    *
    * Physical shape: explode distinct shingles, self-join on the shingle
    * (shuffle on shingle value), count intersections, join the two set
    * sizes back. Cost is Σ_s df(s)² — quadratic in document frequency, so
    * this is the *verification* measure; at corpus scale run
    * [[minHashPairs]] which generates candidates sub-quadratically.
    */
  def jaccardShinglePairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    val post = shinglePostings(df, idCol, textCol, k).cache()
    val sizes = post.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = post.as("a")
      .join(post.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("n", "n1"),
        "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("n", "n2"),
        "id2")
      .withColumn("jaccard",
        round(col("c") / (col("n1") + col("n2") - col("c")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Large prime < 2^61 for the affine MinHash family. */
  private val P = 2305843009213693951L // 2^61 - 1

  /** Deterministic affine constants for hash function i. */
  private def affine(i: Int): (Long, Long) = {
    def mix(z0: Long): Long = {
      var z = z0 * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    ((mix(2L * i + 1).abs % (P - 1)) + 1, mix(2L * i + 2).abs % P)
  }

  /** MinHash signature column: array of `numHashes` minima of
    * hᵢ(x) = (aᵢ·xxhash64(x) + bᵢ) mod (2⁶¹−1) over the shingle set.
    * Computed entirely map-side with array `transform`s — no explode, no
    * shuffle; signature construction is embarrassingly parallel.
    */
  def withMinHashSignature(df: DataFrame, textCol: String, k: Int,
      numHashes: Int): DataFrame = {
    val sh = array_distinct(shingles(tokens(col(textCol)), k))
    val sig = array((0 until numHashes).map { i =>
      val (a, b) = affine(i)
      array_min(transform(sh,
        x => pmod(lit(a) * xxhash64(x) + lit(b), lit(P))))
    }: _*)
    df.withColumn("minhash_sig", sig)
  }

  /** LSH candidate pairs: the signature is cut into `bands` bands of
    * `numHashes/bands` rows; documents sharing any band hash become a
    * candidate pair. One explode (bands× row growth) + one shuffle on the
    * band hash. Band buckets are hash-distributed → no planner-visible
    * skew; at 100 TB add `spark.sql.adaptive.skewJoin` for pathological
    * clusters of true duplicates.
    */
  def lshCandidatePairs(sigDf: DataFrame, idCol: String, numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val banded = sigDf.select(col(idCol).as("id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws("_", lit(b),
          array_join(transform(slice(col("minhash_sig"), b * r + 1, r),
            _.cast("string")), ",")))
      }: _*)))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs, verified: candidates from
    * [[lshCandidatePairs]], then exact shingle-Jaccard on just those
    * pairs (a semi-join against the posting lists, linear in candidate
    * count). Output matches [[jaccardShinglePairs]] up to LSH recall.
    */
  def minHashPairs(df: DataFrame, idCol: String, textCol: String, k: Int,
      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    val sig = withMinHashSignature(df, textCol, k, numHashes)
    val cand = lshCandidatePairs(sig, idCol, numHashes, bands)
    val post = shinglePostings(df, idCol, textCol, k)
    val sizes = post.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(post.as("pa"), col("id1") === col("pa.id"))
      .join(post.as("pb"),
        col("id2") === col("pb.id") && col("pa.s") === col("pb.s"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("n", "n1"),
        "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("n", "n2"),
        "id2")
      .withColumn("jaccard",
        round(col("c") / (col("n1") + col("n2") - col("c")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens (weight = occurrence count).
    * Pure map-side: 64 left-to-right folds over the token array.
    */
  def withSimHash(df: DataFrame, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    val bits = (0 until 64).map { j =>
      val vote = aggregate(tk, lit(0L),
        (acc, t) => acc +
          (shiftright(xxhash64(t), j).bitwiseAND(1) * 2 - 1))
      when(vote > 0, lit(1L).cast("long") * lit(1L << j)).otherwise(0L)
    }
    df.withColumn("simhash", bits.reduce(_ + _))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found by
    * block-blocking: 64 bits → `blocks` chunks; by pigeonhole any pair
    * within maxDist ≤ blocks−1 shares at least one exact block. Shuffle
    * on (block idx, block value) only.
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, blocks: Int = 4): DataFrame = {
    require(maxDist < blocks, "need maxDist < blocks for pigeonhole recall")
    val w = 64 / blocks
    val mask = (1L << w) - 1
    val sim = withSimHash(df, textCol).select(col(idCol).as("id"),
      col("simhash"))
    val blocked = sim.select(col("id"), col("simhash"),
      posexplode(array((0 until blocks).map(b =>
        shiftright(col("simhash"), b * w).bitwiseAND(mask)): _*)))
      .select(col("id"), col("simhash"), col("pos").as("blk"),
        col("col").as("blkval"))
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.blk") === col("b.blk") && col("a.blkval") === col("b.blkval")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
