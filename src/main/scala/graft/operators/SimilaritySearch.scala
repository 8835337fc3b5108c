package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`ArrayType(FloatType)`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k. Queries are broadcast; the
  *    corpus streams map-side, so cost is |corpus|·|queries| FLOPs with NO
  *    corpus shuffle. The right baseline, and the verifier for the ANN
  *    path.
  *  - [[lshTopK]] — random-hyperplane LSH bucketing: corpus vectors are
  *    assigned sign-bit buckets map-side; only bucket-colliding
  *    (multiprobe-expanded) candidates get exact scoring. Sub-linear
  *    per-query cost; recall is tested against brute force in the specs.
  */
object SimilaritySearch {

  /** Exact top-k neighbors for each query vector.
    * @param corpus  (idCol, vecCol) table — any size
    * @param queries (idCol, vecCol) table — must be broadcast-small
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
        else lit(true))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** ANN top-k via random-hyperplane LSH with 1-bit multiprobe.
    *
    * Corpus bucketing is map-side (deterministic hyperplanes — see
    * [[graft.functions.VectorFunctions.hyperplaneBucket]]); each query
    * probes its own bucket plus all single-bit flips, so candidates =
    * corpus rows in (nBits+1) buckets. The exact cosine then ranks only
    * candidates. At 100 TB: corpus bucket assignment is a one-off map,
    * bucket ids are uniformly distributed, and the candidate join is a
    * plain shuffle join on the bucket id.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nBits: Int, dim: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      hyperplaneBucket(col(vecCol), nBits, dim).as("bucket"))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      hyperplaneBucket(col(vecCol), nBits, dim).as("qbucket"))
    // multiprobe: own bucket + every 1-bit flip
    val probes = q0.select(col("query_id"), col("qv"),
      explode(array(col("qbucket") +:
        (0 until nBits).map(b => col("qbucket").bitwiseXOR(lit(1L << b))): _*))
        .as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(probes), Seq("bucket"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id")
        else lit(true))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Embedding-cosine near-duplicate pairs (id1 < id2, cos ≥ threshold).
    * Brute-force self-join for verification scale; the LSH-bucketed
    * variant prunes to same-bucket pairs first.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = df.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", round(cosine(col("v1"), col("v2")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }
}
