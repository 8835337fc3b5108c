package graft.functions

import graft.expressions.GraftFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType(FloatType)` embedding columns.
  *
  * All kernels are native codegen'd Catalyst expressions
  * ([[graft.expressions.VecDot]] and friends) — a compiled primitive
  * loop per row. The earlier `zip_with`/`aggregate` higher-order-function
  * forms evaluated interpreted (per-element lambda dispatch + boxing) and
  * were ~1000× slower on similarity-join hot paths.
  *
  * Accumulation is float→double (exact widening), left-to-right — the
  * same fold order as DuckDB's `list_sum(list_transform(...))`, so
  * results are bit-reproducible against the correctness oracle across
  * partitionings.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ, left-to-right fold. */
  def dot(a: Column, b: Column): Column = GraftFunctions.vecDot(a, b)

  /** Σ aᵢ², left-to-right fold. */
  def normSq(a: Column): Column = GraftFunctions.vecNormSq(a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null-safe on zero vectors (returns 0.0). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Cosine from a precomputed dot and the two squared norms — lets
    * callers hoist the per-row norms out of a pair join so the O(pairs)
    * work is one dot product. Arithmetic shape (dot / (√n1·√n2)) matches
    * [[cosine]] and the oracle SQL exactly.
    */
  def cosineFromParts(dotCol: Column, nsq1: Column, nsq2: Column): Column = {
    val denom = sqrt(nsq1) * sqrt(nsq2)
    when(denom === 0.0, 0.0).otherwise(dotCol / denom)
  }

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column = GraftFunctions.vecL2Sq(a, b)

  /** Sign-bit LSH bucket: `nBits` random-hyperplane sign bits packed into
    * a long. The hyperplanes are a deterministic pseudo-random matrix
    * derived from (bit index, dimension index) via a splitmix-style hash,
    * so executors need no broadcast state and results are reproducible.
    * `dim = -1` (default) projects over the vector's own length; a
    * positive `dim` caps the projection at the first `dim` dimensions,
    * matching the pre-kernel behavior for callers that passed it.
    */
  def hyperplaneBucket(vec: Column, nBits: Int, dim: Int = -1): Column =
    GraftFunctions.hyperplaneBucket(vec, nBits, dim)

  /** The `nProbe` nearest centroids (squared L2, ties → lower index) as
    * an int-array column — one compiled map-side pass, no exchange. The
    * IVF assign (`nProbe = 1`) and probe steps.
    */
  def nearestCells(vec: Column, centroids: Seq[Seq[Float]], nProbe: Int): Column =
    GraftFunctions.nearestCells(vec, centroids, nProbe)

  /** Single nearest-centroid index (the IVF assign step). */
  def nearestCell(vec: Column, centroids: Seq[Seq[Float]]): Column =
    nearestCells(vec, centroids, 1).getItem(0)
}
