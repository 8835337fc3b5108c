package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType(FloatType)` embedding columns.
  *
  * All kernels are built from codegen'd higher-order functions
  * (`zip_with`/`aggregate`/`transform`) — no Scala UDFs, so the hot path
  * stays inside whole-stage codegen and the fold order is deterministic
  * left-to-right (bit-reproducible across partitionings, which the
  * correctness oracle relies on).
  *
  * Elements are cast float→double before any arithmetic: float×float
  * would accumulate single-precision error, and the cast is exact.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("double")

  /** Σ aᵢ·bᵢ, left-to-right fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), _ + _)

  /** Σ aᵢ², left-to-right fold. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + d(x) * d(x))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null-safe on zero vectors (returns 0.0). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))),
      lit(0.0), _ + _)

  /** Sign-bit LSH bucket: `nBits` random-hyperplane sign bits packed into
    * a long. The hyperplanes are a deterministic pseudo-random matrix
    * derived from (bit index, dimension index) via a splitmix-style hash,
    * so executors need no broadcast state and results are reproducible.
    */
  def hyperplaneBucket(vec: Column, nBits: Int, dim: Int): Column = {
    def coef(bit: Int, j: Int): Double = {
      var z = (bit.toLong * 0x9E3779B97F4A7C15L) + (j.toLong * 0xBF58476D1CE4E5B9L)
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      // map to [-1, 1)
      (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }
    val bits = (0 until nBits).map { b =>
      val proj = (0 until dim)
        .map(j => d(element_at(vec, j + 1)) * lit(coef(b, j)))
        .reduce(_ + _)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
