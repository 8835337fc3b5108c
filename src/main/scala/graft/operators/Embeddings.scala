package graft.operators

import graft.expressions.GraftFunctions
import org.apache.spark.mllib.linalg.Vectors
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding preprocessing: PCA dimension reduction before ANN — the
  * standard way to cut vector bytes (and every downstream distance
  * computation) by 2-4× at recall the task can afford. At 100 TB of
  * embeddings the index build, the banding, and every probe all scale
  * with the dimension, so reducing d is a multiplier on the whole
  * similarity family.
  *
  * Training runs on Spark's distributed linear algebra
  * (`RowMatrix.computePrincipalComponentsAndExplainedVariance`): the
  * d×d covariance Gramian accumulates via treeAggregate — one pass,
  * d² doubles per partition, nothing corpus-sized anywhere — and the
  * driver-side eigendecomposition is d×d (embedding dims are ≤ a few
  * thousand). The RDD hop exists because RowMatrix is the public
  * distributed-matrix API; all per-row work afterwards is a compiled
  * Catalyst expression ([[graft.expressions.MatProject]]), not an RDD.
  *
  * PCA is float eigenanalysis — deterministic for a fixed input on a
  * fixed build, but NOT an oracle-checkable integer computation; the
  * spec suite gates it with exact invariants instead (orthonormal
  * components, non-increasing explained variance, full-rank projection
  * preserving neighbor structure exactly, reconstruction error
  * monotone in k).
  */
object Embeddings {

  /** A trained PCA: `mean` (d), row-major `components` (k×d, ordered by
    * explained variance), and the per-component explained-variance
    * fractions.
    */
  case class PcaModel(mean: Seq[Double], components: Seq[Seq[Double]],
      explainedVariance: Seq[Double]) {
    def dim: Int = mean.length
    def k: Int = components.length
  }

  /** Train a k-component PCA over a float-array column. One distributed
    * pass for the covariance, one for the mean; d×d eigen on the
    * driver.
    */
  def trainPca(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rows = df.select(col(vecCol)).na.drop()
      .rdd.map(r => Vectors.dense(
        r.getSeq[Float](0).map(_.toDouble).toArray))
    val mat = new RowMatrix(rows)
    val d = mat.numCols().toInt
    require(k <= d, s"k=$k exceeds the embedding dim $d")
    val (pc, ev) = mat.computePrincipalComponentsAndExplainedVariance(k)
    val mean = mat.computeColumnSummaryStatistics().mean.toArray
    // pc is d×k column-major (each column a component) → k×d rows
    val comps = (0 until k).map(c =>
      (0 until d).map(r => pc(r, c)).toVector).toVector
    PcaModel(mean.toVector, comps, ev.toArray.toVector)
  }

  /** Column form of the apply step: `y = P(x − μ)` as one compiled
    * map-side pass (see [[graft.expressions.MatProject]]).
    */
  def pcaProject(vec: Column, model: PcaModel): Column =
    GraftFunctions.matProject(vec, model.mean, model.components)

  /** `df` with `outCol` = the projected vectors. Pure projection —
    * composes with every similarity operator exactly like the raw
    * embedding column.
    */
  def projectPca(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "projected"): DataFrame =
    df.withColumn(outCol, pcaProject(col(vecCol), model))
}
