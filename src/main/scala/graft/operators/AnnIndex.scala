package graft.operators

import graft.core.{CacheScope, CollectionManager}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED ANN indexes — encode once, store, query many. The inline
  * forms ([[SimilaritySearch.pqTopK]] / [[SimilaritySearch.ivfTopK]])
  * retrain their quantizers and re-encode/re-assign the corpus on
  * every call; an index you rebuild per query batch is a scan, not an
  * index. [[PqIndex.build]] / [[IvfIndex.build]] pay the training +
  * encode cost ONCE into the engine's own [[graft.core.Collection]]
  * parquet layout, and every later query batch runs NO training job:
  * the query path is one tiny codebook/centroid read plus a scan of
  * the stored codes/cells (plan-asserted in the spec suite).
  *
  * Both loaded paths score through the same shared kernels as the
  * inline forms ([[SimilaritySearch.pqScore]] /
  * [[SimilaritySearch.ivfScore]]), so loaded-index results are
  * byte-equal to the inline results for the same parameters
  * (spec-asserted). Freshness is the caller's contract, as with any
  * index: vectors added after the build are invisible until rebuilt.
  */
object AnnIndex {
  private[operators] val MetaName = "meta"
  private[operators] val CodebooksName = "codebooks"
  private[operators] val CodesName = "codes"
  private[operators] val CentroidsName = "centroids"
  private[operators] val CellsName = "cells"

  private[operators] def writeMeta(mgr: CollectionManager,
      spark: SparkSession, kind: String, a: Int, b: Int): Unit = {
    import spark.implicits._
    mgr.collection(MetaName).write(
      Seq((kind, a, b)).toDF("kind", "p1", "p2"), SaveMode.Overwrite)
  }

  /** Loud dimension guard for the extend paths: the encode/assign
    * kernels tolerate dimension mismatches silently (trailing
    * subspaces compare zero elements), so a delta from a DIFFERENT
    * embedding model would append garbage codes that poison every
    * future query. One limit-1 probe of the delta; an empty delta
    * passes (the append is a no-op anyway).
    */
  private[operators] def requireDim(delta: DataFrame, vecCol: String,
      expected: Int): Unit = {
    val head = delta.select(size(col(vecCol))).limit(1).collect()
    head.foreach { r =>
      require(r.getInt(0) == expected,
        s"index expects $expected-dim vectors, delta carries " +
          s"${r.getInt(0)}-dim — a different embedding model? Appending " +
          "would silently poison the index; rebuild instead")
    }
  }

  private[operators] def readMeta(mgr: CollectionManager, path: String,
      kind: String): (Int, Int) = {
    val rows = mgr.collection(MetaName).read().collect()
    require(rows.length == 1 && rows(0).getAs[String]("kind") == kind,
      s"not a $kind index: $path")
    (rows(0).getAs[Int]("p1"), rows(0).getAs[Int]("p2"))
  }
}

/** Product-quantization index: per-subspace codebooks (tiny) + the
  * encoded corpus (neighbor_id, true norm, one centroid index per
  * subspace — at the 8×16 defaults a 64-dim float vector stores as 8
  * codes: the 64× memory cut that makes a 100 TB embedding corpus
  * scannable from RAM, now persisted so queries never re-encode).
  */
final class PqIndex private (
    val spark: SparkSession,
    val path: String,
    val numSubspaces: Int,
    val nCentroids: Int,
    val codebooks: IndexedSeq[Seq[Seq[Float]]]) {

  private def mgr = new CollectionManager(spark, path)

  /** (neighbor_id, cn, codes) — the stored encoded corpus. */
  def codes: DataFrame = mgr.collection(AnnIndex.CodesName).read()

  /** ADC top-k against the stored codes — [[SimilaritySearch.pqTopK]]'s
    * output for the index's build parameters, with NO training and NO
    * encode on the query path: the per-query ADC tables come from the
    * loaded codebooks, and the only corpus-side work is the compiled
    * lookup scan of the codes collection + the final per-query top-k.
    */
  def topK(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val sub = codebooks.head.head.length
    SimilaritySearch.pqScore(codes, codebooks, numSubspaces, nCentroids,
      sub, queries, idCol, vecCol, k, excludeSelf)
  }

  /** APPEND new vectors under the FROZEN codebooks — the index
    * maintenance step: one map-side compiled encode of the delta (the
    * same per-subspace argmin the build used), appended to the codes
    * collection. No retraining: codebooks stay fixed, so pre-extend
    * codes remain valid and the append is a single-collection,
    * delta-sized write. The trade is quantization drift — vectors from
    * a distribution the codebooks never saw carry larger quantization
    * error (they score LOW, the bias's safe direction) — so rebuild on
    * a maintenance cadence, as with [[DedupIndex.extend]]. Ids must
    * stay unique across the original corpus and every extension.
    */
  def extend(delta: DataFrame, idCol: String, vecCol: String): Unit = {
    val sub = codebooks.head.head.length
    AnnIndex.requireDim(delta, vecCol, numSubspaces * sub)
    val c = delta.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), normSq(col(vecCol)).as("cn"))
    val codeCols = (0 until numSubspaces).map { s =>
      nearestCell(slice(col("cv"), s * sub + 1, sub), codebooks(s)) }
    mgr.collection(AnnIndex.CodesName).write(
      c.select(col("neighbor_id"), col("cn"),
        array(codeCols: _*).as("codes")),
      SaveMode.Append)
  }
}

object PqIndex {

  /** Train codebooks (sample-trainable, deterministic — identical to
    * the inline [[SimilaritySearch.pqTopK]] training), encode the
    * corpus in one map pass, and persist (codebooks, codes, meta)
    * under `path`. Every cache the build creates is released before it
    * returns. Returns None for an empty corpus (nothing to index).
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      numSubspaces: Int = 8, nCentroids: Int = 16, kmeansIters: Int = 2,
      trainFraction: Double = 1.0, path: String): Option[PqIndex] = {
    val spark = corpus.sparkSession
    val mgr = new CollectionManager(spark, path)
    CacheScope.scoped {
      val c = CacheScope.cached(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
          normSq(col(vecCol)).as("cn")))
      SimilaritySearch.pqTrainEncode(c, numSubspaces, nCentroids,
          kmeansIters, trainFraction) match {
        case None => None
        case Some((_, codebooks, codes)) =>
          mgr.collection(AnnIndex.CodesName).write(codes,
            SaveMode.Overwrite)
          val cbRows = for {
            s <- codebooks.indices
            (cent, ci) <- codebooks(s).zipWithIndex
          } yield Row(s, ci, cent)
          mgr.collection(AnnIndex.CodebooksName).write(
            spark.createDataFrame(
              spark.sparkContext.parallelize(cbRows, 1),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("subspace",
                  org.apache.spark.sql.types.IntegerType, nullable = false),
                org.apache.spark.sql.types.StructField("cidx",
                  org.apache.spark.sql.types.IntegerType, nullable = false),
                org.apache.spark.sql.types.StructField("vec",
                  org.apache.spark.sql.types.ArrayType(
                    org.apache.spark.sql.types.FloatType,
                    containsNull = false), nullable = false)))),
            SaveMode.Overwrite)
          AnnIndex.writeMeta(mgr, spark, "pq", numSubspaces, nCentroids)
          Some(new PqIndex(spark, path, numSubspaces, nCentroids,
            codebooks))
      }
    }
  }

  /** Open an index previously written by [[build]] — one tiny codebook
    * read; the codes collection stays on disk until queried.
    */
  def load(spark: SparkSession, path: String): PqIndex = {
    val mgr = new CollectionManager(spark, path)
    val (numSubspaces, nCentroids) = AnnIndex.readMeta(mgr, path, "pq")
    val cb = mgr.collection(AnnIndex.CodebooksName).read()
      .orderBy(col("subspace"), col("cidx")).collect()
    val codebooks = (0 until numSubspaces).map { s =>
      cb.filter(_.getInt(0) == s).map(_.getSeq[Float](2)).toSeq
    }
    require(codebooks.forall(_.nonEmpty), s"empty codebook in $path")
    new PqIndex(spark, path, numSubspaces, nCentroids, codebooks)
  }
}

/** IVF index: the coarse centroid table (tiny) + the corpus with its
  * cell assignment, stored Hive-PARTITIONED BY CELL — so a query
  * batch's probe set prunes to the probed cell directories at the
  * parquet-scan level (static partition pruning: at 100 TB a
  * 4-of-1024-cells probe reads ~0.4 % of the index files; the inline
  * form scans and re-assigns everything, every call).
  */
final class IvfIndex private (
    val spark: SparkSession,
    val path: String,
    val nCells: Int,
    val centroids: Seq[Seq[Float]]) {

  private def mgr = new CollectionManager(spark, path)

  /** (neighbor_id, cv, cn, cell) — the stored assigned corpus. */
  def cells: DataFrame = mgr.collection(AnnIndex.CellsName).read()

  /** Probed exact-cosine top-k against the stored cells —
    * [[SimilaritySearch.ivfTopK]]'s output for the build parameters,
    * with NO training and NO assignment on the query path. The probed
    * cell ids are pushed as a partition filter BEFORE the join, so the
    * scan touches only the probed cell directories.
    */
  def topK(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    // tiny driver-side probe-set computation (queries are the bounded
    // side by the ANN contract) -> a LITERAL isin partition filter the
    // parquet source prunes directories with
    val probed = queries.select(
        explode(nearestCells(col(vecCol), centroids, nProbe)).as("cell"))
      .distinct().collect().map(_.getInt(0))
    SimilaritySearch.ivfScore(
      cells.filter(col("cell").isin(probed.toIndexedSeq: _*)),
      centroids, nProbe, queries, idCol, vecCol, k, excludeSelf)
  }

  /** APPEND new vectors under the FROZEN centroids: one map-side
    * compiled cell assign of the delta, appended into the Hive cell
    * partitions (Spark appends per-partition-directory, so existing
    * cells gain files and new arrivals stay prunable). No retraining —
    * centroid drift means off-distribution vectors land in the nearest
    * EXISTING cell; scoring stays exact (IVF stores full vectors), only
    * probe recall drifts. Rebuild on a maintenance cadence. Ids must
    * stay unique across the original corpus and every extension.
    */
  def extend(delta: DataFrame, idCol: String, vecCol: String): Unit = {
    AnnIndex.requireDim(delta, vecCol, centroids.head.length)
    mgr.collection(AnnIndex.CellsName).write(
      SimilaritySearch.assignCells(
        delta.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
          normSq(col(vecCol)).as("cn")),
        "cv", centroids),
      SaveMode.Append, partitionBy = Seq("cell"))
  }
}

object IvfIndex {

  /** Train the coarse quantizer (sample-trainable, identical to the
    * inline [[SimilaritySearch.ivfTopK]] training), assign cells in
    * one map pass, and persist (centroids, cells partitioned-by-cell,
    * meta) under `path`. Returns None for an empty corpus.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, kmeansIters: Int = 2, trainFraction: Double = 1.0,
      path: String): Option[IvfIndex] = {
    val spark = corpus.sparkSession
    val mgr = new CollectionManager(spark, path)
    CacheScope.scoped {
      val c = CacheScope.cached(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
          normSq(col(vecCol)).as("cn")))
      val cents = SimilaritySearch.trainCentroids(c, "neighbor_id", "cv",
        nCells, kmeansIters, trainFraction)
      if (cents.isEmpty) None
      else {
        mgr.collection(AnnIndex.CellsName).write(
          SimilaritySearch.assignCells(c, "cv", cents),
          SaveMode.Overwrite, partitionBy = Seq("cell"))
        mgr.collection(AnnIndex.CentroidsName).write(
          spark.createDataFrame(
            spark.sparkContext.parallelize(
              cents.zipWithIndex.map { case (v, i) => Row(i, v) }, 1),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("cell",
                org.apache.spark.sql.types.IntegerType, nullable = false),
              org.apache.spark.sql.types.StructField("vec",
                org.apache.spark.sql.types.ArrayType(
                  org.apache.spark.sql.types.FloatType,
                  containsNull = false), nullable = false)))),
          SaveMode.Overwrite)
        AnnIndex.writeMeta(mgr, spark, "ivf", cents.length, 0)
        Some(new IvfIndex(spark, path, cents.length, cents))
      }
    }
  }

  /** Open an index previously written by [[build]]. */
  def load(spark: SparkSession, path: String): IvfIndex = {
    val mgr = new CollectionManager(spark, path)
    val (nCells, _) = AnnIndex.readMeta(mgr, path, "ivf")
    val cents = mgr.collection(AnnIndex.CentroidsName).read()
      .orderBy(col("cell")).collect().map(_.getSeq[Float](1)).toSeq
    require(cents.length == nCells, s"centroid table mismatch in $path")
    new IvfIndex(spark, path, nCells, cents)
  }
}
