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
  private[operators] val TombstonesName = "tombstones"
  private[operators] val StatsName = "build_stats"
  private[operators] val StagingVecsName = "vecs_rebuild"
  private[operators] val RebuildPendingPrefix = ".rebuild-pending-"

  /** Refuse an index whose [[IvfIndex.rebuild]] crashed mid-way: the
    * stored collections are then a silent mix of pre- and post-rebuild
    * state. One FS list; same loud-refusal contract as
    * [[DedupIndex.checkPending]].
    */
  private[operators] def checkPending(spark: SparkSession,
      path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val stuck = fs.listStatus(root)
      .filter(_.getPath.getName.startsWith(RebuildPendingPrefix))
    require(stuck.isEmpty,
      s"ANN index at $path has ${stuck.length} incomplete rebuild(s) — " +
        "its collections may mix pre- and post-rebuild state. Re-run " +
        "rebuild (or rebuild from the corpus), then remove: " +
        stuck.map(_.getPath.getName).mkString(", "))
  }

  /** Tombstone filter over the stored corpus side: anti-join the
    * deleted id set when one exists (AQE broadcasts the typically tiny
    * tombstone side at runtime). With no deletes the plan is
    * untouched, so the no-training / partition-pruning plan assertions
    * keep holding verbatim.
    */
  private[operators] def minusTombstones(mgr: CollectionManager,
      df: DataFrame): DataFrame = {
    val t = mgr.collection(TombstonesName)
    if (!t.exists()) df
    else df.join(t.read(), Seq("neighbor_id"), "left_anti")
  }

  /** Tombstone-append shared by both index kinds — one tiny write; the
    * physical vectors/codes persist until rebuild.
    */
  private[operators] def appendTombstones(mgr: CollectionManager,
      ids: DataFrame, idCol: String): Unit =
    mgr.collection(TombstonesName).write(
      ids.select(col(idCol).as("neighbor_id")).distinct(),
      SaveMode.Append)

  /** Refuse an extend that re-uses a tombstoned id: the appended row
    * would be hidden by the tombstone filter (the vector silently
    * invisible) and then dropped by the next rebuild (silently lost) —
    * the same confusion [[DedupIndex.extend]] refuses. Delta-sized
    * semi-join, only when tombstones exist.
    */
  private[operators] def refuseTombstonedIds(mgr: CollectionManager,
      delta: DataFrame, idCol: String): Unit = {
    val t = mgr.collection(TombstonesName)
    if (!t.exists()) return
    val clash = delta.select(col(idCol).as("neighbor_id"))
      .join(t.read(), Seq("neighbor_id"), "left_semi").limit(1).collect()
    require(clash.isEmpty,
      s"delta re-uses tombstoned id ${clash.headOption.map(_.get(0))} " +
        "— deleted ids stay dead until rebuild; re-ingest under a " +
        "fresh id or rebuild first")
  }

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

  /** (neighbor_id, cn, codes) — the stored LIVE encoded corpus
    * (tombstoned vectors excluded).
    */
  def codes: DataFrame =
    AnnIndex.minusTombstones(mgr, mgr.collection(AnnIndex.CodesName).read())

  /** ADC top-k against the stored codes — [[SimilaritySearch.pqTopK]]'s
    * output for the index's build parameters, with NO training and NO
    * encode on the query path: the per-query ADC tables come from the
    * loaded codebooks, and the only corpus-side work is the compiled
    * lookup scan of the codes collection + the final per-query top-k.
    */
  def topK(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    AnnIndex.checkPending(spark, path)
    val sub = codebooks.head.head.length
    SimilaritySearch.pqScore(codes, codebooks, numSubspaces, nCentroids,
      sub, queries, idCol, vecCol, k, excludeSelf)
  }

  /** DELETE vectors from the index (takedown/purge): a tombstone
    * append honored immediately by [[topK]] — the deleted vector stops
    * surfacing as a neighbor the moment this returns; its code row
    * persists until [[rebuild]]. A tombstoned id stays dead until a
    * rebuild frees it.
    */
  def delete(ids: DataFrame, idCol: String): Unit = {
    AnnIndex.checkPending(spark, path)
    AnnIndex.appendTombstones(mgr, ids, idCol)
  }

  /** REBUILD from the current corpus: PQ codes are lossy (the original
    * vectors are not stored), so unlike [[IvfIndex.rebuild]] this
    * needs the corpus frame — retrain the codebooks under today's
    * distribution (the drift [[extend]] accumulates), re-encode, and
    * clear tombstones. Equivalent to [[PqIndex.build]] at this path
    * with the stored parameters; returns the fresh index (None for an
    * empty corpus).
    */
  def rebuild(corpus: DataFrame, idCol: String, vecCol: String,
      kmeansIters: Int = 2, trainFraction: Double = 1.0)
      : Option[PqIndex] =
    PqIndex.build(corpus, idCol, vecCol, numSubspaces, nCentroids,
      kmeansIters, trainFraction, path)

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
    AnnIndex.checkPending(spark, path)
    AnnIndex.refuseTombstonedIds(mgr, delta, idCol)
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
          // a fresh build IS the surviving corpus — stale tombstones
          // from a previous index here must not keep hiding vectors
          mgr.collection(AnnIndex.TombstonesName).drop()
          Some(new PqIndex(spark, path, numSubspaces, nCentroids,
            codebooks))
      }
    }
  }

  /** Open an index previously written by [[build]] — one tiny codebook
    * read; the codes collection stays on disk until queried.
    */
  def load(spark: SparkSession, path: String): PqIndex = {
    AnnIndex.checkPending(spark, path)
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

  /** Crash-marker check, exposed for the streaming layer (it refuses a
    * mid-rebuild index at stream construction, like indexDedupStream).
    */
  private[graft] def checkPending(): Unit =
    AnnIndex.checkPending(spark, path)

  /** (neighbor_id, cv, cn, cell) — the stored LIVE assigned corpus
    * (tombstoned vectors excluded).
    */
  def cells: DataFrame =
    AnnIndex.minusTombstones(mgr, mgr.collection(AnnIndex.CellsName).read())

  /** DELETE vectors from the index (takedown/purge): a tombstone
    * append honored immediately by [[topK]] and [[driftReport]]; the
    * physical rows persist until [[rebuild]] compacts them away.
    */
  def delete(ids: DataFrame, idCol: String): Unit = {
    AnnIndex.checkPending(spark, path)
    AnnIndex.appendTombstones(mgr, ids, idCol)
  }

  /** Probed exact-cosine top-k against the stored cells —
    * [[SimilaritySearch.ivfTopK]]'s output for the build parameters,
    * with NO training and NO assignment on the query path. The probed
    * cell ids are pushed as a partition filter BEFORE the join, so the
    * scan touches only the probed cell directories.
    */
  def topK(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    AnnIndex.checkPending(spark, path)
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
    AnnIndex.checkPending(spark, path)
    AnnIndex.refuseTombstonedIds(mgr, delta, idCol)
    AnnIndex.requireDim(delta, vecCol, centroids.head.length)
    mgr.collection(AnnIndex.CellsName).write(
      SimilaritySearch.assignCells(
        delta.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
          normSq(col(vecCol)).as("cn")),
        "cv", centroids),
      SaveMode.Append, partitionBy = Seq("cell"))
  }

  /** DRIFT AUDIT — the cheap measurement that tells the operator WHEN
    * to [[rebuild]], closing the silent-decay gap of [[extend]]'s
    * frozen centroids: per cell, the build-time baseline (member count
    * and mean squared distance to the centroid, persisted by
    * [[IvfIndex.build]]) against the same statistics over today's LIVE
    * corpus (extends included, tombstones excluded). Off-distribution
    * extends inflate `dist_ratio` (vectors far from every build-time
    * centroid ⇒ probe recall decays); lopsided growth shows as
    * `size_ratio` skew across cells (mega-cells make every probe
    * expensive). Cost: one map-side assigned-distance pass over the
    * cells collection + a nCells-row aggregation — no training, no
    * corpus-source scan.
    *
    * Columns: (cell, n_build, mean_dist_sq_build, n_now,
    * mean_dist_sq_now, size_ratio, dist_ratio). Rule of thumb:
    * rebuild when any populated cell's dist_ratio passes ~2 or the
    * max/mean size_ratio skew passes ~4.
    */
  def driftReport(): DataFrame = {
    AnnIndex.checkPending(spark, path)
    val statsC = mgr.collection(AnnIndex.StatsName)
    require(statsC.exists(),
      s"index at $path predates drift statistics — rebuild() once to " +
        "record the baseline")
    val base = statsC.read().select(col("cell"),
      col("n").as("n_build"),
      col("mean_dist_sq").as("mean_dist_sq_build"))
    val now = IvfIndex.cellStats(cells, centroids).select(col("cell"),
      col("n").as("n_now"), col("mean_dist_sq").as("mean_dist_sq_now"))
    base.join(now, Seq("cell"), "full_outer")
      .withColumn("n_build", coalesce(col("n_build"), lit(0L)))
      .withColumn("n_now", coalesce(col("n_now"), lit(0L)))
      .withColumn("size_ratio",
        col("n_now").cast("double") /
          greatest(col("n_build"), lit(1L)).cast("double"))
      .withColumn("dist_ratio",
        when(col("mean_dist_sq_build") > 0,
          col("mean_dist_sq_now") / col("mean_dist_sq_build")))
      .orderBy(col("cell"))
  }

  /** REBUILD from the index's own surviving vectors (IVF stores full
    * vectors, so no corpus access is needed): retrain the coarse
    * quantizer under today's distribution, reassign, rewrite, refresh
    * the drift baseline, and clear tombstones — restoring the balanced
    * cells and probe recall that [[extend]]'s frozen centroids erode.
    * Survivors are staged to a sibling collection first and the whole
    * rewrite is bracketed by a `.rebuild-pending-*` marker: a crash
    * mid-rebuild is a loud refusal on the next access, never a silent
    * mix of old and new cells. Returns the fresh index.
    */
  def rebuild(kmeansIters: Int = 2, trainFraction: Double = 1.0)
      : IvfIndex = {
    AnnIndex.checkPending(spark, path)
    // refuse a degenerate rebuild BEFORE the crash bracket: failing
    // past the marker would strand it and lock the index for nothing
    require(!cells.limit(1).isEmpty,
      s"rebuild of $path found no surviving vectors (everything " +
        "tombstoned) — drop the index instead")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(path,
      AnnIndex.RebuildPendingPrefix + java.util.UUID.randomUUID())
    fs.create(marker).close()
    CacheScope.scoped {
      val staging = mgr.collection(AnnIndex.StagingVecsName)
      staging.drop()
      staging.write(cells.select(col("neighbor_id"), col("cv"), col("cn")),
        SaveMode.Overwrite)
      val c = CacheScope.cached(staging.read())
      val cents = SimilaritySearch.trainCentroids(c, "neighbor_id", "cv",
        nCells, kmeansIters, trainFraction)
      assert(cents.nonEmpty) // guarded above; keep the invariant loud
      val assigned = SimilaritySearch.assignCells(c, "cv", cents)
      mgr.collection(AnnIndex.CellsName).write(assigned,
        SaveMode.Overwrite, partitionBy = Seq("cell"))
      mgr.collection(AnnIndex.CentroidsName).write(
        IvfIndex.centroidsDf(spark, cents), SaveMode.Overwrite)
      mgr.collection(AnnIndex.StatsName).write(
        IvfIndex.cellStats(assigned, cents), SaveMode.Overwrite)
      AnnIndex.writeMeta(mgr, spark, "ivf", cents.length, 0)
      staging.drop()
      mgr.collection(AnnIndex.TombstonesName).drop()
      fs.delete(marker, false)
      new IvfIndex(spark, path, cents.length, cents)
    }
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
        val assigned = SimilaritySearch.assignCells(c, "cv", cents)
        mgr.collection(AnnIndex.CellsName).write(assigned,
          SaveMode.Overwrite, partitionBy = Seq("cell"))
        mgr.collection(AnnIndex.CentroidsName).write(
          centroidsDf(spark, cents), SaveMode.Overwrite)
        // the drift baseline driftReport() compares against: per-cell
        // member count and mean squared assignment distance at build
        mgr.collection(AnnIndex.StatsName).write(
          cellStats(assigned, cents), SaveMode.Overwrite)
        AnnIndex.writeMeta(mgr, spark, "ivf", cents.length, 0)
        // a fresh build IS the surviving corpus — stale tombstones
        // from a previous index here must not keep hiding vectors
        mgr.collection(AnnIndex.TombstonesName).drop()
        mgr.collection(AnnIndex.StagingVecsName).drop()
        Some(new IvfIndex(spark, path, cents.length, cents))
      }
    }
  }

  /** The tiny (cell, vec) centroid frame — shared by build/rebuild
    * writes and the drift audit's distance join.
    */
  private[operators] def centroidsDf(spark: SparkSession,
      cents: Seq[Seq[Float]]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        cents.zipWithIndex.map { case (v, i) => Row(i, v) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("vec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType,
            containsNull = false), nullable = false))))

  /** Per-cell (cell, n, mean_dist_sq) over an assigned (cv, cell)
    * frame: one broadcast join against the nCells-row centroid table +
    * a map-side compiled squared-L2 — the measurement kernel under
    * both the build-time baseline and [[IvfIndex.driftReport]].
    */
  private[operators] def cellStats(assigned: DataFrame,
      cents: Seq[Seq[Float]]): DataFrame =
    assigned
      .join(broadcast(centroidsDf(assigned.sparkSession, cents)),
        Seq("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        avg(l2Sq(col("cv"), col("vec"))).as("mean_dist_sq"))

  /** Open an index previously written by [[build]]. */
  def load(spark: SparkSession, path: String): IvfIndex = {
    AnnIndex.checkPending(spark, path)
    val mgr = new CollectionManager(spark, path)
    val (nCells, _) = AnnIndex.readMeta(mgr, path, "ivf")
    val cents = mgr.collection(AnnIndex.CentroidsName).read()
      .orderBy(col("cell")).collect().map(_.getSeq[Float](1)).toSeq
    require(cents.length == nCells, s"centroid table mismatch in $path")
    new IvfIndex(spark, path, nCells, cents)
  }
}
