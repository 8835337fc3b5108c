package graft.operators

import graft.core.CollectionManager
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** The tombstone collection of a persisted index ([[DedupIndex]],
  * [[PqIndex]], [[IvfIndex]]), with the presence probe CACHED per
  * handle: the common no-deletes path previously paid one `exists()`
  * filesystem round trip per accessor call (per-query on the topK
  * path — noise locally, a real LIST round trip per query on an
  * object store); here the first probe settles it and a handle with
  * no tombstones never touches the filesystem again.
  *
  * Cache contract (the engine-wide single-writer assumption, as with
  * [[graft.core.Collection.compact]]): deletes go through THIS handle
  * (or a reload). `append` flips the cache to present; a rebuild that
  * drops the collection reports it via [[markDropped]]. When
  * tombstones ARE present the frame is re-read on every access — a
  * delete between two queries is honored by the second, and the read
  * stays delta-sized (the collection holds only deleted ids).
  *
  * The presence probe goes through [[graft.core.Collection.read]]'s
  * data check, not bare directory existence: a tombstones directory
  * with no data files reads as a 0-column frame, and an anti-join
  * against that would fail to resolve the id column — a data-less
  * directory must behave exactly like no directory.
  */
private[operators] final class TombstoneStore(
    spark: SparkSession, indexPath: String, idColName: String) {

  private val coll =
    new CollectionManager(spark, indexPath).collection("tombstones")

  // None = unprobed; Some(false) = known absent (cached); Some(true) =
  // present, re-read per access so growth is honored immediately
  @volatile private var present: Option[Boolean] = None

  /** The live tombstone frame, or None when there are no tombstones
    * (including the data-less-directory case).
    */
  def live(): Option[DataFrame] = {
    val p = present.getOrElse {
      val x = coll.read().columns.nonEmpty
      present = Some(x)
      x
    }
    if (!p) None
    else Some(coll.read()).filter(_.columns.nonEmpty)
  }

  /** Anti-join the tombstoned ids out of `df` (which carries the
    * canonical id column). With no deletes the plan is untouched, so
    * the no-corpus-scan / zero-extra-join plan assertions of the spec
    * suites keep holding verbatim; with deletes, AQE broadcasts the
    * typically tiny tombstone side at runtime.
    */
  def minus(df: DataFrame): DataFrame =
    live().map(t => df.join(t, Seq(idColName), "left_anti")).getOrElse(df)

  /** Anti-join under a caller-named id column — the rebuild-corpus
    * purge path, where the frame still carries the caller's column.
    */
  def minusBy(df: DataFrame, idCol: String): DataFrame =
    live().map { t =>
      df.join(t.select(col(idColName).as(idCol)), Seq(idCol), "left_anti")
    }.getOrElse(df)

  /** Append deleted ids (one tiny write) and flip the cache. */
  def append(ids: DataFrame, idCol: String): Unit = {
    coll.write(ids.select(col(idCol).as(idColName)).distinct(),
      SaveMode.Append)
    present = Some(true)
  }

  /** Refuse a delta that re-uses a tombstoned id: the appended row
    * would be hidden by the tombstone filter (silently invisible) and
    * then dropped by the next rebuild (silently lost). Delta-sized
    * semi-join, only when tombstones exist.
    */
  def refuse(delta: DataFrame, idCol: String, remedy: String): Unit =
    live().foreach { t =>
      val clash = delta.select(col(idCol).as(idColName))
        .join(t, Seq(idColName), "left_semi").limit(1).collect()
      require(clash.isEmpty,
        s"delta re-uses tombstoned id ${clash.headOption.map(_.get(0))} " +
          s"— deleted ids stay dead until rebuild; re-ingest under a " +
          s"fresh id or $remedy first")
    }

  /** Record that a rebuild dropped the collection. */
  def markDropped(): Unit = present = Some(false)
}

/** The `.rebuild-pending-*` crash bracket shared by every index build:
  * a multi-collection overwrite that crashes mid-way leaves the stored
  * collections a silent mix of pre- and post-write state (new codes
  * under old codebooks, sets without their prefix rows) — the marker
  * turns the next access into a loud refusal instead.
  */
private[operators] object IndexMarkers {
  val RebuildPendingPrefix = ".rebuild-pending-"

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Open the bracket (creates the index root if absent). */
  def createPending(spark: SparkSession,
      path: String): org.apache.hadoop.fs.Path = {
    val fs = fsOf(spark, path)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path))
    val m = new org.apache.hadoop.fs.Path(path,
      RebuildPendingPrefix + java.util.UUID.randomUUID())
    fs.create(m).close()
    m
  }

  /** Close the bracket. Clears EVERY pending marker, not just this
    * build's own: a full (re)build overwrites all state, so stale
    * markers from the crash it is recovering from are obsolete —
    * build IS the documented remedy for a stuck index.
    */
  def clearPending(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith(RebuildPendingPrefix))
      .foreach(f => fs.delete(f.getPath, false))
  }
}
