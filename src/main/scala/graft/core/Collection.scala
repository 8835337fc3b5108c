package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** A managed Parquet-backed document collection — the engine-native
  * replacement for the reference's ArangoDB collection
  * (create-if-absent / overwrite=drop+recreate / append semantics,
  * reference ParquetArangoLoader.java:129-135; count as the test oracle,
  * ParquetArangoLoaderTest.java:114).
  *
  * A collection is a directory of Parquet files under a database base
  * path. All filesystem access goes through the Hadoop FileSystem API,
  * so the same code addresses local disk, HDFS, or an object store; at
  * 100 TB a collection is just a partitioned Parquet layout and every
  * read benefits from vectorization, pushdown, and partition pruning.
  */
final class Collection private[core] (
    val spark: SparkSession,
    val name: String,
    val path: String) {

  private def fs = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(): Boolean = fs.exists(new Path(path))

  /** Create the (empty) collection directory if absent. Runs compact
    * crash recovery first: creating a fresh directory on top of a
    * stranded swap would make the retired data look like cleanup-able
    * garbage.
    */
  def create(): Unit = { recoverCompact(); fs.mkdirs(new Path(path)); () }

  /** Drop the collection and all its data (including any stranded
    * compact siblings — recovery first makes the delete total).
    */
  def drop(): Unit = {
    recoverCompact(); fs.delete(new Path(path), true); ()
  }

  private def hasData: Boolean = {
    recoverCompact()
    exists() &&
    fs.listStatus(new Path(path)).exists { f =>
      val n = f.getPath.getName
      // data files at the root, or partition subdirectories (k=v)
      n.endsWith(".parquet") || (f.isDirectory && !n.startsWith("_") &&
        !n.startsWith("."))
    }
  }

  /** Crash recovery for [[compact]]'s two-rename swap, run before every
    * data access: a process that died between rename(path → retired)
    * and rename(staging → path) leaves the collection directory absent
    * and the data stranded in a `.old-<uuid>` sibling — without this,
    * hasData turns false and count() silently reads 0. Recovery
    * restores the retired directory (the original data — always safe;
    * the interrupted compaction simply re-runs) and deletes stale
    * `.compact-*` staging dirs; a crash AFTER publish but before
    * cleanup instead leaves the published directory in place, and the
    * retired copy is deleted as garbage. Like compact itself, this
    * assumes no compact is running concurrently in another process
    * (recovery would mistake its live staging dir for a stale one).
    */
  private def recoverCompact(): Unit = {
    // match ONLY compact()'s own siblings — the exact `.old-<uuid>` /
    // `.compact-<uuid>` names it generates, via listStatus + regex. A
    // glob on `path + ".old-*"` would be wrong twice over: a LEGAL
    // collection named e.g. "docs.old-backup" would match and be
    // deleted as garbage, and glob metacharacters in the collection
    // name would match unrelated directories.
    val uuid = "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    val dirName = new Path(path).getName
    val parent = new Path(path).getParent
    val siblings =
      if (parent == null || !fs.exists(parent)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(parent)
    val olds = siblings.filter(
      _.getPath.getName.matches(java.util.regex.Pattern.quote(dirName) +
        "\\.old-" + uuid))
    val stagings = siblings.filter(
      _.getPath.getName.matches(java.util.regex.Pattern.quote(dirName) +
        "\\.compact-" + uuid))
    if (olds.isEmpty && stagings.isEmpty) return
    if (!fs.exists(new Path(path))) {
      // died between the two renames: the original data is in the
      // retired dir; two retired dirs would be ambiguous — fail loudly
      if (olds.length > 1)
        throw new IllegalStateException(
          s"multiple retired copies of $path: " +
            olds.map(_.getPath.getName).mkString(", ") +
            " — manual recovery required")
      olds.foreach { o =>
        if (!fs.rename(o.getPath, new Path(path)))
          throw new IllegalStateException(
            s"could not restore ${o.getPath} to $path")
      }
    } else {
      // died after publish, before cleanup: the collection is intact
      // and the retired copy is garbage
      olds.foreach(o => fs.delete(o.getPath, true))
    }
    // staging is stale in every recovered state (old data restored, or
    // new data already published)
    stagings.foreach(s => fs.delete(s.getPath, true))
  }

  /** Partition key columns of the collection's Hive-style layout, in
    * directory-nesting order — empty for flat collections. Discovered
    * by walking the first `k=v` directory chain (every chain of a
    * Spark-written partitioned layout carries the same keys in the
    * same order).
    */
  private def partitionKeys: Seq[String] = {
    val keys = Seq.newBuilder[String]
    var dir = new Path(path)
    var continue = fs.exists(dir)
    while (continue) {
      fs.listStatus(dir).find(f => f.isDirectory &&
          f.getPath.getName.matches("[^=]+=.*")) match {
        case Some(d) =>
          keys += d.getPath.getName.takeWhile(_ != '=')
          dir = d.getPath
        case None => continue = false
      }
    }
    keys.result()
  }

  /** Read the collection as a DataFrame (schema from Parquet footers,
    * exactly as the reference derives Avro schemas from footers).
    * An existing-but-empty collection reads as an empty 0-column frame.
    */
  def read(): DataFrame =
    if (hasData) spark.read.parquet(path)
    else spark.emptyDataFrame

  /** Append or overwrite rows. `partitionBy` lays the collection out as
    * a Hive-style partitioned directory tree — at scale the primary
    * lever for partition pruning on reads (only matching subdirectories
    * are scanned when a filter hits a partition column). `clusterBy`
    * RANGE-CLUSTERS the data instead: rows are range-partitioned and
    * sorted within partitions on the given columns before writing, so
    * each parquet file (and each row group inside it) covers a narrow,
    * near-disjoint min/max range — the layout that lets parquet
    * predicate pushdown skip whole files/row groups on range filters
    * (the second pruning lever at 100 TB, for high-cardinality columns
    * where Hive partitioning would explode the directory count).
    * Complementary: partitionBy for low-cardinality dimensions,
    * clusterBy for ranges within them.
    */
  /** The one definition of the range-cluster layout, shared by write()
    * and compact() so the two paths can never silently diverge.
    */
  private def rangeClustered(df: DataFrame, cols: Seq[String],
      numFiles: Option[Int]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val cs = cols.map(col)
    val rp = numFiles match {
      case Some(n) => df.repartitionByRange(n, cs: _*)
      case None => df.repartitionByRange(cs: _*)
    }
    rp.sortWithinPartitions(cs: _*)
  }

  /** Schema-drift guard for [[write]]'s Append mode: appending a frame
    * with renamed/retyped columns would land mixed-schema parquet files
    * under one collection — later reads resolve ONE footer and silently
    * drop (or fail on) the drifted files' columns, poisoning the
    * collection for every reader. Compare by (name → type), ignoring
    * nullability and column order (parquet resolves columns by name, so
    * those differences are harmless); fail loudly naming the drifted
    * columns. Cost: one footer-schema read per Append (the loader
    * appends once per LOAD, not per batch — ParquetLoader.scala:82).
    */
  private def checkAppendSchema(df: DataFrame): Unit = {
    val stored = spark.read.parquet(path).schema
    def types(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => f.name -> f.dataType.catalogString).toMap
    val sm = types(stored)
    val im = types(df.schema)
    if (sm == im) return
    val missing = (sm.keySet -- im.keySet).toSeq.sorted
    val extra = (im.keySet -- sm.keySet).toSeq.sorted
    val retyped = (sm.keySet & im.keySet).toSeq.sorted
      .filter(k => sm(k) != im(k))
      .map(k => s"$k: stored ${sm(k)} vs incoming ${im(k)}")
    throw new IllegalArgumentException(
      s"schema drift on append to collection '$name' ($path):" +
        (if (missing.nonEmpty)
          s" missing columns [${missing.mkString(", ")}]" else "") +
        (if (extra.nonEmpty)
          s" new columns [${extra.mkString(", ")}]" else "") +
        (if (retyped.nonEmpty)
          s" retyped columns [${retyped.mkString("; ")}]" else "") +
        " — align the frame to the stored schema, or pass " +
        "allowSchemaDrift = true to append anyway (readers then need " +
        "mergeSchema to see the union)")
  }

  def write(df: DataFrame, mode: SaveMode,
      maxRecordsPerFile: Long = 0L,
      partitionBy: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil,
      zOrderBy: Seq[String] = Nil,
      zOrderBits: Int = 10,
      allowSchemaDrift: Boolean = false): Unit = {
    require(clusterBy.isEmpty || zOrderBy.isEmpty,
      "clusterBy and zOrderBy are alternative layouts — pass one")
    recoverCompact() // never write beside a stranded swap
    if (mode == SaveMode.Append && !allowSchemaDrift && hasData)
      checkAppendSchema(df)
    val src =
      if (zOrderBy.nonEmpty)
        // multi-dimension clustering: rank-bucketed Morton order, so
        // footer min/max stays tight on EVERY zOrderBy column and a
        // filter on any of them prunes files (Layout.fileSpans is the
        // audit). clusterBy remains the 1-D range layout.
        graft.operators.Layout.zClustered(df, zOrderBy, zOrderBits)
      else if (clusterBy.isEmpty) df
      else rangeClustered(df, clusterBy, None)
    val w = src.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** Document count — the reference test suite's only oracle. Reads
    * the parquet directly after the hasData probe (which already ran
    * crash recovery) instead of through read(), so each count pays ONE
    * recovery scan, not two — on an object store every recovery probe
    * is a LIST round trip.
    */
  def count(): Long =
    if (hasData) spark.read.parquet(path).count() else 0L

  /** Rewrite the collection into ≈`targetRecordsPerFile`-row files —
    * the small-files maintenance pass every batched loader eventually
    * needs (a `batchSize=1000` load of a billion rows leaves a million
    * tiny files; footer-open cost then dominates every scan). The
    * compacted copy is written to a sibling staging directory first
    * and swapped in with two renames; a crash mid-compact leaves
    * either the old or the new data, never a mix — a crash BETWEEN the
    * two renames strands the data in the retired sibling, and
    * [[recoverCompact]] restores it automatically on the next data
    * access. Like any destructive maintenance op this assumes no
    * concurrent writer (or concurrent compact), and in-flight readers
    * of the old directory should be drained first.
    *
    * A Hive-partitioned collection keeps its partition layout: the
    * partition keys are rediscovered from the directory tree and
    * re-applied on the staging write (rows co-located per key by a
    * hash repartition, so each partition value lands in few files);
    * `clusterBy` then sorts within the written files. Flat collections
    * with `clusterBy` get the full range-cluster layout (see
    * [[write]]) — the natural point to impose or repair it, since
    * compaction rewrites everything anyway.
    *
    * Returns (filesBefore, filesAfter) — counted recursively, so
    * partitioned layouts report real file counts.
    */
  def compact(targetRecordsPerFile: Long = 1 << 20,
      clusterBy: Seq[String] = Nil): (Int, Int) = {
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be > 0")
    recoverCompact()
    def dataFiles(p: Path): Int = {
      if (!fs.exists(p)) return 0
      var n = 0
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    val before = dataFiles(new Path(path))
    if (!hasData) return (before, before)
    val parts = partitionKeys
    val df = read()
    val n = df.count()
    val files = math.max(1L,
      (n + targetRecordsPerFile - 1) / targetRecordsPerFile).toInt
    val staging = new Path(path + s".compact-${java.util.UUID.randomUUID()}")
    import org.apache.spark.sql.functions.col
    val laid =
      if (parts.nonEmpty) {
        val co = df.repartition(files, parts.map(col): _*)
        if (clusterBy.nonEmpty)
          co.sortWithinPartitions((parts ++ clusterBy).map(col): _*)
        else co
      }
      else if (clusterBy.isEmpty) df.repartition(files)
      else rangeClustered(df, clusterBy, Some(files))
    val w = laid.write
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
      .parquet(staging.toString)
    val retired = new Path(path + s".old-${java.util.UUID.randomUUID()}")
    if (!fs.rename(new Path(path), retired))
      throw new IllegalStateException(s"could not retire $path")
    if (!fs.rename(staging, new Path(path))) {
      // restore the original before failing — never leave no data
      fs.rename(retired, new Path(path))
      throw new IllegalStateException(s"could not publish $staging")
    }
    fs.delete(retired, true)
    (before, dataFiles(new Path(path)))
  }

  /** Register the collection as a temp view so the full Spark SQL
    * surface queries it by name — the post-load query layer the
    * reference delegated to its database (SURVEY §2.2).
    */
  def createView(viewName: String = name): Unit =
    read().createOrReplaceTempView(viewName)
}

/** A "database" of collections rooted at a base path. */
final class CollectionManager(spark: SparkSession, baseDir: String) {
  def collection(name: String): Collection = {
    require(name.nonEmpty && !name.contains("/") && !name.contains(".."),
      s"invalid collection name: $name")
    new Collection(spark, name, s"$baseDir/$name")
  }
}
