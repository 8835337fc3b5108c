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

  /** Create the (empty) collection directory if absent. */
  def create(): Unit = { fs.mkdirs(new Path(path)); () }

  /** Drop the collection and all its data. */
  def drop(): Unit = { fs.delete(new Path(path), true); () }

  private def hasData: Boolean = exists() &&
    fs.listStatus(new Path(path)).exists { f =>
      val n = f.getPath.getName
      // data files at the root, or partition subdirectories (k=v)
      n.endsWith(".parquet") || (f.isDirectory && !n.startsWith("_") &&
        !n.startsWith("."))
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
    * are scanned when a filter hits a partition column).
    */
  def write(df: DataFrame, mode: SaveMode,
      maxRecordsPerFile: Long = 0L,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** Document count — the reference test suite's only oracle. */
  def count(): Long = if (hasData) read().count() else 0L

  /** Rewrite the collection into ≈`targetRecordsPerFile`-row files —
    * the small-files maintenance pass every batched loader eventually
    * needs (a `batchSize=1000` load of a billion rows leaves a million
    * tiny files; footer-open cost then dominates every scan). The
    * compacted copy is written to a sibling staging directory first
    * and swapped in with two renames, so a crash mid-compact leaves
    * either the old or the new data, never a mix; like any destructive
    * maintenance op this assumes no concurrent writer, and in-flight
    * readers of the old directory should be drained first.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(targetRecordsPerFile: Long = 1 << 20): (Int, Int) = {
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be > 0")
    def dataFiles(p: Path): Int =
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(new Path(path))
    if (!hasData) return (before, before)
    val df = read()
    val n = df.count()
    val files = math.max(1L,
      (n + targetRecordsPerFile - 1) / targetRecordsPerFile).toInt
    val staging = new Path(path + s".compact-${java.util.UUID.randomUUID()}")
    df.repartition(files).write.parquet(staging.toString)
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
