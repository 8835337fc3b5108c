package graft.io

import java.nio.file.{InvalidPathException, Paths}

import scala.concurrent.{ExecutionContext, Future}

import graft.core.Collection
import graft.serde.JsonDocEncoder
import org.apache.spark.sql.{Column, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{count, lit}
import org.apache.spark.sql.types.DataType

/** API-parity facade over the reference loader
  * (ParquetArangoLoader.java) re-expressed on Spark:
  *
  * | reference                                   | here |
  * |---------------------------------------------|------|
  * | `loadParquetFileIntoArango(loc, col, ow, n)`| [[load]] |
  * | `loadParquetFileIntoArangoAsync(...)`       | [[loadAsync]] |
  * | `addTypeConverter(LogicalType, Function)`   | [[addTypeConverter]] |
  * | batchSize (docs per insert, default 1000)   | maxRecordsPerFile on the Parquet write |
  * | maxParallelBatches (async cap, default 10)  | executor task parallelism (no busy-wait loop to port) |
  *
  * Validation semantics match the reference: batchSize ≥ 1 →
  * IllegalArgumentException (ParquetArangoLoader.java:123-125);
  * the location must parse as a path → InvalidPathException (:283-288).
  * Collection DDL matches :129-135 (create-if-absent; overwrite =
  * drop+recreate, otherwise append). The reference's silent
  * IOException→null swallow (ChunkedParquetReaderIterator.java:28-32)
  * is deliberately NOT reproduced — read errors propagate.
  *
  * The scan itself is `spark.read.parquet`: vectorized, parallel,
  * pushdown-capable — strictly stronger than the reference's
  * single-thread AvroParquetReader loop (:139-150) at any scale.
  */
final class ParquetLoader(spark: SparkSession) {

  val DefaultBatchSize = 1000

  @volatile private var converters: Map[DataType, Column => Column] = Map.empty

  /** Register a per-type value transform applied before documents are
    * materialized (the reference's logical-type converter registry).
    *
    * Key granularity (deliberate, pinned by ParitySpec): the reference
    * keys converters by Avro `LogicalType`
    * (ParquetArangoLoader.java:74-76), so e.g. `timestamp-millis` and
    * `timestamp-micros` columns could in principle get different
    * converters. Spark normalizes both precisions to one microsecond
    * timestamp type AT READ TIME — the millis/micros distinction does
    * not exist in a DataFrame — so this registry keys by Spark
    * `DataType`, the finest granularity the engine's data model carries.
    * Distinctions Spark does keep (TimestampType vs TimestampNTZType,
    * DateType, each DecimalType(p,s)) address distinct converters.
    */
  def addTypeConverter(dt: DataType, fn: Column => Column): this.type = {
    converters = converters + (dt -> fn)
    this
  }

  /** Load a Parquet file/directory into a collection; returns the number
    * of documents loaded.
    */
  def load(location: String, collection: Collection,
      overwriteCollection: Boolean = false,
      batchSize: Int = DefaultBatchSize): Long = {
    if (batchSize < 1)
      throw new IllegalArgumentException(
        s"Invalid batch size $batchSize, must be >= 1")
    validatePath(location)

    if (!collection.exists()) collection.create()
    else if (overwriteCollection) { collection.drop(); collection.create() }

    val df = JsonDocEncoder.applyConverters(
      spark.read.parquet(location), converters)
    // observe() piggybacks the row count on the write job itself — a
    // trailing df.count() would re-scan (and re-convert) the whole
    // source a second time
    val obs = org.apache.spark.sql.Observation()
    collection.write(df.observe(obs, count(lit(1)).as("rows")),
      if (overwriteCollection) SaveMode.Overwrite else SaveMode.Append,
      maxRecordsPerFile = batchSize.toLong)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Pipelined variant of [[load]] (reference A8). Spark already overlaps
    * read, transcode, and write inside one distributed job, and its task
    * scheduler bounds in-flight work per executor — the reference's
    * hand-rolled future cap + 10 ms busy-wait (:239-261) has nothing left
    * to do — so this simply runs the load off-thread. `maxParallelBatches`
    * is accepted for signature parity and validated like the reference
    * (:214-219).
    */
  def loadAsync(location: String, collection: Collection,
      overwriteCollection: Boolean = false,
      batchSize: Int = DefaultBatchSize,
      maxParallelBatches: Int = 10)
      (implicit ec: ExecutionContext): Future[Long] = {
    if (maxParallelBatches < 1)
      throw new IllegalArgumentException(
        s"Invalid max parallel batches $maxParallelBatches, must be >= 1")
    if (batchSize < 1)
      throw new IllegalArgumentException(
        s"Invalid batch size $batchSize, must be >= 1")
    Future(load(location, collection, overwriteCollection, batchSize))
  }

  /** Path validation with the reference's semantics
    * (ParquetArangoLoader.java:283-288): must parse as a path.
    */
  private def validatePath(location: String): Unit = {
    val stripped = if (location.startsWith("file:"))
      location.stripPrefix("file:") else location
    Paths.get(stripped) // throws InvalidPathException
    ()
  }
}
