package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-live-ids` — a LIVE-LISTING read of a tiny id collection (one
  * int64 column), built for ONE job: letting a long-running streaming
  * query see index tombstones appended AFTER the stream started.
  *
  * Why a custom source exists at all: the static side of a
  * stream-static join built with `spark.read.parquet` snapshots its
  * file listing at DataFrame CONSTRUCTION (the V1 `InMemoryFileIndex`
  * lists eagerly and the analyzed plan re-uses it every micro-batch),
  * so a tombstone file appended mid-stream is invisible until restart
  * — measured, not assumed: the engine's spec suite pins both
  * behaviors. A V2 relation, by contrast, is re-planned on EVERY
  * micro-batch (each `IncrementalExecution` re-runs optimization,
  * which calls `newScanBuilder().build()` and then
  * `planInputPartitions()` afresh), so a source that lists its
  * directory inside `planInputPartitions` picks up new files at each
  * batch boundary. That turns the index tombstone anti-join from
  * "honored at the next restart" into "honored at the next
  * micro-batch" — the compliance semantics a takedown needs
  * ([[graft.streaming.Streaming.indexDedupStream]] /
  * [[graft.streaming.Streaming.annScreenStream]]).
  *
  * Scale contract: this is for DELTA-SIZED id sets (an index's
  * tombstones), not data. Files are read with the parquet-java record
  * reader (no vectorization — irrelevant at tombstone scale), one
  * partition per file, and the scan reports its true on-disk byte size
  * ([[SupportsReportStatistics]]) so Catalyst broadcasts the anti-join
  * side while it is small and degrades to a shuffle join on a mass
  * purge — no hardcoded broadcast hint to OOM on. A missing or
  * data-less directory reads as zero rows (the no-deletes fast path).
  * The id column is the file's first INT64 field, exposed as `id`
  * (index tombstone collections differ in column name; the engine's
  * document-id contract is int64 either way).
  */
class LiveIdSetSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-live-ids"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LiveIdSetSource.Schema

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = new CaseInsensitiveStringMap(properties).get("path")
    require(path != null && path.nonEmpty,
      "graft-live-ids requires a 'path' option (the id collection dir)")
    new LiveIdSetTable(path)
  }
}

object LiveIdSetSource {
  val Schema: StructType =
    StructType(Seq(StructField("id", LongType, nullable = false)))

  /** (absolute file path, length) of every parquet data file under
    * `dir` — called at PLAN time, never cached across batches.
    */
  private[sources] def listFiles(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.toString, f.getLen)).toSeq.sorted
  }
}

private class LiveIdSetTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-live-ids:$path"
  override def schema(): StructType = LiveIdSetSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LiveIdSetScan(path)
    }
}

private class LiveIdSetScan(path: String)
    extends Scan with Batch with SupportsReportStatistics {

  private val conf = SessionConf.capture()

  // one listing per Scan instance = one per (re)planning, i.e. per
  // micro-batch — the freshness this source exists for
  private lazy val files = LiveIdSetSource.listFiles(path, conf.value)

  override def readSchema(): StructType = LiveIdSetSource.Schema
  override def description(): String = s"graft-live-ids $path"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => LiveIdFilePartition(f._1): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new LiveIdReaderFactory(conf)

  /** True on-disk bytes so the join planner broadcasts a tiny
    * tombstone side without a hint and a mass purge degrades to a
    * shuffle join instead of an OOM.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(math.max(1L, files.map(_._2).sum))
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }
}

private case class LiveIdFilePartition(file: String) extends InputPartition

private class LiveIdReaderFactory(
    conf: org.apache.spark.sql.graftbridge.SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new LiveIdFileReader(
      partition.asInstanceOf[LiveIdFilePartition].file, conf)
}

/** Row-at-a-time parquet read of the file's first INT64 column via the
  * stock parquet-java example API — deliberately simple; tombstone
  * files are tiny by contract.
  */
private class LiveIdFileReader(file: String,
    conf: org.apache.spark.sql.graftbridge.SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val reader = org.apache.parquet.hadoop.ParquetReader
    .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
      new Path(file))
    .withConf(conf.value)
    .build()

  private var fieldIdx = -1
  private var current = 0L

  override def next(): Boolean = {
    val g = reader.read()
    if (g == null) false
    else {
      if (fieldIdx < 0) {
        fieldIdx = g.getType.getFields.asScala.indexWhere(f =>
          f.isPrimitive && f.asPrimitiveType().getPrimitiveTypeName ==
            org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
        require(fieldIdx >= 0, s"no INT64 id column in $file")
      }
      current = g.getLong(fieldIdx, 0)
      true
    }
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](current))

  override def close(): Unit = reader.close()
}
