package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, streaming => streamingread}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-warc` — TRUE-STREAMING continuous WARC ingest as a
  * DataSource V2 micro-batch source: every `*.warc*` file that APPEARS
  * under `path` is parsed exactly once, with each task pulling records
  * off an OPEN (possibly inflating) stream through
  * [[Warc.parseStream]] — task memory is O(largest record), never
  * O(file), and there is NO 2 GB file ceiling. This removes from the
  * STREAMING path the two bounds the built-in binaryFile source
  * imposes (whole-file row materialization + its 2 GB cap), the same
  * way round 10's [[Warc.read]] removed them from batch.
  *
  * File tracking is the engine's shared [[FileSetMicroBatchStream]]
  * machinery — compacted name-set offsets (checkpoint size bounded by
  * `offsetCompactThreshold`, not file count), crash-safe compaction,
  * `maxFilesPerTrigger` admission control — so exactly-once holds
  * across restarts: a recovered query replays precisely the files of
  * its uncommitted batch (deterministic: the batch is pinned by the
  * logged offset pair, and a WARC file's record sequence is a pure
  * function of its bytes).
  *
  * {{{
  *   spark.readStream.format("graft-warc")
  *     .option("path", "/crawl/incoming")
  *     .option("maxFilesPerTrigger", "64")
  *     .option("maxBytesPerTrigger", "256m") // crawl shards vary ~10×
  *     .load()
  * }}}
  *
  * Columns match [[Warc.read]] exactly, so batch-developed transforms
  * run on the stream unchanged. Batch reads through the connector are
  * also supported (one partition per file, same streaming parse).
  *
  * Scale shape: parallelism = files per micro-batch (the standard WARC
  * unit — gzip members are not split-pointable without an external
  * index); a 1000-executor cluster drains a backlog at
  * `maxFilesPerTrigger` shards per trigger with one task per shard.
  */
class WarcStreamSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcStreamSource.Schema

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null && path.nonEmpty,
      "graft-warc requires a 'path' option (the crawl-shard dir)")
    new WarcTable(path, opts.getInt("maxFilesPerTrigger", 1000),
      Option(opts.get("maxBytesPerTrigger"))
        .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
        .getOrElse(Long.MaxValue),
      opts.getInt("offsetCompactThreshold", 1000),
      opts.getBoolean("recursive", false))
  }
}

object WarcStreamSource {
  /** Identical to [[Warc.read]]'s output schema. */
  val Schema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = false),
    StructField("http_content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  /** `(name, size)` of every `*.warc*` file under `dir` — DIR-RELATIVE paths
    * (so recursive mode's nested names stay stable offset keys), one
    * fresh listing per admission decision / batch plan, never cached.
    * Recursive mode walks the whole tree with `fs.listFiles(_, true)`
    * — the RemoteIterator API object stores implement natively with
    * paged listings — matching real crawl layouts
    * (`.../segments/<seg>/warc/<shard>.warc.gz`).
    */
  private[graft] def listWarcFiles(dir: String,
      conf: org.apache.hadoop.conf.Configuration,
      recursive: Boolean = false): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Nil
    else if (!recursive)
      fs.listStatus(p)
        .filter(f => f.isFile && f.getPath.getName.contains(".warc"))
        .map(f => (f.getPath.getName, f.getLen)).toSeq.sortBy(_._1)
    else {
      val prefix = fs.makeQualified(p).toString.stripSuffix("/") + "/"
      val out = Seq.newBuilder[(String, Long)]
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.contains(".warc")) {
          val full = f.getPath.toString
          out += (((if (full.startsWith(prefix))
            full.substring(prefix.length) else f.getPath.getName),
            f.getLen))
        }
      }
      out.result().sortBy(_._1)
    }
  }
}

private class WarcTable(path: String, maxFilesPerTrigger: Int,
    maxBytesPerTrigger: Long, compactThreshold: Int, recursive: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"graft-warc:$path"
  override def schema(): StructType = WarcStreamSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new WarcScan(path, maxFilesPerTrigger, maxBytesPerTrigger,
          compactThreshold, recursive)
    }
}

private class WarcScan(path: String, maxFilesPerTrigger: Int,
    maxBytesPerTrigger: Long, compactThreshold: Int, recursive: Boolean)
    extends Scan with Batch {

  private val conf = SessionConf.capture()

  override def readSchema(): StructType = WarcStreamSource.Schema
  override def description(): String = s"graft-warc $path"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    WarcStreamSource.listWarcFiles(path, conf.value, recursive)
      .map(f => WarcFilePartition(s"$path/${f._1}"): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(conf)

  override def toMicroBatchStream(checkpointLocation: String)
      : streamingread.MicroBatchStream =
    new WarcMicroBatchStream(path, conf, maxFilesPerTrigger,
      maxBytesPerTrigger, checkpointLocation, compactThreshold,
      recursive)
}

private class WarcMicroBatchStream(path: String,
    conf: org.apache.spark.sql.graftbridge.SerializableHadoopConf,
    maxFilesPerTrigger: Int, maxBytesPerTrigger: Long,
    checkpointLocation: String, compactThreshold: Int,
    recursive: Boolean)
    extends FileSetMicroBatchStream(checkpointLocation,
      maxFilesPerTrigger, maxBytesPerTrigger, compactThreshold, conf) {

  override protected def listFiles(): Seq[(String, Long)] =
    WarcStreamSource.listWarcFiles(path, conf.value, recursive)

  override protected def partitionFor(name: String): InputPartition =
    WarcFilePartition(s"$path/$name")

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(conf)
}

private case class WarcFilePartition(file: String) extends InputPartition

private class WarcReaderFactory(
    conf: org.apache.spark.sql.graftbridge.SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new WarcFileReader(
      partition.asInstanceOf[WarcFilePartition].file, conf)
}

/** Streams one WARC file's records off the open FS stream — the
  * O(record) memory bound the source exists for. The stream closes in
  * `close()` (Spark calls it on completion AND on task
  * failure/cancellation), so no handle leaks.
  */
private class WarcFileReader(file: String,
    conf: org.apache.spark.sql.graftbridge.SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val in = {
    val p = new Path(file)
    p.getFileSystem(conf.value).open(p)
  }
  private val records = Warc.parseStream(in)
  private val fileUtf8 = UTF8String.fromString(file)
  private var current: Warc.WarcRecord = _

  override def next(): Boolean =
    if (records.hasNext) { current = records.next(); true } else false

  override def get(): InternalRow = {
    def s(v: String) = UTF8String.fromString(v)
    new GenericInternalRow(Array[Any](fileUtf8, s(current.warc_type),
      s(current.record_id), s(current.target_uri), s(current.warc_date),
      s(current.content_type), current.http_status,
      s(current.http_content_type), current.payload,
      current.payload.length.toLong))
  }

  override def close(): Unit =
    try in.close() catch { case _: java.io.IOException => () }
}
