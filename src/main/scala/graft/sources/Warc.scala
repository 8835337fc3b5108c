package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream, PushbackInputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingestion — the container format of
  * Common Crawl and most web-scale text corpora, i.e. the FIRST format
  * a training-data pipeline meets. Public spec: a WARC file is a
  * sequence of records, each "WARC/1.0\r\n" + header lines + blank
  * line + `Content-Length` payload bytes + "\r\n\r\n"; crawl archives
  * store each record as its own gzip MEMBER, concatenated, so a reader
  * must keep inflating past the first member's end.
  *
  * Spark shape: [[read]] opens each file as a STREAM
  * (`sc.binaryFiles`' `PortableDataStream` — the public lazy-open
  * API), one file per flatMap element (the standard parallelism unit
  * for WARC, whose gzip members are not split-pointable without an
  * external index), and records FLOW from a streaming parse: memory
  * is O(largest record), never O(file) — no whole-file
  * materialization and no 2 GB ceiling, so an arbitrarily large crawl
  * shard parses in a task without buffering the raw OR inflated
  * archive (laziness is spec-pinned: records before a poisoned tail
  * parse without the tail ever being read). The STREAMING ingest
  * ([[readStream]]) has the SAME bound since round 11: it rides the
  * custom `graft-warc` micro-batch source
  * ([[WarcStreamSource]] — the engine's compacted file-set offsets
  * plus this same streaming parse per task), so neither path
  * materializes files or caps them at 2 GB. For
  * `response` records the embedded HTTP response is split into
  * status / headers / body so the payload column is the DOCUMENT
  * BYTES a text pipeline actually wants — feed it straight into the
  * dedup / text-analysis / quality operators.
  *
  * The writer half exists for round-trip fixtures and for re-sharding
  * pipelines that emit WARC (deterministic output: ordered headers,
  * one gzip member per record when `gzipPerRecord`).
  */
object Warc {

  /** One parsed WARC record; `payload` is the raw record block minus
    * the embedded HTTP envelope for response records (http_* columns
    * carry the envelope), or the verbatim block otherwise.
    */
  case class WarcRecord(
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      http_status: Int,
      http_content_type: String,
      payload: Array[Byte])

  private val Gzip0 = 0x1f
  private val Gzip1 = 0x8b

  /** Parse an in-memory WARC file (gzipped-per-member or plain) —
    * [[parseStream]] over the byte array; kept for the writer-fixture
    * round trips and small-payload callers.
    */
  def parseAll(bytes: Array[Byte]): Iterator[WarcRecord] =
    if (bytes.length == 0) Iterator.empty
    else parseStream(new ByteArrayInputStream(bytes))

  /** Parse a WARC stream (gzipped-per-member or plain), STREAMING: the
    * iterator pulls one record at a time off the (possibly inflating)
    * stream — memory O(largest record), never O(stream). Malformed
    * framing fails LOUDLY with the byte context — a truncated crawl
    * shard must not silently yield a shorter corpus. The caller owns
    * closing `raw` (the task-completion listener in [[read]] does).
    */
  def parseStream(raw: InputStream): Iterator[WarcRecord] = {
    val pb = new PushbackInputStream(raw, 2)
    val b0 = pb.read()
    if (b0 < 0) return Iterator.empty
    val b1 = pb.read()
    if (b1 >= 0) pb.unread(b1)
    pb.unread(b0)
    // JDK GZIPInputStream continues across CONCATENATED members
    // natively (readTrailer probes for a following member header), so
    // the per-record-member crawl layout inflates as one stream; the
    // spec suite pins the multi-member behavior so a JDK change that
    // stopped at the first member (reading 1 record of a 30,000-record
    // shard) would fail loudly here
    val in: InputStream =
      if (b0 == Gzip0 && b1 == Gzip1) new GZIPInputStream(pb, 1 << 16)
      else pb
    recordIterator(new PushbackInputStream(in, 1))
  }

  private def recordIterator(in: PushbackInputStream)
      : Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var nextRec: WarcRecord = advance()
    override def hasNext: Boolean = nextRec != null
    override def next(): WarcRecord = {
      val r = nextRec; nextRec = advance(); r
    }

    private def advance(): WarcRecord = {
      // skip inter-record CRLFs, detect clean EOF
      var b = in.read()
      while (b == '\r' || b == '\n') b = in.read()
      if (b < 0) return null
      in.unread(b)
      val headers = readHeaderBlock(in)
      val version = headers._1
      require(version.startsWith("WARC/"),
        s"malformed WARC record: expected version line, got '$version'")
      val h = headers._2
      val len = h.getOrElse("content-length",
        sys.error("WARC record missing Content-Length")).trim.toInt
      val payload = readFully(in, len)
      val warcType = h.getOrElse("warc-type", "")
      val contentType = h.getOrElse("content-type", "")
      // response records embed an HTTP response; split the envelope
      // off so payload = document bytes
      if (warcType == "response" &&
          contentType.startsWith("application/http")) {
        val (status, httpCt, body) = splitHttp(payload)
        WarcRecord(warcType, h.getOrElse("warc-record-id", ""),
          h.getOrElse("warc-target-uri", ""),
          h.getOrElse("warc-date", ""), contentType, status, httpCt, body)
      } else
        WarcRecord(warcType, h.getOrElse("warc-record-id", ""),
          h.getOrElse("warc-target-uri", ""),
          h.getOrElse("warc-date", ""), contentType, 0, "", payload)
    }
  }

  /** Read "VERSION\r\n" + "Name: value\r\n"* + "\r\n"; header names
    * lowercased (WARC headers are case-insensitive per spec).
    */
  private def readHeaderBlock(in: InputStream)
      : (String, Map[String, String]) = {
    def line(): String = {
      val sb = new StringBuilder
      var b = in.read()
      while (b >= 0 && b != '\n') {
        if (b != '\r') sb.append(b.toChar)
        b = in.read()
      }
      if (b < 0 && sb.isEmpty) throw new EOFException(
        "truncated WARC header block")
      sb.toString
    }
    val version = line()
    val h = Map.newBuilder[String, String]
    var l = line()
    while (l.nonEmpty) {
      val i = l.indexOf(':')
      require(i > 0, s"malformed WARC header line: '$l'")
      h += (l.substring(0, i).toLowerCase(java.util.Locale.ROOT) ->
        l.substring(i + 1).trim)
      l = line()
    }
    (version, h.result())
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(
        s"truncated WARC payload: expected $n bytes, got $off")
      off += r
    }
    buf
  }

  /** Split an embedded HTTP response into (status, content-type, body). */
  private def splitHttp(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    // find the \r\n\r\n envelope terminator
    var i = 0
    var end = -1
    while (end < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') end = i
      i += 1
    }
    if (end < 0) return (0, "", payload) // headerless; keep bytes whole
    val head = new String(payload, 0, end, "ISO-8859-1")
    val lines = head.split("\r\n")
    val status = lines.headOption
      .flatMap(_.split(" ").lift(1)).flatMap(_.toIntOption).getOrElse(0)
    val ct = lines.drop(1)
      .find(_.toLowerCase(java.util.Locale.ROOT)
        .startsWith("content-type:"))
      .map(_.substring("content-type:".length).trim).getOrElse("")
    (status, ct, java.util.Arrays.copyOfRange(payload, end + 4,
      payload.length))
  }

  /** Read every WARC file under `path` (glob ok, `*.warc*` names) as a
    * DataFrame: (warc_file, warc_type, record_id, target_uri,
    * warc_date, content_type, http_status, http_content_type, payload,
    * n_bytes). Parallelism = file count (see class doc).
    *
    * TRUE-STREAMING: each file is opened as a `PortableDataStream` and
    * records flow straight off the open (possibly inflating) stream —
    * task memory is O(largest record), never O(file), and there is no
    * 2 GB file ceiling (the bound the whole-file binaryFile row would
    * impose). Streams close at exhaustion AND at task completion, so a
    * failed/killed task never leaks a file handle.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val rdd = spark.sparkContext.binaryFiles(path)
      .filter { case (p, _) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        name.contains(".warc")
      }
      .flatMap { case (p, pds) =>
        val in = pds.open()
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ =>
          try in.close() catch { case _: java.io.IOException => () })
        val base = parseStream(in)
        new Iterator[(String, String, String, String, String, String,
            Int, String, Array[Byte], Long)] {
          override def hasNext: Boolean = {
            val h = base.hasNext
            if (!h) try in.close() catch {
              case _: java.io.IOException => ()
            }
            h
          }
          override def next() = {
            val r = base.next()
            (p, r.warc_type, r.record_id, r.target_uri, r.warc_date,
              r.content_type, r.http_status, r.http_content_type,
              r.payload, r.payload.length.toLong)
          }
        }
      }
    spark.createDataset(rdd)
      .toDF("warc_file", "warc_type", "record_id", "target_uri",
        "warc_date", "content_type", "http_status", "http_content_type",
        "payload", "n_bytes")
  }

  /** Continuous WARC ingest: every `*.warc*` file that APPEARS under
    * `path` is parsed exactly once — the `graft-warc` custom
    * micro-batch source ([[WarcStreamSource]]: the engine's compacted
    * name-set offsets, crash-safe checkpointing, admission control) —
    * emitting the same columns as [[read]], so batch-developed
    * transforms run on the stream unchanged. This is the "crawl
    * shards land in a bucket, the pipeline tails them" deployment;
    * compose downstream with any streaming operator (feed `payload`
    * through [[graft.functions.TextFunctions.htmlToText]] into
    * `indexDedupStream` for dedup-on-crawl-ingest).
    *
    * MEMORY BOUND — same as [[read]] since round 11: each task pulls
    * records off the OPEN inflating stream ([[parseStream]]), so
    * per-task memory is O(largest record), never O(file), and there
    * is no 2 GB file ceiling (both bounds the previous
    * binaryFile-backed implementation carried are gone).
    * `maxFilesPerTrigger` (default 1000) paces backlog drains;
    * `recursive` walks nested crawl layouts
    * (`segments/<seg>/warc/<shard>.warc.gz`).
    */
  def readStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 1000,
      recursive: Boolean = false): DataFrame =
    spark.readStream.format("graft-warc")
      .option("path", path)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .option("recursive", recursive.toString)
      .load()

  /** Serialize records to WARC bytes — deterministic (fixed header
    * order), one gzip member per record when `gzipPerRecord` (the
    * crawl-archive layout [[parseAll]]'s member-concatenation handles).
    */
  def writeBytes(records: Seq[WarcRecord],
      gzipPerRecord: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val body =
        if (r.warc_type == "response")
          (s"HTTP/1.1 ${r.http_status} OK\r\n" +
            s"Content-Type: ${r.http_content_type}\r\n\r\n")
            .getBytes("ISO-8859-1") ++ r.payload
        else r.payload
      val head = (s"WARC/1.0\r\n" +
        s"WARC-Type: ${r.warc_type}\r\n" +
        s"WARC-Record-ID: ${r.record_id}\r\n" +
        s"WARC-Date: ${r.warc_date}\r\n" +
        s"WARC-Target-URI: ${r.target_uri}\r\n" +
        s"Content-Type: ${r.content_type}\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1")
      val record = head ++ body ++ "\r\n\r\n".getBytes("ISO-8859-1")
      if (gzipPerRecord) {
        val gz = new GZIPOutputStream(out)
        gz.write(record); gz.finish()
      } else out.write(record)
    }
    out.toByteArray
  }
}
