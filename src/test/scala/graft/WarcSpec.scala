package graft

import graft.sources.Warc
import graft.sources.Warc.WarcRecord
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) reader: framing, concatenated gzip members, HTTP
  * envelope splitting, loud truncation errors, and the DataFrame read
  * over sharded files.
  */
class WarcSpec extends SparkSpec {

  private def rec(id: Long, body: String): WarcRecord =
    WarcRecord("response", s"<urn:graft:$id>",
      s"http://example.com/doc/$id", "2024-01-01T00:00:00Z",
      "application/http; msgtype=response", 200,
      "text/plain; charset=utf-8", body.getBytes("UTF-8"))

  test("plain round trip: response and warcinfo records survive with " +
      "exact payload bytes; the HTTP envelope is split off responses") {
    val info = WarcRecord("warcinfo", "<urn:graft:info>", "",
      "2024-01-01T00:00:00Z", "application/warc-fields", 0, "",
      "software: graft\r\n".getBytes("UTF-8"))
    val bytes = Warc.writeBytes(Seq(info, rec(1, "hello wörld"),
      rec(2, "")), gzipPerRecord = false)
    val got = Warc.parseAll(bytes).toSeq
    assert(got.map(_.warc_type) == Seq("warcinfo", "response", "response"))
    // warcinfo payload is verbatim (no HTTP envelope to strip)
    assert(new String(got(0).payload, "UTF-8") == "software: graft\r\n")
    assert(got(0).http_status == 0)
    // response payload is the BODY only; envelope fields surfaced
    assert(new String(got(1).payload, "UTF-8") == "hello wörld")
    assert(got(1).http_status == 200)
    assert(got(1).http_content_type == "text/plain; charset=utf-8")
    assert(got(1).target_uri == "http://example.com/doc/1")
    assert(got(2).payload.length == 0) // empty body round-trips
  }

  test("gzip member per record (the crawl-archive layout): ALL members " +
      "parse, not just the first — pins the JDK concatenated-member " +
      "behavior the reader depends on") {
    val bytes = Warc.writeBytes(
      (1L to 40L).map(i => rec(i, s"doc body $i " * i.toInt)),
      gzipPerRecord = true)
    val got = Warc.parseAll(bytes).toSeq
    assert(got.size == 40, s"only ${got.size}/40 members parsed")
    assert(got.map(_.target_uri.split("/").last.toLong) == (1L to 40L))
    assert(new String(got(39).payload, "UTF-8") == "doc body 40 " * 40)
  }

  test("truncation fails loudly, never a silently shorter corpus") {
    val bytes = Warc.writeBytes(Seq(rec(1, "x" * 1000)),
      gzipPerRecord = false)
    val cut = java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 600)
    val e = intercept[Exception](Warc.parseAll(cut).toSeq)
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("Warc.read: sharded directory loads every shard's records with " +
      "bodies intact; tiny files pack into tasks by Spark's open-cost " +
      "heuristic (real ~1 GB shards get a task each)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc").toString
    for (shard <- 0 until 3) {
      val recs = (0 until 5).map(i => rec(shard * 100L + i,
        s"shard $shard doc $i"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"part-$shard%05d.warc.gz"),
        Warc.writeBytes(recs, gzipPerRecord = true))
    }
    val df = graft.sources.Warc.read(spark, dir)
    assert(df.count() == 15)
    assert(df.select(col("warc_file")).distinct().count() == 3)
    // binaryFiles packs small files up to the open-cost/bytes-per-core
    // bound: 3 tiny fixtures may share a task (never more tasks than
    // files) — at production shard sizes each file is its own task
    val parts = df.rdd.getNumPartitions
    assert(parts >= 1 && parts <= 3, s"unexpected partitioning: $parts")
    val row = df.filter(col("target_uri") === "http://example.com/doc/104")
      .collect()(0)
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8") ==
      "shard 1 doc 4")
    assert(row.getAs[Long]("n_bytes") == "shard 1 doc 4".length)
  }

  test("property: arbitrary unicode bodies round-trip bit-exact " +
      "through write -> gzip members -> parse, in order") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(60)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val genBody = Gen.frequency(
      (4, Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)),
      (2, Gen.listOf(Gen.oneOf[String]("ä", "質", "😀",
        "\n", "\r", "\t", " ")).map(_.mkString)),
      (1, Gen.const("")))
    val genBatch = for {
      n <- Gen.chooseNum(0, 12)
      bodies <- Gen.listOfN(n, genBody)
      gz <- Gen.oneOf(true, false)
    } yield (bodies, gz)
    val prop = Prop.forAll(genBatch) { case (bodies, gz) =>
      val recs = bodies.zipWithIndex.map { case (b, i) =>
        rec(i.toLong, b) }
      val got = Warc.parseAll(Warc.writeBytes(recs, gz)).toSeq
      got.size == recs.size && got.zip(recs).forall { case (g, w) =>
        java.util.Arrays.equals(g.payload, w.payload) &&
          g.target_uri == w.target_uri && g.http_status == 200
      }
    }
    val r = SCTest.check(params, prop)
    assert(r.passed, r.toString)
  }

  test("readStream: WARC shards appearing in a directory are parsed " +
      "exactly once, including files that land after the stream starts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warcs").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_warcs_ck")
      .toString
    def shard(name: String, ids: Range): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        Warc.writeBytes(ids.map(i => rec(i.toLong, s"body $i")),
          gzipPerRecord = true))
    shard("a.warc.gz", 0 until 4)
    val q = Warc.readStream(spark, dir)
      .selectExpr("target_uri", "CAST(payload AS STRING) AS body")
      .writeStream.format("memory").queryName("warc_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_stream").count() == 4)
      // a shard landing AFTER the stream started is drained too,
      // exactly once — and earlier shards are not re-emitted
      shard("b.warc.gz", 100 until 103)
      q.processAllAvailable()
      val got = spark.table("warc_stream").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(got.length == 7)
      assert(got.count(_._1.endsWith("/101")) == 1)
      assert(got.toMap.apply("http://example.com/doc/101") == "body 101")
    } finally q.stop()
  }

  test("graft-warc source: exactly-once across RESTARTS with " +
      "multi-record files, offset compaction generations included, " +
      "maxFilesPerTrigger admission control") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_eo")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_warc_eo_ck")
      .toString
    val out = java.nio.file.Files.createTempDirectory("graft_warc_eo_out")
      .toString
    def shard(name: String, ids: Range): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        Warc.writeBytes(ids.map(i => rec(i.toLong, s"body $i")),
          gzipPerRecord = true))
    shard("a.warc.gz", 0 until 4)
    shard("b.warc.gz", 10 until 13)
    // tiny compact threshold forces a compaction GENERATION while the
    // first query runs, so the restart recovers through a compact file,
    // not just a delta offset; maxFilesPerTrigger=1 forces multi-batch
    // admission
    def start() = graft.sources.Warc.readStream(spark, dir)
      .selectExpr("record_id", "CAST(payload AS STRING) AS body")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = spark.readStream.format("graft-warc")
      .option("path", dir)
      .option("maxFilesPerTrigger", "1")
      .option("offsetCompactThreshold", "2")
      .load()
      .selectExpr("record_id", "CAST(payload AS STRING) AS body")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out).count() == 7)
    // files landing while the query is DOWN are picked up on restart;
    // already-consumed shards are not re-emitted (recovery resolves
    // the compacted offset exactly)
    shard("c.warc.gz", 20 until 22)
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == 9, s"expected 9 rows, got ${rows.length}")
    assert(rows.map(_._1).distinct.length == 9, "duplicate records")
    assert(rows.toMap.apply("<urn:graft:20>") == "body 20")
    // restarting with NOTHING new emits nothing (idempotent recovery)
    val q3 = start()
    try { q3.processAllAvailable() } finally q3.stop()
    assert(spark.read.parquet(out).count() == 9)
  }

  test("graft-warc source: maxBytesPerTrigger splits a mixed-size " +
      "shard backlog on the byte budget, preserves exactly-once " +
      "across a restart, and admits an over-budget shard alone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_mb")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_warc_mb_ck")
      .toString
    val out = java.nio.file.Files.createTempDirectory("graft_warc_mb_out")
      .toString
    // mixed-size shards (~10× spread): uncompressed so sizes are
    // predictable multiples of the record payload
    def shard(name: String, ids: Range, bodyLen: Int): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        Warc.writeBytes(ids.map(i => rec(i.toLong, "x" * bodyLen)),
          gzipPerRecord = false))
    shard("a.warc", 0 until 2, 100) // small
    shard("b.warc", 10 until 12, 100) // small
    shard("c.warc", 20 until 22, 20000) // ~40 KB — over any small budget
    shard("d.warc", 30 until 32, 100) // small
    val smallSize = java.nio.file.Files.size(
      java.nio.file.Paths.get(dir, "a.warc"))
    def start() = spark.readStream.format("graft-warc")
      .option("path", dir)
      // budget = two small shards; c.warc alone exceeds it
      .option("maxBytesPerTrigger", (2 * smallSize).toString)
      .load()
      .selectExpr("record_id", "warc_file")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out).count() == 8)
    // per-batch file sets respect the budget: a+b together (2 small ≤
    // budget), the oversized c alone, then d — never c with company
    val fileBatches = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._2).view.mapValues(_.length).toMap
    assert(fileBatches.keySet.map(f => f.substring(f.length - 6)) ==
      Set("a.warc", "b.warc", "c.warc", "d.warc"))
    // restart with new shards: exactly-once holds under the byte knob
    shard("e.warc", 40 until 42, 100)
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val rows = spark.read.parquet(out).collect().map(_.getString(0))
    assert(rows.length == 10, s"expected 10 rows, got ${rows.length}")
    assert(rows.distinct.length == 10, "duplicate records after restart")
  }

  test("graft-warc recursive mode: nested crawl layouts " +
      "(segments/<seg>/warc/<shard>) list dir-relative, stream " +
      "exactly once, and new files in new subdirs are picked up") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_rec")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_warc_rec_ck")
      .toString
    def shard(rel: String, ids: Range): Unit = {
      val p = java.nio.file.Paths.get(dir, rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        Warc.writeBytes(ids.map(i => rec(i.toLong, s"body $i")),
          gzipPerRecord = true))
    }
    shard("segments/s1/warc/a.warc.gz", 0 until 3)
    shard("segments/s2/warc/b.warc.gz", 10 until 12)
    // the listing is dir-relative so nested names are stable offset keys
    val names = graft.sources.WarcStreamSource.listWarcFiles(dir,
      spark.sparkContext.hadoopConfiguration, recursive = true)
      .map(_._1)
    assert(names == Seq("segments/s1/warc/a.warc.gz",
      "segments/s2/warc/b.warc.gz"))
    // non-recursive sees nothing at the root (the default contract)
    assert(graft.sources.WarcStreamSource.listWarcFiles(dir,
      spark.sparkContext.hadoopConfiguration).isEmpty)
    val q = spark.readStream.format("graft-warc")
      .option("path", dir).option("recursive", "true").load()
      .selectExpr("record_id", "warc_file")
      .writeStream.format("memory").queryName("warc_rec")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_rec").count() == 5)
      // a NEW segment directory appearing mid-stream is drained too
      shard("segments/s3/warc/c.warc.gz", 20 until 22)
      q.processAllAvailable()
      val got = spark.table("warc_rec").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(got.length == 7)
      assert(got.map(_._1).distinct.length == 7)
      assert(got.exists(_._2.endsWith("segments/s3/warc/c.warc.gz")))
    } finally q.stop()
  }

  test("graft-warc batch read through the connector equals Warc.read " +
      "on the same shards") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_b")
      .toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s1.warc.gz"),
      Warc.writeBytes((0 until 5).map(i => rec(i.toLong, s"doc $i")),
        gzipPerRecord = true))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s2.warc"),
      Warc.writeBytes((10 until 13).map(i => rec(i.toLong, s"doc $i")),
        gzipPerRecord = false))
    val viaConnector = spark.read.format("graft-warc")
      .option("path", dir).load()
      .selectExpr("record_id", "CAST(payload AS STRING) AS body")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val viaRead = Warc.read(spark, dir)
      .selectExpr("record_id", "CAST(payload AS STRING) AS body")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(viaConnector.length == 8)
    assert(viaConnector.toSeq == viaRead.toSeq)
  }

  test("end-to-end crawl-ingest dedup: WARC shards stream in, HTML " +
      "payloads extract, and arriving copies screen against the " +
      "PERSISTED dedup index — including a shard landing mid-stream") {
    import spark.implicits._
    // corpus of mutually-disjoint token sets → cross-doc jaccard ~0,
    // exact copies land at 1.0
    def text(i: Long): String =
      s"doc $i " + (0 until 30).map(j => s"w${i}_$j").mkString(" ")
    val corpus = (0L until 40L).map(i => (i, text(i))).toDF("doc_id", "text")
    val idxPath =
      java.nio.file.Files.createTempDirectory("graft_widx").toString
    val idx = graft.operators.DedupIndex.build(corpus, "doc_id", "text",
      k = 3, threshold = 0.6, path = idxPath)

    val dir = java.nio.file.Files.createTempDirectory("graft_crawl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_crawl_ck")
      .toString
    def htmlOf(t: String): String =
      s"<html><head><title>x</title></head><body><!-- nav --><p>$t</p>" +
        "<script>if(1<2){var s='</p>';}</script></body></html>"
    def shard(name: String, recs: Seq[(Long, String, String)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        Warc.writeBytes(recs.map { case (id, body, date) =>
          Warc.WarcRecord("response", s"<urn:c:$id>", s"http://t/doc/$id",
            date, "application/http; msgtype=response", 200,
            "text/html; charset=utf-8", htmlOf(body).getBytes("UTF-8"))
        }, gzipPerRecord = true))

    // shard a: an exact copy of corpus doc 3 + a fresh doc
    shard("a.warc.gz", Seq(
      (1003L, text(3), "2024-01-01T10:00:00Z"),
      (1500L, text(1500), "2024-01-01T10:00:00Z")))
    val ingested = Warc.readStream(spark, dir)
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
        graft.functions.TextFunctions
          .htmlToText(col("payload").cast("string")).as("text"),
        col("warc_date").cast("timestamp").as("ts"))
    val stream = graft.streaming.Streaming.indexDedupStream(
      ingested, idx, "doc_id", "text", threshold = 0.6, tsCol = "ts")
    val q = stream.writeStream.format("memory").queryName("crawl_dedup")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // shard b lands MID-STREAM: a copy of corpus doc 7 + a fresh doc
      shard("b.warc.gz", Seq(
        (1107L, text(7), "2024-01-01T10:05:00Z"),
        (1600L, text(1600), "2024-01-01T10:05:00Z")))
      q.processAllAvailable()
      // push the watermark past the pair windows
      shard("c.warc.gz", Seq(
        (9999L, text(9999), "2024-01-02T12:00:00Z")))
      q.processAllAvailable()
      val flagged = spark.table("crawl_dedup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(flagged.map(p => (p._1, p._2)).toSet ==
        Set((1003L, 3L), (1107L, 7L)),
        s"flagged ${flagged.mkString(", ")}")
      assert(flagged.forall(_._3 > 0.99),
        "exact copies must screen at jaccard 1.0")
    } finally q.stop()
  }

  test("parseStream is genuinely lazy — records before a poisoned " +
      "tail parse without the tail ever being read (the memory-" +
      "O(record) contract: no whole-stream materialization)") {
    val good = graft.sources.Warc.writeBytes(Seq(
      graft.sources.Warc.WarcRecord("resource", "<urn:1>", "u1", "d",
        "text/plain", 0, "", "one".getBytes("UTF-8")),
      graft.sources.Warc.WarcRecord("resource", "<urn:2>", "u2", "d",
        "text/plain", 0, "", "two".getBytes("UTF-8")),
      graft.sources.Warc.WarcRecord("resource", "<urn:3>", "u3", "d",
        "text/plain", 0, "", "three".getBytes("UTF-8"))),
      gzipPerRecord = false) // plain: no inflater read-ahead buffering
    val poisoned = new java.io.SequenceInputStream(
      new java.io.ByteArrayInputStream(good),
      new java.io.InputStream {
        override def read(): Int =
          sys.error("parse materialized the stream past the live record")
      })
    val it = graft.sources.Warc.parseStream(poisoned)
    // one-record lookahead: consuming records 1 and 2 touches at most
    // record 3's bytes; a whole-stream slurp would hit the poison pill
    // before the first record came back
    assert(new String(it.next().payload, "UTF-8") == "one")
    assert(new String(it.next().payload, "UTF-8") == "two")
    // and the poison genuinely fires once the parse runs off the end
    val boom = intercept[RuntimeException] { it.next(); it.next() }
    assert(boom.getMessage.contains("materialized"))
  }

  test("x69 fixture + entry: the WARC round trip over the documents " +
      "table recovers every document's exact bytes") {
    import spark.implicits._
    val got = graft.queries.Extensions.x69WarcStats(spark, sfDir).collect()
    val want = graft.core.Graft.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("m"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got.nonEmpty && got.length == want.size)
    got.foreach { r =>
      val (m, n) = want(r.getLong(0))
      assert(r.getInt(1) == 200)
      assert(r.getLong(2) == n, s"byte count drifted for ${r.getLong(0)}")
      assert(r.getString(3) == m, s"md5 drifted for ${r.getLong(0)}")
    }
  }
}
