package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.core.CollectionManager
import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming transforms vs their batch twins (the invariant that makes
  * the engine's batch and streaming surfaces interchangeable).
  */
class StreamingSpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp(min * 60000)

  test("windowedAgg on a MemoryStream equals the batch window aggregation") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = Streaming.windowedAgg(
      input.toDF.toDF("ts", "etype", "value"),
      "ts", "etype", "value", "10 minutes")
    val q = stream.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      val data = Seq(
        (ts(0), "a", 1.0), (ts(5), "a", 2.0), (ts(9), "b", 3.0),
        (ts(12), "a", 4.0), (ts(25), "b", 5.0))
      input.addData(data)
      q.processAllAvailable()
      val got = spark.table("win_agg")
        .select(col("window_start"), col("etype"), col("n"), col("sum_value"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val batch = data.toDF("ts", "etype", "value")
        .groupBy(window(col("ts"), "10 minutes"), col("etype"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
        .select(col("window.start"), col("etype"), col("n"), col("s"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("custom mergeable UDAFs (FrequentItems, TopKRows) aggregate " +
      "incrementally in a windowed stream and equal their batch result") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val freq = udaf(new graft.functions.Aggregators.FrequentItems(3, 64))
    val input = MemoryStream[(Timestamp, String)]
    val stream = input.toDF.toDF("ts", "token")
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(freq(col("token")).as("top"))
      .select(col("window.start").as("ws"), col("top"))
    val q = stream.writeStream.format("memory").queryName("stream_freq")
      .outputMode("complete").start()
    try {
      // two incremental additions into the same window: the sketch state
      // must merge across micro-batches, not recompute from scratch
      input.addData(Seq(ts(1) -> "a", ts(2) -> "a", ts(3) -> "b"))
      q.processAllAvailable()
      input.addData(Seq(ts(4) -> "b", ts(5) -> "b", ts(6) -> "c"))
      q.processAllAvailable()
      val got = spark.table("stream_freq").collect()
      assert(got.length == 1)
      val top = got.head.getSeq[org.apache.spark.sql.Row](1)
        .map(r => (r.getString(0), r.getLong(1)))
      // capacity 64 >> vocab → exact: b:3, a:2, c:1
      assert(top == Seq(("b", 3L), ("a", 2L), ("c", 1L)), top.toString)
    } finally q.stop()
  }

  test("lshCandidateStream: distinct streamed candidate pairs across " +
      "micro-batches equal the batch LSH candidates on the same docs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // real corpus slice (contains seeded near-duplicates → nonempty)
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (k, numHashes, bands) = (3, 64, 16)

    val batchCand = graft.operators.Dedup.lshCandidatePairs(
        graft.operators.Dedup.withMinHashSignature(
          docs.toSeq.toDF("doc_id", "text"), "text", k, numHashes),
        "doc_id", numHashes, bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = graft.streaming.Streaming.lshCandidateStream(
      input.toDF.toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", k, numHashes, bands)
    val q = stream.writeStream.format("memory").queryName("lsh_cand")
      .outputMode("append").start()
    try {
      // three micro-batches: pairs must span batch boundaries via state
      val parts = docs.grouped(math.max(1, docs.length / 3)).toSeq
      parts.zipWithIndex.foreach { case (part, i) =>
        // keep event times well above epoch 0: the initial watermark is
        // exactly 0 and rows at/below it are discarded as late
        input.addData(part.toSeq.map { case (id, t) => (id, t, ts(120 + i * 5)) })
        q.processAllAvailable()
      }
      val streamed = spark.table("lsh_cand").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batchCand,
        s"streamed ${streamed.size} vs batch ${batchCand.size}")
      assert(batchCand.nonEmpty, "corpus slice should produce candidates")
    } finally q.stop()
  }

  test("indexDedupStream: arriving docs screen against the PERSISTED " +
      "corpus index — streamed pairs equal the batch index query's " +
      "cross pairs across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val d = graft.core.Graft.table(spark, sfDir, "documents")
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val deltaRows = d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val idxPath =
      java.nio.file.Files.createTempDirectory("graft_sidx").toString
    val idx = graft.operators.DedupIndex.build(corpus, "doc_id", "text",
      k = 3, threshold = 0.6, path = idxPath)
    val corpusIds = corpus.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet

    // batch truth: the index query's CROSS pairs only (the stream form
    // deliberately does not pair in-stream arrivals with each other)
    val batchCross = idx.minHashPairsAgainst(
        deltaRows.toSeq.toDF("doc_id", "text"), "doc_id", "text", 0.6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => corpusIds.contains(p._1) != corpusIds.contains(p._2))
      .map { case (a, b, j) =>
        if (corpusIds.contains(a)) (b, a, j) else (a, b, j) }
      .toSet

    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = graft.streaming.Streaming.indexDedupStream(
      input.toDF.toDF("doc_id", "text", "ts"), idx,
      "doc_id", "text", threshold = 0.6, tsCol = "ts")
    val q = stream.writeStream.format("memory").queryName("idx_dedup")
      .outputMode("append").start()
    try {
      val parts = deltaRows.grouped(
        math.max(1, deltaRows.length / 2)).toSeq
      parts.zipWithIndex.foreach { case (part, i) =>
        input.addData(part.toSeq.map { case (id, t) =>
          (id, t, ts(120 + i * 5)) })
        q.processAllAvailable()
      }
      // append mode emits windowed aggs only after the watermark passes
      // them — push it forward with a late sentinel doc
      input.addData(Seq((999999L, "watermark pusher", ts(10000))))
      q.processAllAvailable()
      val streamed = spark.table("idx_dedup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batchCross,
        s"streamed ${streamed.size} vs batch ${batchCross.size}")
      assert(batchCross.nonEmpty, "corpus should contain delta twins")
    } finally q.stop()
  }

  test("indexDedupStream over-cap bucket: the bounded member buffer " +
      "keeps exactly the bucketCap SMALLEST corpus ids per bucket — " +
      "an arrival screens against those and only those") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // five byte-identical corpus docs: they share EVERY (band, bucket),
    // so any cap < 5 overflows every bucket and the kept members must
    // be the cap smallest ids — the same members the previous
    // row_number-window form kept (orderBy id, rn <= cap)
    val text = "alpha beta gamma delta epsilon zeta eta theta iota"
    val corpus = Seq(10L, 11L, 12L, 13L, 14L)
      .map(id => (id, text)).toDF("doc_id", "text")
    val idxPath =
      java.nio.file.Files.createTempDirectory("graft_sidx_cap").toString
    val idx = graft.operators.DedupIndex.build(corpus, "doc_id", "text",
      k = 3, threshold = 0.6, path = idxPath)
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = graft.streaming.Streaming.indexDedupStream(
      input.toDF.toDF("doc_id", "text", "ts"), idx,
      "doc_id", "text", threshold = 0.6, tsCol = "ts", bucketCap = 2)
    val q = stream.writeStream.format("memory").queryName("idx_cap")
      .outputMode("append").start()
    try {
      input.addData(Seq((100L, text, ts(120))))
      q.processAllAvailable()
      input.addData(Seq((999999L, "watermark pusher", ts(10000))))
      q.processAllAvailable()
      val got = spark.table("idx_cap").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == Set((100L, 10L, 1.0), (100L, 11L, 1.0)),
        s"over-cap screen must keep the 2 smallest corpus ids, got $got")
    } finally q.stop()
  }

  test("indexDedupStream honors tombstones: a deleted corpus doc " +
      "never surfaces as dup_of; survivors still screen") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val d = graft.core.Graft.table(spark, sfDir, "documents")
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val delta = d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val idxPath =
      java.nio.file.Files.createTempDirectory("graft_tidx").toString
    val idx = graft.operators.DedupIndex.build(corpus, "doc_id", "text",
      k = 3, threshold = 0.6, path = idxPath)
    val corpusIds = corpus.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    // victim: any corpus doc that screens some arriving delta doc
    val pre = idx.minHashPairsAgainst(delta.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val victim = pre.flatMap(p => Seq(p._1, p._2))
      .find(corpusIds.contains)
      .getOrElse(fail("no cross pair in fixture"))
    idx.delete(Seq(victim).toDF("doc_id"), "doc_id")

    // batch truth over the SURVIVING corpus (tombstone-filtered index)
    val batchCross = idx.minHashPairsAgainst(
        delta.toSeq.toDF("doc_id", "text"), "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => corpusIds.contains(p._1) != corpusIds.contains(p._2))
      .map { case (a, b, j) =>
        if (corpusIds.contains(a)) (b, a, j) else (a, b, j) }
      .toSet
    assert(!batchCross.exists(_._2 == victim))

    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = graft.streaming.Streaming.indexDedupStream(
      input.toDF.toDF("doc_id", "text", "ts"), idx,
      "doc_id", "text", threshold = 0.6, tsCol = "ts")
    val q = stream.writeStream.format("memory").queryName("idx_tomb")
      .outputMode("append").start()
    try {
      input.addData(delta.toSeq.map { case (id, t) => (id, t, ts(120)) })
      q.processAllAvailable()
      input.addData(Seq((999999L, "watermark pusher", ts(10000))))
      q.processAllAvailable()
      val streamed = spark.table("idx_tomb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(!streamed.exists(_._2 == victim),
        s"tombstoned $victim surfaced in the stream")
      assert(streamed == batchCross,
        s"streamed ${streamed.size} vs batch ${batchCross.size}")
      assert(streamed.nonEmpty, "survivors should still screen")
    } finally q.stop()
  }

  test("annScreenStream: arriving embeddings screen against the " +
      "persisted IVF index — planted twins surface at cos 1.0, " +
      "tombstoned corpus vectors never do, noise stays silent") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.core.Graft.table(spark, sfDir, "embeddings")
    val idxPath =
      java.nio.file.Files.createTempDirectory("graft_annstream").toString
    val ivf = graft.operators.IvfIndex.build(emb, "vec_id", "embedding",
      nCells = 16, path = idxPath).get

    // two corpus vectors to twin against; tombstone the second
    val targets = emb.orderBy(col("vec_id")).limit(2).collect()
    val (liveId, liveVec) =
      (targets(0).getLong(0), targets(0).getSeq[Float](1))
    val (deadId, deadVec) =
      (targets(1).getLong(0), targets(1).getSeq[Float](1))
    ivf.delete(Seq(deadId).toDF("vec_id"), "vec_id")

    val noise = Array.tabulate(liveVec.length)(i =>
      (math.sin(i * 12.9898) * 43758.5453 % 1.0).toFloat).toSeq
    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    // probe ALL cells: this test is about screening semantics, not
    // probe recall
    val stream = graft.streaming.Streaming.annScreenStream(
      input.toDF.toDF("vec_id", "embedding", "ts"), ivf,
      "vec_id", "embedding", threshold = 0.9, tsCol = "ts",
      nProbe = 16)
    val q = stream.writeStream.format("memory").queryName("ann_screen")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        (900001L, liveVec, ts(120)),
        (900002L, deadVec, ts(120)),
        (900003L, noise, ts(121))))
      q.processAllAvailable()
      input.addData(Seq((999999L, noise, ts(10000)))) // watermark push
      q.processAllAvailable()
      val streamed = spark.table("ann_screen").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed.contains((900001L, liveId, 1.0)),
        s"planted live twin missing: $streamed")
      assert(!streamed.exists(_._2 == deadId),
        s"tombstoned $deadId surfaced: $streamed")
      assert(!streamed.exists(p => p._1 == 900003L || p._1 == 999999L),
        s"noise arrival matched: $streamed")
    } finally q.stop()
  }

  test("annScreenStreamPq: arrivals screen against the COMPOSED IVF-PQ " +
      "index via per-row ADC tables — planted twins flag near cos 1, " +
      "noise stays silent, and a MID-STREAM delete is honored at the " +
      "next micro-batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.core.Graft.table(spark, sfDir, "embeddings")
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_annpqstream").toString
    val idx = graft.operators.IvfPqIndex.build(emb, "vec_id",
      "embedding", nCells = 16, numSubspaces = 8, nCentroids = 16,
      path = idxPath).get
    val target = emb.orderBy(col("vec_id")).limit(1).collect()(0)
    val (victim, twin) = (target.getLong(0), target.getSeq[Float](1))
    val noise = Array.tabulate(twin.length)(i =>
      (math.sin(i * 12.9898) * 43758.5453 % 1.0).toFloat).toSeq

    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    // threshold in the ADC regime: an exact twin scores the index's
    // SELF-ADC cosine (~0.7-0.8 on this fixture at 8x16 — measured),
    // unrelated vectors near 0; 0.6 separates the regimes
    val stream = graft.streaming.Streaming.annScreenStreamPq(
      input.toDF.toDF("vec_id", "embedding", "ts"), idx,
      "vec_id", "embedding", threshold = 0.6, tsCol = "ts", nProbe = 16)
    val q = stream.writeStream.format("memory").queryName("ann_pq")
      .outputMode("append").start()
    try {
      input.addData(Seq((900001L, twin, ts(120)),
        (900003L, noise, ts(121))))
      q.processAllAvailable()
      input.addData(Seq((900098L, noise, ts(1000)))) // watermark push
      q.processAllAvailable()
      val afterB1 = spark.table("ann_pq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val twinHit = afterB1.find(p => p._1 == 900001L && p._2 == victim)
      assert(twinHit.exists(_._3 >= 0.6),
        s"planted twin must flag in the ADC self-cos band: " +
          s"${afterB1.toSeq}")
      assert(!afterB1.exists(p => p._1 == 900003L || p._1 == 900098L),
        s"noise arrival matched: ${afterB1.toSeq}")

      idx.delete(Seq(victim).toDF("vec_id"), "vec_id")

      input.addData(Seq((900002L, twin, ts(2000))))
      q.processAllAvailable()
      input.addData(Seq((900099L, noise, ts(5000))))
      q.processAllAvailable()
      val all = spark.table("ann_pq").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!all.exists(p => p._1 == 900002L && p._2 == victim),
        s"victim still surfaced for a post-delete arrival: $all")
    } finally q.stop()
  }

  test("annIngestStreamPq: arrivals screen against AND extend the " +
      "composed IVF-PQ index per micro-batch — an arrival is findable " +
      "by the NEXT batch's screen, mid-stream deletes are honored, a " +
      "replayed stream lineage skips duplicate appends, and an " +
      "off-distribution burst surfaces in driftReport") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.core.Graft.table(spark, sfDir, "embeddings")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_annpq_ingest").toString
    val idx = graft.operators.IvfPqIndex.build(emb, "vec_id",
      "embedding", nCells = 16, numSubspaces = 8, nCentroids = 16,
      path = idxPath).get
    val target = emb.orderBy(col("vec_id")).limit(1).collect()(0)
    val (victim, twin) = (target.getLong(0), target.getSeq[Float](1))

    val got = scala.collection.mutable.Buffer[(Long, Long, Long)]()
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.Streaming.annIngestStreamPq(
      input.toDF.toDF("vec_id", "embedding"), idx, "vec_id",
      "embedding", threshold = 0.6, streamId = "lineage-1",
      nProbe = 16) { (m, bid) =>
      got.synchronized {
        got ++= m.collect().map(r => (bid, r.getLong(0), r.getLong(1)))
      }
    }
    try {
      // batch 0: an exact twin of the victim arrives — matches the
      // CORPUS victim, and is appended under the frozen quantizers
      input.addData(Seq((900001L, twin)))
      q.processAllAvailable()
      assert(got.exists(p => p._2 == 900001L && p._3 == victim),
        s"batch-0 twin missed its corpus victim: $got")
      assert(!got.exists(p => p._2 == 900001L && p._3 == 900001L),
        "an arrival matched itself within its own batch")
      // batch 1: the same vector again — now ALSO finds batch 0's
      // arrival: the index grew without any batch job
      input.addData(Seq((900002L, twin)))
      q.processAllAvailable()
      assert(got.exists(p => p._2 == 900002L && p._3 == 900001L),
        s"batch-1 arrival cannot see batch-0's extend: $got")
      assert(got.exists(p => p._2 == 900002L && p._3 == victim))

      // a takedown lands while the stream runs — honored next batch
      idx.delete(Seq(victim).toDF("vec_id"), "vec_id")
      input.addData(Seq((900003L, twin)))
      q.processAllAvailable()
      val b2 = got.filter(_._2 == 900003L).map(_._3).toSet
      assert(!b2.contains(victim),
        s"deleted victim still surfaced post-delete: $b2")
      assert(b2.contains(900001L) && b2.contains(900002L),
        s"survivors vanished from the screen: $b2")

      // a RE-ARRIVAL of the tombstoned id is screened but NOT
      // appended — without the filter, extend's tombstone refusal
      // would poison-pill the stream on every replay
      val beforeVictim = idx.codes.count()
      input.addData(Seq((victim, twin)))
      q.processAllAvailable()
      assert(idx.codes.count() == beforeVictim,
        "a tombstoned re-arrival was appended into the index")
      assert(got.exists(p => p._2 == victim && p._3 == 900001L),
        "the tombstoned re-arrival was not screened")

      // off-distribution burst: far outside the trained residual
      // distribution — the extend records its qerrs and driftReport
      // flags it immediately
      val n = emb.count().toInt
      val burst = (0 until n).map { j =>
        (910000L + j, Seq.tabulate(dim)(i =>
          ((math.sin(i * 7.3 + j * 13.1) * 1000) % 97).toFloat * 50f))
      }
      input.addData(burst)
      q.processAllAvailable()
    } finally q.stop()
    val drift = idx.driftReport().collect()
      .flatMap(r => Option(r.getAs[java.lang.Double]("err_ratio")))
      .map(_.toDouble)
    assert(drift.nonEmpty && drift.max > 2.0,
      s"off-distribution burst invisible in driftReport: " +
        s"${drift.toSeq}")

    // replay lineage: the SAME streamId re-delivers its batches after
    // a restart — screens still run, duplicate appends are SKIPPED,
    // and the batch's own already-indexed vectors never pair with
    // themselves (the anti-join on the replayed batch's ids).
    // The marker is first rewritten into the LEGACY single-lineage
    // two-line format, so this replay also proves a pre-multi-lineage
    // marker still suppresses its duplicate append after upgrade
    val markerFile = java.nio.file.Paths.get(idxPath,
      "stream_extend_batch")
    val markerNow = new String(
      java.nio.file.Files.readAllBytes(markerFile), "UTF-8")
    val lin1 = markerNow.split("\n").find(_.startsWith("lineage-1\t"))
      .map(_.split("\t")(1).trim).getOrElse(fail(
        s"lineage-1 missing from marker: $markerNow"))
    java.nio.file.Files.write(markerFile,
      s"lineage-1\n$lin1".getBytes("UTF-8"))
    // the raw write bypassed Hadoop's ChecksumFileSystem — drop the
    // stale .crc sidecar or the next FS read fails its checksum
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(idxPath,
      ".stream_extend_batch.crc"))
    val codesBefore = idx.codes.count()
    val replay = MemoryStream[(Long, Seq[Float])]
    val gotReplay = scala.collection.mutable.Buffer[(Long, Long)]()
    val q2 = graft.streaming.Streaming.annIngestStreamPq(
      replay.toDF.toDF("vec_id", "embedding"), idx, "vec_id",
      "embedding", threshold = 0.6, streamId = "lineage-1",
      nProbe = 16) { (m, _) =>
      gotReplay.synchronized {
        gotReplay ++= m.collect().map(r => (r.getLong(0), r.getLong(1)))
      }
    }
    try {
      // both twins in one replayed batch: both are already indexed
      replay.addData(Seq((900001L, twin), (900002L, twin)))
      q2.processAllAvailable()
      assert(gotReplay.exists(p => p._1 == 900001L && p._2 == 900003L),
        s"replayed batch stopped screening: $gotReplay")
      assert(!gotReplay.exists(p => p._1 == p._2),
        s"replayed arrival matched ITSELF: $gotReplay")
      assert(!gotReplay.exists(p => Set(p._1, p._2) ==
          Set(900001L, 900002L)),
        s"replayed batch-mates paired with each other: $gotReplay")
      assert(idx.codes.count() == codesBefore,
        "replayed batch double-appended into the index")
    } finally q2.stop()
    // a NEW lineage is a different stream — its appends are real
    val fresh = MemoryStream[(Long, Seq[Float])]
    // compactEvery exercises the periodic maintenance path: the
    // per-batch append files fold, answers unchanged (row-preserving
    // compact is separately spec-asserted in AnnIndexSpec)
    val q3 = graft.streaming.Streaming.annIngestStreamPq(
      fresh.toDF.toDF("vec_id", "embedding"), idx, "vec_id",
      "embedding", threshold = 0.6, streamId = "lineage-2",
      nProbe = 16, compactEvery = 1) { (_, _) => () }
    try {
      fresh.addData(Seq((920001L, twin)))
      q3.processAllAvailable()
      fresh.addData(Seq((920002L, twin)))
      q3.processAllAvailable()
      assert(idx.codes.count() == codesBefore + 2,
        "a new stream lineage failed to extend (through compaction)")
    } finally q3.stop()

    // a rebuild by ANOTHER job mid-stream rotates the epoch — the
    // running stream's next batch fails LOUDLY (stale handle) before
    // any screen scores rotated codes under the old quantizers
    val after = MemoryStream[(Long, Seq[Float])]
    val q4 = graft.streaming.Streaming.annIngestStreamPq(
      after.toDF.toDF("vec_id", "embedding"), idx, "vec_id",
      "embedding", threshold = 0.6, streamId = "lineage-3",
      nProbe = 16) { (_, _) => () }
    try {
      graft.operators.IvfPqIndex.build(emb, "vec_id", "embedding",
        nCells = 16, numSubspaces = 8, nCentroids = 16, path = idxPath)
      after.addData(Seq((930001L, twin)))
      val e = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { q4.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("stale")),
        s"mid-stream rebuild did not fail the stream loudly: ${msgs(e)}")
    } finally q4.stop()
  }

  test("blendConsumptionStream: an epoch published MID-STREAM is " +
      "consumed in ascending epoch order, exactly once, only after " +
      "the prior epoch's callback drained; steps arrive dense with " +
      "the right positions; an idle trigger re-consumes nothing") {
    import spark.implicits._
    import graft.io.TrainerShards
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "pack my box with five dozen liquor jugs"),
      (3L, "de", "zwei boxkaempfer jagen eva quer durch sylt"),
      (4L, "de", "franz jagt im taxi quer durch bayern"))
      .toDF("doc_id", "lang", "text")
    val seqs = graft.operators.Packing.materializeSequences(docs,
      "doc_id", "text", "lang", seqLen = 8, merges = Nil,
      tokenPattern = graft.functions.TextFunctions.bpeBytePatternFull)
    val dir = Files.createTempDirectory("graft_blendstream").toString +
      "/shards"
    TrainerShards.write(seqs, "lang", "seq_id", "token_ids", 2, dir)
    val weights = Map("en" -> 1.0, "de" -> 2.0)
    def publish(e: Int): Unit = {
      TrainerShards.writeEpochOrder(spark, dir, seed = "s", epoch = e)
      TrainerShards.writeBlendSchedule(spark, dir, e, weights,
        stepsPerFile = 3)
    }
    publish(0)
    val ckpt = Files.createTempDirectory("graft_blendstream_ck")
      .toString
    // (epoch, dense-steps-with-positions, thread marker) per callback,
    // in invocation order — the sequencing assertion IS the order of
    // this buffer
    val got = scala.collection.mutable.Buffer[(Int,
      Seq[(Long, String, Long, Long)])]()
    val q = graft.streaming.Streaming.blendConsumptionStream(spark,
      dir, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(0L)) { (epoch, frame, _) =>
      got.synchronized {
        got += ((epoch, frame.orderBy(col("global_step")).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3))).toSeq))
      }
    }
    try {
      q.processAllAvailable()
      assert(got.map(_._1).toSeq == Seq(0),
        s"expected exactly epoch 0 consumed, got ${got.map(_._1)}")
      // the consumed steps equal the BATCH composed read, dense 1..T
      val batch0 = TrainerShards.readInBlendOrder(spark, dir, 0)
        .orderBy(col("global_step")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got(0)._2 == batch0,
        "streamed epoch 0 diverged from the batch composed read")
      assert(got(0)._2.map(_._1) == (1L to batch0.length),
        "epoch 0 steps are not dense")

      // a NEW epoch publishes while the stream runs: consumed after
      // epoch 0 (already drained), exactly once
      publish(1)
      q.processAllAvailable()
      assert(got.map(_._1).toSeq == Seq(0, 1),
        s"epoch 1 not consumed in order: ${got.map(_._1)}")
      val batch1 = TrainerShards.readInBlendOrder(spark, dir, 1)
        .orderBy(col("global_step")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got(1)._2 == batch1,
        "streamed epoch 1 diverged from the batch composed read")
      // epoch 1's permutation is its OWN (seed:1), not epoch 0's
      assert(got(1)._2 != got(0)._2,
        "epoch 1 replayed epoch 0's consumption order")

      // nothing new: no re-consumption (exactly-once on the file log)
      q.processAllAvailable()
      assert(got.map(_._1).toSeq == Seq(0, 1),
        s"idle trigger re-consumed: ${got.map(_._1)}")

      // TWO epochs published between triggers arrive in one batch,
      // still consumed ascending
      publish(2)
      publish(3)
      q.processAllAvailable()
      assert(got.map(_._1).toSeq == Seq(0, 1, 2, 3),
        s"multi-epoch batch out of order: ${got.map(_._1)}")
    } finally q.stop()
  }

  test("annIngestStreamPq: the extend-then-marker crash window heals " +
      "by idempotence — a replayed batch whose vectors are already in " +
      "the index appends NOTHING (exactly-once, no rebuild), the " +
      "marker heals, and a re-crawled LIVE id is a no-op instead of " +
      "a poison pill") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.core.Graft.table(spark, sfDir, "embeddings")
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_annpq_crash").toString
    val idx = graft.operators.IvfPqIndex.build(emb, "vec_id",
      "embedding", nCells = 16, numSubspaces = 8, nCentroids = 16,
      path = idxPath).get
    val target = emb.orderBy(col("vec_id")).limit(1).collect()(0)
    val (victim, twin) = (target.getLong(0), target.getSeq[Float](1))
    // simulate the crash: batch 0's extend COMMITTED, the marker was
    // never recorded (killed between the two), stream restarts and
    // recovery re-delivers the same batch under the same lineage
    idx.extend(Seq((800001L, twin)).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val codesBefore = idx.codes.count()
    val input = MemoryStream[(Long, Seq[Float])]
    val got = scala.collection.mutable.Buffer[(Long, Long)]()
    val q = graft.streaming.Streaming.annIngestStreamPq(
      input.toDF.toDF("vec_id", "embedding"), idx, "vec_id",
      "embedding", threshold = 0.6, streamId = "lineage-crash",
      nProbe = 16) { (m, _) =>
      got.synchronized {
        got ++= m.collect().map(r => (r.getLong(0), r.getLong(1)))
      }
    }
    try {
      // the replayed batch: no marker entry exists for this lineage,
      // so the batch-id skip CANNOT fire — only presence idempotence
      // stands between the replay and a double append
      input.addData(Seq((800001L, twin)))
      q.processAllAvailable()
      assert(idx.codes.count() == codesBefore,
        "the extend-then-marker crash window double-appended")
      // the screen still ran, and the replayed arrival never paired
      // with its own already-indexed vector
      assert(got.exists(p => p._1 == 800001L && p._2 == victim),
        s"replayed batch stopped screening: $got")
      assert(!got.exists(p => p._1 == 800001L && p._2 == 800001L),
        "the replayed arrival matched ITSELF")
      // the marker healed (recorded despite the empty append): the
      // next batch extends normally
      input.addData(Seq((800002L, twin)))
      q.processAllAvailable()
      assert(idx.codes.count() == codesBefore + 1,
        "post-heal batch failed to extend")
      // a re-crawled LIVE id is silently skipped, never re-appended
      // and never a poison pill (extend would refuse the duplicate
      // loudly and recovery would re-deliver the batch forever)
      input.addData(Seq((800002L, twin)))
      q.processAllAvailable()
      assert(idx.codes.count() == codesBefore + 1,
        "a live re-arrival was re-appended")
      // the stream survived and keeps extending
      input.addData(Seq((800003L, twin)))
      q.processAllAvailable()
      assert(idx.codes.count() == codesBefore + 2,
        "the stream did not survive the live re-arrival")
      // a re-crawled live id whose EMBEDDING CHANGED assigns to a
      // different cell, so the cell-pruned presence scan alone would
      // miss it and append a silent duplicate neighbor_id — the
      // id-only unpruned fallback on the survivors must catch it
      import graft.functions.VectorFunctions.nearestCell
      def cellOf(v: Seq[Float]): Int =
        Seq(Tuple1(v)).toDF("embedding")
          .select(nearestCell(col("embedding"), idx.centroids))
          .collect()(0).getInt(0)
      val moved = emb.orderBy(col("vec_id").desc).limit(64).collect()
        .map(_.getSeq[Float](1))
        .find(v => cellOf(v) != cellOf(twin))
        .getOrElse(fail("no fixture vector lands in a different " +
          "cell — widen the candidate pool"))
      input.addData(Seq((800002L, moved)))
      q.processAllAvailable()
      assert(idx.codes.count() == codesBefore + 2,
        "a re-crawled id with a CHANGED vector escaped the " +
          "cell-pruned presence scan and duplicated in the index")
      // and the stream keeps extending genuinely-new ids after it
      input.addData(Seq((800004L, twin)))
      q.processAllAvailable()
      assert(idx.codes.count() == codesBefore + 3,
        "the changed-vector guard blocked a genuinely new id")
    } finally q.stop()
  }

  test("annIngestStream (raw IVF): exact-cosine screen + extend per " +
      "micro-batch — a batch-0 arrival is findable by batch 1 at " +
      "cos 1, mid-stream deletes honored, replayed lineage skips the " +
      "duplicate append without self-matching") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.core.Graft.table(spark, sfDir, "embeddings")
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_annivf_ingest").toString
    val idx = graft.operators.IvfIndex.build(emb, "vec_id",
      "embedding", nCells = 16, path = idxPath).get
    val target = emb.orderBy(col("vec_id")).limit(1).collect()(0)
    val (victim, twin) = (target.getLong(0), target.getSeq[Float](1))
    val got = scala.collection.mutable.Buffer[(Long, Long, Double)]()
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.Streaming.annIngestStream(
      input.toDF.toDF("vec_id", "embedding"), idx, "vec_id",
      "embedding", threshold = 0.95, streamId = "ivf-1", nProbe = 16) {
      (m, _) => got.synchronized {
        got ++= m.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }
    }
    try {
      input.addData(Seq((900001L, twin)))
      q.processAllAvailable()
      assert(got.exists(p => p._1 == 900001L && p._2 == victim &&
        p._3 >= 0.999), s"exact twin missed its victim at cos 1: $got")
      assert(!got.exists(p => p._1 == p._2), s"self-match: $got")
      input.addData(Seq((900002L, twin)))
      q.processAllAvailable()
      assert(got.exists(p => p._1 == 900002L && p._2 == 900001L &&
        p._3 >= 0.999),
        s"batch-1 arrival cannot see batch-0's extend: $got")
      idx.delete(Seq(victim).toDF("vec_id"), "vec_id")
      input.addData(Seq((900003L, twin)))
      q.processAllAvailable()
      val b2 = got.filter(_._1 == 900003L).map(_._2).toSet
      assert(!b2.contains(victim) && b2.contains(900001L),
        s"post-delete screen wrong: $b2")
    } finally q.stop()
    // replay lineage: screens, never re-appends, never self-pairs
    val cellsBefore = idx.cells.count()
    val replay = MemoryStream[(Long, Seq[Float])]
    val gotR = scala.collection.mutable.Buffer[(Long, Long)]()
    val q2 = graft.streaming.Streaming.annIngestStream(
      replay.toDF.toDF("vec_id", "embedding"), idx, "vec_id",
      "embedding", threshold = 0.95, streamId = "ivf-1", nProbe = 16) {
      (m, _) => gotR.synchronized {
        gotR ++= m.collect().map(r => (r.getLong(0), r.getLong(1)))
      }
    }
    try {
      replay.addData(Seq((900001L, twin), (900002L, twin)))
      q2.processAllAvailable()
      assert(gotR.exists(p => p._1 == 900001L && p._2 == 900003L),
        s"replayed batch stopped screening: $gotR")
      assert(!gotR.exists(p => p._1 == p._2), s"replay self-match: $gotR")
      assert(!gotR.exists(p => Set(p._1, p._2) == Set(900001L, 900002L)),
        s"replayed batch-mates paired: $gotR")
      assert(idx.cells.count() == cellsBefore,
        "replayed batch double-appended")
    } finally q2.stop()
  }

  test("ANN screens refuse wrong-dimension arrivals LOUDLY: a stream " +
      "fed by a different embedding model fails the micro-batch " +
      "instead of silently screening prefix-truncated vectors") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.core.Graft.table(spark, sfDir, "embeddings")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_annpq_dim").toString
    val idx = graft.operators.IvfPqIndex.build(emb, "vec_id",
      "embedding", nCells = 4, numSubspaces = 8, nCentroids = 16,
      path = idxPath).get
    val short = Seq.fill(dim / 2)(0.5f)
    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    val stream = graft.streaming.Streaming.annScreenStreamPq(
      input.toDF.toDF("vec_id", "embedding", "ts"), idx,
      "vec_id", "embedding", threshold = 0.6, tsCol = "ts")
    val q = stream.writeStream.format("memory").queryName("ann_pq_dim")
      .outputMode("append").start()
    try {
      input.addData(Seq((900001L, short, ts(120))))
      val e = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains(s"expects $dim-dim")),
        s"wrong-dim arrival did not fail loudly: ${msgs(e)}")
    } finally q.stop()
    // the raw-IVF screen carries the same guard
    val ivfPath = java.nio.file.Files
      .createTempDirectory("graft_annivf_dim").toString
    val ivf = graft.operators.IvfIndex.build(emb, "vec_id",
      "embedding", nCells = 4, path = ivfPath).get
    val in2 = MemoryStream[(Long, Seq[Float], Timestamp)]
    val s2 = graft.streaming.Streaming.annScreenStream(
      in2.toDF.toDF("vec_id", "embedding", "ts"), ivf,
      "vec_id", "embedding", threshold = 0.9, tsCol = "ts")
    val q2 = s2.writeStream.format("memory").queryName("ann_ivf_dim")
      .outputMode("append").start()
    try {
      in2.addData(Seq((900001L, short, ts(120))))
      val e2 = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { q2.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e2).exists(m => m.contains(s"expects $dim-dim")),
        s"wrong-dim arrival did not fail loudly: ${msgs(e2)}")
    } finally q2.stop()
  }

  test("indexDedupStream honors a delete issued MID-STREAM: docs " +
      "arriving after the delete stop matching the victim in the very " +
      "next micro-batch — no restart") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val d = graft.core.Graft.table(spark, sfDir, "documents")
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    val delta = d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val idxPath =
      java.nio.file.Files.createTempDirectory("graft_midtomb").toString
    val idx = graft.operators.DedupIndex.build(corpus, "doc_id", "text",
      k = 3, threshold = 0.6, path = idxPath)
    val corpusIds = corpus.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    // probe doc: a delta doc with a cross pair; victim: its corpus twin
    val pre = idx.minHashPairsAgainst(delta.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => corpusIds.contains(p._1) != corpusIds.contains(p._2))
    val (probeId, victim) = pre.headOption.map { p =>
      if (corpusIds.contains(p._2)) (p._1, p._2) else (p._2, p._1)
    }.getOrElse(fail("no cross pair in fixture"))
    val probeText = delta.find(_._1 == probeId).get._2

    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = graft.streaming.Streaming.indexDedupStream(
      input.toDF.toDF("doc_id", "text", "ts"), idx,
      "doc_id", "text", threshold = 0.6, tsCol = "ts")
    val q = stream.writeStream.format("memory").queryName("mid_tomb")
      .outputMode("append").start()
    try {
      // batch 1 (pre-delete): the probe matches its corpus twin
      input.addData(Seq((900001L, probeText, ts(120))))
      q.processAllAvailable()
      input.addData(Seq((900098L, "watermark pusher", ts(1000))))
      q.processAllAvailable()
      val afterB1 = spark.table("mid_tomb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterB1.contains((900001L, victim)),
        s"pre-delete arrival should match the victim: $afterB1")

      // the takedown arrives while the stream is RUNNING
      idx.delete(Seq(victim).toDF("doc_id"), "doc_id")

      // batch 2 (post-delete): an identical arrival no longer matches
      // the victim — honored at the next micro-batch, not next restart
      input.addData(Seq((900002L, probeText, ts(2000))))
      q.processAllAvailable()
      input.addData(Seq((900099L, "watermark pusher", ts(5000))))
      q.processAllAvailable()
      val all = spark.table("mid_tomb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!all.exists(p => p._1 == 900002L && p._2 == victim),
        s"victim still surfaced for a post-delete arrival: $all")
      // survivors still screen: the post-delete arrival keeps every
      // NON-victim partner the pre-delete arrival had
      val b1Partners = all.filter(_._1 == 900001L).map(_._2) - victim
      val b2Partners = all.filter(_._1 == 900002L).map(_._2)
      assert(b2Partners == b1Partners,
        s"post-delete arrival lost non-victim partners: " +
          s"$b2Partners vs $b1Partners")
    } finally q.stop()
  }

  test("annScreenStream honors a delete issued MID-STREAM: vectors " +
      "arriving after the delete stop matching the victim in the very " +
      "next micro-batch — no restart") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.core.Graft.table(spark, sfDir, "embeddings")
    val idxPath =
      java.nio.file.Files.createTempDirectory("graft_midann").toString
    val ivf = graft.operators.IvfIndex.build(emb, "vec_id", "embedding",
      nCells = 16, path = idxPath).get
    val target = emb.orderBy(col("vec_id")).limit(1).collect()(0)
    val (victim, twin) = (target.getLong(0), target.getSeq[Float](1))

    val input = MemoryStream[(Long, Seq[Float], Timestamp)]
    val stream = graft.streaming.Streaming.annScreenStream(
      input.toDF.toDF("vec_id", "embedding", "ts"), ivf,
      "vec_id", "embedding", threshold = 0.9, tsCol = "ts", nProbe = 16)
    val q = stream.writeStream.format("memory").queryName("mid_ann")
      .outputMode("append").start()
    try {
      input.addData(Seq((900001L, twin, ts(120))))
      q.processAllAvailable()
      input.addData(Seq((900098L, twin.map(_ + 100f), ts(1000))))
      q.processAllAvailable()
      val afterB1 = spark.table("mid_ann").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterB1.contains((900001L, victim)),
        s"pre-delete twin should surface: $afterB1")

      ivf.delete(Seq(victim).toDF("vec_id"), "vec_id")

      input.addData(Seq((900002L, twin, ts(2000))))
      q.processAllAvailable()
      input.addData(Seq((900099L, twin.map(_ + 100f), ts(5000))))
      q.processAllAvailable()
      val all = spark.table("mid_ann").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!all.exists(p => p._1 == 900002L && p._2 == victim),
        s"victim still surfaced for a post-delete arrival: $all")
    } finally q.stop()
  }

  test("sinkStream lands each micro-batch into a collection exactly " +
      "once, and a replayed batch id overwrites instead of duplicating") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = Files.createTempDirectory("graft_sink_stream").toString
    val mgr = new CollectionManager(spark, s"$base/collections")
    val coll = mgr.collection("stream_docs")
    val ckpt = s"$base/ckpt"
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.Streaming.sinkStream(
      input.toDF.toDF("id", "text"), coll, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      input.addData(Seq(1L -> "a", 2L -> "b"))
      q.processAllAvailable()
      input.addData(Seq(3L -> "c"))
      q.processAllAvailable()
      assert(coll.count() == 3)
      // the lineage partition column is visible (and not underscore-hidden)
      assert(coll.read().columns.contains("graft_batch"))
    } finally q.stop()
    // simulate a failure re-run of an already-delivered batch: Spark
    // re-invokes foreachBatch with the SAME batchId after a crash, so
    // re-writing batch 0's directory in Overwrite mode (exactly what the
    // sink body does) must leave the row count unchanged
    spark.createDataFrame(Seq(1L -> "a", 2L -> "b")).toDF("id", "text")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"${coll.path}/graft_batch=0")
    assert(coll.count() == 3, "replayed batch must not duplicate")
    // a restart on the same checkpoint with no new data replays nothing
    val q2 = graft.streaming.Streaming.sinkStream(
      input.toDF.toDF("id", "text"), coll, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      q2.processAllAvailable()
      assert(coll.count() == 3, "restart must not duplicate")
    } finally q2.stop()
  }

  test("lshCandidateStream flags docs hitting a full bucket with the " +
      "(-1, id) sentinel instead of emitting unbounded partial pairs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // identical texts → identical signatures → all bands collide
    val text = "alpha beta gamma delta epsilon zeta"
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = graft.streaming.Streaming.lshCandidateStream(
      input.toDF.toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", k = 3, numHashes = 64, bands = 16,
      maxBucketSize = 2)
    val q = stream.writeStream.format("memory").queryName("lsh_overflow")
      .outputMode("append").start()
    try {
      input.addData(Seq((1L, text, ts(120)), (2L, text, ts(120)),
        (3L, text, ts(121))))
      q.processAllAvailable()
      val rows = spark.table("lsh_overflow").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows.contains((1L, 2L)), "in-capacity pair emitted")
      assert(rows.contains((-1L, 3L)), "overflow doc flagged")
      assert(!rows.exists(p => p._1 > 0 && (p._1 == 3L || p._2 == 3L)),
        "no partial pairs for the overflow doc")
    } finally q.stop()
  }

  test("contaminationStream (stream-static join) equals the batch " +
      "contamination report per document") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val d = graft.core.Graft.table(spark, sfDir, "documents")
      .filter(col("doc_id") < 150)
    val h = substring(md5(col("doc_id").cast("string")), 1, 1)
    val train = d.filter(h =!= "0" && h =!= "1")
    val test = d.filter(h === "0")
    val batch = graft.operators.Dedup
      .contaminationReport(train, test, "doc_id", "text", k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(batch.nonEmpty)

    val trainShingles = graft.operators.Dedup
      .distinctShingles(train, "doc_id", "text", 3).cache()
    val testRows = test.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = graft.streaming.Streaming.contaminationStream(
      input.toDF.toDF("doc_id", "text", "ts"), trainShingles,
      "doc_id", "text", "ts", k = 3)
    val q = stream.writeStream.format("memory").queryName("contam")
      .outputMode("update").start()
    try {
      // two micro-batches, same event-time window
      val (a, b) = testRows.splitAt(testRows.length / 2)
      input.addData(a.toSeq.map { case (id, t) => (id, t, ts(120)) })
      q.processAllAvailable()
      input.addData(b.toSeq.map { case (id, t) => (id, t, ts(121)) })
      q.processAllAvailable()
      val streamed = spark.table("contam").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getBoolean(3)))).toMap
      assert(streamed == batch,
        s"streamed ${streamed.size} vs batch ${batch.size}")
    } finally q.stop()
  }

  test("sessionWindowAgg closes gap-separated sessions like the batch rule") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val stream = Streaming.sessionWindowAgg(
      input.toDF.toDF("ts", "user_id"), "ts", "user_id", "30 minutes",
      watermark = "0 seconds")
    val q = stream.writeStream.format("memory").queryName("sess_agg")
      .outputMode("append").start()
    try {
      // user 1: events at 0,10 (one session), 60 (second session);
      // user 2: single event
      input.addData(Seq((ts(0), 1L), (ts(10), 1L), (ts(60), 1L), (ts(5), 2L)))
      q.processAllAvailable()
      // push the watermark far ahead so all sessions finalize
      input.addData(Seq((ts(10000), 99L)))
      q.processAllAvailable()
      val got = spark.table("sess_agg")
        .filter(col("user_id") < 99)
        .select(col("user_id"), col("session_events")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
      assert(got == Map(1L -> List(1L, 2L), 2L -> List(1L)))
    } finally q.stop()
  }

  test("sessionizeStateful (flatMapGroupsWithState) matches the gap rule") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Streaming.Event]
    val stream = Streaming.sessionizeStateful(input.toDS(), gapMinutes = 30,
      watermark = "0 seconds")
    val q = stream.writeStream.format("memory").queryName("sess_state")
      .outputMode("append").start()
    try {
      // keep every event strictly after epoch: a row whose event time
      // equals the initial watermark (0) is filtered as late
      input.addData(Seq(
        Streaming.Event(1L, 1L, ts(1)), Streaming.Event(1L, 2L, ts(10)),
        Streaming.Event(1L, 3L, ts(60)), Streaming.Event(2L, 4L, ts(5))))
      q.processAllAvailable()
      input.addData(Seq(Streaming.Event(99L, 5L, ts(10000))))
      q.processAllAvailable()
      // a second far-future batch lets the event-time timeout fire for
      // sessions that were still open at the previous watermark
      input.addData(Seq(Streaming.Event(99L, 6L, ts(20000))))
      q.processAllAvailable()
      val got = spark.table("sess_state")
        .filter(col("user_id") < 99)
        .select(col("user_id"), col("session_events")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
      assert(got == Map(1L -> List(1L, 2L), 2L -> List(1L)))
    } finally q.stop()
  }

  test("sessionizeStateful: late-but-in-watermark events extend, precede, " +
      "or bridge open sessions instead of splitting them") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Streaming.Event]
    val stream = Streaming.sessionizeStateful(input.toDS(), gapMinutes = 30,
      watermark = "3 hours")
    val q = stream.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      // batch 1 — user 1 opens [100,110]; user 2 opens [100] and [160]
      // (60 min apart: two sessions under the 30-min gap)
      input.addData(Seq(
        Streaming.Event(1L, 1L, ts(100)), Streaming.Event(1L, 2L, ts(110)),
        Streaming.Event(2L, 3L, ts(100)), Streaming.Event(2L, 4L, ts(160))))
      q.processAllAvailable()
      // batch 2, all within the 3 h watermark — user 1: t=10 PRECEDES the
      // open session by more than the gap (its own earlier session) and
      // t=130 EXTENDS it (a single-session state would have closed
      // [100,110] to make room for t=10 and then split); user 2: t=130
      // BRIDGES [100] and [160] into one session
      input.addData(Seq(
        Streaming.Event(1L, 5L, ts(10)), Streaming.Event(1L, 6L, ts(130)),
        Streaming.Event(2L, 7L, ts(130))))
      q.processAllAvailable()
      // two far-future batches: the first advances the watermark, the
      // second lets the event-time timeout fire and flush every session
      input.addData(Seq(Streaming.Event(99L, 8L, ts(10000))))
      q.processAllAvailable()
      input.addData(Seq(Streaming.Event(99L, 9L, ts(20000))))
      q.processAllAvailable()
      val got = spark.table("sess_late")
        .filter(col("user_id") < 99)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("session_events")).collect()
        .map(r => (r.getLong(0),
          (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toList).toMap
      assert(got(1L) == List((ts(10), ts(10), 1L), (ts(100), ts(130), 3L)))
      assert(got(2L) == List((ts(100), ts(160), 3L)))
    } finally q.stop()
  }

  test("intervalJoin pairs events within the time bound, drops the rest") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val views = MemoryStream[(Timestamp, Long, Long)]
    val joined = Streaming.intervalJoin(
      clicks.toDF.toDF("cts", "user_id", "click_id"),
      views.toDF.toDF("vts", "user_id", "view_id"),
      "user_id", "cts", "vts", within = "10 minutes")
      .select(col("click_id"), col("view_id"))
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      views.addData(Seq((ts(5), 1L, 100L), (ts(30), 1L, 101L),
        (ts(5), 2L, 200L)))
      clicks.addData(Seq((ts(12), 1L, 1L), (ts(35), 1L, 2L), (ts(50), 2L, 3L)))
      q.processAllAvailable()
      val got = spark.table("ivj").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // click 1 @12 pairs view 100 @5 (within 10m); click 2 @35 pairs
      // view 101 @30; click 3 @50 pairs nothing (view 200 @5 too old)
      assert(got == Set((1L, 100L), (2L, 101L)))
    } finally q.stop()
  }

  test("dedupStream keeps one row per event id across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val out = Streaming.dedupStream(input.toDF.toDF("ts", "event_id"),
      "event_id", "ts")
    val q = out.writeStream.format("memory").queryName("dedup_s")
      .outputMode("append").start()
    try {
      input.addData(Seq((ts(1), 10L), (ts(1), 10L), (ts(2), 11L)))
      q.processAllAvailable()
      input.addData(Seq((ts(1), 10L), (ts(3), 12L))) // replay of id 10
      q.processAllAvailable()
      val ids = spark.table("dedup_s").select(col("event_id"))
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(10L, 11L, 12L))
    } finally q.stop()
  }

  test("continuousLoad ingests files exactly once into a collection") {
    val src = Files.createTempDirectory("graft-stream-src").toString
    val db = new CollectionManager(spark,
      Files.createTempDirectory("graft-stream-db").toString)
    val c = db.collection("events_ingest")
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    val events = graft.core.Graft.table(spark, sfDir, "events")
    events.limit(100).write.mode("append").parquet(src)
    val q1 = Streaming.continuousLoad(spark, src, c, ckpt)
    q1.awaitTermination(120000)
    assert(c.count() == 100)

    // new file arrives → only the delta is ingested on the next drain
    events.limit(150).write.mode("append").parquet(src)
    val q2 = Streaming.continuousLoad(spark, src, c, ckpt)
    q2.awaitTermination(120000)
    assert(c.count() == 250)
  }

  test("continuousLoad with an explicit schema starts on an EMPTY landing " +
      "directory and drains files that appear later") {
    val src = Files.createTempDirectory("graft-stream-empty").toString
    val db = new CollectionManager(spark,
      Files.createTempDirectory("graft-stream-db2").toString)
    val c = db.collection("events_ingest_empty")
    val ckpt = Files.createTempDirectory("graft-ckpt2").toString

    val events = graft.core.Graft.table(spark, sfDir, "events")
    // the landing dir is empty at construction — the normal boot state
    // for a tailing deployment; the explicit schema skips the eager
    // inference read that would otherwise throw before the stream starts
    val q1 = Streaming.continuousLoad(spark, src, c, ckpt,
      schema = Some(events.schema))
    q1.awaitTermination(120000)
    assert(c.count() == 0)

    events.limit(80).write.mode("append").parquet(src)
    val q2 = Streaming.continuousLoad(spark, src, c, ckpt,
      schema = Some(events.schema))
    q2.awaitTermination(120000)
    assert(c.count() == 80)
  }

  test("stateless pipeline ops (masking, chunking, quality) run on a " +
      "stream unchanged and match their batch output") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = (1 to 30).map(i =>
      (i.toLong, (1 to 20).map(j => s"w${(i * j) % 7}").mkString(" ")))
    val batchDf = rows.toDF("doc_id", "text")

    val input = MemoryStream[(Long, String)]
    // the SAME operator calls, applied to the streaming frame: these
    // are map-only transforms, so Structured Streaming accepts them
    // with no watermark/outputMode ceremony — one definition serves
    // batch and streaming, which is the point of building on DataFrames
    val streamed = graft.operators.Chunking.tokenWindows(
      graft.operators.Masking.maskTokens(
        input.toDS().toDF("doc_id", "text"),
        "doc_id", "text", rateNum = 3, rateDen = 20)
        .select(col("doc_id"), col("masked_text").as("text")),
      "doc_id", "text", width = 8, stride = 8)
    val q = streamed.writeStream.format("memory")
      .queryName("stateless_ops").start()
    try {
      input.addData(rows.take(15): _*)
      q.processAllAvailable()
      input.addData(rows.drop(15): _*)
      q.processAllAvailable()
    } finally q.stop()

    val expected = graft.operators.Chunking.tokenWindows(
      graft.operators.Masking.maskTokens(batchDf, "doc_id", "text", 3, 20)
        .select(col("doc_id"), col("masked_text").as("text")),
      "doc_id", "text", width = 8, stride = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    val got = spark.table("stateless_ops")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == expected)
  }

  test("packStream: cursor carries across micro-batches (offsets are " +
      "one contiguous stream per stratum), straddles at the right " +
      "cuts, and id-ordered arrival reproduces the batch packer " +
      "byte-for-byte") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val stream = Streaming.packStream(
      input.toDF.toDF("lang", "doc_id", "n"),
      "doc_id", "lang", "n", seqLen = 10)
    val q = stream.writeStream.format("memory").queryName("pack_stream")
      .outputMode("append").start()
    try {
      def rows() = spark.table("pack_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
        .toMap
      // batch 1: a:4+7 tokens (7 straddles the 10-cut), b:3
      input.addData(Seq(("a", 1L, 4L), ("a", 2L, 7L), ("b", 10L, 3L)))
      q.processAllAvailable()
      assert(rows() == Map(
        ("a", 1L) -> (0L, 0L, 0L, false),
        ("a", 2L) -> (4L, 0L, 1L, true),
        ("b", 10L) -> (0L, 0L, 0L, false)))
      // batch 2: cursors resume at a=11, b=3; a zero-token doc sits
      // at the cursor and never straddles
      input.addData(Seq(("a", 3L, 9L), ("a", 4L, 0L), ("b", 11L, 17L)))
      q.processAllAvailable()
      val r2 = rows()
      assert(r2(("a", 3L)) == (11L, 1L, 1L, false))
      assert(r2(("a", 4L)) == (20L, 2L, 2L, false))
      assert(r2(("b", 11L)) == (3L, 0L, 1L, true))

      // id-ordered arrival ≡ the batch packer on the same counts:
      // replay real documents (zero-merge byte counts) in id order
      val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("text").isNotNull)
      val corpus = docsDf.select(col("lang"), col("doc_id"),
        octet_length(col("text")).cast("long").as("n"))
      val batch = graft.operators.Packing.packSequencesBpe(
          docsDf, "doc_id", "text", "lang", seqLen = 512, merges = Nil,
          tokenPattern =
            graft.functions.TextFunctions.bpeBytePatternFull)
        .select("lang", "doc_id", "begin_offset", "seq_id", "seq_last",
          "straddles")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
        .toMap
      val in2 = MemoryStream[(String, Long, Long)]
      val s2 = Streaming.packStream(in2.toDF.toDF("lang", "doc_id", "n"),
        "doc_id", "lang", "n", seqLen = 512)
      val q2 = s2.writeStream.format("memory").queryName("pack_stream2")
        .outputMode("append").start()
      try {
        // two id-ordered micro-batches split mid-corpus
        val all = corpus.orderBy("doc_id")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        val (b1, b2) = all.splitAt(all.length / 2)
        in2.addData(b1.toSeq); q2.processAllAvailable()
        in2.addData(b2.toSeq); q2.processAllAvailable()
        val streamed = spark.table("pack_stream2").collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
          .toMap
        assert(streamed == batch,
          "id-ordered streaming must equal batch packing")
      } finally q2.stop()
    } finally q.stop()
  }

  test("materializeStream: complete sequences emit with exact spans, " +
      "a straddling document carries across micro-batches through " +
      "state, and id-ordered arrival equals the batch artifact") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // hand fixture: seqLen 5, byte tokens. a1 'ab' (2), a2 'cdefg'
    // (5): seq 0 = ab+cde (a2 straddles), buffer holds fg
    val input = MemoryStream[(String, Long, String)]
    val stream = Streaming.materializeStream(
      input.toDF.toDF("lang", "doc_id", "text"), "doc_id", "text",
      "lang", seqLen = 5, merges = Nil,
      tokenPattern = graft.functions.TextFunctions.bpeBytePatternFull)
    val q = stream.writeStream.format("memory").queryName("mat_stream")
      .outputMode("append").start()
    try {
      def seqs() = spark.table("mat_stream").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getSeq[Long](2),
            r.getSeq[org.apache.spark.sql.Row](3)
              .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))),
            r.getLong(4), r.getBoolean(5))).toMap
      input.addData(Seq(("a", 1L, "ab"), ("a", 2L, "cdefg")))
      q.processAllAvailable()
      val s1 = seqs()
      assert(s1.keySet == Set(("a", 0L)))
      val (ids0, spans0, n0, c0) = s1(("a", 0L))
      assert(n0 == 5L && c0 && ids0.size == 5)
      assert(spans0 == Seq((0L, 1L, 2L), (2L, 2L, 3L)),
        s"straddle spans wrong: $spans0")
      // batch 2: zero-token doc contributes nothing; 'hij' (3) tops
      // up the carried 'fg' (2) → seq 1 completes with a2's TAIL
      // first — the cross-batch straddle the state exists for
      input.addData(Seq(("a", 3L, ""), ("a", 4L, "hij")))
      q.processAllAvailable()
      val s2 = seqs()
      assert(s2.keySet == Set(("a", 0L), ("a", 1L)))
      val (ids1, spans1, _, _) = s2(("a", 1L))
      assert(ids1.size == 5)
      assert(spans1 == Seq((0L, 2L, 2L), (2L, 4L, 3L)),
        s"carried-tail spans wrong: $spans1")

      // id-ordered replay over real documents (with a separator)
      // equals the batch artifact minus its incomplete tails
      val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("text").isNotNull)
      val batch = graft.operators.Packing.materializeSequences(
          docsDf, "doc_id", "text", "lang", seqLen = 512, merges = Nil,
          specialTokens = Seq("<|endoftext|>"),
          dropIncomplete = true,
          docSeparator = Some("<|endoftext|>"),
          tokenPattern =
            graft.functions.TextFunctions.bpeBytePatternFull)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getSeq[Long](2),
            r.getSeq[org.apache.spark.sql.Row](3)
              .map(s => (s.getLong(0), s.getLong(1), s.getLong(2)))))
        .toMap
      val in2 = MemoryStream[(String, Long, String)]
      val s3 = Streaming.materializeStream(
        in2.toDF.toDF("lang", "doc_id", "text"), "doc_id", "text",
        "lang", seqLen = 512, merges = Nil,
        specialTokens = Seq("<|endoftext|>"),
        docSeparator = Some("<|endoftext|>"),
        tokenPattern = graft.functions.TextFunctions.bpeBytePatternFull)
      val q2 = s3.writeStream.format("memory").queryName("mat_stream2")
        .outputMode("append").start()
      try {
        val all = docsDf.select("lang", "doc_id", "text")
          .orderBy("doc_id").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        val (b1, b2) = all.splitAt(all.length / 2)
        in2.addData(b1.toSeq); q2.processAllAvailable()
        in2.addData(b2.toSeq); q2.processAllAvailable()
        val streamed = spark.table("mat_stream2").collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            (r.getSeq[Long](2),
              r.getSeq[org.apache.spark.sql.Row](3)
                .map(s => (s.getLong(0), s.getLong(1), s.getLong(2)))))
          .toMap
        assert(streamed == batch,
          s"streamed ${streamed.size} vs batch ${batch.size} sequences")
      } finally q2.stop()
    } finally q.stop()
  }

  test("materializeStreamFlush: an idle stratum's partial sequence " +
      "flushes complete=false once the watermark passes last-seen + " +
      "flushAfter; the sequence-id line continues after the flush; " +
      "active strata never flush") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(minOfDay: Int): java.sql.Timestamp =
      new java.sql.Timestamp(minOfDay * 60000L)
    val input = MemoryStream[(String, Long, String, java.sql.Timestamp)]
    val stream = Streaming.materializeStreamFlush(
      input.toDF.toDF("lang", "doc_id", "text", "ts"),
      "doc_id", "text", "lang", "ts", seqLen = 5, merges = Nil,
      flushAfter = "1 hour",
      tokenPattern = graft.functions.TextFunctions.bpeBytePatternFull)
    val q = stream.writeStream.format("memory").queryName("mat_flush")
      .outputMode("append").start()
    try {
      def seqs() = spark.table("mat_flush").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getSeq[Long](2).size, r.getLong(4), r.getBoolean(5)))
        .toMap
      // 10:00 — a: 7 tokens → seq 0 complete, 2 tokens buffered
      input.addData(Seq(("a", 1L, "abcdefg", ts(600))))
      q.processAllAvailable()
      assert(seqs() == Map(("a", 0L) -> (5, 5L, true)))
      // 10:30 — b speaks (watermark 10:00 < a's 11:00 horizon): a's
      // partial holds
      input.addData(Seq(("b", 10L, "xy", ts(630))))
      q.processAllAvailable()
      assert(seqs() == Map(("a", 0L) -> (5, 5L, true)))
      // 13:00 — b advances the watermark past a's 11:00 horizon: a's
      // 2-token partial flushes complete=false; b (last seen 10:30,
      // horizon 11:30 < 13:00 watermark? watermark after THIS batch
      // is 10:30; b re-arms its own timeout) — only a flushes
      input.addData(Seq(("b", 11L, "z", ts(780))))
      q.processAllAvailable()
      input.addData(Seq(("b", 12L, "w", ts(781))))
      q.processAllAvailable()
      val s3 = seqs()
      assert(s3(("a", 1L)) == (2, 2L, false),
        s"idle partial must flush: $s3")
      // 13:05 — a re-appears: the id line CONTINUES at seq 2 (never
      // reuses the flushed id 1); 8 tokens → seq 2 completes (5) and
      // 3 stay buffered
      input.addData(Seq(("a", 2L, "hijklmno", ts(785))))
      q.processAllAvailable()
      val s4 = seqs()
      assert(s4(("a", 2L)) == (5, 5L, true),
        s"post-flush cursor must continue, got $s4")
      assert(!s4.contains(("b", 0L)) || s4(("b", 0L))._3 == false,
        "b has at most its own flush")
    } finally q.stop()
  }

  test("dsirScore over a stream: frozen terms score arriving documents " +
      "identically to the batch scorer (stream-static broadcast join, " +
      "update-mode per-doc sums)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
    val terms = graft.operators.Selection.dsirTerms(
      docsDf, docsDf.filter(col("lang") === "en"), "text", 256)
      .cache()
    val batch = graft.operators.Selection.dsirScore(
        docsDf, "doc_id", "text", terms, 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val input = MemoryStream[(Long, String)]
    val scored = graft.operators.Selection.dsirScore(
      input.toDF.toDF("doc_id", "text"), "doc_id", "text", terms, 256)
    val q = scored.writeStream.format("memory").queryName("dsir_stream")
      .outputMode("update").start()
    try {
      // two micro-batches; each doc arrives exactly once, so its
      // update row IS its final score
      val all = docsDf.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val (b1, b2) = all.splitAt(all.length / 2)
      input.addData(b1.toSeq); q.processAllAvailable()
      input.addData(b2.toSeq); q.processAllAvailable()
      val streamed = spark.table("dsir_stream").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed == batch,
        s"streamed ${streamed.size} vs batch ${batch.size} docs")
    } finally { q.stop(); terms.unpersist() }
  }

  test("domainQuotaStream: first-quota-per-domain across micro-batches, " +
      "cap survives idle batches, later arrivals at a full domain drop") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = Streaming.domainQuotaStream(
      input.toDF.toDF("doc_id", "domain"), "doc_id", "domain", quota = 3)
    val q = stream.writeStream.format("memory").queryName("dom_quota")
      .outputMode("append").start()
    try {
      def kept(): Map[String, Set[Long]] = spark.table("dom_quota")
        .collect().map(r => (r.getString(1), r.getLong(0)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // batch 1: A under quota, B exactly at quota
      input.addData(Seq(1L -> "A", 2L -> "A", 10L -> "B", 11L -> "B",
        12L -> "B"))
      q.processAllAvailable()
      assert(kept() == Map("A" -> Set(1L, 2L), "B" -> Set(10L, 11L, 12L)))
      // batch 2: A tops up to 3 then drops; B (already full) all drop;
      // C starts fresh
      input.addData(Seq(3L -> "A", 4L -> "A", 13L -> "B", 20L -> "C"))
      q.processAllAvailable()
      assert(kept() == Map("A" -> Set(1L, 2L, 3L),
        "B" -> Set(10L, 11L, 12L), "C" -> Set(20L)))
      // batch 3 after B/C idle a batch: counters persisted, not reset
      input.addData(Seq(14L -> "B", 21L -> "C", 22L -> "C", 23L -> "C"))
      q.processAllAvailable()
      val finalKept = kept()
      assert(finalKept("B") == Set(10L, 11L, 12L), "B cap must survive")
      assert(finalKept("C") == Set(20L, 21L, 22L), finalKept.toString)
      // total = quota-bounded per domain
      assert(finalKept.values.forall(_.size <= 3))
    } finally q.stop()
  }

  test("domainQuotaStreamTtl: counters survive within the TTL horizon, " +
      "idle domains evict once the watermark passes last-seen + ttl, " +
      "and a re-appearing domain starts a fresh quota") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(minOfDay: Int): java.sql.Timestamp =
      new java.sql.Timestamp(minOfDay * 60000L)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = Streaming.domainQuotaStreamTtl(
      input.toDF.toDF("doc_id", "domain", "ts"),
      "doc_id", "domain", "ts", quota = 2, ttl = "1 hour")
    val q = stream.writeStream.format("memory").queryName("dom_quota_ttl")
      .outputMode("append").start()
    try {
      def kept(): Map[String, Set[Long]] = spark.table("dom_quota_ttl")
        .collect().map(r => (r.getString(1), r.getLong(0)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // 10:00 — A over quota: 2 kept
      input.addData(Seq((1L, "A", ts(600)), (2L, "A", ts(600)),
        (3L, "A", ts(600))))
      q.processAllAvailable()
      assert(kept() == Map("A" -> Set(1L, 2L)))
      // 10:30 — still inside the TTL horizon: counter held, drop
      input.addData(Seq((4L, "A", ts(630))))
      q.processAllAvailable()
      assert(kept() == Map("A" -> Set(1L, 2L)), "cap reset inside TTL")
      // 13:00 — B advances the watermark far past A's 11:30 horizon;
      // the no-data timeout batch evicts A's counter
      input.addData(Seq((10L, "B", ts(780))))
      q.processAllAvailable()
      assert(kept() == Map("A" -> Set(1L, 2L), "B" -> Set(10L)))
      // 13:05 — A re-appears after eviction: FRESH quota (the
      // documented per-activity-burst trade)
      input.addData(Seq((5L, "A", ts(785)), (6L, "A", ts(785)),
        (7L, "A", ts(785))))
      q.processAllAvailable()
      val finalKept = kept()
      assert(finalKept("A") == Set(1L, 2L, 5L, 6L),
        s"expected a fresh post-eviction quota, got $finalKept")
      assert(finalKept("B") == Set(10L))
    } finally q.stop()
  }

  test("sequenceContaminationStream: a cross-boundary contamination " +
      "ARRIVING ACROSS A MICRO-BATCH SPLIT is flagged on ingest " +
      "(invisible at document level), and the screen equals the batch " +
      "x97 report on a real id-ordered replay") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // planted case: doc1 "ab" + doc2 "cdefg" pack into seq 0 = "abcde"
    // — a WORD that exists in NEITHER document, only in the packed
    // sequence, and doc2 arrives in a LATER micro-batch
    val bench = Seq(Tuple1("abcde")).toDF("text")
    val input = MemoryStream[(String, Long, String)]
    val seqsStream = Streaming.materializeStream(
      input.toDF.toDF("lang", "doc_id", "text"), "doc_id", "text",
      "lang", seqLen = 5, merges = Nil,
      tokenPattern = graft.functions.TextFunctions.bpeBytePatternFull)
    val screened = Streaming.sequenceContaminationStream(
      seqsStream.toDF(), bench, "text", merges = Nil, k = 1)
    val q = screened.writeStream.format("memory")
      .queryName("seq_contam_stream").outputMode("append").start()
    try {
      input.addData(Seq(("a", 1L, "ab")))
      q.processAllAvailable()
      assert(spark.table("seq_contam_stream").isEmpty,
        "no sequence completed yet")
      input.addData(Seq(("a", 2L, "cdefg")))
      q.processAllAvailable()
      val flagged = spark.table("seq_contam_stream")
        .select(col("strata"), col("seq_id"), col("n_shingles"),
          col("n_shared"), col("contaminated"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      assert(flagged == Map(("a", 0L) -> (1L, 1L, true)),
        s"cross-boundary case not flagged on ingest: $flagged")
      // the DOCUMENT-level screen cannot see it — neither doc carries
      // the crossing word
      val docLevel = graft.operators.Dedup.contaminationReport(
        bench.select(monotonically_increasing_id().as("id"), col("text")),
        Seq((1L, "ab"), (2L, "cdefg")).toDF("id", "text"),
        "id", "text", k = 1)
        .filter(col("contaminated")).count()
      assert(docLevel == 0, "planted case must be doc-level invisible")
    } finally q.stop()

    // batch parity on real documents: id-ordered replay split across
    // micro-batches, screened on ingest, equals the exact batch x97
    // report on the same (complete) sequences
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
    val benchmark = docsDf.filter(
      substring(md5(col("doc_id").cast("string")), 1, 1) === "0")
      .select(col("text"))
    val batchSeqs = graft.operators.Packing.materializeSequences(
      docsDf, "doc_id", "text", "lang", seqLen = 512, merges = Nil,
      dropIncomplete = true,
      tokenPattern = graft.functions.TextFunctions.bpeBytePatternFull)
    val batchReport = graft.operators.Packing.sequenceContamination(
      batchSeqs, "lang", benchmark, "text", merges = Nil, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val in2 = MemoryStream[(String, Long, String)]
    val s2 = Streaming.materializeStream(
      in2.toDF.toDF("lang", "doc_id", "text"), "doc_id", "text",
      "lang", seqLen = 512, merges = Nil,
      tokenPattern = graft.functions.TextFunctions.bpeBytePatternFull)
    val screened2 = Streaming.sequenceContaminationStream(
      s2.toDF(), benchmark, "text", merges = Nil, k = 3)
    val q2 = screened2.writeStream.format("memory")
      .queryName("seq_contam_stream2").outputMode("append").start()
    try {
      val all = docsDf.select("lang", "doc_id", "text")
        .orderBy("doc_id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      val (b1, b2) = all.splitAt(all.length / 2)
      in2.addData(b1.toSeq); q2.processAllAvailable()
      in2.addData(b2.toSeq); q2.processAllAvailable()
      val streamed = spark.table("seq_contam_stream2")
        .select(col("strata"), col("seq_id"), col("n_shingles"),
          col("n_shared"), col("contaminated"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      assert(streamed.nonEmpty)
      assert(streamed == batchReport.view
        .filterKeys(streamed.contains).toMap,
        "stream screen diverged from the batch x97 report")
      // every key the batch report has beyond the stream's is an
      // incomplete tail the stream correctly withheld
      assert(batchReport.keySet == streamed.keySet,
        s"complete-sequence sets differ: batch ${batchReport.size} " +
          s"vs stream ${streamed.size}")
    } finally q2.stop()
  }

  test("materializeStreamTtl: an idle stratum flushes its partial AND " +
      "evicts; a re-appearing stratum RESTARTS its sequence line at 0 " +
      "(visible as a second (stratum, 0) emission)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(minOfDay: Int): java.sql.Timestamp =
      new java.sql.Timestamp(minOfDay * 60000L)
    val input = MemoryStream[(String, Long, String, java.sql.Timestamp)]
    val stream = Streaming.materializeStreamTtl(
      input.toDF.toDF("lang", "doc_id", "text", "ts"),
      "doc_id", "text", "lang", "ts", seqLen = 5, merges = Nil,
      ttl = "1 hour",
      tokenPattern = graft.functions.TextFunctions.bpeBytePatternFull)
    val q = stream.writeStream.format("memory").queryName("mat_ttl")
      .outputMode("append").start()
    try {
      def rows() = spark.table("mat_ttl").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(4),
          r.getBoolean(5))).toSeq
      // 10:00 — a: 7 tokens → seq 0 complete, 2 buffered
      input.addData(Seq(("a", 1L, "abcdefg", ts(600))))
      q.processAllAvailable()
      assert(rows() == Seq(("a", 0L, 5L, true)))
      // 13:00+ — b pushes the watermark past a's 11:00 horizon: a's
      // partial flushes complete=false and the state EVICTS
      input.addData(Seq(("b", 10L, "z", ts(780))))
      q.processAllAvailable()
      input.addData(Seq(("b", 11L, "w", ts(781))))
      q.processAllAvailable()
      assert(rows().contains(("a", 1L, 2L, false)),
        s"idle partial must flush before eviction: ${rows()}")
      // 13:05 — a re-appears AFTER eviction: the id line RESTARTS at
      // seq 0 (the documented per-burst trade) — a SECOND ("a", 0)
      // emission is the visible restart
      input.addData(Seq(("a", 2L, "hijkl", ts(785))))
      q.processAllAvailable()
      val emissions = rows().filter(r => r._1 == "a" && r._2 == 0L)
      assert(emissions == Seq(("a", 0L, 5L, true), ("a", 0L, 5L, true)),
        s"re-appearing stratum must restart its id line: ${rows()}")
    } finally q.stop()
  }

  test("packStreamTtl: an idle stratum's cursor evicts (offsets " +
      "restart at 0 per activity burst); active strata keep one " +
      "contiguous stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(minOfDay: Int): java.sql.Timestamp =
      new java.sql.Timestamp(minOfDay * 60000L)
    val input = MemoryStream[(String, Long, Long, java.sql.Timestamp)]
    val stream = Streaming.packStreamTtl(
      input.toDF.toDF("lang", "doc_id", "n", "ts"),
      "doc_id", "lang", "n", "ts", seqLen = 10, ttl = "1 hour")
    val q = stream.writeStream.format("memory").queryName("pack_ttl")
      .outputMode("append").start()
    try {
      def begins() = spark.table("pack_ttl").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
      // 10:00 — a: 7 tokens at offset 0
      input.addData(Seq(("a", 1L, 7L, ts(600))))
      q.processAllAvailable()
      assert(begins() == Map(("a", 1L) -> 0L))
      // inside the horizon the cursor holds: next doc at offset 7
      input.addData(Seq(("a", 2L, 4L, ts(630))))
      q.processAllAvailable()
      assert(begins()(("a", 2L)) == 7L)
      // 13:00+ — b pushes the watermark past a's horizon: a evicts
      input.addData(Seq(("b", 10L, 1L, ts(780))))
      q.processAllAvailable()
      input.addData(Seq(("b", 11L, 1L, ts(781))))
      q.processAllAvailable()
      // 13:05 — a re-appears: offsets RESTART at 0 (fresh burst);
      // b (active) continues its contiguous stream at offset 1
      input.addData(Seq(("a", 3L, 2L, ts(785)), ("b", 12L, 2L, ts(785))))
      q.processAllAvailable()
      val b3 = begins()
      assert(b3(("a", 3L)) == 0L,
        s"evicted stratum must restart at 0: $b3")
      assert(b3(("b", 12L)) == 2L,
        s"active stratum must stay contiguous: $b3")
    } finally q.stop()
  }
}
