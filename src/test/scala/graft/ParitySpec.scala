package graft

import java.nio.file.{Files, InvalidPathException}

import graft.core.CollectionManager
import graft.io.ParquetLoader
import graft.serde.JsonDocEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity behavior: collection lifecycle + loader semantics
  * mirroring the reference's 24-case count-parity matrix
  * (ParquetArangoLoaderTest.java:94-162), and the quirk JSON encoder vs
  * the documented transcoder behavior
  * (GenericRecordJsonEncoder.java:42-216).
  */
class ParitySpec extends SparkSpec {

  private def freshDb(): CollectionManager = {
    val dir = Files.createTempDirectory("graft-db").toString
    new CollectionManager(spark, dir)
  }
  private val fixture = s"$sfDir/nation.parquet"
  private lazy val fixtureRows =
    spark.read.parquet(fixture).count()

  test("load into fresh collection creates it with the file's row count") {
    val c = freshDb().collection("nation")
    assert(!c.exists())
    val loaded = new ParquetLoader(spark).load(fixture, c)
    assert(c.exists())
    assert(loaded == fixtureRows)
    assert(c.count() == fixtureRows)
  }

  test("append load doubles the count; overwrite resets it") {
    val c = freshDb().collection("nation")
    val loader = new ParquetLoader(spark)
    loader.load(fixture, c)
    loader.load(fixture, c) // append (overwrite=false)
    assert(c.count() == 2 * fixtureRows)
    loader.load(fixture, c, overwriteCollection = true)
    assert(c.count() == fixtureRows)
  }

  test("small batchSize load preserves count (batch = write file sizing)") {
    val c = freshDb().collection("nation")
    new ParquetLoader(spark).load(fixture, c, batchSize = 3)
    assert(c.count() == fixtureRows)
  }

  test("async load matches sync semantics incl. append") {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val c = freshDb().collection("nation")
    val loader = new ParquetLoader(spark)
    assert(Await.result(loader.loadAsync(fixture, c), 2.minutes)
      == fixtureRows)
    Await.result(loader.loadAsync(fixture, c, batchSize = 3), 2.minutes)
    assert(c.count() == 2 * fixtureRows)
  }

  test("validation: batchSize/maxParallelBatches >= 1, path must parse") {
    val c = freshDb().collection("nation")
    val loader = new ParquetLoader(spark)
    intercept[IllegalArgumentException](loader.load(fixture, c, batchSize = 0))
    intercept[IllegalArgumentException] {
      import scala.concurrent.ExecutionContext.Implicits.global
      loader.loadAsync(fixture, c, maxParallelBatches = 0)
    }
    intercept[InvalidPathException](loader.load(0.toChar + "bad", c))
  }

  test("collection drop removes data; read of empty collection is empty") {
    val db = freshDb()
    val c = db.collection("tmp")
    new ParquetLoader(spark).load(fixture, c)
    assert(c.count() > 0)
    c.drop()
    assert(!c.exists())
    c.create()
    assert(c.exists() && c.count() == 0)
  }

  test("end-to-end user journey: load parquet → collection → SQL query") {
    val db = freshDb()
    val loader = new ParquetLoader(spark)
    loader.load(s"$sfDir/lineitem.parquet", db.collection("li"))
    loader.load(s"$sfDir/orders.parquet", db.collection("ord"))
    db.collection("li").createView("li")
    db.collection("ord").createView("ord")
    val fromCollections = spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM li JOIN ord ON l_orderkey = o_orderkey
        |WHERE l_quantity > 30
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val direct = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_quantity") > 30)
      .groupBy(col("o_orderpriority")).count()
      .orderBy(col("o_orderpriority"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(fromCollections == direct && direct.nonEmpty)
  }

  test("partitioned collection write prunes partitions on filtered reads") {
    import org.apache.spark.sql.SaveMode
    val c = freshDb().collection("cust_part")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    c.create()
    c.write(cust, SaveMode.Overwrite, partitionBy = Seq("c_mktsegment"))
    assert(c.count() == cust.count())
    val one = c.read().filter(col("c_mktsegment") === "BUILDING")
    // partition pruning: the filtered scan reads only the one partition dir
    val scanned = one.queryExecution.executedPlan.collectLeaves().map(
      _.toString).mkString
    assert(one.count() ==
      cust.filter(col("c_mktsegment") === "BUILDING").count())
    assert(scanned.contains("PartitionFilters") ||
      !scanned.contains("c_mktsegment=AUTOMOBILE"))
  }

  test("DocumentSink delivers every row once in bounded batches") {
    import graft.io.{BatchSink, DocumentSink}
    val sizes = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val docs = spark.sparkContext.collectionAccumulator[String]("docs")
    val sink = new BatchSink {
      override def insertDocuments(batch: Seq[String]): Unit = {
        sizes.add(batch.size)
        batch.foreach(docs.add)
      }
    }
    val nation = spark.read.parquet(fixture)
    DocumentSink.writeDocuments(nation, sink, batchSize = 7)
    import scala.jdk.CollectionConverters._
    assert(sizes.value.asScala.forall(_ <= 7))
    assert(docs.value.size() == fixtureRows)
    assert(docs.value.asScala.forall(d =>
      d.startsWith("{") && d.contains("\"n_name\"")))
    intercept[IllegalArgumentException](
      DocumentSink.writeDocuments(nation, sink, batchSize = 0))
  }

  test("type converter registry transforms columns before encoding " +
      "(reference addTypeConverter ISO-8601 example)") {
    val db = freshDb()
    val c = db.collection("orders")
    // o_orderdate reads as TimestampNTZ from the driver-generated parquet
    val loader = new ParquetLoader(spark)
      .addTypeConverter(TimestampNTZType,
        d => date_format(d, "yyyy-MM-dd'T'00:00:00"))
    loader.load(s"$sfDir/orders.parquet", c)
    val schema = c.read().schema
    assert(schema("o_orderdate").dataType == StringType)
    val v = c.read().select(col("o_orderdate")).limit(1)
      .collect().head.getString(0)
    assert(v.matches("\\d{4}-\\d{2}-\\d{2}T00:00:00"))
  }

  test("quirk JSON: NaN/Inf quoted, bytes as ISO-8859-1 object, " +
      "schema field order, control-char escaping") {
    import spark.implicits._
    // build the U+2014 em-dash / U+2028 line-separator probe at runtime
    // (source-level unicode escapes would be preprocessed by scalac)
    val uProbe = "em" + 0x2014.toChar + "dash " + 0x2028.toChar + "sep"
    val df = Seq(
      (1L, Double.NaN, "plain"),
      (2L, Double.PositiveInfinity, "tab\there"),
      (3L, 1.5, uProbe)
    ).toDF("id", "x", "s")
      .withColumn("b", when(col("id") === 1, lit(Array[Byte](72, 105, -1)))
        .otherwise(lit(null).cast("binary")))
    val docs = JsonDocEncoder.encode(df, quirkCompat = true)
      .select(col("id"), col("doc")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs(1L) ==
      "{\"id\": 1, \"x\": \"NaN\", \"s\": \"plain\", \"b\": {\"bytes\": \"Hi" +
        0xff.toChar + "\"}}")
    assert(docs(2L) ==
      "{\"id\": 2, \"x\": \"Infinity\", \"s\": \"tab\\there\", \"b\": null}")
    // 1.5 renders as a bare number; the whole U+2000-U+20FF block (both
    // the em-dash and the line separator) hex-escapes
    assert(docs(3L) ==
      "{\"id\": 3, \"x\": 1.5, \"s\": " +
        "\"em\\u2014dash \\u2028sep\", \"b\": null}")
  }

  test("quirk JSON: nested struct/array/map and raw logical types") {
    import spark.implicits._
    val df = Seq((1, Seq(1, 2), Map("k" -> 1.5), java.sql.Date.valueOf("1970-01-11")))
      .toDF("i", "arr", "m", "d")
      .withColumn("nested", struct(col("i").as("a"), lit("x").as("b")))
    val doc = JsonDocEncoder.encode(df, quirkCompat = true)
      .select(col("doc")).collect().head.getString(0)
    assert(doc ==
      """{"i": 1, "arr": [1, 2], "m": {"k": 1.5}, "d": 10, """ +
      """"nested": {"a": 1, "b": "x"}}""")
  }

  test("default (non-quirk) encode matches Spark to_json semantics") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("i", "s")
    val doc = JsonDocEncoder.encode(df)
      .select(col("doc")).collect().head.getString(0)
    assert(doc == """{"i":1,"s":"a"}""")
  }

  // ---- the reference's OWN fixture files (the exact parquet inputs its
  // 24-case matrix runs over, ParquetArangoLoaderTest.java:94-106) ----

  private val refRes = "/root/reference/src/test/resources"
  private val refFixtures = Seq(
    "testTypes.parquet" -> 26L,
    "testTypesWithPDIndex.parquet" -> 26L,
    "traffic.parquet" -> 2000L,
    "trafficWithPDIndex.parquet" -> 2000L)

  test("reference fixtures: full 24-case matrix — 4 files × {sync, async} " +
      "× {overwrite, append, batchSize=3}") {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    refFixtures.foreach { case (name, rows) =>
      val path = s"$refRes/$name"
      val loader = new ParquetLoader(spark)
      val c = freshDb().collection("TRAFFIC_COL")
      // canLoadParquetSyncWithOverwrite (:108-115)
      loader.load(path, c, overwriteCollection = true)
      assert(c.count() == rows, s"$name sync overwrite")
      // canLoadParquetSyncAsAppend (:117-125)
      loader.load(path, c, overwriteCollection = true)
      loader.load(path, c)
      assert(c.count() == 2 * rows, s"$name sync append")
      // canLoadParquetSyncSmallerBatchSize (:127-134)
      loader.load(path, c, overwriteCollection = true, batchSize = 3)
      assert(c.count() == rows, s"$name sync batch=3")
      // canLoadParquetAsyncWithOverwrite (:136-143)
      assert(Await.result(
        loader.loadAsync(path, c, overwriteCollection = true),
        2.minutes) == rows)
      assert(c.count() == rows, s"$name async overwrite")
      // canLoadParquetAsyncAsAppend (:145-153)
      Await.result(loader.loadAsync(path, c, overwriteCollection = true),
        2.minutes)
      Await.result(loader.loadAsync(path, c), 2.minutes)
      assert(c.count() == 2 * rows, s"$name async append")
      // canLoadParquetAsyncSmallerBatchSize (:155-162)
      Await.result(loader.loadAsync(path, c, overwriteCollection = true,
        batchSize = 3), 2.minutes)
      assert(c.count() == rows, s"$name async batch=3")
    }
  }

  test("pandas-footer (*WithPDIndex) twins load and encode byte-identically " +
      "to their plain files") {
    // the reference proves pandas footer metadata does not change loader
    // behavior by running both variants through the same matrix; here the
    // stronger form: the full transcoded document sets are identical
    for (base <- Seq("testTypes", "traffic")) {
      def docsOf(f: String): Seq[String] =
        JsonDocEncoder.encode(spark.read.parquet(s"$refRes/$f.parquet"),
            quirkCompat = true)
          .select(col("doc")).collect().map(_.getString(0)).toSeq.sorted
      val plain = docsOf(base)
      val withPd = docsOf(s"${base}WithPDIndex")
      assert(plain.nonEmpty && plain == withPd, base)
    }
  }

  test("testTypes golden documents: quirk transcode of the reference's own " +
      "typed fixture") {
    val docs = JsonDocEncoder.encode(
        spark.read.parquet(s"$refRes/testTypes.parquet"), quirkCompat = true)
      .select(col("numeric"), col("doc")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs.size == 26)
    // schema field order (c, floatVal, numeric), bare double rendering via
    // Java Double.toString — both exactly what the reference's encoder
    // emits for this file (GenericRecordJsonEncoder.java:63,133-137)
    assert(docs(0L) == "{\"c\": \"a\", \"floatVal\": 50.0, \"numeric\": 0}")
    assert(docs(2L) ==
      "{\"c\": \"c\", \"floatVal\": 16.666666666666668, \"numeric\": 2}")
  }

  test("Collection.compact: rewrites many small files into few, " +
      "preserving every row; empty collection is a no-op") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val mgr = new graft.core.CollectionManager(spark, base)
    val c = mgr.collection("docs")
    // tiny batch size → many small files, the loader's failure mode
    c.write((1 to 5000).map(i => (i.toLong, s"d$i")).toDF("id", "t"),
      org.apache.spark.sql.SaveMode.Overwrite, maxRecordsPerFile = 100)
    val beforeRows = c.read().collect().map(_.getLong(0)).sorted.toSeq

    val (before, after) = c.compact(targetRecordsPerFile = 2500)
    assert(before >= 32, s"expected many small files, got $before")
    assert(after <= 4, s"expected few compacted files, got $after")
    assert(c.count() == 5000)
    assert(c.read().collect().map(_.getLong(0)).sorted.toSeq == beforeRows)
    // no staging/retired leftovers beside the collection
    val leftovers = new java.io.File(base).listFiles()
      .map(_.getName).filter(n => n.contains(".compact-") ||
        n.contains(".old-"))
    assert(leftovers.isEmpty, leftovers.toSeq)

    val empty = mgr.collection("empty")
    empty.create()
    assert(empty.compact() == ((0, 0)))
  }

  test("Collection Append schema guard: renamed/retyped columns throw " +
      "naming the drift; matching and opted-in appends land") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val base = java.nio.file.Files
      .createTempDirectory("graft_drift").toString
    val c = new graft.core.CollectionManager(spark, base).collection("docs")
    c.write(Seq((1L, "a")).toDF("id", "t"), SaveMode.Overwrite)

    // matching schema appends (nullability/order differences are fine)
    c.write(Seq(("b", 2L)).toDF("t", "id"), SaveMode.Append)
    assert(c.count() == 2)

    // renamed column → loud failure naming both sides
    val renamed = intercept[IllegalArgumentException] {
      c.write(Seq((3L, "c")).toDF("id", "txt"), SaveMode.Append)
    }
    assert(renamed.getMessage.contains("txt") &&
      renamed.getMessage.contains("t"), renamed.getMessage)

    // retyped column → loud failure naming the types
    val retyped = intercept[IllegalArgumentException] {
      c.write(Seq((4, "d")).toDF("id", "t"), SaveMode.Append)
    }
    assert(retyped.getMessage.contains("bigint") &&
      retyped.getMessage.contains("int"), retyped.getMessage)
    assert(c.count() == 2) // failed appends wrote nothing

    // explicit opt-in appends the widened frame (readers use mergeSchema)
    c.write(Seq((5L, "e", 1.5)).toDF("id", "t", "score"),
      SaveMode.Append, allowSchemaDrift = true)
    assert(spark.read.option("mergeSchema", "true")
      .parquet(s"$base/docs").count() == 3)

    // overwrite with a new schema needs no opt-in (it REPLACES the data)
    c.write(Seq((6, "f")).toDF("id", "t"), SaveMode.Overwrite)
    assert(c.count() == 1)
  }

  test("Collection clusterBy: range-clustered writes give near-disjoint " +
      "per-file min/max ranges (the layout parquet skipping needs), " +
      "preserved through a clustered compact") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_cluster").toString
    val mgr = new graft.core.CollectionManager(spark, base)
    val c = mgr.collection("docs")
    // shuffled insert order: without clustering every file would span
    // nearly the full id range
    val rows = new scala.util.Random(7).shuffle((1 to 20000).toList)
      .map(i => (i.toLong, s"d$i")).toDF("id", "t")
    c.write(rows, org.apache.spark.sql.SaveMode.Overwrite,
      maxRecordsPerFile = 2500, clusterBy = Seq("id"))

    def fileRanges(): Seq[(Long, Long)] = {
      val files = new java.io.File(s"$base/docs").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
      assert(files.size >= 4, s"expected several files, got ${files.size}")
      files.map { f =>
        val r = spark.read.parquet(f).agg(min(col("id")), max(col("id")))
          .head()
        (r.getLong(0), r.getLong(1))
      }
    }
    def assertDisjoint(ranges: Seq[(Long, Long)]): Unit = {
      val sorted = ranges.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) =>
          assert(hi < lo2, s"overlapping file ranges: $sorted")
        case _ => ()
      }
    }
    assertDisjoint(fileRanges())
    assert(c.read().select("id").as[Long].collect().sorted.toSeq ==
      (1L to 20000L), "clustering must not lose or duplicate rows")

    // a clustered compact re-imposes the layout on a fragmented
    // collection
    c.write(rows, org.apache.spark.sql.SaveMode.Overwrite,
      maxRecordsPerFile = 500) // unclustered, fragmented
    val (before, after) = c.compact(targetRecordsPerFile = 4000,
      clusterBy = Seq("id"))
    assert(before >= 32 && after <= 6, s"($before, $after)")
    assertDisjoint(fileRanges())
    assert(c.count() == 20000)
  }

  test("Collection.compact preserves a Hive-partitioned layout: " +
      "partition dirs survive, pruning still works, rows intact") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_pcompact").toString
    val mgr = new graft.core.CollectionManager(spark, base)
    val c = mgr.collection("docs")
    val rows = (1 to 6000).map(i =>
      (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("id", "lang")
    c.write(rows, org.apache.spark.sql.SaveMode.Overwrite,
      maxRecordsPerFile = 100, partitionBy = Seq("lang"))
    val (before, after) = c.compact(targetRecordsPerFile = 2000,
      clusterBy = Seq("id"))
    assert(before >= 30, s"expected fragmentation, got $before")
    assert(after < before, s"($before, $after)")
    // the partition tree survived — not a flattened directory
    val dirs = new java.io.File(s"$base/docs").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq("lang=de", "lang=en", "lang=fr"), dirs)
    assert(c.count() == 6000)
    // pruning still works: a lang filter scans only that partition
    val pruned = c.read().filter(col("lang") === "en")
    assert(pruned.count() == 2000)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(!scan.contains("lang=de"), "partition pruning lost")
  }

  test("Collection.compact crash recovery: a process death between the " +
      "two swap renames is healed on the next access — count never " +
      "silently reads 0") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact_crash").toString
    val mgr = new graft.core.CollectionManager(spark, base)
    val c = mgr.collection("docs")
    c.write((1 to 100).map(i => (i.toLong, s"d$i")).toDF("id", "t"),
      org.apache.spark.sql.SaveMode.Overwrite)
    assert(c.count() == 100)

    // a LEGALLY-NAMED sibling collection that merely looks like a
    // retired copy must never be touched by recovery (names are
    // matched against compact()'s exact .old-<uuid> shape)
    val lookalike = mgr.collection("docs.old-backup")
    lookalike.write((1 to 7).map(i => (i.toLong, "x")).toDF("id", "t"),
      org.apache.spark.sql.SaveMode.Overwrite)

    def freshUuid() = java.util.UUID.randomUUID().toString
    // simulate the crash window: path renamed to .old-<uuid>, the
    // staged compacted copy left beside it, the publish rename never ran
    val dir = new java.io.File(s"$base/docs")
    val retired = new java.io.File(s"$base/docs.old-${freshUuid()}")
    val staging = new java.io.File(s"$base/docs.compact-${freshUuid()}")
    assert(dir.renameTo(retired))
    java.nio.file.Files.createDirectory(staging.toPath)
    assert(!dir.exists())

    // next access auto-restores the retired data and clears staging
    assert(c.count() == 100, "stranded swap must restore, not read 0")
    assert(dir.exists() && !retired.exists() && !staging.exists())
    assert(c.read().select("id").as[Long].collect().sorted.toSeq ==
      (1L to 100L))

    // crash AFTER publish, before cleanup: collection intact, retired
    // copy is garbage — recovery deletes it without touching the data
    val retired2 = new java.io.File(s"$base/docs.old-${freshUuid()}")
    java.nio.file.Files.createDirectory(retired2.toPath)
    assert(c.count() == 100)
    assert(!retired2.exists())

    // the look-alike collection survived every recovery pass intact
    assert(lookalike.count() == 7,
      "recovery must never touch a legally-named sibling collection")

    // two retired copies is ambiguous: fail loudly, never guess
    val o1 = new java.io.File(s"$base/docs.old-${freshUuid()}")
    val o2 = new java.io.File(s"$base/docs.old-${freshUuid()}")
    assert(dir.renameTo(o1))
    java.nio.file.Files.createDirectory(o2.toPath)
    val ex = intercept[IllegalStateException] { c.count() }
    assert(ex.getMessage.contains("manual recovery"), ex.getMessage)
  }
}
