package graft

import graft.expressions.GraftFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native expression kernels vs independent reference implementations —
  * both plain Scala re-computations and the (slow but trusted) Spark
  * higher-order-function forms they replaced.
  */
class ExpressionSpec extends SparkSpec {

  private lazy val emb =
    graft.core.Graft.table(spark, sfDir, "embeddings").limit(64).cache()

  test("VecDot / VecNormSq / VecL2Sq match a plain Scala computation") {
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
    val vecs = rows.map(r => r.getLong(0) ->
      r.getSeq[Float](1).toArray).toMap
    val got = emb.as("a").crossJoin(emb.as("b"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        GraftFunctions.vecDot(col("a.embedding"), col("b.embedding")).as("d"),
        GraftFunctions.vecNormSq(col("a.embedding")).as("n"),
        GraftFunctions.vecL2Sq(col("a.embedding"), col("b.embedding")).as("l"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (x, y) = (vecs(r.getLong(0)), vecs(r.getLong(1)))
      val dot = x.zip(y).foldLeft(0.0) { case (acc, (a, b)) =>
        acc + a.toDouble * b.toDouble }
      val nsq = x.foldLeft(0.0)((acc, a) => acc + a.toDouble * a.toDouble)
      val l2 = x.zip(y).foldLeft(0.0) { case (acc, (a, b)) =>
        val d = a.toDouble - b.toDouble; acc + d * d }
      assert(r.getDouble(2) == dot, s"dot ${r.getLong(0)},${r.getLong(1)}")
      assert(r.getDouble(3) == nsq, "normsq")
      assert(r.getDouble(4) == l2, "l2sq")
    }
  }

  test("VecDot matches the interpreted zip_with/aggregate fold bit-for-bit") {
    val hof = emb.select(
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), _ + _)
        .as("h"),
      GraftFunctions.vecDot(col("embedding"), col("embedding")).as("n"))
      .collect()
    hof.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("WordShingles = array_sort(array_distinct(HOF shingles)) and is sorted") {
    import graft.functions.TextFunctions
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    val rows = docs.select(
      GraftFunctions.wordShingles(col("text"), 3).as("fast"),
      array_sort(array_distinct(
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3)))
        .as("slow"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("WordShinglesSeq is positional with duplicates; distinct-sorted " +
      "it equals WordShingles; short text yields empty") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("text", StringType)))
    val toy = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("The quick  brown fox"), Row("a a a a"), Row("too short"),
        Row("")), 2), schema)
    val got = toy.select(
        GraftFunctions.wordShinglesSeq(col("text"), 3).as("seq"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("the quick brown", "quick brown fox"))
    assert(got(1) == Seq("a a a", "a a a")) // duplicates preserved
    assert(got(2) == Seq.empty && got(3) == Seq.empty)

    // on the real corpus: distinct+sort of the positional form IS the
    // set form — one contract, two access patterns
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    docs.select(
        array_sort(array_distinct(
          GraftFunctions.wordShinglesSeq(col("text"), 3))).as("a"),
        GraftFunctions.wordShingles(col("text"), 3).as("b"))
      .collect()
      .foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("SortedArrayIntersectCount equals size(array_intersect) on shingle sets") {
    val docs = graft.core.Graft.table(spark, sfDir, "documents").limit(40)
    val sets = docs.select(col("doc_id").as("id"),
      GraftFunctions.wordShingles(col("text"), 3).as("sh"))
    val rows = sets.as("a").crossJoin(sets.as("b"))
      .select(
        GraftFunctions.sortedIntersectCount(col("a.sh"), col("b.sh")).as("m"),
        size(array_intersect(col("a.sh"), col("b.sh"))).as("s"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("MinHashSignature: deterministic, right length, dominated by singletons") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Seq("a b c", "b c d", "c d e")),
        Row(Seq("a b c")),
        Row(Seq.empty[String]))),
      StructType(Seq(StructField("sh", ArrayType(StringType)))))
    val sigs = df.select(GraftFunctions.minHashSignature(col("sh"), 16))
      .collect().map(_.getSeq[Long](0))
    assert(sigs.forall(_.length == 16))
    // signature of a set is the element-wise min of its singletons
    val bySingleton = Seq("a b c", "b c d", "c d e").map { s =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(Seq(s)))),
        StructType(Seq(StructField("sh", ArrayType(StringType)))))
        .select(GraftFunctions.minHashSignature(col("sh"), 16))
        .collect().head.getSeq[Long](0)
    }
    val expected = bySingleton.transpose.map(_.min)
    assert(sigs(0) == expected)
    // empty set → all MaxValue sentinel
    assert(sigs(2).forall(_ == Long.MaxValue))
  }

  test("SimHash64: identical texts collide, token-order invariant on votes") {
    val df = spark.createDataFrame(Seq(
      (1, "the quick brown fox"),
      (2, "the quick brown fox"),
      (3, "fox brown quick the"),
      (4, "completely different words entirely")))
      .toDF("id", "t")
    val h = df.select(col("id"), GraftFunctions.simHash64(col("t")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h(1) == h(2))
    assert(h(1) == h(3)) // bag-of-words: order does not matter
    assert(h(1) != h(4))
  }

  test("WinnowFingerprints: identity, shared-substring guarantee, density") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val shared = "a long enough shared substring to guarantee a fingerprint"
    val df = Seq(
      (1L, base), (2L, base),
      (3L, s"prefix one $shared suffix alpha"),
      (4L, s"other start $shared different tail omega"),
      (5L, "zzzz completely unrelated material qqqq")).toDF("id", "t")
    val fps = df.select(col("id"),
      GraftFunctions.winnowFingerprints(col("t"), 8, 16).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    // identical texts → identical fingerprint sets
    assert(fps(1L) == fps(2L) && fps(1L).nonEmpty)
    // shared substring of length >= w + k - 1 = 23 → >= 1 shared print
    assert(shared.length >= 23)
    assert((fps(3L) & fps(4L)).nonEmpty)
    // expected density ≈ 2/(w+1): selected ≤ positions, and far fewer
    assert(fps(1L).size < base.length - 8 + 1)
    // unrelated doc shares nothing with the base text
    assert((fps(1L) & fps(5L)).isEmpty)
  }

  test("expressions are reachable from SQL via SparkSessionExtensions") {
    val r = spark.sql(
      """SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                     array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       graft_simhash64('hello world') AS s,
        |       size(graft_word_shingles('a b c d', 2)) AS n,
        |       size(graft_hyperplane_bands(
        |         array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), 4, 8)) AS b,
        |       size(graft_winnow_fingerprints(
        |         'the quick brown fox jumps over the lazy dog', 8, 4)) AS w
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(2) == 3)
    assert(r.getInt(3) == 4)
    assert(r.getInt(4) > 0)
  }

  test("Int8QuantStats kernel equals the x33 explode/aggregate twin on " +
      "every vector, with a map-only (exchange-free) plan") {
    val emb = graft.core.Graft.table(spark, sfDir, "embeddings")
    val kernelDf = emb.select(col("vec_id"),
      graft.expressions.GraftFunctions.int8QuantStats(col("embedding"))
        .as("s"))
      .select(col("vec_id"), col("s.dim"), col("s.max_q"), col("s.min_q"),
        col("s.mse"))
    val p = kernelDf.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), p) // one compiled pass over the scan
    val viaKernel = kernelDf.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val viaExplode = graft.queries.Extensions
      .x33QuantizationError(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    // x33 filters maxabs > 0; on this corpus that is every vector
    assert(viaExplode.nonEmpty && viaKernel.size == viaExplode.size)
    assert(viaKernel == viaExplode)
    // SQL surface
    val sqlRow = spark.sql(
      """SELECT graft_int8_quant_stats(
        |  array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT))).max_q AS mq
        |""".stripMargin).collect().head
    assert(sqlRow.getLong(0) == 127L)
  }

  test("two SortedArrayIntersectCount instances compile in ONE codegen stage") {
    // the round-1 freshName lesson: two instances sharing a
    // WholeStageCodegen method must not collide on generated local names.
    // Failure mode is a silent janino fallback, so assert on values
    // produced by a projection carrying both instances at once.
    val docs = graft.core.Graft.table(spark, sfDir, "documents").limit(20)
    val sets = docs.select(col("doc_id").as("id"),
      GraftFunctions.wordShingles(col("text"), 2).as("s2"),
      GraftFunctions.wordShingles(col("text"), 3).as("s3"))
    val rows = sets.as("a").crossJoin(sets.as("b"))
      .select(
        GraftFunctions.sortedIntersectCount(col("a.s2"), col("b.s2")).as("m2"),
        GraftFunctions.sortedIntersectCount(col("a.s3"), col("b.s3")).as("m3"),
        size(array_intersect(col("a.s2"), col("b.s2"))).as("e2"),
        size(array_intersect(col("a.s3"), col("b.s3"))).as("e3"))
      .collect()
    assert(rows.length == 400)
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(2), "k=2 intersect count")
      assert(r.getInt(1) == r.getInt(3), "k=3 intersect count")
    }
  }

  test("hyperplaneBucket honors dim: capped projection = bucket of the " +
      "truncated vector") {
    val d = 16
    val rows = emb.select(
        GraftFunctions.hyperplaneBucket(col("embedding"), 12, d).as("capped"),
        GraftFunctions.hyperplaneBucket(
          slice(col("embedding"), 1, d), 12).as("truncated"),
        GraftFunctions.hyperplaneBucket(col("embedding"), 12).as("full"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // and it genuinely projects fewer dimensions than the default
    assert(rows.exists(r => r.getLong(0) != r.getLong(2)))
  }

  test("NearestCells matches a driver-side argmin, codegen and interpreted") {
    val cents: Seq[Seq[Float]] =
      emb.limit(8).collect().map(_.getSeq[Float](1)).toSeq
    def l2(x: Array[Float], y: Seq[Float]): Double = {
      var acc = 0.0
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val d = x(i).toDouble - y(i).toDouble; acc += d * d; i += 1
      }
      acc
    }
    val got = emb.select(col("vec_id"),
        GraftFunctions.nearestCells(col("embedding"), cents, 3).as("cells"),
        col("embedding"))
      .collect()
    assert(got.length == 64)
    got.foreach { r =>
      val v = r.getSeq[Float](2).toArray
      val expected = cents.indices
        .sortBy(i => (l2(v, cents(i)), i)).take(3)
      assert(r.getSeq[Int](1) == expected, s"vec ${r.getLong(0)}")
    }
    // interpreted eval agrees (the non-codegen path used by e.g. filters
    // that fall back): evaluate the expression directly
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.expressions.NearestCells
    val v0 = got.head.getSeq[Float](2)
    val lit0 = Literal(new GenericArrayData(v0.map(Float.box).toArray[Any]),
      ArrayType(FloatType, containsNull = false))
    val direct = NearestCells(lit0, cents, 3).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
    assert(direct == got.head.getSeq[Int](1))
  }

  test("BloomContains: zero false negatives, codegen agrees with eval, " +
      "false-positive rate sane at the design load") {
    import spark.implicits._
    // build over 1000 keys into 2^17 bits with 5 hashes (m/n = 131)
    val bloomAgg = org.apache.spark.sql.functions.udaf(
      new graft.functions.Aggregators.BloomBuild(1 << 17, 5),
      org.apache.spark.sql.Encoders.scalaLong)
    val keys = spark.range(0, 1000).select(col("id"))
    val bloom = keys
      .agg(bloomAgg(xxhash64(col("id"))).as("bits"))

    // codegen path: the probe runs inside a projection over a range —
    // every inserted key MUST be contained (no false negatives, the
    // property the exactness of BloomJoin rests on)
    val probeAll = spark.range(0, 5000).crossJoin(broadcast(bloom))
      .select(col("id"),
        GraftFunctions.bloomContains(col("bits"), xxhash64(col("id")), 5)
          .as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0L until 1000L).foreach(k => assert(probeAll(k), s"false negative $k"))
    // false positives among the 4000 non-members stay low at this load
    val fp = (1000L until 5000L).count(probeAll)
    assert(fp < 40, s"$fp false positives of 4000") // expect ~0 at m/n=131

    // interpreted eval agrees with the codegen'd outcomes
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val bits = bloom.collect().head.getSeq[Long](0)
    val bitsLit = Literal(new GenericArrayData(bits.map(Long.box).toArray[Any]),
      ArrayType(LongType, containsNull = false))
    def evalContains(h: Long): Boolean =
      graft.expressions.BloomContains(bitsLit, Literal(h, LongType), 5)
        .eval(null).asInstanceOf[Boolean]
    val hashed = spark.range(0, 5000)
      .select(col("id"), xxhash64(col("id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5000L).foreach { k =>
      assert(evalContains(hashed(k)) == probeAll(k), s"eval/codegen $k")
    }
  }

  test("PackedTokenBinary: little-endian packing at widths 1/2/4, " +
      "width-1 on byte ids reproduces the raw bytes, out-of-range " +
      "ids fail loudly instead of truncating") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def pack(ids: Seq[Long], w: Int): Seq[Byte] =
      graft.expressions.PackedTokenBinary(null, w)
        .kernel(new GenericArrayData(ids.map(Long.box).toArray[Any]))
        .asInstanceOf[Array[Byte]].toSeq
    assert(pack(Seq(0L, 1L, 255L), 1) ==
      Seq[Byte](0, 1, 0xff.toByte))
    assert(pack(Seq(0x1234L), 2) == Seq[Byte](0x34, 0x12))
    assert(pack(Seq(0x01020304L), 4) ==
      Seq[Byte](0x04, 0x03, 0x02, 0x01))
    // zero-merge byte config: width-1 packing IS the UTF-8 bytes
    val text = "hi there"
    val ids = text.getBytes("UTF-8").map(b => (b & 0xff).toLong).toSeq
    assert(pack(ids, 1).toArray.toSeq == text.getBytes("UTF-8").toSeq)
    for ((bad, w) <- Seq((256L, 1), (65536L, 2), (-1L, 4))) {
      val ex = intercept[IllegalArgumentException] {
        pack(Seq(bad), w)
      }
      assert(ex.getMessage.contains("does not fit"), ex.getMessage)
    }
    intercept[IllegalArgumentException] {
      graft.expressions.PackedTokenBinary(null, 3)
    }
  }

  test("IdsToText inverts the encode→ids chain row-for-row (agrees " +
      "with Bpe.decodeIds), renders special-token ids literally, and " +
      "rejects unknown ids loudly") {
    import spark.implicits._
    import graft.operators.Bpe
    val df = Seq((1L, "the cat sat"), (2L, "naïve café — ok"))
      .toDF("id", "text")
    val merges = Bpe.trainBytes(df, "text", 8)
    val specials = Seq("<|endoftext|>")
    val vocab = Bpe.vocabBytes(merges, specials)
    val encoded = Bpe.encodeIdsBytes(df, "id", "text", merges)
      .select(col("id"), col("token_ids"))
    val viaKernel = encoded
      .select(col("id"),
        GraftFunctions.idsToText(col("token_ids"), vocab).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    encoded.collect().foreach { r =>
      assert(viaKernel(r.getLong(0)) ==
        Bpe.decodeIds(r.getSeq[Long](1), vocab))
    }
    // special ids interleave and render as their literal markers
    val eot = vocab.find(_._1 == "<|endoftext|>").get._2
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val k = graft.expressions.IdsToText(null, vocab)
    def decode(ids: Seq[Long]): String =
      k.kernel(new GenericArrayData(ids.map(Long.box).toArray[Any]))
        .asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    assert(decode(Seq('h'.toLong, 'i'.toLong, eot)) ==
      "hi<|endoftext|>")
    val ex = intercept[IllegalArgumentException] {
      decode(Seq(999999L))
    }
    assert(ex.getMessage.contains("not in the vocabulary"),
      ex.getMessage)
  }

  test("BpeEncodeTokens cache sizes change nothing: direct-mapped " +
      "collisions (size 1), no cache (size 0), and the default all " +
      "emit identical tokens on a high-cardinality corpus") {
    import spark.implicits._
    import graft.operators.Bpe
    val texts = (0 until 300).map(i =>
      s"alpha$i beta${i % 7} gamma${i % 3} alpha$i")
    val df = texts.toDF("text")
      .withColumn("id", monotonically_increasing_id())
    val merges = Bpe.trainBytes(df, "text", 15)
      .sortBy(_._1).map(m => (m._1, m._2, m._3))
    def run(size: Int): Seq[(Long, Seq[String])] =
      df.select(col("id"),
          org.apache.spark.sql.graftbridge.ColumnBridge.column(
            graft.expressions.BpeEncodeTokens(
              org.apache.spark.sql.graftbridge.ColumnBridge
                .expression(col("text")), merges,
              graft.functions.TextFunctions.bpeTokenPattern,
              byteLevel = true, cacheSize = size)).as("tokens"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
        .sortBy(_._1).toSeq
    val want = run(10000)
    assert(run(1) == want, "size-1 cache (all collisions) diverged")
    assert(run(0) == want, "cache-off diverged")
  }
}
