package graft

import graft.operators.{Bucketing, SkewJoin}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Scale-path operators: bucketed co-located joins (shuffle elimination)
  * and salted joins for skew.
  */
class ScaleOpsSpec extends SparkSpec {

  test("joining two co-bucketed tables runs with no shuffle exchange") {
    // clean both the catalog entry and any orphaned warehouse directory
    // from a previous test run (the in-memory catalog forgets tables on
    // restart but their directories persist)
    Seq("orders_b", "customer_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(wh)
    }
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    Bucketing.writeBucketed(orders.select(col("o_custkey"),
      col("o_totalprice")), "orders_b", 8, Seq("o_custkey"))
    Bucketing.writeBucketed(customer.select(col("c_custkey"),
      col("c_mktsegment")), "customer_b", 8, Seq("c_custkey"))

    val joined = Bucketing.table(spark, "orders_b")
      .join(Bucketing.table(spark, "customer_b"),
        col("o_custkey") === col("c_custkey"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty,
      s"expected shuffle-free bucketed join, found: $shuffles")
    // and it's still the right answer
    val expected = orders.join(customer,
      col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() == expected)
  }

  test("salted inner join equals the plain inner join on skewed data") {
    import spark.implicits._
    // hot key: 10_000 rows of key 1; right side small
    val left = spark.range(10000).select(lit(1L).as("k"),
        col("id").as("payload"))
      .union(spark.range(100).select((col("id") + 2).as("k"),
        col("id").as("payload")))
    val right = Seq((1L, "hot"), (2L, "a"), (50L, "b")).toDF("k", "name")

    val plain = left.join(right, Seq("k"))
      .groupBy(col("k"), col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", salt = 8)
      .groupBy(col("k"), col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(salted == plain)
    assert(plain((1L, "hot")) == 10000L)
  }

  test("BloomJoin.bloomSemiJoin equals the plain semi join; the compiled " +
      "probe prefilters the big side before the join") {
    import org.apache.spark.sql.functions._
    val orders = graft.core.Graft.table(spark, sfDir, "orders")
    val keys = graft.core.Graft.table(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 45).select(col("l_orderkey"))

    val bloomed = graft.operators.BloomJoin
      .bloomSemiJoin(orders, "o_orderkey", keys, "l_orderkey")
    val plain = orders.join(keys.withColumnRenamed("l_orderkey",
        "o_orderkey"), Seq("o_orderkey"), "left_semi")

    val a = bloomed.select("o_orderkey").collect().map(_.getLong(0)).sorted
    val b = plain.select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(a.toSeq == b.toSeq)

    // the Bloom probe sits in the plan (map-side, pre-join), and the
    // exact semi join still runs after it
    val p = bloomed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("graft_bloom_contains"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("Layout.zValue matches a reference Morton interleave, including " +
      "dimension order and multi-column striding") {
    import spark.implicits._
    def ref(vals: Seq[Long], bits: Int): Long =
      (for { (v, c) <- vals.zipWithIndex; j <- 0 until bits }
        yield ((v >> j) & 1L) << (j * vals.size + c)).foldLeft(0L)(_ | _)
    // exhaustive 3-bit 2-D grid + spot checks at full width
    val grid = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val got2 = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.operators.Layout.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    for ((x, y) <- grid)
      assert(got2((x, y)) == ref(Seq(x, y), 3), s"($x,$y)")
    // the curve visits the grid in the textbook N-shape: (0,0) (1,0)
    // (0,1) (1,1) over the low quad
    assert(got2((0, 0)) == 0 && got2((1, 0)) == 1 &&
      got2((0, 1)) == 2 && got2((1, 1)) == 3)
    val wide = Seq((1023L, 511L, 7L)).toDF("a", "b", "c")
      .select(graft.operators.Layout.zValue(
        Seq(col("a"), col("b"), col("c")), 10).as("z"))
      .head().getLong(0)
    assert(wide == ref(Seq(1023L, 511L, 7L), 10))
  }

  test("Z-ordered files are tight on BOTH dimensions; a single-column " +
      "sort leaves the non-leading dimension spanning the full range") {
    import spark.implicits._
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield (x, y, x * 64 + y)).toDF("x", "y", "payload")
    val zdir = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    val xdir = java.nio.file.Files
      .createTempDirectory("graft_xsort").toString
    graft.operators.Layout.writeZOrdered(grid, zdir, Seq("x", "y"),
      bits = 6, numFiles = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xdir)
    def avgSpans(dir: String): (Double, Double) = {
      val rows = graft.operators.Layout
        .fileSpans(spark, dir, Seq("x", "y")).collect()
      (rows.map(_.getAs[Double]("span_x")).sum / rows.length,
       rows.map(_.getAs[Double]("span_y")).sum / rows.length)
    }
    val (zx, zy) = avgSpans(zdir)
    val (sx, sy) = avgSpans(xdir)
    // 16 files over a 64×64 grid = 4×4 curve blocks → ~1/4 span per
    // dim; allow slack for range-partition boundary files
    assert(zx < 0.5 && zy < 0.5, s"z-order not tight: x=$zx y=$zy")
    // x-sort: leading dim tight, y spans everything — the failure mode
    // Z-order exists to fix
    assert(sx < 0.2, s"x-sorted leading dim should be tight: $sx")
    assert(sy > 0.9, s"x-sorted y should span the range: $sy")
    assert(zy < sy / 2, "Z-order must beat the 1-D layout on y")
    // round trip: clustering only reorders — content is unchanged
    assert(spark.read.parquet(zdir).agg(sum(col("payload"))).head.getLong(0)
      == grid.agg(sum(col("payload"))).head.getLong(0))
  }

  test("Layout.rankBuckets: near-equal-mass buckets on skewed data, " +
      "total (no rows dropped), monotone in the value") {
    import spark.implicits._
    // quadratic growth → heavily right-skewed value distribution: raw
    // value bits would pile most rows into the low buckets
    val df = (1L to 4096L).map(i => (i, i * i)).toDF("id", "v")
    val got = graft.operators.Layout.rankBuckets(df, "v", bits = 4)
    assert(got.count() == 4096, "totality")
    val sizes = got.groupBy(col("v_bucket")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(sizes.size == 16, s"expected 16 buckets: ${sizes.keySet}")
    // equal mass within approxQuantile tolerance (256 ± 25%)
    assert(sizes.values.forall(n => n > 192 && n < 320),
      s"unbalanced: $sizes")
    // bucket id is monotone in the value: ranges never interleave
    val ranges = got.groupBy(col("v_bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("v_bucket")).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    for (Array((_, hi), (lo, _)) <- ranges.sliding(2))
      assert(hi < lo, s"overlapping buckets: ${ranges.toSeq}")
  }

  test("Collection.write(zOrderBy): the engine's table format writes " +
      "multi-dimension-clustered files — tight spans on BOTH skewed " +
      "columns, content byte-identical to the input") {
    import spark.implicits._
    // both dims skewed (quadratic/cubic growth) — raw-bit interleave
    // would collapse; the rank-bucketed curve must still split evenly
    val df = (1L to 4096L).map(i => (i, i * i, (i % 64) * (i % 64) *
      (i % 64), i)).toDF("id", "x", "y", "payload")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_zcol").toString
    val mgr = new graft.core.CollectionManager(spark, tmp)
    val c = mgr.collection("zc")
    c.write(df, org.apache.spark.sql.SaveMode.Overwrite,
      maxRecordsPerFile = 256, zOrderBy = Seq("x", "y"), zOrderBits = 6)
    val spans = graft.operators.Layout
      .fileSpans(spark, c.path, Seq("x", "y")).collect()
    assert(spans.length > 4, s"expected multiple files: ${spans.length}")
    // value-space spans are meaningless under skew; assert on ROW-RANK
    // space: per file, the fraction of distinct x (and y) values
    // covered must be far under 1 — the multi-dim pruning property
    val all = spark.read.parquet(c.path)
      .withColumn("__f", input_file_name())
      .select(col("__f"), col("x"), col("y")).collect()
    val xs = all.map(_.getLong(1)).distinct.sorted
    val ys = all.map(_.getLong(2)).distinct.sorted
    def rankSpan(vals: Array[Long], sorted: Array[Long]): Double = {
      val idx = sorted.zipWithIndex.toMap
      val rs = vals.map(idx)
      (rs.max - rs.min + 1).toDouble / sorted.length
    }
    val perFile = all.groupBy(_.getString(0)).values.map { rows =>
      (rankSpan(rows.map(_.getLong(1)), xs),
       rankSpan(rows.map(_.getLong(2)), ys))
    }.toSeq
    val avgX = perFile.map(_._1).sum / perFile.size
    val avgY = perFile.map(_._2).sum / perFile.size
    assert(avgX < 0.55 && avgY < 0.55,
      s"z-ordered collection not tight in rank space: x=$avgX y=$avgY")
    // layout is layout only: same rows, nothing lost or duplicated
    assert(c.read().agg(sum(col("payload"))).head.getLong(0) ==
      df.agg(sum(col("payload"))).head.getLong(0))
    assert(c.count() == 4096)
  }
}
