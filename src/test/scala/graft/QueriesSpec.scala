package graft

import graft.core.Graft
import graft.queries.Extensions
import org.apache.spark.sql.functions._

/** Query-corpus invariants that the SQL oracle cannot express. */
class QueriesSpec extends SparkSpec {

  test("x15 approx_count_distinct is within 5% of the exact distinct count") {
    val exact = Graft.table(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Extensions.x15ApproxDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"flag $k: approx $a vs exact $e")
    }
  }

  test("Space-Saving aggregator: exact with ample capacity, bounded error " +
      "and guaranteed heavy-hitter retention under eviction") {
    import graft.functions.Aggregators.FrequentItems
    import spark.implicits._
    // skewed stream: "a"×50, "b"×30, "c"×10, then 20 distinct singletons
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c") ++
      (1 to 20).map(i => s"z$i")
    val n = items.size.toLong
    val ds = spark.sparkContext.parallelize(items, 4).toDS()

    // ample capacity → exact
    val exact = ds.select(udaf(new FrequentItems(3, 1000)).apply(col("value")))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exact == Seq(("a", 50L, 0L), ("b", 30L, 0L), ("c", 10L, 0L)))

    // tight capacity (8): heavy hitters (freq > N/8 ≈ 14) must be present
    // and every reported count within its error of the truth
    val truth = Map("a" -> 50L, "b" -> 30L, "c" -> 10L)
      .withDefaultValue(1L)
    val sketched = ds
      .select(udaf(new FrequentItems(8, 8)).apply(col("value")))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byItem = sketched.map(t => t._1 -> t).toMap
    Seq("a", "b").foreach(h => assert(byItem.contains(h),
      s"heavy hitter $h evicted (freq > N/capacity = ${n / 8})"))
    sketched.foreach { case (item, c, e) =>
      assert(c >= truth(item) && c - e <= truth(item),
        s"$item: reported $c (err $e) vs true ${truth(item)}")
    }
  }

  test("TopKRows equals the ranking-window top-k on every partitioning, " +
      "and its buffer never exceeds k rows") {
    import graft.functions.Aggregators.{ScoredRow, TopKRows}
    val agg = new TopKRows(3)
    // driver-side property check over a skewed stream with score ties
    val rows = (1L to 200L).map(i =>
      ScoredRow((i % 7).toDouble, i % 13, i))
    val expected = rows.sortBy(r => (-r.score, r.key1, r.key2)).take(3)
    // any split into partial buffers then merged must agree
    for (chunks <- Seq(1, 3, 7, 200)) {
      val bufs = rows.grouped(math.max(1, rows.size / chunks)).map(part =>
        part.foldLeft(agg.zero)(agg.reduce)).toSeq
      bufs.foreach(b => assert(b.size <= 3, "bounded state violated"))
      val merged = bufs.reduce(agg.merge)
      assert(agg.finish(merged) == expected, s"chunks=$chunks")
    }
    // distributed: x30 equals q7 row-for-row (same oracle semantics)
    val q7 = graft.queries.Relational.q7TopKPerGroup(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val x30 = graft.queries.Extensions.x30TopKAgg(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(x30 == q7)
  }

  test("x31 approx percentiles track the exact q32 values within 5%") {
    val exact = graft.queries.Relational.q32Percentiles(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = graft.queries.Extensions.x31ApproxPercentiles(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, es) <- exact; (e, a) <- es.zip(approx(flag))) {
      val err = if (e == 0.0) math.abs(a) else math.abs(a - e) / math.abs(e)
      assert(err <= 0.05, s"$flag: approx $a vs exact $e")
    }
  }

  test("TopKRows ranks NaN scores like Spark's DESC sort (NaN greatest) " +
      "independent of arrival order") {
    import graft.functions.Aggregators.{ScoredRow, TopKRows}
    val agg = new TopKRows(2)
    val rows = Seq(ScoredRow(Double.NaN, 1, 1), ScoredRow(5.0, 2, 2),
      ScoredRow(7.0, 3, 3))
    // every arrival order and split must agree: NaN first, then 7.0
    val expected = Seq(ScoredRow(Double.NaN, 1, 1), ScoredRow(7.0, 3, 3))
    for (perm <- rows.permutations) {
      assert(agg.finish(perm.foldLeft(agg.zero)(agg.reduce)).map(r =>
        (r.score.isNaN, if (r.score.isNaN) 0.0 else r.score, r.key1)) ==
        expected.map(r =>
          (r.score.isNaN, if (r.score.isNaN) 0.0 else r.score, r.key1)),
        s"order $perm")
      val (a, b) = perm.splitAt(1)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged).map(_.key1) == Seq(1L, 3L), s"split $perm")
    }
  }

  test("TopKRows treats -0.0 and +0.0 as equal scores (key tiebreak), " +
      "matching Spark's sort semantics") {
    import graft.functions.Aggregators.{ScoredRow, TopKRows}
    val agg = new TopKRows(2)
    val rows = Seq(ScoredRow(0.0, 5, 5), ScoredRow(-0.0, 1, 1),
      ScoredRow(-0.0, 3, 3))
    // signed zeros tie → key1 ASC decides: (1), (3) — NOT +0.0 first
    for (perm <- rows.permutations) {
      val got = agg.finish(perm.foldLeft(agg.zero)(agg.reduce)).map(_.key1)
      assert(got == Seq(1L, 3L), s"order $perm → $got")
    }
  }

  test("Space-Saving reduce ignores null inputs instead of NPEing") {
    import graft.functions.Aggregators.FrequentItems
    val agg = new FrequentItems(k = 2, capacity = 4)
    val buf = Seq("a", null, "a", null, "b")
      .foldLeft(agg.zero)((b, i) => agg.reduce(b, i))
    val out = agg.finish(buf).map(f => (f.item, f.count))
    assert(out == Seq(("a", 2L), ("b", 1L)))
  }

  test("Space-Saving merge never loses tracked mass (absence bound applied)") {
    import graft.functions.Aggregators.FrequentItems
    val agg = new FrequentItems(k = 2, capacity = 2)
    def sketch(items: String*) =
      items.foldLeft(agg.zero)((b, i) => agg.reduce(b, i))
    // partition A: x tracked with count 3 (and y with 2 — sketch full);
    // partition B: z,w fill the sketch, x absent (evicted there or never
    // seen). Before the fix, merging could drop x's mass silently; now x
    // inherits B's min-count as error and the invariant
    // truth <= count <= truth + error holds for whatever is retained.
    val a = sketch("x", "x", "x", "y", "y")
    val b = sketch("z", "z", "z", "z", "w", "w", "w")
    val merged = agg.merge(a, b)
    val finished = agg.finish(merged)
    finished.foreach { f =>
      val truth = Map("x" -> 3L, "y" -> 2L, "z" -> 4L, "w" -> 3L)(f.item)
      assert(f.count >= truth, s"${f.item}: undercount ${f.count} < $truth")
      assert(f.count - f.error <= truth,
        s"${f.item}: error bound broken (${f.count} - ${f.error} > $truth)")
    }
  }

  test("every SparkEntry query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet),
      s"oracle without query: ${SparkEntry.oracleSql.keySet -- qs.keySet}")
    // smoke-run the ones not covered by a dedicated spec or the oracle
    val noOracle = qs.keySet -- SparkEntry.oracleSql.keySet
    noOracle.foreach { name =>
      val n = qs(name)(spark, sfDir).count()
      assert(n >= 0, name)
    }
  }

  test("curation pipeline composes in ONE declarative plan: mix -> " +
      "segment-dedup -> quality budget -> mask -> pack, with row " +
      "conservation at every stage") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    val total = docs.count()

    // 1. rebalance languages to a cap
    val mixed = graft.operators.Mixing
      .capPerStratum(docs, "lang", "doc_id", cap = 200L)
    val nMixed = mixed.count()
    assert(nMixed > 0 && nMixed <= total)

    // 2. corpus-wide segment dedup, keep docs that retained content
    val deduped = graft.operators.Chunking
      .dedupSegments(mixed, "doc_id", "text", width = 16)
      .filter(col("n_kept") > 0)
      .join(mixed.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("lang"), col("kept_text").as("text"))
    val nDeduped = deduped.count()
    assert(nDeduped > 0 && nDeduped <= nMixed)

    // 3. best tokens per language under a budget
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Long.MinValue, 0)
    val selected = deduped
      .withColumn("quality",
        graft.functions.TextFunctions.qualityScore(col("text")))
      .withColumn("n_bpe",
        graft.functions.TextFunctions.bpeTokenCount(col("text")).cast("long"))
      .withColumn("running", sum(col("n_bpe")).over(w))
      .filter(col("running") - col("n_bpe") < 4096L)
    val nSelected = selected.count()
    assert(nSelected > 0 && nSelected <= nDeduped)

    // 4. mask + 5. pack the survivors into training sequences
    val masked = graft.operators.Masking
      .maskTokens(selected.select("doc_id", "lang", "text"),
        "doc_id", "text", rateNum = 3, rateDen = 20)
    val packed = graft.operators.Packing.packSequences(
      masked.select(col("doc_id"), col("lang"),
        col("masked_text").as("text")),
      idCol = "doc_id", textCol = "text", strataCol = "lang",
      seqLen = 512)
    assert(packed.count() == nSelected) // packing keeps every row

    // the whole chain is ONE lazily-composed DataFrame plan — no
    // intermediate materialization was required to express it
    assert(packed.queryExecution.optimizedPlan != null)
  }

  test("q40 survives a >100-year order range: yearly spine + the " +
      "engine-level recursion limit, months gap-filled exactly") {
    import spark.implicits._
    // two orders 105 years apart: a MONTHLY recursive spine would need
    // 1,258 iterations and the yearly spine needs 106 — both past the
    // default cteRecursionLevelLimit of 100, so this range errors
    // without the raised limit Graft.session sets at construction
    // (q40 itself never mutates session conf)
    assert(spark.conf.get("spark.sql.cteRecursionLevelLimit") == "100000")
    Seq(
      (1L, 10L, java.time.LocalDateTime.of(1900, 6, 15, 0, 0)),
      (2L, 20L, java.time.LocalDateTime.of(2005, 3, 20, 0, 0)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .createOrReplaceTempView("orders_century")
    val rows = graft.queries.Relational
      .q40OverView(spark, "orders_century").collect()
    // 1900-06 .. 2005-03 inclusive
    assert(rows.length == (2005 - 1900) * 12 + (3 - 6) + 1, rows.length)
    val nonEmpty = rows.filter(_.getLong(1) > 0)
    assert(nonEmpty.length == 2)
    // spine endpoints are the months of the two orders (timestamp_ntz
    // surfaces as LocalDateTime — compare opaquely)
    assert(nonEmpty.map(_.get(0)).toSeq ==
      Seq(rows.head.get(0), rows.last.get(0)))
  }
}
