package graft

import graft.operators.{IvfIndex, PqIndex, SimilaritySearch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted ANN indexes: loaded-index results must byte-equal the
  * inline paths, the query path must run no training/encode jobs (no
  * corpus-source scan), and IVF probes must prune to the probed cell
  * partitions at the parquet-scan level.
  */
class AnnIndexSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_annidx").toString

  private def emb: DataFrame =
    graft.core.Graft.table(spark, sfDir, "embeddings")
  private def queries: DataFrame = emb.filter(col("vec_id") < 10)

  private def rows(df: DataFrame): Seq[(Any, Int, Any, Double)] =
    df.orderBy(col("query_id"), col("rk")).collect()
      .map(r => (r.get(0), r.getInt(1), r.get(2), r.getDouble(3))).toSeq

  test("PqIndex: loaded-index topK byte-equals the inline pqTopK " +
      "(same params, sampled training included)") {
    val path = tmpDir()
    PqIndex.build(emb, "vec_id", "embedding", trainFraction = 0.5,
      path = path)
    val idx = PqIndex.load(spark, path)
    val inline = rows(SimilaritySearch.pqTopK(emb, queries, "vec_id",
      "embedding", k = 5, trainFraction = 0.5))
    val loaded = rows(idx.topK(queries, "vec_id", "embedding", k = 5))
    assert(loaded == inline)
    assert(loaded.nonEmpty)
  }

  test("PqIndex: the query path scans only the index — no corpus-source " +
      "scan, no training job") {
    val path = tmpDir()
    val idx = PqIndex.build(emb, "vec_id", "embedding", path = path).get
    val q = idx.topK(queries, "vec_id", "embedding", k = 5)
    q.count()
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains(path), "query did not read the stored codes")
    // the corpus side of the scoring plan must be the codes collection,
    // not the embeddings source (queries legitimately come from it)
    val codesScans = plan.linesIterator
      .filter(_.contains("embeddings.parquet"))
      .filter(l => l.contains("cv") || l.contains("codes")).toSeq
    assert(codesScans.isEmpty,
      "corpus vectors were re-read on the query path:\n" + plan)
  }

  test("IvfIndex: loaded-index topK byte-equals the inline ivfTopK and " +
      "prunes the scan to probed cell partitions") {
    val path = tmpDir()
    IvfIndex.build(emb, "vec_id", "embedding", nCells = 16, path = path)
    val idx = IvfIndex.load(spark, path)
    assert(idx.nCells == 16)
    val inline = rows(SimilaritySearch.ivfTopK(emb, queries, "vec_id",
      "embedding", k = 5, nCells = 16, nProbe = 4))
    val q = idx.topK(queries, "vec_id", "embedding", k = 5, nProbe = 4)
    assert(rows(q) == inline)
    // partition pruning: the cells scan must carry the cell isin filter
    // as a partition filter (cell is a Hive partition column)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") &&
      plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("cell")),
      "probe set was not pushed as a partition filter:\n" + plan)
  }

  test("extend: appended vectors are found under the frozen quantizers " +
      "— an identical query returns its planted twin; pre-extend " +
      "results stay reachable") {
    import spark.implicits._
    val corpus = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    // PQ: delta encodes under the stored codebooks; an exact copy of a
    // delta vector must surface it (identical codes -> identical ADC
    // score; excludeSelf filters the query id itself, ids differ)
    val pqPath = tmpDir()
    val pq = PqIndex.build(corpus, "vec_id", "embedding",
      path = pqPath).get
    val preRows = pq.codes.count()
    pq.extend(delta, "vec_id", "embedding")
    assert(pq.codes.count() == preRows + 50)
    // probe and expected id must come from the SAME row — an unordered
    // limit(1) is free to pick any row and would make this flaky
    val planted = delta.orderBy(col("vec_id")).limit(1).collect()(0)
    val plantedId = planted.getLong(0)
    val probe = Seq(Tuple1(777777L)).toDF("vec_id")
      .withColumn("embedding",
        typedLit(planted.getSeq[Float](1)).cast("array<float>"))
    val pqTop = pq.topK(probe, "vec_id", "embedding", k = 3)
      .collect().map(_.getLong(2)).toSet
    assert(pqTop.contains(plantedId),
      s"PQ extend lost the planted twin $plantedId: $pqTop")
    // IVF: identical vector assigns to the same cell deterministically
    // and scoring is exact, so the twin is the cos-1.0 top hit; the
    // appended rows land inside the Hive cell partitions
    val ivfPath = tmpDir()
    val ivf = IvfIndex.build(corpus, "vec_id", "embedding",
      nCells = 16, path = ivfPath).get
    ivf.extend(delta, "vec_id", "embedding")
    assert(ivf.cells.count() == 450)
    val ivfTop = ivf.topK(probe, "vec_id", "embedding", k = 1)
      .collect()(0)
    assert(ivfTop.getLong(2) == plantedId && ivfTop.getDouble(3) == 1.0,
      s"IVF extend: expected ($plantedId, 1.0), got $ivfTop")
    // reloading sees the extension too (state is all on disk)
    assert(IvfIndex.load(spark, ivfPath).cells.count() == 450)
    assert(PqIndex.load(spark, pqPath).codes.count() == preRows + 50)
    // a delta from a different embedding model (wrong dim) is refused
    // loudly instead of silently poisoning the stored codes/cells
    val wrongDim = delta.select(col("vec_id"),
      slice(col("embedding"), 1, 32).as("embedding"))
    for (op <- Seq(() => pq.extend(wrongDim, "vec_id", "embedding"),
        () => ivf.extend(wrongDim, "vec_id", "embedding"))) {
      val e = intercept[IllegalArgumentException](op())
      assert(e.getMessage.contains("dim"), e.getMessage)
    }
  }

  test("empty corpus: build returns None instead of writing a broken " +
      "index") {
    val empty = emb.filter(col("vec_id") < -1)
    assert(PqIndex.build(empty, "vec_id", "embedding",
      path = tmpDir()).isEmpty)
    assert(IvfIndex.build(empty, "vec_id", "embedding",
      path = tmpDir()).isEmpty)
  }

  test("build releases every cache it created") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    PqIndex.build(emb, "vec_id", "embedding", path = tmpDir())
    IvfIndex.build(emb, "vec_id", "embedding", path = tmpDir())
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "index build leaked operator caches")
  }

  test("x63 equals x61: the indexed query entry byte-matches the inline " +
      "entry") {
    val a = rows(graft.queries.Extensions.x61KnnPq(spark, sfDir))
    val b = rows(graft.queries.Extensions.x63KnnPqIndexed(spark, sfDir))
    assert(a == b)
    assert(a.nonEmpty)
  }
}
