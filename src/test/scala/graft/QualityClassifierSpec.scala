package graft

import graft.core.Graft
import graft.expressions.HashedBucket
import graft.operators.QualityClassifier
import graft.operators.QualityClassifier.{Model, Quant}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Gates for the learned quality classifier (x81 scoring — also
  * DuckDB-oracle-checked — and x82 training, which has no SQL oracle:
  * each iteration's gradient depends on the previous weights through
  * the transcendental σ, so the gate here is EXACT equality against an
  * independent driver-side reference trainer, which the quantized-long
  * gradient construction makes achievable verbatim).
  */
class QualityClassifierSpec extends SparkSpec {

  private def docs: DataFrame = Graft.table(spark, sfDir, "documents")

  /** Independent reference path: plain-Scala tokenize + java MD5,
    * no engine code shared beyond the JDK.
    */
  private def refTokens(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  private def refBucket(tok: String, dim: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(tok.getBytes("UTF-8"))
    val h16 = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
    ((h16.toLong * dim) / 65536L).toInt // long math like the kernel
  }

  private def refLogit(text: String, m: Model): (Long, Long) = {
    val toks = refTokens(text)
    var sum = m.biasQ
    toks.foreach(t => sum += m.weightsQ(refBucket(t, m.dim)))
    (toks.length.toLong, sum)
  }

  /** Reference trainer: same contract (exact quantized-long gradient
    * sums, driver-side momentum), sequential plain-Scala collections —
    * a disjoint code path from the distributed treeAggregate trainer.
    */
  private def refTrain(rows: Seq[(String, Long)], dim: Int, iters: Int,
      lr: Double, momentum: Double): Model = {
    val feats = rows.map { case (text, y) =>
      val cnts = new Array[Long](dim)
      refTokens(text).foreach(t => cnts(refBucket(t, dim)) += 1L)
      (y, cnts)
    }
    val n = feats.size.toDouble
    var biasQ = 0L
    val wq = new Array[Long](dim)
    var vBias = 0.0
    val vW = new Array[Double](dim)
    for (_ <- 0 until iters) {
      val grad = new Array[Long](dim + 1)
      feats.foreach { case (y, cnts) =>
        var logitQ = biasQ
        var b = 0
        while (b < dim) { logitQ += wq(b) * cnts(b); b += 1 }
        val p = 1.0 / (1.0 + math.exp(-logitQ.toDouble / Quant.toDouble))
        val r = p - y.toDouble
        grad(0) += math.floor(r * Quant.toDouble).toLong
        b = 0
        while (b < dim) {
          if (cnts(b) != 0L)
            grad(b + 1) +=
              math.floor(r * cnts(b).toDouble * Quant.toDouble).toLong
          b += 1
        }
      }
      vBias = momentum * vBias + grad(0).toDouble / n
      biasQ -= math.round(lr * vBias)
      var b = 0
      while (b < dim) {
        vW(b) = momentum * vW(b) + grad(b + 1).toDouble / n
        wq(b) -= math.round(lr * vW(b))
        b += 1
      }
    }
    Model(biasQ, wq)
  }

  test("md5 bucket: kernel agrees with the Spark SQL restatement") {
    import spark.implicits._
    val toks = docs.filter(col("text").isNotNull)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .distinct()
    val dim = 64
    val viaSql = toks.withColumn("b",
        (conv(substring(md5(col("token")), 1, 4), 16, 10).cast("long")
          * dim / 65536).cast("int"))
      .as[(String, Int)].collect()
    assert(viaSql.nonEmpty)
    viaSql.foreach { case (t, b) =>
      assert(HashedBucket.bucketOf(t, dim) === b, s"token $t")
      assert(b >= 0 && b < dim)
    }
  }

  test("score: exact equality with the driver reference on the corpus") {
    import spark.implicits._
    val m = QualityClassifier.refModel(seed = 9, dim = 64)
    val got = QualityClassifier.score(docs, "doc_id", "text", m)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    val want = docs.select(col("doc_id"), coalesce(col("text"), lit("")))
      .as[(Long, String)].collect().sortBy(_._1)
      .map { case (id, t) =>
        val (n, lq) = refLogit(t, m)
        (id, n, lq, lq > 0)
      }
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("score: null text scores as bias-only, keep = sign of bias") {
    import spark.implicits._
    val m = QualityClassifier.refModel(seed = 9, dim = 64)
    val df = Seq((1L, null: String), (2L, ""), (3L, "   ")).toDF("id", "text")
    val out = QualityClassifier.score(df, "id", "text", m)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    out.foreach { case (_, n, lq, keep) =>
      assert(n === 0L)
      assert(lq === m.biasQ)
      assert(keep === (m.biasQ > 0))
    }
  }

  test("score plan: pure map-side — zero exchanges") {
    val m = QualityClassifier.refModel(seed = 9, dim = 64)
    val plan = QualityClassifier.score(docs, "doc_id", "text", m)
      .queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"expected no shuffle in the scoring plan:\n$plan")
  }

  test("train: equals the independent reference trainer verbatim, " +
      "partitioning-independent") {
    import spark.implicits._
    val labeled = docs.withColumn("y",
      (length(coalesce(col("text"), lit(""))) % 2 === 0).cast("int"))
    val rows = labeled
      .select(coalesce(col("text"), lit("")), col("y").cast("long"))
      .as[(String, Long)].collect().toSeq
    val want = refTrain(rows, dim = 64, iters = 7, lr = 0.5, momentum = 0.9)
    // docsPerPartition sized so the 500-doc fixture genuinely spans
    // the requested partition count — the 7-way case exercises
    // treeAggregate's combOp path for real (500/80 + 1 = 7 tasks),
    // not a single-task collapse
    for ((parts, dpp) <- Seq((1, 50000L), (7, 80L))) {
      val got = QualityClassifier.train(labeled.repartition(parts), "text",
        "y", dim = 64, iters = 7, lr = 0.5, docsPerPartition = dpp)
      assert(got.biasQ === want.biasQ, s"bias at parts=$parts")
      assert(got.weightsQ.toSeq === want.weightsQ.toSeq,
        s"weights at parts=$parts")
    }
  }

  test("train: learns a separable corpus to training accuracy 1.0") {
    import spark.implicits._
    val good = (0L until 60L).map(i => (i, s"alpha beta gamma delta g$i", 1))
    val bad = (60L until 120L).map(i => (i, s"zeta eta theta iota b$i", 0))
    val df = (good ++ bad).toDF("id", "text", "y")
    val m = QualityClassifier.train(df, "text", "y", dim = 64, iters = 40,
      lr = 0.5)
    val acc = QualityClassifier.score(df, "id", "text", m)
      .join(df.select(col("id"), col("y")), "id")
      .select((col("keep") === (col("y") === 1)).cast("double").as("c"))
      .agg(avg(col("c"))).head().getDouble(0)
    assert(acc === 1.0)
  }

  test("train: exact-long overflow guard fails loudly") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e", 1), (2L, "f g h", 0)).toDF("id", "text", "y")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.train(df, "text", "y", dim = 16, iters = 1,
        maxExactTokens = 3L)
    }
    assert(e.getMessage.contains("maxExactTokens"))
  }

  test("x82 entry: trains to high accuracy on the fixture label") {
    val out = graft.queries.Extensions.x82QualityTrain(spark, sfDir)
    val acc = out.select(avg(col("correct").cast("double")))
      .head().getDouble(0)
    assert(acc >= 0.95, s"training accuracy $acc below 0.95")
  }

  test("calibrationReport: confusion counts equal a driver recompute " +
      "at every threshold, recall is monotone in the threshold, and " +
      "undefined ratios report -1") {
    import spark.implicits._
    val m = QualityClassifier.refModel(seed = 9, dim = 64)
    val labeled = docs.withColumn("y",
      (length(coalesce(col("text"), lit(""))) % 2 === 0).cast("int"))
    val thresholds = graft.queries.Extensions.x86Thresholds
    val got = QualityClassifier.calibrationReport(
        labeled, "text", "y", m, thresholds)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // driver recompute from the reference logit
    val rows = labeled.select(coalesce(col("text"), lit("")),
        col("y").cast("long"))
      .as[(String, Long)].collect()
      .map { case (t, y) => (refLogit(t, m)._2, y) }
    thresholds.foreach { thr =>
      val tp = rows.count { case (l, y) => y == 1 && l > thr }.toLong
      val fp = rows.count { case (l, y) => y != 1 && l > thr }.toLong
      val tn = rows.count { case (l, y) => y != 1 && l <= thr }.toLong
      val fn = rows.count { case (l, y) => y == 1 && l <= thr }.toLong
      val prec = if (tp + fp > 0) tp * 10000 / (tp + fp) else -1L
      val rec = if (tp + fn > 0) tp * 10000 / (tp + fn) else -1L
      assert(got(thr) == ((tp, fp, tn, fn, prec, rec)), s"thr $thr")
    }
    // raising the threshold can only shrink the kept set → tp (and so
    // recall) non-increasing
    val byThr = thresholds.sorted.map(got(_))
    assert(byThr.map(_._1).sliding(2).forall(p => p(0) >= p(1)))
    // a threshold above every logit keeps nothing: precision undefined
    val edge = QualityClassifier.calibrationReport(
        labeled, "text", "y", m, Seq(Long.MaxValue - 1))
      .collect().head
    assert(edge.getLong(1) == 0L && edge.getLong(5) == -1L)
  }
}
