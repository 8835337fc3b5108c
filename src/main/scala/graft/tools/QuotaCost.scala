package graft.tools

import graft.operators.Curation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decompose the window-free exact domainQuota's wall time into its two
  * components — the thresholds materialization job (BottomKKey agg +
  * cache + count, the broadcast-gate measurement) vs the second corpus
  * pass (join-back + threshold filter) — against the retired
  * ranking-window form, on the x77/x78 planted-domain frame. Evidence
  * for the x78 bench attribution: the window-free trade buys
  * mega-domain safety (no per-domain sort under one task) at the price
  * of ONE extra bounded job at small scale, which this tool prices.
  *
  * `runMain graft.tools.QuotaCost <sfDir> [sfDir...]`
  */
object QuotaCost {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("graft-quota-cost")
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"))
        .withColumn("domain",
          when(col("doc_id") % 10 < 5, lit("megafarm.com"))
            .otherwise(concat(lit("site"), (col("doc_id") % 97)
              .cast("string"))))
      val n = d.count() // warm the scan
      def timed(body: => Unit): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      // full window-free operator (thresholds job + second pass)
      val tFull = timed {
        Curation.domainQuota(d, "domain", "doc_id", 20).count()
      }
      // the thresholds phase alone, replicated verbatim from the
      // operator: agg + cache + the count() materialization job
      val tThr = timed {
        val sortKey = concat(md5(col("doc_id").cast("string")),
          col("doc_id").cast("string"))
        val bottomK = udaf(
          new graft.functions.Aggregators.BottomKKey(20),
          org.apache.spark.sql.Encoders.STRING)
        val thr = d.select(col("domain"), sortKey.as("__k"))
          .groupBy(col("domain")).agg(bottomK(col("__k")).as("__thr"))
          .cache()
        thr.count()
      }
      // the retired ranking-window reference form
      val tWin = timed {
        val w = Window.partitionBy(col("domain"))
          .orderBy(md5(col("doc_id").cast("string")),
            col("doc_id").cast("string"))
        d.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= 20).count()
      }
      println(f"""{"dir":"$dir","rows":$n,""" +
        f""""window_free_full_sec":$tFull%.3f,""" +
        f""""thresholds_job_sec":$tThr%.3f,""" +
        f""""second_pass_sec":${tFull - tThr}%.3f,""" +
        f""""ranking_window_sec":$tWin%.3f}""")
    }
    spark.stop()
  }
}
