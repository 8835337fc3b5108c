package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{name:{"sec":s,"ok":b},...},
  *  "failed":k,"sf":dir}.
  *
  * Failures are recorded per query (ok=false, the elapsed time until the
  * failure) and surfaced in a nonzero `failed` count — a crash at bench
  * scale must be visible in the output, not swallowed.
  *
  * A small untimed warmup (the flagship aggregation at the bench SF)
  * first forces session init, parquet footer reads, and whole-stage
  * codegen JIT, so per-query timings measure the queries rather than JVM
  * warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Graft.session("graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, sec, ok) =>
      s""""$k":{"sec":$sec,"ok":$ok}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failed = results.count(!_._3)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
