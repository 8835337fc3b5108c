package graft.tools

/** Dev tool: write `.explain("formatted")` of named SparkEntry queries
  * to files, for the plan-evidence artifacts the optimization rounds
  * commit under `plans/`.
  * `runMain graft.tools.ExplainOne <sfDir> <outDir> <suffix> <name> [more...]`
  * writes `<outDir>/<name>_<suffix>.txt` per query (suffix is
  * `before`/`after`). Uses [[graft.core.Graft.session]] so the plans
  * match what Bench/Verify execute.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val spark = graft.core.Graft.session("graft-explain-one")
    spark.sparkContext.setLogLevel("WARN")
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p)
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(p.resolve(s"${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"explained $n -> $out/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
