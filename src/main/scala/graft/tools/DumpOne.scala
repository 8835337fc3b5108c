package graft.tools

/** Dev tool: dump a single SparkEntry query (and its oracle SQL, when
  * present) the way Verify does, for fast per-query oracle iteration
  * without running the whole suite.
  * `runMain graft.tools.DumpOne <sfDir> <outDir> <queryName> [more...]`
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val names = args.drop(2)
    val spark = graft.core.Graft.session("graft-dump-one")
    spark.sparkContext.setLogLevel("WARN")
    val sqls = names.flatMap(n =>
      graft.SparkEntry.oracleSql.get(n).map(n -> _)).toMap
    val json = sqls.map { case (k, v) =>
      s""""$k": ${com.fasterxml.jackson.databind.json.JsonMapper.builder()
        .build().writeValueAsString(v)}"""
    }.mkString("{", ",\n", "}")
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("oracle_sql.json"),
      json.getBytes("UTF-8"))
    for (n <- names) {
      graft.SparkEntry.queries(n)(spark, dir)
        .write.mode("overwrite").parquet(s"$out/$n")
      println(s"dumped $n")
    }
    spark.stop()
  }
}
