package graft.tools

import graft.core.Graft

/** Throwaway exploration main (kept out of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val ev = Graft.table(spark, "/root/testdata/sf0.001", "events")
    ev.printSchema()
    spark.stop()
  }
}
