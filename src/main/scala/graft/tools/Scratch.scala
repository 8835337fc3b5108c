package graft.tools

import graft.core.Graft
import graft.queries.Extensions

/** Throwaway exploration main (kept out of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    t("x6")(println("  x6 rows=" +
      Extensions.x6EmbeddingNearDup(spark, dir).count()))
    t("x14")(println("  x14 rows=" +
      Extensions.x14NearDupLsh(spark, dir).count()))
    t("x61")(println("  x61 rows=" +
      Extensions.x61KnnPq(spark, dir).count()))
    t("x60")(println("  x60 rows=" +
      Extensions.x60IncrementalLsh(spark, dir).count()))
    t("x59")(println("  x59 rows=" +
      Extensions.x59IncrementalJaccard(spark, dir).count()))
    t("x56")(println("  x56 rows=" +
      Extensions.x56DedupClustersStar(spark, dir).count()))
    spark.stop()
  }
}
