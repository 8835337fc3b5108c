package graft.tools

import graft.core.Graft
import org.apache.spark.sql.functions._

/** Throwaway exploration main (kept out of the library surface).
  * Current experiment: ADC cosine magnitude of exact twins under the
  * composed IVF-PQ index on the embeddings fixture.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val emb = Graft.table(spark, dir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("scratch_ivfpq")
      .toString
    val idx = graft.operators.IvfPqIndex.build(emb, "vec_id", "embedding",
      nCells = 16, numSubspaces = 8, nCentroids = 16, path = path).get
    // self-query WITHOUT excludeSelf: rk=1 should be the vector itself;
    // its ADC cos tells us the twin-score magnitude
    val self = idx.topK(emb.filter(col("vec_id") < 10), "vec_id",
      "embedding", k = 1, nProbe = 16, excludeSelf = false)
    self.orderBy(col("query_id")).show(10, false)
    spark.stop()
  }
}
