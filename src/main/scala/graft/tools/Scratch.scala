package graft.tools

import graft.core.Graft
import graft.expressions.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway exploration main (kept out of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    // x3 pipeline stage-by-stage at sf0.1 (threshold 0.6, k=3)
    val docs = Graft.table(spark, dir, "documents")
    val sets = docs.select(col("doc_id").as("id"),
        GraftFunctions.wordShingles(col("text"), 3).as("sh"))
      .withColumn("n", size(col("sh"))).cache()
    t("shingle+cache")(sets.count())
    val post = sets.select(col("id"), col("n"), explode(col("sh")).as("s"))
    t("postings")(println("  postings=" + post.count()))
    val dfreq = post.groupBy(col("s")).agg(count(lit(1)).as("df")).cache()
    t("dfreq")(println("  distinct shingles=" + dfreq.count()))
    val prefix = post.join(broadcast(dfreq), "s")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      .filter(col("rn") <= col("n") - ceil(col("n") * 0.6 - 1e-9) + 1)
      .select(col("id"), col("n"), col("s"), col("rn")).cache()
    t("prefix")(println("  prefix rows=" + prefix.count()))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          col("a.n") >= col("b.n") * 0.6 - 1e-9 &&
          col("b.n") >= col("a.n") * 0.6 - 1e-9 &&
          least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) + 1
            >= ceil((col("a.n") + col("b.n")) * (0.6 / 1.6) - 1e-9))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
    t("cand-raw")(println("  raw candidates=" + cand.count()))
    val dis = cand.distinct().cache()
    t("cand-distinct")(println("  distinct candidates=" + dis.count()))
    val ver = dis
      .join(broadcast(sets.select(col("id").as("id1"), col("sh").as("sh1"),
        col("n").as("n1"))), "id1")
      .join(broadcast(sets.select(col("id").as("id2"), col("sh").as("sh2"),
        col("n").as("n2"))), "id2")
      .withColumn("c", GraftFunctions.sortedIntersectCount(col("sh1"), col("sh2")))
      .withColumn("jaccard",
        round(col("c") / (col("n1") + col("n2") - col("c")), 6))
      .filter(col("jaccard") >= 0.6)
    t("verify")(println("  pairs=" + ver.count()))
    spark.stop()
  }
}
