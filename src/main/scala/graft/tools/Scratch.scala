package graft.tools

import graft.core.Graft
import graft.expressions.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway exploration main (kept out of the library surface). */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Graft.table(spark, dir, "documents")
    val threshold = 0.6

    val sets = docs.select(col("doc_id").as("id"),
        GraftFunctions.wordShingles(col("text"), 3).as("sh"))
      .withColumn("n", size(col("sh"))).cache()
    time("sets materialize")(println("sets=" + sets.count()))
    val post = sets.select(col("id"), col("n"), explode(col("sh")).as("s"))
    val dfreq = post.groupBy(col("s")).agg(count(lit(1)).as("df"))
    time("dfreq")(println("dfreq=" + dfreq.count()))
    val prefix = post
      .join(dfreq, "s")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      .filter(col("rn") <= col("n") - ceil(col("n") * threshold - 1e-9) + 1)
      .select(col("id"), col("n"), col("s"))
      .cache()
    time("prefix materialize")(println("prefix=" + prefix.count()))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          col("a.n") >= col("b.n") * threshold - 1e-9 &&
          col("b.n") >= col("a.n") * threshold - 1e-9)
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct().cache()
    time("candidates")(println("cand=" + cand.count()))
    def ver(withIntersect: Boolean) = {
      val j = cand
        .join(broadcast(sets.select(col("id").as("id1"), col("sh").as("sh1"),
          col("n").as("n1"))), "id1")
        .join(broadcast(sets.select(col("id").as("id2"), col("sh").as("sh2"),
          col("n").as("n2"))), "id2")
      if (withIntersect)
        j.withColumn("c",
            GraftFunctions.sortedIntersectCount(col("sh1"), col("sh2")))
          .withColumn("jaccard",
            round(col("c") / (col("n1") + col("n2") - col("c")), 6))
          .filter(col("jaccard") >= threshold)
      else j.filter(col("n1") + col("n2") > 0)
    }
    time("verify joins only")(println("rows=" + ver(false).count()))
    time("verify full")(println("pairs=" + ver(true).count()))
    time("verify full again")(println("pairs=" + ver(true).count()))
    spark.stop()
  }
}
