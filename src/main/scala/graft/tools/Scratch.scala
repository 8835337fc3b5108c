package graft.tools

import graft.core.Graft
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
    def sides(hotMod: Int, rep: Int) = {
      val li = Graft.table(spark, dir, "lineitem")
        .repartition(32)
        .withColumn("rep", explode(array((0 until rep).map(lit): _*)))
        .select(
          when(col("l_orderkey") % hotMod =!= 7, lit(0L))
            .otherwise(pmod(col("l_orderkey"), lit(997)).cast("long")).as("k"),
          (col("l_linenumber").cast("long") + col("rep")).as("v"))
      val sup = Graft.table(spark, dir, "supplier").select(
        pmod(col("s_suppkey"), lit(997)).cast("long").as("k"),
        col("s_nationkey").cast("long").as("w")).hint("merge")
      (li, sup)
    }
    def heavyAgg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy(pmod(col("k"), lit(10)).as("kb"))
        .agg(count(lit(1)).as("cnt"), sum(col("v") + col("w")).as("sv"),
          sum(when(substring(md5(concat_ws("-", col("k"), col("v"),
            col("w"))), 1, 1) === "a", 1L).otherwise(0L)).as("na"))
    for (rep <- Seq(16); n <- 1 to 3) {
      val (li, sup) = sides(100, rep)
      t(s"plain rep=$rep #$n")(heavyAgg(li.join(sup, "k")).count())
      val (li2, sup2) = sides(100, rep)
      t(s"salted rep=$rep #$n")(heavyAgg(
        graft.operators.SkewJoin.saltedInnerJoin(li2, sup2, "k", salt = 16))
        .count())
    }
    spark.stop()
  }
}
