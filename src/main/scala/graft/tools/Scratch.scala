package graft.tools

import graft.core.Graft
import org.apache.spark.sql.functions._

/** Throwaway exploration main (kept out of the library surface).
  * Current experiment: attribute the V2 quirk-JSONL sink's throughput
  * gap vs the parquet loader — transcode kernel vs commit protocol.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("scratch")
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-38s ${s}%8.3f s")
      s
    }

    for ((label, dir) <- Seq(
        "sf0.1" -> "/root/testdata/sf0.1",
        "sf1-synth" ->
          s"${System.getProperty("java.io.tmpdir")}/graft_synth_sf1")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      println(s"=== $label: $n docs")
      val tmp = java.nio.file.Files.createTempDirectory("graft_sinkprof")
      // 1. scan only (floor)
      val tScan = time("scan+count only")(docs.count())
      // 2. transcode kernel only (no write): quirk JSON per row
      val tEnc = time("quirk transcode, no write") {
        graft.serde.JsonDocEncoder.encode(docs, Map.empty,
          quirkCompat = true).select(col("doc")).count()
      }
      // 3. transcode + plain text write (Spark's stock committer)
      val tText = time("transcode + plain text write") {
        graft.serde.JsonDocEncoder.encode(docs, Map.empty,
          quirkCompat = true).select(col("doc"))
          .write.mode("overwrite").text(s"$tmp/plain")
      }
      // 4. the real V2 sink (two-phase commit protocol)
      val tV2 = time("graft-docs V2 sink (full path)") {
        docs.write.format("graft-docs")
          .option("path", s"$tmp/docs").mode("append").save()
      }
      println(f"$label: kernel=${tEnc - tScan}%.3f s, " +
        f"textWrite-over-kernel=${tText - tEnc}%.3f s, " +
        f"v2-over-textWrite=${tV2 - tText}%.3f s, " +
        f"v2 docs/s=${n / tV2}%.0f, text docs/s=${n / tText}%.0f")
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
    spark.stop()
  }
}
