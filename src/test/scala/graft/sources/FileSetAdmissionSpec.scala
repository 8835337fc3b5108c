package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}

import graft.SparkSpec

/** Unit coverage of [[FileSetMicroBatchStream]]'s ADMISSION decision —
  * the greedy file/byte-budget walk — against a synthetic listing, so
  * every boundary case (byte budget mid-list, oversized single file,
  * both caps at once, limit-free fallback) is pinned without driving a
  * full streaming query. Package-scoped here because the class is
  * `private[sources]` by design.
  */
class FileSetAdmissionSpec extends SparkSpec {

  private case class FakePartition(name: String) extends InputPartition

  /** A stream over a fixed in-memory listing. */
  private def stream(files: Seq[(String, Long)], maxFiles: Int,
      maxBytes: Long): FileSetMicroBatchStream = {
    val ckpt = Files.createTempDirectory("graft_adm_unit").toString
    val conf = new org.apache.spark.sql.graftbridge.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    new FileSetMicroBatchStream(ckpt, maxFiles, maxBytes,
        compactThreshold = 1000, conf) {
      override protected def listFiles(): Seq[(String, Long)] = files
      override protected def partitionFor(name: String): InputPartition =
        FakePartition(name)
      override def createReaderFactory(): PartitionReaderFactory =
        throw new UnsupportedOperationException("admission-only fake")
    }
  }

  /** Drain the stream's admission loop; returns the admitted batches
    * as name lists.
    */
  private def batches(s: FileSetMicroBatchStream): Seq[Seq[String]] = {
    val out = Seq.newBuilder[Seq[String]]
    var off = s.initialOffset()
    var done = false
    while (!done) {
      val next = s.latestOffset(off, s.getDefaultReadLimit)
      val names = s.planInputPartitions(off, next)
        .map(_.asInstanceOf[FakePartition].name).toSeq
      if (names.isEmpty) done = true
      else { out += names; off = next }
    }
    out.result()
  }

  test("byte budget splits mixed-size listings at the size sum, " +
      "always admitting at least one file") {
    // crawl-shard mix: sizes vary ~10×
    val files = Seq("a" -> 100L, "b" -> 900L, "c" -> 100L, "d" -> 100L,
      "e" -> 1000L).map { case (n, s) => (n, s) }
    val got = batches(stream(files, maxFiles = 1000, maxBytes = 1000L))
    // a(100)+b(900)=1000 fits; c+d=200 then e would overflow; e alone
    assert(got == Seq(Seq("a", "b"), Seq("c", "d"), Seq("e")), got)
  }

  test("a single file larger than the byte budget is still admitted " +
      "alone — an oversized shard can never stall the stream") {
    val files = Seq("big" -> 5000L, "small" -> 10L)
    val got = batches(stream(files, maxFiles = 1000, maxBytes = 100L))
    assert(got == Seq(Seq("big"), Seq("small")), got)
  }

  test("file cap and byte cap compose: whichever trips first bounds " +
      "the batch") {
    val files = (1 to 6).map(i => (f"f$i%02d", 10L))
    // byte cap admits 3 (30 ≤ 35 < 40), file cap admits 2 → min rules
    val byFiles = batches(stream(files, maxFiles = 2, maxBytes = 35L))
    assert(byFiles.forall(_.size <= 2), byFiles)
    assert(byFiles.flatten == files.map(_._1), byFiles)
    // file cap admits 4, byte cap admits 3 → byte cap rules
    val byBytes = batches(stream(files, maxFiles = 4, maxBytes = 35L))
    assert(byBytes.map(_.size) == Seq(3, 3), byBytes)
  }

  test("without a byte budget the default limit is file-count only " +
      "(the pre-existing contract, unchanged)") {
    val files = (1 to 5).map(i => (s"g$i", 1000000L))
    val got = batches(stream(files, maxFiles = 2,
      maxBytes = Long.MaxValue))
    assert(got.map(_.size) == Seq(2, 2, 1), got)
  }
}
