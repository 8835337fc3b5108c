package graft.io

import graft.serde.JsonDocEncoder
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType

/** Pluggable batched document sink — the generic form of the reference's
  * insert loop (accumulate `batchSize` JSON docs → one `insertDocuments`
  * call → clear; ParquetArangoLoader.java:142-156). A JDBC store, a REST
  * document API, or a message bus slots in by implementing [[BatchSink]];
  * the Spark side is a single `foreachPartition` — each task batches its
  * partition independently, so at 100 TB the write parallelism is the
  * task count and the memory bound is one batch per task, exactly the
  * reference's bound per thread.
  */
trait BatchSink extends Serializable {
  /** Called once per batch of ≤ batchSize JSON documents. */
  def insertDocuments(batch: Seq[String]): Unit
  /** Called once per partition after its last batch (flush/close hook). */
  def close(): Unit = ()
}

object DocumentSink {

  /** Render every row of `df` to a JSON document (via
    * [[graft.serde.JsonDocEncoder]]) and deliver them to `sink` in
    * batches of `batchSize` per partition. Validation matches the
    * reference (batchSize ≥ 1, :123-125).
    */
  def writeDocuments(df: DataFrame, sink: BatchSink, batchSize: Int = 1000,
      converters: Map[DataType, Column => Column] = Map.empty,
      quirkCompat: Boolean = false): Unit = {
    if (batchSize < 1)
      throw new IllegalArgumentException(
        s"Invalid batch size $batchSize, must be >= 1")
    val docs = JsonDocEncoder.encode(df, converters, quirkCompat)
      .select(col("doc"))
    docs.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      try it.map(_.getString(0)).grouped(batchSize)
        .foreach(b => sink.insertDocuments(b))
      finally sink.close()
    }
  }
}
