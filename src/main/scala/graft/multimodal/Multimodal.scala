package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with batch decode/feature-extraction executed per-partition.
  *
  * The image/audio codec libraries are not present in this environment,
  * so the decode kernel itself is a clearly-marked deterministic STUB —
  * but every Spark-side piece is real and tested: the schema contract
  * (binary payload + metadata struct), the per-partition batched
  * execution shape (the exact shape a JNI/FFI codec wants: amortize
  * library setup per batch, not per row), partitioning, and the column
  * plumbing to downstream operators.
  */
object Multimodal {

  /** Rows per decode batch — the unit a real codec would process at once. */
  val DecodeBatchSize = 256

  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("ok", BooleanType, nullable = false)))

  /** Attach an opaque binary payload + metadata to a documents table.
    * In production the payload is the raw image/audio bytes from the
    * object store; here it is the utf-8 text bytes (deterministic, so
    * the oracle can reproduce byte length and sha independently).
    */
  def attachPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("sha", sha2(col("payload"), 256))

  /** STUB decode kernel: deterministic fake "image header parse" from the
    * byte length. A real implementation would hand `batch` to an image
    * library (e.g. via JNI) and return real dimensions — the signature
    * and batch shape would not change.
    */
  private def decodeBatchStub(batch: Seq[Array[Byte]])
      : Seq[(Int, Int, Int, Boolean)] =
    batch.map { bytes =>
      val n = bytes.length
      (64 + n % 512, 64 + (n * 7) % 512, 3, n > 0)
    }

  /** Batched per-partition decode: groups each partition's rows into
    * [[DecodeBatchSize]] chunks, runs the (stub) kernel once per chunk,
    * and emits the input row + decoded struct. Executed via
    * `Dataset.mapPartitions` with an explicit row encoder — constant
    * memory (one batch in flight per task), no shuffle, scales with
    * partition count, and — unlike the earlier `df.rdd` +
    * `createDataFrame` round trip — stays a single plan node, so
    * whole-stage codegen resumes immediately downstream of the decode.
    */
  def decodePayloads(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("decoded", decodedSchema, nullable = false))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        val decoded = decodeBatchStub(batch.map(_.getAs[Array[Byte]](payloadIdx)))
        batch.lazyZip(decoded).map { case (row, (w, h, c, ok)) =>
          Row.fromSeq(row.toSeq :+ Row(w, h, c, ok))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
