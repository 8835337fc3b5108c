package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with batch decode/feature-extraction executed per-partition.
  *
  * Decode and resize are REAL for image payloads: `javax.imageio`
  * (public JDK API, no added dependency) parses PNG/JPEG/GIF/BMP bytes
  * to true dimensions/channel counts, and resize renders through a
  * `Graphics2D` bilinear scale into a fixed `targetW×targetH×3` BGR
  * buffer. Payloads that are NOT a decodable image (the synthetic text
  * corpus, unknown codecs) fall back to a clearly-marked deterministic
  * synthesis — a pure function of the byte length — so pipelines stay
  * total and reproducible over mixed corpora; the `ok` flag in the
  * decoded struct does not distinguish the two (it is the
  * non-empty-payload flag), but real images always take the real path
  * (image magic bytes never collide with the fallback's inputs). The
  * feature-extraction kernel remains an honest documented stub (no
  * vision encoder ships with the JDK); its batched execution shape,
  * schema contract, and determinism are real and tested.
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

  /** Parse `bytes` as an image via javax.imageio. None when the bytes
    * are not a decodable image (no registered reader claims them, or
    * the reader fails mid-stream). The in-memory stream keeps ImageIO
    * off its disk cache (`setUseCache(false)` once per JVM).
    */
  private lazy val imageIoInit: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  private def readImage(bytes: Array[Byte])
      : Option[java.awt.image.BufferedImage] = {
    imageIoInit
    if (bytes.length < 8) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
  }

  /** HEADER-ONLY image metadata parse: an ImageReader claims the bytes
    * and reports width/height/channels WITHOUT decoding the pixel
    * raster — for a corpus of multi-megapixel media the full decode
    * would dominate the pass while only three ints are kept. Falls
    * back to a full read if a reader can't report a header-level image
    * type (rare), and to None when no registered reader claims the
    * bytes at all.
    */
  private def readImageHeader(bytes: Array[Byte])
      : Option[(Int, Int, Int)] = {
    imageIoInit
    if (bytes.length < 8) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val r = readers.next()
      try {
        r.setInput(iis, true, true)
        val (w, h) = (r.getWidth(0), r.getHeight(0))
        val channels = {
          val raw = r.getRawImageType(0)
          if (raw != null) raw.getColorModel.getNumComponents
          else {
            val types = r.getImageTypes(0)
            if (types.hasNext) types.next().getColorModel.getNumComponents
            else return readImage(bytes).map(img =>
              (img.getWidth, img.getHeight,
                img.getColorModel.getNumComponents))
          }
        }
        Some((w, h, channels))
      } finally r.dispose()
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** Batch decode kernel: REAL image header parse via javax.imageio
    * for decodable payloads (true width/height/channel count, pixels
    * never materialized); non-image payloads synthesize deterministic
    * dimensions from the byte length (pure function — reproducible
    * across runs, partitions, engines) so mixed corpora decode
    * totally.
    */
  private def decodeBatch(batch: Seq[Array[Byte]])
      : Seq[(Int, Int, Int, Boolean)] =
    batch.map { bytes =>
      readImageHeader(bytes) match {
        case Some((w, h, c)) => (w, h, c, true)
        case None =>
          val n = bytes.length
          // long arithmetic: n*7 overflows Int past ~306 MB payloads
          // and would synthesize a negative height
          (64 + n % 512, 64 + (n.toLong * 7 % 512).toInt, 3, n > 0)
      }
    }

  /** Batched per-partition decode: groups each partition's rows into
    * [[DecodeBatchSize]] chunks, runs the decode kernel once per chunk,
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
        val decoded = decodeBatch(batch.map(_.getAs[Array[Byte]](payloadIdx)))
        batch.lazyZip(decoded).map { case (row, (w, h, c, ok)) =>
          Row.fromSeq(row.toSeq :+ Row(w, h, c, ok))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Batch resize kernel: REAL bilinear scale for decodable image
    * payloads — render into a `targetW×targetH` TYPE_3BYTE_BGR buffer
    * via Graphics2D and return its raster bytes (fixed size
    * targetW·targetH·3, deterministic for identical input bytes).
    * Non-image payloads emit a deterministic buffer of exactly that
    * size (bytes cycled from the input), so downstream code sees the
    * same two properties on every row: fixed output size and pure
    * function of (payload, target). Empty payloads stay empty.
    */
  private def resizeBatch(batch: Seq[Array[Byte]], targetW: Int,
      targetH: Int): Seq[Array[Byte]] =
    batch.map { bytes =>
      readImage(bytes) match {
        case Some(img) =>
          val out = new java.awt.image.BufferedImage(targetW, targetH,
            java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
          } finally g.dispose()
          out.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferByte].getData.clone()
        case None =>
          if (bytes.isEmpty) Array.emptyByteArray
          else Array.tabulate(targetW * targetH * 3)(
            i => bytes(i % bytes.length))
      }
    }

  /** Batched binary→binary transform (resize / re-encode): same
    * per-partition batch execution shape as [[decodePayloads]], output is
    * a new fixed-size binary column — the 1-row→1-row media transform.
    * Constant memory: one batch of decoded buffers in flight per task.
    */
  def resizePayloads(df: DataFrame, payloadCol: String, targetW: Int,
      targetH: Int): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType, nullable = false),
      StructField("resized_bytes", IntegerType, nullable = false)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        val out = resizeBatch(
          batch.map(_.getAs[Array[Byte]](payloadIdx)), targetW, targetH)
        batch.lazyZip(out).map { case (row, buf) =>
          Row.fromSeq(row.toSeq ++ Seq(buf, buf.length))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** STUB feature-extraction kernel: a real one runs a vision/audio
    * encoder over the batch and returns one embedding per payload; the
    * stub derives a deterministic unit-norm vector from a 64-bit hash of
    * the bytes — byte-identical payloads get identical embeddings
    * (cosine exactly 1), which preserves the property the composition
    * tests rely on: duplicate media are near-dups in embedding space.
    */
  private def embedBatchStub(batch: Seq[Array[Byte]], dim: Int)
      : Seq[Array[Float]] =
    batch.map { bytes =>
      // FNV-1a over the payload seeds a splitmix stream — pure function
      // of the bytes, no RNG state
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= bytes(i) & 0xffL
        h *= 0x100000001b3L
        i += 1
      }
      val v = new Array[Float](dim)
      var norm = 0.0
      var j = 0
      while (j < dim) {
        var z = h + (j + 1).toLong * 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        val x = (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
        v(j) = x.toFloat
        norm += x * x
        j += 1
      }
      val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
      j = 0
      while (j < dim) { v(j) = (v(j) * inv).toFloat; j += 1 }
      v
    }

  /** Batched feature extraction (the embed verb): binary payload →
    * `ArrayType(FloatType)` embedding column, same per-partition batch
    * shape as [[decodePayloads]]. The output column is exactly what the
    * similarity/dedup operators consume, so media dedup composes as
    * sampleFrames → extractFeatures → cosineNearDupPairsLSH (asserted
    * end-to-end in the spec suite).
    */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int)
      : DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        val embs = embedBatchStub(
          batch.map(_.getAs[Array[Byte]](payloadIdx)), dim)
        batch.lazyZip(embs).map { case (row, v) =>
          Row.fromSeq(row.toSeq :+ v.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Batched 1-row→N-row frame sampling (the video verb): the payload is
    * cut into fixed-size "frames" (a real codec seeks keyframes; the
    * stub slices `frameBytes` chunks) and every `everyNth` frame is
    * emitted as its own row with (frame_idx, frame_ms, frame payload).
    * This is the row-exploding media transform — the shape that turns a
    * video corpus into a frame corpus for captioning/embedding. Output
    * rows carry all input columns, so downstream operators (dedup,
    * similarity, quality) compose directly on frames.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, frameBytes: Int,
      everyNth: Int, frameMs: Int = 40): DataFrame = {
    require(frameBytes > 0 && everyNth > 0, "need positive frame params")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_ms", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    // per-row streaming (no grouped() batching): frame slicing needs no
    // batch kernel, and batching would only pin DecodeBatchSize full
    // payloads (potentially large media blobs) in memory per chunk
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val nFrames = (bytes.length + frameBytes - 1) / frameBytes
        (0 until nFrames by everyNth).iterator.map { f =>
          val frame = java.util.Arrays.copyOfRange(bytes, f * frameBytes,
            math.min((f + 1) * frameBytes, bytes.length))
          Row.fromSeq(row.toSeq ++ Seq(f, f * frameMs, frame))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
