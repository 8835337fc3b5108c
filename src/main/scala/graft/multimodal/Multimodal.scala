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
  * (image magic bytes never collide with the fallback's inputs).
  * Feature extraction and the dHash perceptual fingerprint run on REAL
  * decoded pixels for image payloads (pooled mean-centered luminance /
  * 9×8 neighbor-brightness bits — brightness-invariant, so re-exposed
  * or re-scaled copies stay near in embedding and Hamming space); a
  * production deployment swaps the pooled-luminance embed for a vision
  * encoder under the same batched contract. Non-image payloads take a
  * deterministic hash fallback for both, keeping mixed corpora total.
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

  /** Payload extraction shared by every batched kernel: a NULL payload
    * (what [[attachPayload]] yields for a null text, and what any real
    * media table carries for rows whose blob is absent) normalizes to
    * the empty byte array, so null-bearing corpora flow through the
    * same deterministic empty-payload path as the rest of the engine
    * treats null text — instead of an NPE killing the task.
    */
  private def payloadBytes(row: org.apache.spark.sql.Row,
      idx: Int): Array[Byte] = {
    val b = row.getAs[Array[Byte]](idx)
    if (b == null) Array.emptyByteArray else b
  }

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
        val decoded = decodeBatch(batch.map(payloadBytes(_, payloadIdx)))
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
          batch.map(payloadBytes(_, payloadIdx)), targetW, targetH)
        batch.lazyZip(out).map { case (row, buf) =>
          Row.fromSeq(row.toSeq ++ Seq(buf, buf.length))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** FNV-1a(bytes) → splitmix stream → unit vector: the deterministic
    * fallback embedding for payloads no image reader claims. Pure
    * function of the bytes — byte-identical payloads get identical
    * embeddings (cosine exactly 1), which preserves the property the
    * composition tests rely on: duplicate media are near-dups in
    * embedding space.
    */
  private def hashEmbed(bytes: Array[Byte], dim: Int): Array[Float] = {
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

  /** Render `img` onto a `w×h` grayscale grid (bilinear) and return the
    * raster as doubles in [0,255]. The shared pixel reduction under the
    * real embed and dHash kernels.
    */
  private def grayGrid(img: java.awt.image.BufferedImage, w: Int, h: Int)
      : Array[Double] = {
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val raw = out.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    Array.tabulate(w * h)(i => (raw(i) & 0xff).toDouble)
  }

  /** REAL feature-extraction kernel for decodable images: bilinear-pool
    * the luminance onto a grid covering `dim` cells, mean-center (the
    * classic normalized-patch trick — embeddings become invariant to
    * global brightness shifts, so a re-exposed copy of an image stays
    * cosine ≈ 1 to the original), and L2-normalize. A constant image
    * centers to the zero vector, which normalizes to the uniform unit
    * vector instead — keeping "identical payloads ⇒ cosine exactly 1"
    * total. Payloads no reader claims (text, audio stubs, truncated
    * files) fall back to [[hashEmbed]] — also deterministic, so mixed
    * corpora embed totally and reproducibly. A real deployment swaps
    * this kernel for a vision encoder; every property downstream
    * operators rely on (fixed dim, unit norm, purity in the bytes) is
    * the same contract.
    */
  private def embedBatch(batch: Seq[Array[Byte]], dim: Int)
      : Seq[Array[Float]] =
    batch.map { bytes =>
      readImage(bytes) match {
        case Some(img) =>
          val gw = math.ceil(math.sqrt(dim.toDouble)).toInt
          val gh = (dim + gw - 1) / gw
          val px = grayGrid(img, gw, gh)
          val mean = {
            var s = 0.0; var i = 0
            while (i < dim) { s += px(i); i += 1 }
            s / dim
          }
          val v = new Array[Float](dim)
          var norm = 0.0
          var i = 0
          while (i < dim) {
            val x = px(i) - mean
            v(i) = x.toFloat
            norm += x * x
            i += 1
          }
          if (norm == 0.0) {
            val u = (1.0 / math.sqrt(dim.toDouble)).toFloat
            java.util.Arrays.fill(v, u)
          } else {
            val inv = 1.0 / math.sqrt(norm)
            i = 0
            while (i < dim) { v(i) = (v(i) * inv).toFloat; i += 1 }
          }
          v
        case None => hashEmbed(bytes, dim)
      }
    }

  /** Batched feature extraction (the embed verb): binary payload →
    * `ArrayType(FloatType)` embedding column, same per-partition batch
    * shape as [[decodePayloads]]. Decodable images embed from REAL
    * pixels (pooled mean-centered luminance — see [[embedBatch]]);
    * everything else gets the deterministic hash fallback. The output
    * column is exactly what the similarity/dedup operators consume, so
    * media dedup composes as sampleFrames → extractFeatures →
    * cosineNearDupPairsLSH (asserted end-to-end in the spec suite).
    */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int)
      : DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        val embs = embedBatch(
          batch.map(payloadBytes(_, payloadIdx)), dim)
        batch.lazyZip(embs).map { case (row, v) =>
          Row.fromSeq(row.toSeq :+ v.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Per-frame GIF delay in centiseconds from the
    * GraphicControlExtension of frame `i`'s metadata — None for
    * non-GIF containers, absent extensions, or any metadata hiccup.
    */
  private def frameDelayCs(r: javax.imageio.ImageReader,
      i: Int): Option[Int] =
    try {
      val fmt = "javax_imageio_gif_image_1.0"
      val md = r.getImageMetadata(i)
      if (md == null || !md.getMetadataFormatNames.contains(fmt)) None
      else {
        val root = md.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
        val gce = root.getElementsByTagName("GraphicControlExtension")
        if (gce.getLength == 0) None
        else Option(gce.item(0).getAttributes.getNamedItem("delayTime"))
          .map(_.getNodeValue.toInt)
      }
    } catch { case _: Exception => None }

  /** Decode the sampled frames of a multi-frame image container
    * (animated GIF through the stock JDK readers): every `everyNth`
    * frame index, its start time in ms (cumulative container delays
    * when present — GIF delayTime is centiseconds — else `frameMs` per
    * frame), and the decoded frame. Frames decode independently, so an
    * "optimized" GIF whose frames are stored as partial patches yields
    * the stored patches (compositing disposal methods is a codec
    * concern out of scope for the sampling verb). None when no
    * registered reader claims the bytes. Memory bound: the SAMPLED
    * frames of one payload at a time.
    */
  private def readSampledFrames(bytes: Array[Byte], everyNth: Int,
      frameMs: Int)
      : Option[IndexedSeq[(Int, Int, java.awt.image.BufferedImage)]] = {
    imageIoInit
    if (bytes.length < 8) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val r = readers.next()
      try {
        r.setInput(iis, false, false)
        val n = r.getNumImages(true)
        if (n < 1) return None
        // start-of-frame times need every PRIOR frame's delay, sampled
        // or not — metadata-only reads, no raster decode
        val startMs = (0 until n).scanLeft(0) { (acc, i) =>
          acc + frameDelayCs(r, i).map(_ * 10).getOrElse(frameMs)
        }
        Some((0 until n by everyNth).map(f => (f, startMs(f), r.read(f))))
      } finally r.dispose()
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** Deterministic PNG re-encode of a decoded frame — each emitted
    * frame is a self-contained decodable payload, so the downstream
    * verbs ([[extractFeatures]], [[withImageDHash]], resize) run their
    * REAL pixel kernels on it.
    */
  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    imageIoInit // the WRITE path honors the same disk-cache flag
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Batched 1-row→N-row frame sampling (the video verb): every
    * `everyNth` frame of the payload is emitted as its own row with
    * (frame_idx, frame_ms, frame payload). This is the row-exploding
    * media transform — the shape that turns a video corpus into a
    * frame corpus for captioning/embedding. Output rows carry all
    * input columns, so downstream operators (dedup, similarity,
    * quality) compose directly on frames.
    *
    * MJPEG AVI payloads (round 10) decode REAL VIDEO frames: the RIFF
    * walk yields each sampled `00dc` chunk's JPEG through the stock
    * decoder with frame times from the container's
    * `dwMicroSecPerFrame` — the one video codec the stock JDK can
    * genuinely decode (see [[readAviFrames]]). Payloads a registered
    * image reader claims (animated GIF through
    * the stock JDK; single-frame images count as one-frame containers)
    * decode REAL frames: frame_ms comes from the container's
    * cumulative per-frame delays when present (`frameMs` per frame
    * otherwise), and each frame re-encodes as a standalone PNG whose
    * pixels feed the downstream verbs' real kernels. Anything else
    * (H.264-family codecs — no stock-JDK decoder exists — and the
    * synthetic text corpus) falls back to slicing
    * `frameBytes` chunks — the deterministic stand-in that keeps mixed
    * corpora total, with frame_ms = frame_idx · frameMs.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, frameBytes: Int,
      everyNth: Int, frameMs: Int = 40): DataFrame = {
    require(frameBytes > 0 && everyNth > 0, "need positive frame params")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_ms", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    // per-row streaming (no grouped() batching): batching would only
    // pin DecodeBatchSize full payloads (potentially large media
    // blobs) in memory per chunk; the decode path bounds itself to one
    // payload's sampled frames at a time
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = payloadBytes(row, payloadIdx)
        readAviFrames(bytes, everyNth)
          // MJPEG chunks ship verbatim (already standalone JPEGs);
          // reader-claimed containers (GIF frames composite on prior
          // frames) still re-encode their decoded rasters to PNG
          .map(_.iterator.map { case (f, ms, jpeg) =>
            Row.fromSeq(row.toSeq ++ Seq(f, ms, jpeg))
          })
          .orElse(readSampledFrames(bytes, everyNth, frameMs)
            .map(_.iterator.map { case (f, ms, img) =>
              Row.fromSeq(row.toSeq ++ Seq(f, ms, encodePng(img)))
            })) match {
          case Some(frames) => frames
          case None =>
            val nFrames = (bytes.length + frameBytes - 1) / frameBytes
            (0 until nFrames by everyNth).iterator.map { f =>
              val frame = java.util.Arrays.copyOfRange(bytes,
                f * frameBytes,
                math.min((f + 1) * frameBytes, bytes.length))
              Row.fromSeq(row.toSeq ++ Seq(f, f * frameMs, frame))
            }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Difference-hash kernel: decodable images reduce to a 9×8 grayscale
    * grid and emit 64 bits of "left pixel brighter than its right
    * neighbor" — the classic dHash perceptual fingerprint: invariant to
    * scale and (because only the ORDER of neighboring intensities
    * matters) to global brightness/contrast shifts, while any visible
    * re-composition flips many bits. Payloads no reader claims hash
    * with FNV-1a over the raw bytes — still a pure 64-bit function of
    * the payload, so exact byte duplicates collide at Hamming 0 and a
    * mixed corpus fingerprints totally.
    */
  private def dHash(bytes: Array[Byte]): Long =
    readImage(bytes) match {
      case Some(img) =>
        val px = grayGrid(img, 9, 8)
        var h = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (px(y * 9 + x) > px(y * 9 + x + 1))
              h |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        h
      case None =>
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < bytes.length) {
          h ^= bytes(i) & 0xffL
          h *= 0x100000001b3L
          i += 1
        }
        h
    }

  /** Perceptual-fingerprint verb: binary payload → 64-bit `dhash` long
    * column, same per-partition batch shape as [[decodePayloads]]. The
    * output feeds [[graft.operators.Dedup.hammingPairs]] directly —
    * see [[imageNearDupPairs]] for the composed operator.
    */
  def withImageDHash(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("dhash", LongType, nullable = false))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { row =>
          Row.fromSeq(row.toSeq :+ dHash(payloadBytes(row, payloadIdx)))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** MEDIA NEAR-DUP PAIRS: one dHash pass over the payloads, then the
    * shared pigeonhole block-blocking generator
    * ([[graft.operators.Dedup.hammingPairs]]) — so image dedup has
    * exactly the same scale shape as text SimHash dedup: no decode
    * rerun, one bucket-keyed shuffle with per-bucket caps, exact
    * Hamming verification of every candidate. Output (id1, id2,
    * hamming) with id1 < id2.
    *
    * At 100 TB this is THE image-dedup entry point: the quadratic
    * pixel-compare never exists; re-encoded / resized / brightness-
    * shifted copies land within a few bits of each other and surface
    * here, while [[extractFeatures]] + cosine LSH covers the softer
    * "same scene" regime.
    */
  def imageNearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
      maxDist: Int = 3, blocks: Int = 4): DataFrame =
    graft.operators.Dedup.hammingPairs(
      withImageDHash(df, payloadCol), idCol, "dhash", maxDist, blocks)

  // ---------------------------------------------------------------- audio

  val audioSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("silence_ratio", DoubleType, nullable = false),
    StructField("is_audio", BooleanType, nullable = false)))

  /** Parse `bytes` as an audio container via the stock JDK sound API
    * (`javax.sound.sampled` — WAV/AIFF/AU, no added dependency),
    * returning (rate, channels, bits, interleaved int samples). None
    * when the bytes are not decodable audio. 8-bit and 16-bit integer
    * PCM are materialized (16-bit honoring the container's endianness);
    * other depths decode the header only (samples empty) — enough for
    * duration metadata, with amplitude stats zeroed.
    */
  /** The JDK's audio SPI providers, resolved ONCE per JVM:
    * `AudioSystem.getAudioInputStream` re-runs a SYNCHRONIZED
    * provider scan on every call (JDK13Services holds a global lock),
    * which serializes a 32-thread decode stage to ~2 effective cores —
    * measured par 1.75 on the x71 sf1 trend row before this cache.
    * The readers themselves (WAV/AIFF/AU) are stateless parsers, so
    * sharing the resolved instances across tasks is safe.
    */
  private lazy val audioReaders
      : Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader],
      classOf[javax.sound.sampled.spi.AudioFileReader].getClassLoader)
      .iterator().asScala.toSeq
    // two more lock dodges, both measured on the x71 sf1 trend row
    // (decode stage serialized to ~1 effective core WITH the provider
    // cache — this pass took it to real parallelism):
    //  1. the JDK's SoftMidiAudioFileReader is a MIDI RENDERER, not a
    //     PCM container parser, and its reject path runs MidiSystem
    //     provider lookups through the same JDK13Services GLOBAL LOCK
    //     the cache exists to avoid — every row paid it before
    //     reaching WaveFileReader. MIDI is not a container this
    //     operator decodes; drop the reader.
    //  2. WAV is the overwhelmingly common container — probe Wave*
    //     readers first so the hot path never pays Aiff/Au reject
    //     exceptions.
    val kept = all.filterNot(
      _.getClass.getSimpleName.contains("SoftMidi"))
    val (wav, rest) = kept.partition(
      _.getClass.getSimpleName.startsWith("Wave"))
    wav ++ rest
  }

  private def openAudio(bytes: Array[Byte])
      : javax.sound.sampled.AudioInputStream = {
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      try return r.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
    }
    // no provider claimed it (or none were discoverable in this
    // classloader) — the stock entry point decides, with its lock
    javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
  }

  private def readAudio(bytes: Array[Byte])
      : Option[(Int, Int, Int, Array[Int])] = {
    if (bytes.length < 12) return None
    try {
      val in = openAudio(bytes)
      try {
        val f = in.getFormat
        val enc = f.getEncoding
        val signed =
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned =
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        if (!signed && !unsigned) return None
        val data = in.readAllBytes()
        val bits = f.getSampleSizeInBits
        val samples: Array[Int] =
          if (bits == 16) {
            val n = data.length / 2
            val out = new Array[Int](n)
            var i = 0
            while (i < n) {
              val (lo, hi) =
                if (f.isBigEndian) (data(2 * i + 1), data(2 * i))
                else (data(2 * i), data(2 * i + 1))
              out(i) = (hi.toInt << 8) | (lo & 0xff)
              i += 1
            }
            out
          } else if (bits == 8) {
            data.map(b => if (unsigned) (b & 0xff) - 128 else b.toInt)
          } else Array.emptyIntArray
        Some((f.getSampleRate.toInt, f.getChannels, bits, samples))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  /** Batch audio kernel: REAL decode for audio payloads (true rate /
    * channel / depth, amplitude stats over the PCM samples — peak,
    * RMS, exact-zero silence ratio); non-audio payloads synthesize
    * deterministic metadata from the byte length (the same totality
    * contract as [[decodePayloads]]).
    */
  private def audioBatch(batch: Seq[Array[Byte]]): Seq[Row] =
    batch.map { bytes =>
      readAudio(bytes) match {
        case Some((rate, channels, bits, samples)) =>
          val frames =
            if (channels > 0) samples.length.toLong / channels
            else samples.length.toLong
          val durMs = if (rate > 0) frames * 1000L / rate else 0L
          var peak = 0
          var sumSq = 0.0
          var zeros = 0L
          var i = 0
          while (i < samples.length) {
            val a = math.abs(samples(i))
            if (a > peak) peak = a
            sumSq += samples(i).toDouble * samples(i)
            if (samples(i) == 0) zeros += 1
            i += 1
          }
          val rms =
            if (samples.isEmpty) 0.0
            else math.sqrt(sumSq / samples.length)
          val silence =
            if (samples.isEmpty) 1.0 else zeros.toDouble / samples.length
          Row(rate, channels, bits, frames, durMs, peak, rms, silence,
            true)
        case None =>
          val n = bytes.length
          Row(16000, 1, 16, n.toLong, n.toLong * 1000 / 16000, 0, 0.0,
            1.0, false)
      }
    }

  /** Batched per-partition audio decode — appends an `audio` struct
    * ([[audioSchema]]) per row; same execution shape as
    * [[decodePayloads]] (constant memory, no shuffle, single plan
    * node).
    */
  def decodeAudio(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("audio", audioSchema, nullable = false))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        val decoded = audioBatch(batch.map(payloadBytes(_, payloadIdx)))
        batch.lazyZip(decoded).map { case (row, a) =>
          Row.fromSeq(row.toSeq :+ a)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  val videoSchema: StructType = StructType(Seq(
    StructField("container", StringType, nullable = false),
    StructField("brand", StringType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Parse an ISO base-media-file-format (MP4, ISO 14496-12) container's
    * METADATA — brand, movie duration, track count, presentation size —
    * by walking the box tree (`ftyp`, `moov`/`mvhd`, `trak`/`tkhd`,
    * 32- and 64-bit box sizes, mvhd/tkhd versions 0 and 1). This is a
    * REAL parse of the container the stock JDK can't decode frames
    * from: codec work (H.264 etc.) stays the documented stub, but
    * duration/resolution/track filtering — the curation decisions a
    * video corpus actually makes before spending GPU decode — run on
    * true container values. Returns None for non-BMFF bytes; malformed
    * boxes degrade to None, never an error (the crawl totality
    * contract).
    */
  private[multimodal] def readMp4Meta(bytes: Array[Byte])
      : Option[(String, Long, Int, Int, Int)] = {
    def u32(p: Int): Long =
      ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
    def u64(p: Int): Long = (u32(p) << 32) | u32(p + 4)
    def fourcc(p: Int): String =
      new String(bytes, p, 4, "US-ASCII")
    // walk the boxes in [from, to); returns (header size, body bounds)
    // per box via the callback
    def walk(from: Long, to: Long)(f: (String, Long, Long) => Unit): Boolean = {
      var p = from
      while (p + 8 <= to) {
        val size0 = u32(p.toInt)
        val typ = fourcc(p.toInt + 4)
        val (size, hdr) =
          if (size0 == 1L) {
            if (p + 16 > to) return false
            (u64(p.toInt + 8), 16L)
          } else if (size0 == 0L) (to - p, 8L)
          else (size0, 8L)
        if (size < hdr || p + size > to) return false
        f(typ, p + hdr, p + size)
        p += size
      }
      p == to
    }
    try {
      if (bytes.length < 16) return None
      if (fourcc(4) != "ftyp") return None
      var brand = ""
      var durationMs = -1L
      var nTracks = 0
      var width = 0
      var height = 0
      val ok = walk(0L, bytes.length.toLong) { (typ, bFrom, bTo) =>
        typ match {
          case "ftyp" if bTo - bFrom >= 4 =>
            brand = fourcc(bFrom.toInt)
          case "moov" =>
            walk(bFrom, bTo) { (t2, cFrom, cTo) =>
              t2 match {
                case "mvhd" if cTo - cFrom >= 20 =>
                  val v = bytes(cFrom.toInt) & 0xff
                  val (ts, dur) =
                    if (v == 1 && cTo - cFrom >= 28)
                      (u32(cFrom.toInt + 20), u64(cFrom.toInt + 24))
                    else (u32(cFrom.toInt + 12), u32(cFrom.toInt + 16))
                  if (ts > 0) durationMs = dur * 1000L / ts
                case "trak" =>
                  nTracks += 1
                  walk(cFrom, cTo) { (t3, dFrom, dTo) =>
                    if (t3 == "tkhd" && dTo - dFrom >= 84) {
                      val v = bytes(dFrom.toInt) & 0xff
                      val wOff = if (v == 1) 88 else 76
                      if (dTo - dFrom >= wOff + 8) {
                        val w = (u32(dFrom.toInt + wOff) >> 16).toInt
                        val h = (u32(dFrom.toInt + wOff + 4) >> 16).toInt
                        // first track with a real presentation size wins
                        // (audio tracks carry 0×0)
                        if (width == 0 && w > 0) { width = w; height = h }
                      }
                    }
                  }
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      if (!ok || durationMs < 0) None
      else Some((brand, durationMs, nTracks, width, height))
    } catch {
      case _: IndexOutOfBoundsException => None
    }
  }

  /** Batched per-partition video-container metadata — appends a `video`
    * struct ([[videoSchema]]) per row; same execution shape as
    * [[decodePayloads]]. Non-BMFF payloads report the deterministic
    * byte-length fallback (`container = "unknown"`), keeping mixed
    * corpora total.
    */
  def videoMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("video", videoSchema, nullable = false))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = payloadBytes(row, payloadIdx)
          val v = readMp4Meta(bytes) match {
            case Some((brand, durMs, nTracks, w, h)) =>
              Row("mp4", brand, durMs, nTracks, w, h)
            case None =>
              Row("unknown", "", bytes.length.toLong, 0, 0, 0)
          }
          Row.fromSeq(row.toSeq :+ v)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Serialize a minimal valid MP4 (ftyp + moov(mvhd, trak(tkhd)...))
    * — the fixture/re-shard writer twin of [[videoMeta]],
    * deterministic for identical inputs. Tracks are (width, height)
    * pairs; zero-sized tracks model audio.
    */
  def mp4Bytes(brand: String, timescale: Long, duration: Long,
      tracks: Seq[(Int, Int)]): Array[Byte] = {
    require(brand.length == 4, "brand must be a 4cc")
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(8 + body.length)
      buf.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      buf.array()
    }
    val ftyp = box("ftyp",
      (brand + "    " + brand).getBytes("US-ASCII"))
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0) // version 0 + flags
      b.putInt(0).putInt(0) // creation, modification
      b.putInt(timescale.toInt).putInt(duration.toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      b.putLong(0) // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(tracks.length + 1) // next track id
      box("mvhd", b.array())
    }
    val traks = tracks.zipWithIndex.map { case ((w, h), i) =>
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(7) // version 0, flags: enabled|in_movie|in_preview
      b.putInt(0).putInt(0) // creation, modification
      b.putInt(i + 1).putInt(0) // track id, reserved
      b.putInt(duration.toInt)
      b.putLong(0) // reserved
      b.putShort(0).putShort(0).putShort(0).putShort(0)
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)
      b.putInt(w << 16).putInt(h << 16)
      box("trak", box("tkhd", b.array()))
    }
    val moov = box("moov", (mvhd +: traks).reduce(_ ++ _))
    ftyp ++ moov
  }

  /** Deterministic MP4 payload generator for fixtures and the x80
    * oracle: per id, timescale 1000 with duration `1500 + (id % 11)·250`
    * (so duration_ms = duration exactly), `1 + id % 2` tracks — the
    * first `(320 + (id % 5)·16) × (240 + (id % 3)·16)` video, the
    * optional second a 0×0 audio track — so every metadata field
    * [[videoMeta]] reports is CLOSED-FORM in the id.
    */
  def attachMp4Payload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        val w = (320 + (id % 5) * 16).toInt
        val h = (240 + (id % 3) * 16).toInt
        val tracks =
          if (id % 2 == 1) Seq((w, h), (0, 0)) else Seq((w, h))
        val bytes = mp4Bytes("isom", 1000L, 1500 + (id % 11) * 250, tracks)
        Row.fromSeq(row.toSeq :+ bytes)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Serialize 16-bit mono PCM to a canonical 44-byte-header WAV —
    * the fixture/re-shard writer twin of [[decodeAudio]], deterministic
    * for identical samples.
    */
  def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Deterministic WAV payload generator for fixtures and the x71
    * oracle: per id, a 16 kHz mono 16-bit square wave of amplitude
    * `(id % 1000)·16` and length `1600 + (id % 7)·800` samples
    * (period 16, half-period aligned lengths) — every statistic
    * [[decodeAudio]] reports is then CLOSED-FORM in the id (RMS of a
    * ±A square wave is exactly A; the lengths divide evenly by both
    * the period and the 16 kHz→ms conversion), so an SQL oracle can
    * state the full decode output from first principles and any bug
    * anywhere in the WAV write → JDK parse → PCM reconstruction →
    * stats chain breaks the hash compare.
    */
  def attachWavPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        val amp = ((id % 1000) * 16).toShort
        val n = (1600 + (id % 7) * 800).toInt
        val samples = Array.tabulate(n)(i =>
          if (i % 16 < 8) amp else (-amp).toShort)
        Row.fromSeq(row.toSeq :+ wavBytes(samples, 16000))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  // ---- MJPEG-in-AVI: REAL video frame decode (round 10) -------------
  //
  // The one video codec the stock JDK can genuinely decode: MJPEG
  // stores each frame as an independent JPEG inside the RIFF/AVI
  // container (public spec: Microsoft AVI RIFF + OpenDML), and
  // javax.imageio decodes JPEG. This closes the video-frame-decode
  // stub for the MJPEG case with the same honesty contract as the
  // rest of the family: H.264/VP9/AV1 payloads still take the
  // deterministic byte-slice fallback (no stock-JDK codec exists for
  // them), and a real deployment swaps in a hardware decoder behind
  // the same sampleFrames contract.

  /** Walk an AVI's RIFF tree and copy ONLY the `everyNth`-strided
    * `##dc`/`##db` video chunks — the stride applies DURING the movi
    * walk, so a 1-in-30 frame sample copies 1/30th of the payload
    * (non-sampled chunks are skipped over, never allocated; each
    * element of the returned seq is exactly one copyOfRange —
    * spec-asserted on chunk counts). Returns (µs per frame, sampled
    * (original chunk index, JPEG bytes)); None for non-AVI bytes or a
    * hostile/corrupt size field. Chunk 0 is always on the stride, so
    * "no video chunks at all" ⇔ empty result.
    */
  private[graft] def aviSampledChunks(bytes: Array[Byte], everyNth: Int)
      : Option[(Long, IndexedSeq[(Int, Array[Byte])])] = {
    if (bytes.length < 12 ||
        bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F' || bytes(8) != 'A' || bytes(9) != 'V' ||
        bytes(10) != 'I' || bytes(11) != ' ') return None
    try {
      def le32(off: Int): Long =
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) |
          ((bytes(off + 3) & 0xffL) << 24)
      def fcc(off: Int): String = new String(bytes, off, 4, "ISO-8859-1")
      var usPerFrame = 40000L // 25 fps default when avih is absent
      val sampled = IndexedSeq.newBuilder[(Int, Array[Byte])]
      var vidIdx = 0 // video chunks SEEN (sampled or not)
      var p = 12
      while (p + 8 <= bytes.length) {
        val id = fcc(p)
        val sz = le32(p + 4).toInt
        // a hostile/corrupt size field (top bit set → negative toInt)
        // could zero or reverse the step — malformed, take the
        // fallback rather than spinning
        if (sz < 0) return None
        if (id == "LIST" && p + 12 <= bytes.length) {
          val listEnd = math.min(p + 8 + sz, bytes.length)
          fcc(p + 8) match {
            case "hdrl" =>
              var q = p + 12
              while (q + 8 <= listEnd) {
                val csz = le32(q + 4).toInt
                if (csz < 0) return None
                if (fcc(q) == "avih" && csz >= 4 && le32(q + 8) > 0)
                  usPerFrame = le32(q + 8)
                q += 8 + csz + (csz & 1)
              }
            case "movi" =>
              var q = p + 12
              while (q + 8 <= listEnd) {
                val cid = fcc(q)
                val csz = le32(q + 4).toInt
                if (csz < 0) return None
                if ((cid.endsWith("dc") || cid.endsWith("db")) &&
                    csz > 0 && q + 8 + csz <= bytes.length) {
                  if (vidIdx % everyNth == 0)
                    sampled += ((vidIdx, java.util.Arrays.copyOfRange(
                      bytes, q + 8, q + 8 + csz)))
                  vidIdx += 1
                }
                q += 8 + csz + (csz & 1)
              }
            case _ => ()
          }
        }
        p += 8 + sz + (sz & 1)
      }
      Some((usPerFrame, sampled.result()))
    } catch { case _: Exception => None }
  }

  /** Parse an MJPEG AVI: cumulative frame times from the avih
    * `dwMicroSecPerFrame` and every sampled `##dc`/`##db` chunk's JPEG
    * decoded via the stock reader. None for non-AVI bytes, AVIs with
    * no video chunks, or any non-JPEG frame payload (an AVI carrying a
    * codec the JDK lacks degrades to the byte-slice fallback rather
    * than erroring — totality over mixed corpora). Memory bound: one
    * payload's SAMPLED frames at a time — the `everyNth` stride is
    * honored during the container walk ([[aviSampledChunks]]), not
    * after, so non-sampled frames are never copied.
    */
  /** Sampled MJPEG frames as (frame_idx, frame_ms, jpeg bytes). Every
    * sampled chunk is FULLY decoded for validation (a corrupt or
    * non-JPEG chunk routes the whole payload to the slicing fallback,
    * as before), but the emitted frame payload is the chunk's own JPEG
    * bytes VERBATIM — each chunk is already a standalone decodable
    * image, so re-encoding the decoded raster to PNG only burned one
    * deflate per frame (measured: the dominant per-frame cost of the
    * video path) without changing downstream pixels: decoding the
    * emitted JPEG yields exactly the raster the PNG round-trip carried.
    */
  private def readAviFrames(bytes: Array[Byte], everyNth: Int)
      : Option[IndexedSeq[(Int, Int, Array[Byte])]] = {
    // without this, the FIRST decode path to run in an executor JVM
    // would route every per-frame ImageInputStream through ImageIO's
    // DISK cache (a temp file created and deleted per frame — syscall
    // work that scales with frames × threads, not pixels)
    imageIoInit
    aviSampledChunks(bytes, everyNth).flatMap { case (usPerFrame, chunks) =>
      if (chunks.isEmpty) None
      else try {
        val stepMs = (usPerFrame / 1000L).toInt
        val out = IndexedSeq.newBuilder[(Int, Int, Array[Byte])]
        var j = 0
        var bad = false
        while (j < chunks.length && !bad) {
          val (i, jpeg) = chunks(j)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(jpeg))
          if (img == null) bad = true // non-JPEG codec → fallback path
          else out += ((i, i * stepMs, jpeg))
          j += 1
        }
        if (bad) None else Some(out.result())
      } catch { case _: Exception => None } // corrupt JPEG → fallback
    }
  }

  /** Serialize frames as an MJPEG AVI (RIFF `AVI ` → LIST hdrl
    * (avih + LIST strl (strh `vids`/`MJPG` + strf BITMAPINFOHEADER))
    * → LIST movi with one `00dc` JPEG chunk per frame) — the
    * fixture/re-shard writer twin of the AVI branch in
    * [[sampleFrames]]; deterministic for identical frames (ImageIO's
    * JPEG writer at default quality is a pure function of the raster
    * within one JDK build).
    */
  def aviMjpegBytes(frames: Seq[java.awt.image.BufferedImage],
      usPerFrame: Long): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(usPerFrame > 0, s"usPerFrame must be positive: $usPerFrame")
    imageIoInit // keep the fixture writer off the per-frame disk cache
    val jpegs = frames.map { img =>
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", b)
      b.toByteArray
    }
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val maxJpeg = jpegs.map(_.length).max
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def s(x: String): Array[Byte] = x.getBytes("ISO-8859-1")
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte)
        else Array.empty[Byte]
      s(id) ++ le32(data.length) ++ data ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      s("LIST") ++ le32(body.length + 4) ++ s(kind) ++ body
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(maxJpeg) ++
      le32(w) ++ le32(h) ++ new Array[Byte](16)
    val strh = s("vids") ++ s("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(usPerFrame) ++ le32(1000000L) ++ le32(0) ++
      le32(frames.length) ++ le32(maxJpeg) ++ le32(0xffffffffL) ++
      le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      s("MJPG") ++ le32(w.toLong * h * 3) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val body = s("AVI ") ++ hdrl ++ movi
    s("RIFF") ++ le32(body.length) ++ body
  }

  /** Deterministic MJPEG-AVI payload generator for fixtures and the
    * x84 oracle: per id, `2 + id % 3` solid-color frames of size
    * `(32 + (id % 5)·16) × (24 + (id % 3)·16)` at
    * `(20 + (id % 4)·10)` ms per frame — frame count, every frame
    * time, and the decoded dimensions are all CLOSED-FORM in the id,
    * so an SQL oracle states the full container-write → RIFF-walk →
    * JPEG-decode chain from first principles.
    */
  def attachAviPayload(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("payload", BinaryType, nullable = false))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        val n = (2 + id % 3).toInt
        val w = (32 + (id % 5) * 16).toInt
        val h = (24 + (id % 3) * 16).toInt
        val frames = (0 until n).map { f =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val g = img.createGraphics()
          try {
            g.setColor(new java.awt.Color(
              ((id * 37 + f * 11) % 256).toInt,
              ((id * 53 + f * 29) % 256).toInt,
              ((id * 71 + f * 47) % 256).toInt))
            g.fillRect(0, 0, w, h)
          } finally g.dispose()
          img
        }
        val usPerFrame = (20L + (id % 4) * 10L) * 1000L
        Row.fromSeq(row.toSeq :+ aviMjpegBytes(frames, usPerFrame))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
