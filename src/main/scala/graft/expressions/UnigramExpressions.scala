package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DecimalType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** DecimalType → fixed-width ORDER-PRESERVING binary: the unscaled
  * value as big-endian two's complement sign-extended to the
  * precision's byte width, sign bit flipped — so UNSIGNED
  * lexicographic byte order (Spark's BinaryType ordering, and the
  * [[graft.functions.Aggregators.TopKRowsBin]] buffer's) equals
  * numeric order for a column's shared scale. [[SortKeyDecimal]] is
  * the exact inverse; round-trip is bit-identical (spec-asserted).
  * This is what lets DECIMAL neighbor ids ride the bounded top-k
  * buffer instead of falling back to a per-query ranking window.
  */
case class DecimalSortKey(child: Expression, precision: Int,
    scale: Int) extends UnaryKernelCodegen {
  require(precision >= 1 && scale >= 0 && scale <= precision,
    s"bad decimal shape ($precision, $scale)")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_decimal_sort_key"

  @transient private[graft] lazy val width: Int =
    java.math.BigInteger.TEN.pow(precision).toByteArray.length

  override def kernel(input: Any): Any = {
    val unscaled = input.asInstanceOf[Decimal]
      .toJavaBigDecimal.unscaledValue()
    val raw = unscaled.toByteArray // minimal two's complement, BE
    val out = new Array[Byte](width)
    // sign-extend to the fixed width
    val fill: Byte = if (unscaled.signum() < 0) -1 else 0
    java.util.Arrays.fill(out, 0, width - raw.length, fill)
    System.arraycopy(raw, 0, out, width - raw.length, raw.length)
    out(0) = (out(0) ^ 0x80).toByte // flip the sign bit
    out
  }

  override protected def withNewChildInternal(
      newChild: Expression): DecimalSortKey = copy(child = newChild)
}

/** Double → order-preserving SIGNED long: IEEE-754 bits with all
  * non-sign bits flipped for negatives — signed-long order equals
  * Spark's double ordering, including NaN greatest (the canonical
  * NaN bit pattern sits above +Infinity). −0.0 CANONICALIZES to +0.0
  * before encoding: Spark's comparison ties them, so the bounded
  * buffer's byte-exact tie-break needs one representative — the
  * decode returns +0.0 for both, the only (documented) non-identity
  * of the round trip. This is what lifts DOUBLE neighbor ids off the
  * per-query ranking-window fallback. [[SortKeyDouble]] inverts.
  */
case class DoubleSortKey(child: Expression)
    extends UnaryKernelCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_double_sort_key"

  override def kernel(input: Any): Any = {
    val d0 = input.asInstanceOf[Double]
    val d = if (d0 == 0.0) 0.0 else d0
    val bits = java.lang.Double.doubleToLongBits(d)
    java.lang.Long.valueOf(
      if (bits >= 0L) bits else bits ^ java.lang.Long.MAX_VALUE)
  }

  override protected def withNewChildInternal(
      newChild: Expression): DoubleSortKey = copy(child = newChild)
}

/** The inverse of [[DoubleSortKey]] (−0.0 comes back as the
  * canonical +0.0 — see the encoder doc).
  */
case class SortKeyDouble(child: Expression)
    extends UnaryKernelCodegen {
  override def dataType: DataType =
    org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_sort_key_double"

  override def kernel(input: Any): Any = {
    val k = input.asInstanceOf[Long]
    java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(
      if (k >= 0L) k else k ^ java.lang.Long.MAX_VALUE))
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortKeyDouble = copy(child = newChild)
}

/** [[DoubleSortKey]] for floats: the int-bits encoding widened to
  * long (widening preserves signed order). [[SortKeyFloat]] inverts.
  */
case class FloatSortKey(child: Expression)
    extends UnaryKernelCodegen {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_float_sort_key"

  override def kernel(input: Any): Any = {
    val f0 = input.asInstanceOf[Float]
    val f = if (f0 == 0.0f) 0.0f else f0
    val bits = java.lang.Float.floatToIntBits(f)
    java.lang.Long.valueOf(
      (if (bits >= 0) bits else bits ^ java.lang.Integer.MAX_VALUE)
        .toLong)
  }

  override protected def withNewChildInternal(
      newChild: Expression): FloatSortKey = copy(child = newChild)
}

/** The inverse of [[FloatSortKey]]. */
case class SortKeyFloat(child: Expression)
    extends UnaryKernelCodegen {
  override def dataType: DataType =
    org.apache.spark.sql.types.FloatType
  override def prettyName: String = "graft_sort_key_float"

  override def kernel(input: Any): Any = {
    val k = input.asInstanceOf[Long].toInt
    java.lang.Float.valueOf(java.lang.Float.intBitsToFloat(
      if (k >= 0) k else k ^ java.lang.Integer.MAX_VALUE))
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortKeyFloat = copy(child = newChild)
}

/** The exact inverse of [[DecimalSortKey]]. */
case class SortKeyDecimal(child: Expression, precision: Int,
    scale: Int) extends UnaryKernelCodegen {
  override def dataType: DataType = DecimalType(precision, scale)
  override def prettyName: String = "graft_sort_key_decimal"

  override def kernel(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]].clone()
    bytes(0) = (bytes(0) ^ 0x80).toByte
    Decimal(new java.math.BigDecimal(
      new java.math.BigInteger(bytes), scale), precision, scale)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortKeyDecimal = copy(child = newChild)
}

/** Unigram (sentencepiece-class) ENCODE as a compiled map-side kernel
  * — the Llama-family half of the tokenizer surface, beside the
  * byte-BPE [[BpeEncodeTokens]]: text → token ids by VITERBI maximum-
  * likelihood segmentation over a scored piece vocabulary (the public
  * sentencepiece / HF `tokenizers` Unigram algorithm: each piece
  * carries a log-probability; the best segmentation maximizes the
  * sum; unknown spans cost `min_score − 10.0` per code point — the
  * published kUnkPenalty).
  *
  * Semantics pinned here, all spec-asserted:
  *  - NORMALIZERS run inside the kernel, in file order: `Prepend`
  *    (Llama's "▁") then literal `Replace` (Llama's " " → "▁") —
  *    exactly the two the sentencepiece-conversion lineage uses.
  *    (NFC, when the file carries it, is applied UPSTREAM through the
  *    engine's compiled x89 kernel — see
  *    [[graft.operators.Unigram.encodeIds]].)
  *  - The LATTICE runs over the whole normalized string when the
  *    file has no pre-tokenizer (the Llama lineage), or per
  *    PRE-TOKEN under a `Metaspace` pre-tokenizer (the T5 lineage):
  *    Metaspace rewrites " " to its replacement, prepends one per
  *    its scheme (never double-prepending), and with `split` cuts
  *    the string BEFORE every replacement occurrence (merged-with-
  *    next), each segment encoding independently — a piece can never
  *    span a pre-token boundary, and unknown fusing stays within a
  *    segment. Positions advance by code point, and the unknown edge
  *    spans one code point. A real piece strictly outscores the
  *    unknown edge by construction (`unk = min − 10`), so offering
  *    the edge at every position equals sentencepiece's
  *    only-when-no-single-char rule.
  *  - TIES (impossible in EM-trained artifacts — scores are distinct
  *    log-probs — but the order must be total): the relaxation keeps
  *    the FIRST winner under a strict `>`, scanning starts ascending,
  *    so the piece starting EARLIEST (the longest at that end) wins,
  *    deterministically.
  *  - CONSECUTIVE UNKNOWN code points FUSE into one span when the
  *    model defines an unk id (the HF rule: `fuse_unk ⇔ unk_id`
  *    present; serialization carries no separate flag).
  *  - BYTE FALLBACK: an unknown span resolves to its UTF-8 bytes'
  *    `<0xNN>` pieces when the model declares `byte_fallback` and ALL
  *    those pieces exist; otherwise the span falls to `unk_id`; a
  *    model with NEITHER path fails LOUDLY naming the span — never a
  *    silently dropped character.
  *
  * Scale shape: pure projection — zero shuffles, whole-stage codegen
  * via [[UnaryKernelCodegen]], O(len · maxPieceLen) hash probes per
  * row bounded by a first-char gate. Token ids are the piece's INDEX
  * in the vocab array (the Unigram convention).
  */
case class UnigramEncodeIds(child: Expression,
    pieces: Seq[(String, Double)], unkId: Int, byteFallback: Boolean,
    norms: Seq[(String, String, String)],
    metaspace: Option[(String, Boolean, String)] = None)
    extends UnaryKernelCodegen {

  require(pieces.nonEmpty, "unigram vocab must be non-empty")
  require(unkId < pieces.length,
    s"unk_id $unkId outside the ${pieces.length}-piece vocab")
  metaspace.foreach { case (repl, _, scheme) =>
    require(repl.nonEmpty, "metaspace replacement must be non-empty")
    require(scheme == "always" || scheme == "first" ||
      scheme == "never", s"unknown metaspace prepend scheme '$scheme'")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_unigram_encode"

  @transient private lazy val matcher =
    new UnigramMatcher(pieces, unkId, byteFallback, norms, metaspace)

  override def kernel(input: Any): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    matcher.encode(input.asInstanceOf[UTF8String].toString,
      (id, _, _) => out += id)
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramEncodeIds = copy(child = newChild)
}

/** Unigram ENCODE WITH OFFSETS — the [[UnigramEncodeIds]] Viterbi
  * matcher emitting `(id, start, end)` per token, spans in CODE
  * POINTS into the NORMALIZED-AND-REWRITTEN string the lattice runs
  * over (post Prepend/Replace, post Metaspace rewrite — the view
  * span-level consumers of this lineage operate on, and the form a
  * relational oracle can restate: x130). Every byte-fallback token of
  * an unknown span carries the WHOLE span's offsets (the span is the
  * unit the lattice priced; the bytes are its serialization), and a
  * fused unknown carries the fused span. Shares [[UnigramMatcher]] —
  * the ONE lattice implementation — with the id kernel, so the two
  * surfaces cannot disagree on segmentation (additionally
  * spec-asserted id-equal across every lattice fixture). Pure
  * projection: zero shuffles, whole-stage codegen.
  */
case class UnigramEncodeOffsets(child: Expression,
    pieces: Seq[(String, Double)], unkId: Int, byteFallback: Boolean,
    norms: Seq[(String, String, String)],
    metaspace: Option[(String, Boolean, String)] = None)
    extends UnaryKernelCodegen {

  require(pieces.nonEmpty, "unigram vocab must be non-empty")
  require(unkId < pieces.length,
    s"unk_id $unkId outside the ${pieces.length}-piece vocab")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_unigram_encode_offsets"

  @transient private lazy val matcher =
    new UnigramMatcher(pieces, unkId, byteFallback, norms, metaspace)

  override def kernel(input: Any): Any = {
    val toks =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    val t = matcher.encode(input.asInstanceOf[UTF8String].toString,
      (id, s, e) => toks += ((id, s, e)))
    // char index -> code points before it, one pass over the lattice
    // string (the matcher emits CHAR offsets; the surface is CP)
    val cpAt = new Array[Int](t.length + 1)
    var ci = 0; var cc = 0
    while (ci < t.length) {
      cpAt(ci) = cc
      val n = Character.charCount(t.codePointAt(ci))
      var k = 1
      while (k < n) { cpAt(ci + k) = cc; k += 1 }
      ci += n; cc += 1
    }
    cpAt(t.length) = cc
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      val (id, s, e) = toks(i)
      out(i) =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](id, cpAt(s), cpAt(e)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramEncodeOffsets =
    copy(child = newChild)
}

/** The ONE Viterbi lattice implementation behind BOTH Unigram encode
  * kernels ([[UnigramEncodeIds]] / [[UnigramEncodeOffsets]]): the
  * normalizer ops, the Metaspace rewrite/segmentation, the scored
  * lattice with its first-char gate, unknown fusing, and byte
  * fallback — token emission goes through a callback carrying the
  * token id and its CHAR span into the full lattice string, so the
  * id surface and the offsets surface can never drift. Built once
  * per expression instance (`@transient lazy val`), plain vals
  * inside.
  */
private[graft] final class UnigramMatcher(
    pieces: Seq[(String, Double)], unkId: Int, byteFallback: Boolean,
    norms: Seq[(String, String, String)],
    metaspace: Option[(String, Boolean, String)]) {

  private val pieceIdx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.size * 2)
    pieces.zipWithIndex.foreach { case ((p, _), i) =>
      m.put(p, Integer.valueOf(i))
    }
    m
  }
  private val scoreOf: Array[Double] = pieces.map(_._2).toArray
  private val maxLen: Int = pieces.map(_._1.length).max
  private val unkScore: Double = pieces.map(_._2).min - 10.0
  // first-char gate: the longest piece beginning with each char, 0 if
  // none — prunes the inner substring loop at positions no piece
  // starts at
  private val maxLenFrom: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    pieces.foreach { case (p, _) =>
      if (p.nonEmpty) {
        val c = Character.valueOf(p.charAt(0))
        val cur = m.get(c)
        if (cur == null || cur.intValue() < p.length)
          m.put(c, Integer.valueOf(p.length))
      }
    }
    m
  }
  // <0xNN> piece ids, or -1 — the byte-fallback table
  private val byteIds: Array[Int] =
    Array.tabulate(256) { b =>
      val p = pieceIdx.get(f"<0x$b%02X>")
      if (p == null) -1 else p.intValue()
    }

  private def normalize(text: String): String = {
    var t = text
    norms.foreach {
      // the reference lineage (HF Prepend / sentencepiece) no-ops on
      // empty input — encode("") must yield only template ids, never
      // the prepend piece (mirrors the Metaspace t.nonEmpty gate)
      case ("prepend", s, _) => if (t.nonEmpty) t = s + t
      case ("replace", from, to) => t = t.replace(from, to)
      case (k, _, _) => throw new IllegalStateException(
        s"unknown normalizer op '$k' — loader bug")
    }
    t
  }

  /** Encode `text`: `f(id, charStart, charEnd)` per token, spans
    * into the RETURNED full lattice string (normalized + Metaspace-
    * rewritten).
    */
  def encode(text: String, f: (Long, Int, Int) => Unit): String = {
    val t0 = normalize(text)
    metaspace match {
      case None =>
        encodeInto(t0, 0, f)
        t0
      case Some((repl, split, scheme)) =>
        var t = t0.replace(" ", repl)
        if (scheme != "never" && !t.startsWith(repl) && t.nonEmpty)
          t = repl + t
        if (!split) encodeInto(t, 0, f)
        else {
          // merged-with-next: cut BEFORE every replacement occurrence
          var from = 0
          var at = t.indexOf(repl, if (t.startsWith(repl)) repl.length
            else 0)
          while (at >= 0) {
            if (at > from) encodeInto(t.substring(from, at), from, f)
            from = at
            at = t.indexOf(repl, at + repl.length)
          }
          if (from < t.length) encodeInto(t.substring(from), from, f)
        }
        t
    }
  }

  private def encodeInto(t: String, base: Int,
      f: (Long, Int, Int) => Unit): Unit = {
    val n = t.length
    if (n == 0) return
    val NEG = java.lang.Double.NEGATIVE_INFINITY
    val best = new Array[Double](n + 1)
    java.util.Arrays.fill(best, NEG)
    best(0) = 0.0
    val backPos = new Array[Int](n + 1)
    val backPiece = new Array[Int](n + 1) // vocab index, or -1 = unk
    var i = 0
    while (i < n) {
      if (best(i) != NEG) {
        val gate = maxLenFrom.get(Character.valueOf(t.charAt(i)))
        if (gate != null) {
          val maxL = math.min(math.min(maxLen, gate.intValue()), n - i)
          var len = 1
          while (len <= maxL) {
            val pi = pieceIdx.get(t.substring(i, i + len))
            if (pi != null) {
              val sc = best(i) + scoreOf(pi.intValue())
              if (sc > best(i + len)) {
                best(i + len) = sc
                backPos(i + len) = i
                backPiece(i + len) = pi.intValue()
              }
            }
            len += 1
          }
        }
        // the unknown edge: one code point
        val step = Character.charCount(t.codePointAt(i))
        val sc = best(i) + unkScore
        if (sc > best(i + step)) {
          best(i + step) = sc
          backPos(i + step) = i
          backPiece(i + step) = -1
        }
      }
      i += 1
    }
    // backtrack: (start, end, pieceIdx) in reverse
    var spans: List[(Int, Int, Int)] = Nil
    var pos = n
    while (pos > 0) {
      val s = backPos(pos)
      spans = (s, pos, backPiece(pos)) :: spans
      pos = s
    }
    // fuse consecutive unknown code points when an unk id exists
    val fused =
      if (unkId < 0) spans
      else {
        val b = List.newBuilder[(Int, Int, Int)]
        var run: (Int, Int) = null
        spans.foreach { case (s, e, p) =>
          if (p == -1) run = if (run == null) (s, e) else (run._1, e)
          else {
            if (run != null) { b += ((run._1, run._2, -1)); run = null }
            b += ((s, e, p))
          }
        }
        if (run != null) b += ((run._1, run._2, -1))
        b.result()
      }
    fused.foreach { case (s, e, p) =>
      if (p >= 0) f(p.toLong, base + s, base + e)
      else {
        val span = t.substring(s, e)
        var fell = false
        if (byteFallback) {
          val bytes = span.getBytes(
            java.nio.charset.StandardCharsets.UTF_8)
          if (bytes.forall(b => byteIds(b & 0xff) >= 0)) {
            // every byte token carries the WHOLE span's offsets —
            // the span is the unit the lattice priced
            bytes.foreach(b =>
              f(byteIds(b & 0xff).toLong, base + s, base + e))
            fell = true
          }
        }
        if (!fell) {
          if (unkId >= 0) f(unkId.toLong, base + s, base + e)
          else throw new IllegalStateException(
            s"unigram encode cannot represent '$span': no matching " +
              "piece, byte fallback " +
              (if (byteFallback) "incomplete (<0xNN> pieces missing)"
               else "disabled") +
              ", and the model defines no unk_id — refusing to drop " +
              "input silently")
        }
      }
    }
  }
}

/** Every substring of 1..maxLen CODE POINTS, as an array column — the
  * Unigram trainer's seed-candidate enumerator: exploded and
  * count-aggregated DISTRIBUTED (the substring space is combinatorial
  * — words × lengths — and must never ride a driver collect; only the
  * top-N seed survives to the driver). Pure projection.
  */
case class AllSubstrings(child: Expression, maxLen: Int)
    extends UnaryKernelCodegen {
  require(maxLen >= 1, s"maxLen must be >= 1: $maxLen")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_all_substrings"

  override def kernel(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < w.length) {
      var end = i
      var len = 0
      while (end < w.length && len < maxLen) {
        end += Character.charCount(w.codePointAt(end))
        len += 1
        out += UTF8String.fromString(w.substring(i, end))
      }
      i += Character.charCount(w.codePointAt(i))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): AllSubstrings = copy(child = newChild)
}

/** The shared per-word EM core — the forward–backward posterior pass
  * ONE implementation feeds: the driver E-step
  * ([[graft.operators.Unigram.emStep]]) and the distributed E-step
  * kernel ([[UnigramEStep]]), so the two homes compute identical
  * per-word expectations by construction.
  */
private[graft] object UnigramEm {

  private val NEG = Double.NegativeInfinity

  private def lse(a: Double, b: Double): Double =
    if (a == NEG) b else if (b == NEG) a
    else if (a > b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** Forward–backward over one word: `acc(pieceIdx, posteriorMass)`
    * fires once per reachable lattice edge (mass for ONE occurrence
    * of the word — the caller applies its weight); returns the
    * word's log-likelihood Z. Refuses an unreachable word loudly
    * (the required-singles invariant).
    */
  def wordExpected(w: String,
      idx: java.util.HashMap[String, Integer], logp: Array[Double],
      maxPieceLen: Int, acc: (Int, Double) => Unit): Double = {
    val nn = w.length
    val alpha = Array.fill(nn + 1)(NEG); alpha(0) = 0.0
    val beta = Array.fill(nn + 1)(NEG); beta(nn) = 0.0
    var i = 0
    while (i < nn) {
      if (alpha(i) != NEG) {
        var end = i; var len = 0
        while (end < nn && len < maxPieceLen) {
          end += Character.charCount(w.codePointAt(end)); len += 1
          val pi = idx.get(w.substring(i, end))
          if (pi != null)
            alpha(end) = lse(alpha(end), alpha(i) + logp(pi.intValue()))
        }
      }
      i += Character.charCount(w.codePointAt(i))
    }
    require(alpha(nn) != NEG,
      s"EM lattice unreachable for '$w' — the required single-" +
        "code-point pieces are missing; trainer invariant broken")
    var j = nn
    while (j > 0) {
      val prev = w.offsetByCodePoints(j, -1)
      var end = prev; var len = 0
      while (end < nn && len < maxPieceLen) {
        end += Character.charCount(w.codePointAt(end)); len += 1
        val pi = idx.get(w.substring(prev, end))
        if (pi != null && beta(end) != NEG)
          beta(prev) = lse(beta(prev), logp(pi.intValue()) + beta(end))
      }
      j = prev
    }
    val z = alpha(nn)
    i = 0
    while (i < nn) {
      if (alpha(i) != NEG) {
        var end = i; var len = 0
        while (end < nn && len < maxPieceLen) {
          end += Character.charCount(w.codePointAt(end)); len += 1
          val pi = idx.get(w.substring(i, end))
          if (pi != null && beta(end) != NEG)
            acc(pi.intValue(),
              math.exp(alpha(i) + logp(pi.intValue()) + beta(end) - z))
        }
      }
      i += Character.charCount(w.codePointAt(i))
    }
    z
  }
}

/** The DISTRIBUTED E-step kernel: one word → its sparse expected
  * piece counts as `array<struct<id int, e double>>` (one occurrence's
  * posterior mass — the caller multiplies by the word's weight and
  * sum-aggregates), with a final sentinel entry `(-1, Z)` carrying
  * the word's log-likelihood. Runs the SAME [[UnigramEm]] core as the
  * driver E-step. This is what lets [[graft.operators.Unigram.train]]
  * scale past `maxDriverWords`: the histogram never leaves the
  * cluster; each EM iteration is one explode + vocab-sized aggregate.
  * Pure projection, whole-stage codegen.
  */
case class UnigramEStep(child: Expression, pieces: Seq[String],
    logp: Seq[Double], maxPieceLen: Int) extends UnaryKernelCodegen {

  require(pieces.nonEmpty, "EM vocabulary must be non-empty")
  require(pieces.length == logp.length,
    s"${pieces.length} pieces vs ${logp.length} scores")
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("e",
        org.apache.spark.sql.types.DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_unigram_estep"

  @transient private lazy val idx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pieces.size * 2)
    pieces.zipWithIndex.foreach { case (p, i) =>
      m.put(p, Integer.valueOf(i)) }
    m
  }
  @transient private lazy val lp: Array[Double] = logp.toArray

  override def kernel(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    // dense per-word accumulation (a word rarely touches more than a
    // handful of pieces, but edges repeat — fuse before emitting)
    val touched = new java.util.LinkedHashMap[Integer, java.lang.Double]()
    val z = UnigramEm.wordExpected(w, idx, lp, maxPieceLen, (i, e) => {
      val k = Integer.valueOf(i)
      val cur = touched.get(k)
      touched.put(k, java.lang.Double.valueOf(
        if (cur == null) e else cur.doubleValue() + e))
    })
    val out = new Array[Any](touched.size() + 1)
    var n = 0
    val it = touched.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(n) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey.intValue(), e.getValue.doubleValue())
      n += 1
    }
    out(n) = org.apache.spark.sql.catalyst.InternalRow(-1, z)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramEStep = copy(child = newChild)
}

/** The shared Unigram DECODE core — one implementation feeding both
  * the distributed kernel ([[UnigramDecodeIds]]) and the driver-side
  * [[graft.operators.Unigram.decodeIds]], so the two can never drift.
  *
  * The sentencepiece convention, parameterized by the tokenizer's own
  * pipeline (not hardcoded to the Llama shape):
  *  - ids → pieces; `<0xNN>` RUNS fuse and decode as UTF-8 bytes;
  *  - the space MARKER un-renders to " ": the Metaspace replacement
  *    when the tokenizer carries one, else the content of a
  *    `Replace " " → X` normalizer, else the conventional "▁";
  *  - ONE leading space drops when the pipeline prepended one — a
  *    `Prepend` normalizer, or a Metaspace prepend scheme of
  *    `always`/`first` (never for `never`).
  * Unknown-id positions render as the unk piece — decode is lossy
  * exactly where the encode discarded information, nowhere else.
  */
private[graft] object UnigramDecode {

  private val byteRe = "^<0x([0-9A-Fa-f]{2})>$".r

  /** The marker string this tokenizer renders spaces as. */
  def spaceMarker(norms: Seq[(String, String, String)],
      metaspace: Option[(String, Boolean, String)]): String =
    metaspace.map(_._1).orElse(
      norms.collectFirst { case ("replace", " ", to) => to })
      .getOrElse("▁")

  /** Whether the pipeline prepends one marker the decode must drop. */
  def dropsLeading(norms: Seq[(String, String, String)],
      metaspace: Option[(String, Boolean, String)]): Boolean =
    norms.exists(_._1 == "prepend") ||
      metaspace.exists(m => m._3 == "always" || m._3 == "first")

  def decode(ids: Array[Long], pieces: IndexedSeq[String],
      marker: String, dropLeading: Boolean): String = {
    val sb = new java.lang.StringBuilder
    val pending = new java.io.ByteArrayOutputStream
    def flush(): Unit = if (pending.size() > 0) {
      sb.append(new String(pending.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
      pending.reset()
    }
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      require(id >= 0 && id < pieces.size,
        s"id $id outside the ${pieces.size}-piece vocab")
      val p = pieces(id.toInt)
      byteRe.findFirstMatchIn(p) match {
        case Some(m) => pending.write(Integer.parseInt(m.group(1), 16))
        case None => flush(); sb.append(p)
      }
      i += 1
    }
    flush()
    var out = sb.toString
    if (marker.nonEmpty && marker != " ")
      out = out.replace(marker, " ")
    if (dropLeading && out.startsWith(" ")) out = out.substring(1)
    out
  }
}

/** Unigram DECODE as a compiled map-side kernel — the distributed
  * inverse of [[UnigramEncodeIds]] (ids → text), sharing its core
  * with the driver-side decode through [[UnigramDecode]]. With byte
  * fallback covering the full `<0xNN>` alphabet,
  * `decode(encode(x))` equals `x` up to the marker→space rewrite —
  * the relationally-statable identity the x123 oracle checks
  * end-to-end. Pure projection: zero shuffles, whole-stage codegen.
  */
case class UnigramDecodeIds(child: Expression, pieces: Seq[String],
    norms: Seq[(String, String, String)],
    metaspace: Option[(String, Boolean, String)])
    extends UnaryKernelCodegen {

  require(pieces.nonEmpty, "unigram vocab must be non-empty")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unigram_decode"

  @transient private lazy val pieceArr: IndexedSeq[String] =
    pieces.toIndexedSeq
  @transient private lazy val marker: String =
    UnigramDecode.spaceMarker(norms, metaspace)
  @transient private lazy val dropLeading: Boolean =
    UnigramDecode.dropsLeading(norms, metaspace)

  override def kernel(input: Any): Any =
    UTF8String.fromString(UnigramDecode.decode(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray(),
      pieceArr, marker, dropLeading))

  override protected def withNewChildInternal(
      newChild: Expression): UnigramDecodeIds = copy(child = newChild)
}
