package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece ENCODE as a compiled map-side kernel — the BERT lineage,
  * completing the tokenizer trifecta beside [[BpeEncodeTokens]] and
  * [[UnigramEncodeIds]]: per pre-token GREEDY LONGEST-MATCH-FIRST
  * over a vocabulary whose word-internal continuations carry a prefix
  * (`##`), the published WordPiece algorithm (any unmatched position
  * or an over-long word makes the WHOLE word `unk`).
  *
  * The Bert pipeline stages run inside the kernel, in the published
  * order, each reproducing the public `tokenizers` BertNormalizer /
  * BertPreTokenizer semantics:
  *  - `clean_text`: drop U+0000, U+FFFD and control characters
  *    (Unicode Cc/Cf except tab/newline/carriage-return, which — like
  *    every other whitespace — rewrite to a plain space);
  *  - `handle_chinese_chars`: pad CJK ideographs with spaces so each
  *    becomes its own pre-token;
  *  - `strip_accents`: NFD then remove combining marks (Mn) — and the
  *    BERT default rule: when the file leaves it null, it follows
  *    `lowercase`;
  *  - `lowercase`: locale-independent full Unicode lowercase;
  *  - pre-tokenization: split on whitespace, then isolate every
  *    punctuation character (ASCII punctuation ranges + Unicode P*)
  *    as its own pre-token.
  *
  * Known honest bound: category lookups (control, punctuation, Mn)
  * use the JDK's Unicode tables; a `tokenizers` build pinned to a
  * different Unicode version could classify an exotic codepoint
  * differently. Every mainstream-text case is identical and the
  * semantics are spec-pinned with hand-computed fixtures.
  *
  * Scale shape: pure projection — zero shuffles, whole-stage codegen,
  * greedy matching costs O(len²) per WORD bounded by
  * `maxInputCharsPerWord` (the published default 100).
  */
/** The shared BertNormalizer + BertPreTokenizer pipeline — ONE
  * implementation feeding the encode kernel ([[WordPieceEncodeIds]]),
  * the pre-token histogram expression ([[BertPreTokens]]) the TRAINER
  * builds its word counts with, and any future stage: the trainer's
  * view of a word and the encoder's can never drift.
  */
private[graft] object BertPipeline {

  private def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
    (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
    (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
    (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F)

  private def isPunct(cp: Int): Boolean = {
    if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
        (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) true
    else Character.getType(cp) match {
      case Character.DASH_PUNCTUATION | Character.START_PUNCTUATION |
           Character.END_PUNCTUATION | Character.CONNECTOR_PUNCTUATION |
           Character.OTHER_PUNCTUATION | Character.INITIAL_QUOTE_PUNCTUATION |
           Character.FINAL_QUOTE_PUNCTUATION => true
      case _ => false
    }
  }

  // Unicode White_Space (the Rust `char::is_whitespace` the published
  // pipeline uses) — Java's isWhitespace alone EXCLUDES NBSP-class
  // Zs chars; isSpaceChar supplies them (controls are handled before
  // this test ever runs)
  private def isWs(cp: Int): Boolean =
    Character.isWhitespace(cp) || Character.isSpaceChar(cp)

  private def isControl(cp: Int): Boolean =
    cp != '\t' && cp != '\n' && cp != '\r' && {
      val t = Character.getType(cp)
      t == Character.CONTROL || t == Character.FORMAT
    }

  def normalize(text: String, cleanText: Boolean,
      handleChineseChars: Boolean, stripAccents: Boolean,
      lowercase: Boolean): String = {
    var t = text
    if (cleanText) {
      val sb = new StringBuilder(t.length)
      var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        if (cp == 0 || cp == 0xFFFD || isControl(cp)) ()
        else if (isWs(cp)) sb.append(' ')
        else sb.appendAll(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      t = sb.toString
    }
    if (handleChineseChars) {
      val sb = new StringBuilder(t.length + 16)
      var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        if (isCjk(cp)) {
          sb.append(' ').appendAll(Character.toChars(cp)).append(' ')
        } else sb.appendAll(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      t = sb.toString
    }
    if (stripAccents) {
      val nfd = java.text.Normalizer.normalize(t,
        java.text.Normalizer.Form.NFD)
      val sb = new StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val cp = nfd.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          sb.appendAll(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      t = sb.toString
    }
    if (lowercase) t = t.toLowerCase(java.util.Locale.ROOT)
    t
  }

  /** Pre-tokens with their CODE-POINT spans into the input string —
    * the one segmentation implementation ([[preTokens]] delegates
    * here), so the id kernel, the offsets kernel and the trainer can
    * never disagree on where a word starts.
    */
  def preTokensOff(t: String): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    val word = new StringBuilder
    var wordStart = -1
    var cp = 0
    def flush(cpEnd: Int): Unit =
      if (word.nonEmpty) {
        out += ((word.toString, wordStart, cpEnd))
        word.clear(); wordStart = -1
      }
    var i = 0
    while (i < t.length) {
      val c = t.codePointAt(i)
      if (isWs(c)) flush(cp)
      else if (isPunct(c)) {
        flush(cp)
        out += ((new String(Character.toChars(c)), cp, cp + 1))
      } else {
        if (word.isEmpty) wordStart = cp
        word.appendAll(Character.toChars(c))
      }
      i += Character.charCount(c)
      cp += 1
    }
    flush(cp)
    out.result()
  }

  def preTokens(t: String): Seq[String] = preTokensOff(t).map(_._1)
}

case class WordPieceEncodeIds(child: Expression,
    vocab: Seq[(String, Long)], unkId: Long, contPrefix: String,
    maxInputCharsPerWord: Int, cleanText: Boolean,
    handleChineseChars: Boolean, stripAccents: Boolean,
    lowercase: Boolean)
    extends UnaryKernelCodegen {

  require(vocab.nonEmpty, "wordpiece vocab must be non-empty")
  require(maxInputCharsPerWord >= 1,
    s"maxInputCharsPerWord must be >= 1: $maxInputCharsPerWord")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_encode"

  @transient private lazy val idOf: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (t, i) => m.put(t, java.lang.Long.valueOf(i)) }
    m
  }

  override def kernel(input: Any): Any = {
    val t = BertPipeline.normalize(
      input.asInstanceOf[UTF8String].toString, cleanText,
      handleChineseChars, stripAccents, lowercase)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    BertPipeline.preTokens(t).foreach { w =>
      // the reference counts CODE POINTS, not UTF-16 units — an
      // astral-heavy word near the limit must not go unk early
      if (w.codePointCount(0, w.length) > maxInputCharsPerWord)
        out += unkId
      else {
        // greedy longest-match-first; any stuck position fails the
        // WHOLE word to unk (the published WordPiece rule)
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        var start = 0
        var bad = false
        while (start < w.length && !bad) {
          var end = w.length
          var hit: java.lang.Long = null
          while (end > start && hit == null) {
            val cand =
              (if (start > 0) contPrefix else "") + w.substring(start, end)
            hit = idOf.get(cand)
            if (hit == null) end -= 1
          }
          if (hit == null) bad = true
          else { ids += hit.longValue(); start = end }
        }
        if (bad) out += unkId else out ++= ids
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceEncodeIds = copy(child = newChild)
}

/** The Bert pre-token stream as a compiled map-side kernel — text →
  * array of pre-tokens under EXACTLY the [[BertPipeline]] the encode
  * kernel runs (normalizer stages + whitespace split + punctuation
  * isolation). This is the trainer's corpus view: the word histogram
  * feeding [[graft.operators.WordPiece.train]] explodes this column,
  * so a trained vocabulary segments the corpus precisely the way the
  * encoder will re-segment it — histogram and encode can never
  * drift. Pure projection: zero shuffles, whole-stage codegen.
  */
case class BertPreTokens(child: Expression, cleanText: Boolean,
    handleChineseChars: Boolean, stripAccents: Boolean,
    lowercase: Boolean) extends UnaryKernelCodegen {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bert_pre_tokens"

  override def kernel(input: Any): Any = {
    val toks = BertPipeline.preTokens(BertPipeline.normalize(
      input.asInstanceOf[UTF8String].toString, cleanText,
      handleChineseChars, stripAccents, lowercase))
    new GenericArrayData(
      toks.map(t => UTF8String.fromString(t): Any).toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BertPreTokens = copy(child = newChild)
}

/** WordPiece DECODE as a compiled map-side kernel — the published
  * `decoders.WordPiece` join convention: tokens join with a single
  * space, except a token carrying the continuation prefix (`##`)
  * attaches directly to its word with the prefix stripped. Ids in
  * `skipIds` (template specials — [CLS]/[SEP]) drop from the output;
  * any other id must exist in the vocab or the decode fails LOUDLY —
  * never a silently skipped token. (The reference decoder's optional
  * `cleanup` punctuation-respacing pass is NOT applied — decode here
  * is the exact join form, which is what makes the x124 roundtrip
  * relationally statable.)
  *
  * On pre-tokenized input (the only thing the encode emits), decode ∘
  * encode reconstructs the normalized text exactly when every word is
  * in-coverage — the identity the x124 oracle states end-to-end.
  * Pure projection: zero shuffles, whole-stage codegen.
  */
case class WordPieceDecodeIds(child: Expression,
    vocab: Seq[(String, Long)], contPrefix: String,
    skipIds: Seq[Long], cleanup: Boolean = false)
    extends UnaryKernelCodegen {

  require(vocab.nonEmpty, "wordpiece vocab must be non-empty")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_wordpiece_decode"

  @transient private lazy val tokOf: java.util.HashMap[java.lang.Long, String] = {
    val m = new java.util.HashMap[java.lang.Long, String](vocab.size * 2)
    vocab.foreach { case (t, i) => m.put(java.lang.Long.valueOf(i), t) }
    m
  }
  @transient private lazy val skip: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long]()
    skipIds.foreach(i => s.add(java.lang.Long.valueOf(i)))
    s
  }

  override def kernel(input: Any): Any = {
    val ids = input
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    val sb = new java.lang.StringBuilder
    var first = true
    var i = 0
    while (i < ids.length) {
      val boxed = java.lang.Long.valueOf(ids(i))
      if (!skip.contains(boxed)) {
        val t = tokOf.get(boxed)
        if (t == null) throw new IllegalStateException(
          s"wordpiece decode: id ${ids(i)} has no vocab entry — " +
            "refusing to skip a token silently")
        if (contPrefix.nonEmpty && t.startsWith(contPrefix))
          sb.append(t, contPrefix.length, t.length)
        else {
          if (!first) sb.append(' ')
          sb.append(t)
        }
        first = false
      }
      i += 1
    }
    UTF8String.fromString(
      if (cleanup) WordPieceDecodeIds.cleanupChain(sb.toString)
      else sb.toString)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceDecodeIds = copy(child = newChild)
}

object WordPieceDecodeIds {
  /** The `cleanup = true` post-pass of the reference WordPiece
    * decoder — the punctuation/contraction re-attachment chain,
    * replicated VERBATIM as sequential literal replaces in exactly
    * this order (each replace scans the previous one's output,
    * left-to-right, the `String.replace` semantics SQL `replace`
    * shares — what lets x138 restate the whole chain relationally):
    *
    *   " ."→"."   " ?"→"?"   " !"→"!"   " ,"→","   " ' "→"'"
    *   " n't"→"n't"   " 'm"→"'m"   " do not"→" don't"
    *   " 's"→"'s"   " 've"→"'ve"   " 're"→"'re"
    *
    * including the reference's famous `" do not"→" don't"`
    * contraction quirk — reproduced, not corrected, because the
    * contract is bit-parity with what the source tokenizer's decode
    * emits, not prettier English.
    */
  def cleanupChain(s: String): String = s
    .replace(" .", ".")
    .replace(" ?", "?")
    .replace(" !", "!")
    .replace(" ,", ",")
    .replace(" ' ", "'")
    .replace(" n't", "n't")
    .replace(" 'm", "'m")
    .replace(" do not", " don't")
    .replace(" 's", "'s")
    .replace(" 've", "'ve")
    .replace(" 're", "'re")
}
/** WordPiece ENCODE WITH OFFSETS — the [[WordPieceEncodeIds]] greedy
  * matcher emitting `(id, start, end)` per token, spans in CODE
  * POINTS into the NORMALIZED text (the string [[BertPipeline]] hands
  * the pre-tokenizer): a continuation token spans exactly the
  * characters it matched, a whole-word unk (stuck position or
  * over-long word) spans the whole word — the published convention,
  * with the engine's honest divergence DOCUMENTED: the reference
  * reports byte offsets into the ORIGINAL string via its alignment
  * maps; this kernel reports code-point offsets into the normalized
  * string, the view span-level consumers here (PII token masks,
  * contamination span reports) operate on, and the form a relational
  * oracle can restate (x129). On input the normalizer leaves
  * untouched the two coincide up to the byte/code-point unit.
  * Pure projection: zero shuffles, whole-stage codegen.
  */
/** The Bert NORMALIZED view of a text column — exactly the
  * [[BertPipeline.normalize]] string the encode/offsets kernels run
  * over, surfaced as its own projection so span consumers
  * ([[graft.operators.Chunking.tokenWindowSpans]]) can substr the
  * SAME string the offsets index. One shared pipeline — the view and
  * the spans can never drift. Pure projection.
  */
case class BertNormalize(child: Expression, cleanText: Boolean,
    handleChineseChars: Boolean, stripAccents: Boolean,
    lowercase: Boolean) extends UnaryKernelCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bert_normalize"

  override def kernel(input: Any): Any =
    UTF8String.fromString(BertPipeline.normalize(
      input.asInstanceOf[UTF8String].toString, cleanText,
      handleChineseChars, stripAccents, lowercase))

  override protected def withNewChildInternal(
      newChild: Expression): BertNormalize = copy(child = newChild)
}

case class WordPieceEncodeOffsets(child: Expression,
    vocab: Seq[(String, Long)], unkId: Long, contPrefix: String,
    maxInputCharsPerWord: Int, cleanText: Boolean,
    handleChineseChars: Boolean, stripAccents: Boolean,
    lowercase: Boolean)
    extends UnaryKernelCodegen {

  require(vocab.nonEmpty, "wordpiece vocab must be non-empty")
  require(maxInputCharsPerWord >= 1,
    s"maxInputCharsPerWord must be >= 1: $maxInputCharsPerWord")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_wordpiece_encode_offsets"

  @transient private lazy val idOf: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (t, i) => m.put(t, java.lang.Long.valueOf(i)) }
    m
  }

  override def kernel(input: Any): Any = {
    val t = BertPipeline.normalize(
      input.asInstanceOf[UTF8String].toString, cleanText,
      handleChineseChars, stripAccents, lowercase)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    def row(id: Long, s: Int, e: Int): Unit =
      out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](id, s, e))
    BertPipeline.preTokensOff(t).foreach { case (w, cpStart, cpEnd) =>
      if (w.codePointCount(0, w.length) > maxInputCharsPerWord)
        row(unkId, cpStart, cpEnd)
      else {
        // char index -> code points before it, for span conversion
        val cpAt = new Array[Int](w.length + 1)
        var ci = 0; var cc = 0
        while (ci < w.length) {
          cpAt(ci) = cc
          val n = Character.charCount(w.codePointAt(ci))
          var k = 1
          while (k < n) { cpAt(ci + k) = cc; k += 1 }
          ci += n; cc += 1
        }
        cpAt(w.length) = cc
        // the same greedy longest-match-first walk as the id kernel
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
        var start = 0
        var bad = false
        while (start < w.length && !bad) {
          var end = w.length
          var hit: java.lang.Long = null
          while (end > start && hit == null) {
            val cand =
              (if (start > 0) contPrefix else "") + w.substring(start, end)
            hit = idOf.get(cand)
            if (hit == null) end -= 1
          }
          if (hit == null) bad = true
          else {
            spans += ((hit.longValue(),
              cpStart + cpAt(start), cpStart + cpAt(end)))
            start = end
          }
        }
        if (bad) row(unkId, cpStart, cpEnd)
        else spans.foreach { case (id, s, e) => row(id, s, e) }
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceEncodeOffsets =
    copy(child = newChild)
}
