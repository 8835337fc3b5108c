package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed bag-of-words feature kernels for the learned quality
  * classifier ([[graft.operators.QualityClassifier]]) — the
  * fastText-style linear filter of CCNet (Wenzek et al. LREC'20) and
  * the GPT-3/DCLM data pipelines, over [[Tok]]'s whitespace tokens.
  *
  * Feature hashing uses md5 so the bucket is statable in BOTH engines:
  * the first four hex nibbles of md5(token) form a 16-bit integer,
  * scaled to [0, dim) exactly like [[graft.operators.Sampling
  * .shuffleShards]]'s shard key — `(h16 * dim) div 65536` — which the
  * DuckDB oracle restates with strpos-nibble arithmetic (the x73
  * device). dim must divide 65536 evenly in spirit only; any dim ≤
  * 65536 is exact because the scaling is pure integer arithmetic.
  *
  * Weights live in quantized integer space (units of 1e-9, the repo's
  * exact-sum idiom): a document's logit is a LONG — bias plus one
  * weight lookup per token — so scoring is deterministic,
  * partitioning-independent, and bit-for-bit statable in SQL. No
  * reference-repo counterpart (the reference has no scoring surface at
  * all — SURVEY §0).
  */
object HashedBucket {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First-16-bits md5 bucket in [0, dim): UTF-8 digest, big-endian
    * nibble order — exactly `conv(substring(md5(t),1,4),16,10)*dim
    * div 65536` on the Spark SQL surface and the oracle's strpos form.
    */
  def bucketOf(token: String, dim: Int): Int = {
    val md = md5Local.get()
    md.reset()
    val h = md.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h16 = ((h(0) & 0xff) << 8) | (h(1) & 0xff)
    // long arithmetic, matching shuffleShards' BIGINT cast: for
    // dim > 32768 (permitted up to 65536) an Int product h16*dim
    // would overflow at h16 = 65535 into a negative bucket
    ((h16.toLong * dim) / 65536L).toInt
  }
}

/** Per-document `[n_tokens, logit_q]` of the frozen linear model in ONE
  * compiled pass: logit_q = biasQ + Σ_tokens weightsQ(bucket(token)) —
  * exact long arithmetic end-to-end, so scoring 100 TB is a pure
  * map-side scan with zero exchanges and a deterministic answer.
  */
case class HashedLinearLogit(child: Expression, weightsQ: Seq[Long],
    biasQ: Long) extends UnaryExpression with UnaryKernelCodegen {

  require(weightsQ.nonEmpty && weightsQ.size <= 65536,
    s"weight dimension must be in [1, 65536], got ${weightsQ.size}")

  private val wq: Array[Long] = weightsQ.toArray
  private val dim: Int = wq.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_linear_logit"

  override def kernel(t: Any): Any = {
    val toks = Tok.tokens(t.asInstanceOf[UTF8String])
    var sum = biasQ
    var i = 0
    while (i < toks.length) {
      sum += wq(HashedBucket.bucketOf(toks(i), dim))
      i += 1
    }
    new GenericArrayData(Array(toks.length.toLong, sum))
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedLinearLogit = copy(child = newChild)
}

/** Per-document hashed bucket counts (length-dim long array) — the
  * training-side feature vector; one compiled pass per row.
  */
case class HashedBucketCounts(child: Expression, dim: Int)
    extends UnaryExpression with UnaryKernelCodegen {

  require(dim >= 1 && dim <= 65536,
    s"feature dimension must be in [1, 65536], got $dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_bucket_counts"

  override def kernel(t: Any): Any = {
    val toks = Tok.tokens(t.asInstanceOf[UTF8String])
    val cnts = new Array[Long](dim)
    var i = 0
    while (i < toks.length) {
      cnts(HashedBucket.bucketOf(toks(i), dim)) += 1L
      i += 1
    }
    new GenericArrayData(cnts)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedBucketCounts = copy(child = newChild)
}
