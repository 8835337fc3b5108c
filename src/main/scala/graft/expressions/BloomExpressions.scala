package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Membership probe against a Bloom bitset built by
  * [[graft.functions.Aggregators.BloomBuild]] — the map-side prefilter
  * of the Bloom-pruned join ([[graft.operators.BloomJoin]]).
  *
  * The bitset is an `Array[Long]` whose bit count is a power of two;
  * probe positions come from Kirsch–Mitzenmacher double hashing
  * (h1 + i·h2, "Less Hashing, Same Performance", ESA 2006) over the
  * caller-supplied 64-bit key hash. The EXACT same probe arithmetic
  * lives in the builder's reduce — the two must never diverge, so both
  * call [[BloomProbe]].
  *
  * No false negatives ever (every inserted key probes the bits its
  * insert set); false positives are filtered by the exact join that
  * follows, so the operator stays exact.
  */
object BloomProbe {
  /** Second hash for double hashing; forced odd so probes cycle the
    * full power-of-two range. Golden-ratio multiplier (public
    * splitmix64 constant).
    */
  @inline def h2(h1: Long): Long =
    (java.lang.Long.rotateLeft(h1, 31) * 0x9E3779B97F4A7C15L) | 1L

  @inline def pos(h1: Long, hh2: Long, i: Int, mBits: Long): Long =
    (h1 + i.toLong * hh2) & (mBits - 1)
}

case class BloomContains(left: Expression, right: Expression,
    numHashes: Int) extends BinaryExpression {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bitsAny: Any, hAny: Any): Any = {
    val bits = bitsAny.asInstanceOf[ArrayData]
    val mBits = bits.numElements().toLong * 64L
    val h1 = hAny.asInstanceOf[Long]
    val hh2 = BloomProbe.h2(h1)
    var i = 0
    while (i < numHashes) {
      val p = BloomProbe.pos(h1, hh2, i, mBits)
      if ((bits.getLong((p >>> 6).toInt) & (1L << (p & 63L))) == 0L)
        return false
      i += 1
    }
    true
  }

  // emitted into the enclosing whole-stage-codegen method: this runs
  // once per BIG-side row right on the scan, so CodegenFallback here
  // would break codegen for the entire pre-shuffle stage
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, h) => {
      val m = ctx.freshName("mBits")
      val h2v = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      // probe arithmetic via BloomProbe's static forwarders — the SAME
      // bytecode the builder and interpreted eval run, so the three
      // paths cannot drift (JIT inlines the tiny static calls)
      val probe = "graft.expressions.BloomProbe"
      s"""
         |long $m = (long) $bits.numElements() * 64L;
         |long $h2v = $probe.h2($h);
         |${ev.value} = true;
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  long $p = $probe.pos($h, $h2v, $i, $m);
         |  if (($bits.getLong((int) ($p >>> 6)) & (1L << ($p & 63L))) == 0L) {
         |    ${ev.value} = false;
         |    break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

/** Count of a string array's elements whose Spark-compatible xxhash64
  * (seed 42 — IDENTICAL to the `xxhash64(col)` the Bloom builder was
  * fed) probes all-set in the bitset — the whole per-row contamination
  * measurement of [[graft.operators.Dedup.contaminationReportBloom]]'s
  * explode→probe→sum chain collapsed into ONE compiled pass. Built for
  * the STREAMING sequence screen ([[graft.streaming.Streaming
  * .sequenceContaminationStream]]), where an explode + re-aggregate
  * would turn an Append-mode map into a stateful streaming aggregation.
  */
case class BloomSharedCount(left: Expression, right: Expression,
    numHashes: Int) extends BinaryExpression with BinaryKernelCodegen {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_bloom_shared_count"

  override def kernel(shinglesAny: Any, bitsAny: Any): Any = {
    val shingles = shinglesAny.asInstanceOf[ArrayData]
    val bits = bitsAny.asInstanceOf[ArrayData]
    val mBits = bits.numElements().toLong * 64L
    var shared = 0L
    var j = 0
    val n = shingles.numElements()
    while (j < n) {
      val s = shingles.getUTF8String(j)
      // Spark's xxhash64(string) semantics, seed 42 — must match the
      // hash the builder aggregated or every probe misses
      val h1 = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val hh2 = BloomProbe.h2(h1)
      var hit = true
      var i = 0
      while (hit && i < numHashes) {
        val p = BloomProbe.pos(h1, hh2, i, mBits)
        if ((bits.getLong((p >>> 6).toInt) & (1L << (p & 63L))) == 0L)
          hit = false
        i += 1
      }
      if (hit) shared += 1L
      j += 1
    }
    shared
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomSharedCount =
    copy(left = newLeft, right = newRight)
}
