package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken, "
  * Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003) over a ROLLING polynomial hash:
  *
  *  1. hash every character k-gram with a Rabin-Karp rolling hash —
  *     O(1) per position (h ← (h − c_out·B^(k−1))·B + c_in, Long
  *     wraparound arithmetic, deterministic everywhere);
  *  2. slide a window of `w` consecutive k-gram hashes and keep the
  *     minimum (rightmost on ties — the winnowing tie rule);
  *  3. return the distinct selected hashes, sorted.
  *
  * Guarantee: any shared substring of length ≥ w + k − 1 between two
  * documents yields at least one shared fingerprint; expected density of
  * selected positions is 2/(w+1). One compiled pass per row; the output
  * feeds overlap joins exactly like shingle sets, at a fraction of the
  * bytes.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with UnaryKernelCodegen {

  require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got ($k, $w)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fingerprints"

  private val B = 257L
  private lazy val bPow: Long = {
    var p = 1L
    var i = 0
    while (i < k - 1) { p *= B; i += 1 }
    p
  }

  override def kernel(t: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Any])

    // rolling k-gram hashes
    val m = n - k + 1
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + s.charAt(i).toLong; i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1).toLong * bPow) * B + s.charAt(i + k - 1).toLong
      hs(i) = h
      i += 1
    }

    // winnow: rightmost min of each w-window, dedupe consecutive picks
    val selected = scala.collection.mutable.SortedSet.empty[Long]
    if (m <= w) {
      var minIdx = 0
      var j = 1
      while (j < m) { if (hs(j) <= hs(minIdx)) minIdx = j; j += 1 }
      selected += hs(minIdx)
    } else {
      var minIdx = -1
      var start = 0
      while (start + w <= m) {
        if (minIdx < start) {
          minIdx = start
          var j = start + 1
          while (j < start + w) { if (hs(j) <= hs(minIdx)) minIdx = j; j += 1 }
        } else {
          val newest = start + w - 1
          if (hs(newest) <= hs(minIdx)) minIdx = newest
        }
        selected += hs(minIdx)
        start += 1
      }
    }
    new GenericArrayData(selected.toArray.map(Long.box).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
