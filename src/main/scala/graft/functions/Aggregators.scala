package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (`Aggregator[IN, BUF, OUT]`) — the engine's
  * UDAF surface (SURVEY §2.2 "UDF/UDAF/UDTF" row). Registered for SQL
  * use via `spark.udf.register(..., functions.udaf(agg))`.
  */
object Aggregators {

  /** One tracked item in the frequent-items sketch: `count` overcounts
    * the true frequency by at most `error`.
    */
  case class FreqItem(item: String, count: Long, error: Long)

  /** Space-Saving sketch state as three parallel arrays SORTED BY ITEM —
    * a flat product the Tungsten struct encoder serializes directly
    * (three array columns), replacing the earlier Kryo-serialized
    * `mutable.HashMap` buffer that round-tripped through Kryo on every
    * partial-merge. Sorted order gives the hot path (increment an
    * already-tracked item) a binary search + in-place count bump;
    * insert/evict are O(size) array rebuilds, which Space-Saving only
    * pays on untracked arrivals.
    */
  case class FreqSketch(items: Array[String], counts: Array[Long],
      errors: Array[Long]) {
    def size: Int = items.length
  }

  /** Space-Saving frequent-items sketch (Metwally, Agrawal, El Abbadi,
    * "Efficient Computation of Frequent and Top-k Elements in Data
    * Streams", ICDT 2005): bounded state of `capacity` counters per
    * partition regardless of input size — the 100 TB way to ask "top
    * tokens" without shuffling every distinct token. Guarantees: any
    * item with true frequency > N/capacity is in the sketch, and each
    * reported count overstates truth by at most its `error`. With
    * capacity ≥ distinct-item count the result is exact (error 0).
    *
    * Merge sums counts pairwise then re-prunes to capacity — the
    * standard mergeable-summaries construction, so partial aggregation
    * (map-side combine) applies as with any built-in agg. Eviction and
    * truncation tie-breaks are deterministic (min count, then smallest
    * item), so results are partitioning-independent given the same
    * partition contents.
    */
  class FrequentItems(k: Int, capacity: Int)
      extends Aggregator[String, FreqSketch, Seq[FreqItem]] {
    require(k >= 1 && capacity >= k, "need capacity >= k >= 1")

    override def zero: FreqSketch =
      FreqSketch(Array.empty, Array.empty, Array.empty)

    private def inserted(buf: FreqSketch, ins: Int, item: String,
        count: Long, error: Long): FreqSketch = {
      val n = buf.size
      val items = new Array[String](n + 1)
      val counts = new Array[Long](n + 1)
      val errors = new Array[Long](n + 1)
      System.arraycopy(buf.items, 0, items, 0, ins)
      System.arraycopy(buf.counts, 0, counts, 0, ins)
      System.arraycopy(buf.errors, 0, errors, 0, ins)
      items(ins) = item; counts(ins) = count; errors(ins) = error
      System.arraycopy(buf.items, ins, items, ins + 1, n - ins)
      System.arraycopy(buf.counts, ins, counts, ins + 1, n - ins)
      System.arraycopy(buf.errors, ins, errors, ins + 1, n - ins)
      FreqSketch(items, counts, errors)
    }

    override def reduce(buf: FreqSketch, item: String): FreqSketch = {
      if (item == null) return buf // nulls carry no frequency mass
      val idx = java.util.Arrays.binarySearch(
        buf.items.asInstanceOf[Array[AnyRef]], item)
      if (idx >= 0) {
        buf.counts(idx) += 1 // in place — no rebuild on the hot path
        buf
      } else {
        val ins = -idx - 1
        if (buf.size < capacity) inserted(buf, ins, item, 1L, 0L)
        else {
          // evict the min-count item (first such in item order —
          // deterministic); the newcomer inherits its count as error
          var minIdx = 0
          var i = 1
          while (i < buf.size) {
            if (buf.counts(i) < buf.counts(minIdx)) minIdx = i
            i += 1
          }
          val minC = buf.counts(minIdx)
          val n = buf.size
          val items = new Array[String](n)
          val counts = new Array[Long](n)
          val errors = new Array[Long](n)
          // remove minIdx and insert item at its sorted slot in one pass:
          // when the slot is reached, leave a hole (dst skips it) and keep
          // copying behind it; the hole is filled after the loop
          var src = 0
          var dst = 0
          var insAt = -1
          while (src < n) {
            if (src != minIdx) {
              if (insAt < 0 && item.compareTo(buf.items(src)) < 0) {
                insAt = dst; dst += 1
              }
              items(dst) = buf.items(src)
              counts(dst) = buf.counts(src)
              errors(dst) = buf.errors(src)
              dst += 1
            }
            src += 1
          }
          if (insAt < 0) insAt = dst // item sorts after everything kept
          items(insAt) = item; counts(insAt) = minC + 1; errors(insAt) = minC
          FreqSketch(items, counts, errors)
        }
      }
    }

    /** Mergeable-summaries combine (Agarwal et al., "Mergeable
      * Summaries", PODS 2012): an item absent from one sketch may still
      * have occurred up to that sketch's minimum count there (that is
      * exactly the Space-Saving absence bound, and it is 0 unless the
      * sketch is full), so the merged estimate adds the other side's
      * min-count as count AND error. Truncating back to capacity then
      * drops only the smallest estimates, preserving the invariant
      * truth ≤ count ≤ truth + error for every retained item. A sorted
      * two-pointer merge — no hashing.
      */
    override def merge(a: FreqSketch, b: FreqSketch): FreqSketch = {
      if (a.size == 0) return b
      if (b.size == 0) return a
      val minA = if (a.size >= capacity) a.counts.min else 0L
      val minB = if (b.size >= capacity) b.counts.min else 0L
      val items = Array.newBuilder[String]
      val counts = Array.newBuilder[Long]
      val errors = Array.newBuilder[Long]
      var i = 0
      var j = 0
      while (i < a.size || j < b.size) {
        val cmp =
          if (i >= a.size) 1
          else if (j >= b.size) -1
          else a.items(i).compareTo(b.items(j))
        if (cmp == 0) {
          items += a.items(i); counts += a.counts(i) + b.counts(j)
          errors += a.errors(i) + b.errors(j)
          i += 1; j += 1
        } else if (cmp < 0) {
          items += a.items(i); counts += a.counts(i) + minB
          errors += a.errors(i) + minB
          i += 1
        } else {
          items += b.items(j); counts += minA + b.counts(j)
          errors += minA + b.errors(j)
          j += 1
        }
      }
      val merged = FreqSketch(items.result(), counts.result(), errors.result())
      if (merged.size <= capacity) merged
      else {
        val keep = merged.items.indices
          .sortBy(ix => (-merged.counts(ix), merged.items(ix)))
          .take(capacity)
          .sortBy(ix => merged.items(ix)) // back to item order
        FreqSketch(keep.map(merged.items).toArray,
          keep.map(merged.counts).toArray, keep.map(merged.errors).toArray)
      }
    }

    override def finish(buf: FreqSketch): Seq[FreqItem] =
      buf.items.indices
        .sortBy(ix => (-buf.counts(ix), buf.items(ix)))
        .take(k)
        .map(ix => FreqItem(buf.items(ix), buf.counts(ix), buf.errors(ix)))

    override def bufferEncoder: Encoder[FreqSketch] =
      Encoders.product[FreqSketch]
    override def outputEncoder: Encoder[Seq[FreqItem]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[FreqItem]]()
  }
}
