package graft.functions

import scala.collection.mutable

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
    * (map-side combine) applies as with any built-in agg.
    */
  class FrequentItems(k: Int, capacity: Int)
      extends Aggregator[String, mutable.HashMap[String, (Long, Long)],
        Seq[FreqItem]] {
    require(k >= 1 && capacity >= k, "need capacity >= k >= 1")

    override def zero: mutable.HashMap[String, (Long, Long)] =
      mutable.HashMap.empty

    override def reduce(buf: mutable.HashMap[String, (Long, Long)],
        item: String): mutable.HashMap[String, (Long, Long)] = {
      buf.get(item) match {
        case Some((c, e)) => buf.update(item, (c + 1, e))
        case None if buf.size < capacity => buf.update(item, (1L, 0L))
        case None =>
          // evict the minimum-count item; inherit its count as error
          val (minItem, (minC, _)) = buf.minBy(_._2._1)
          buf.remove(minItem)
          buf.update(item, (minC + 1, minC))
      }
      buf
    }

    /** Mergeable-summaries combine (Agarwal et al., "Mergeable
      * Summaries", PODS 2012): an item absent from one sketch may still
      * have occurred up to that sketch's minimum count there (that is
      * exactly the Space-Saving absence bound, and it is 0 unless the
      * sketch is full), so the merged estimate adds the other side's
      * min-count as count AND error. Truncating back to capacity then
      * drops only the smallest estimates, preserving the invariant
      * truth ≤ count ≤ truth + error for every retained item.
      */
    override def merge(a: mutable.HashMap[String, (Long, Long)],
        b: mutable.HashMap[String, (Long, Long)])
        : mutable.HashMap[String, (Long, Long)] = {
      val minA = if (a.size >= capacity) a.valuesIterator.map(_._1).min else 0L
      val minB = if (b.size >= capacity) b.valuesIterator.map(_._1).min else 0L
      val merged = mutable.HashMap.empty[String, (Long, Long)]
      (a.keysIterator ++ b.keysIterator).foreach { item =>
        if (!merged.contains(item)) {
          val (ca, ea) = a.getOrElse(item, (minA, minA))
          val (cb, eb) = b.getOrElse(item, (minB, minB))
          merged.update(item, (ca + cb, ea + eb))
        }
      }
      if (merged.size > capacity) {
        val keep = merged.toSeq.sortBy { case (item, (c, _)) => (-c, item) }
          .take(capacity)
        merged.clear()
        keep.foreach { case (item, ce) => merged.update(item, ce) }
      }
      merged
    }

    override def finish(buf: mutable.HashMap[String, (Long, Long)])
        : Seq[FreqItem] =
      buf.toSeq.sortBy { case (item, (c, _)) => (-c, item) }
        .take(k)
        .map { case (item, (c, e)) => FreqItem(item, c, e) }

    override def bufferEncoder
        : Encoder[mutable.HashMap[String, (Long, Long)]] =
      Encoders.kryo[mutable.HashMap[String, (Long, Long)]]
    override def outputEncoder: Encoder[Seq[FreqItem]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[FreqItem]]()
  }
}
