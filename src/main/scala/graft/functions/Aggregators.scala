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

  /** One retained row in the top-k buffer: ranked by score DESC, then
    * key1 ASC, then key2 ASC (deterministic total order — key1/key2 are
    * the caller's unique tiebreakers).
    */
  case class ScoredRow(score: Double, key1: Long, key2: Long)

  /** Top-k buffer as parallel arrays in rank order, capped at k — a flat
    * product the Tungsten struct encoder serializes directly.
    */
  case class TopKBuf(scores: Array[Double], key1s: Array[Long],
      key2s: Array[Long]) {
    def size: Int = scores.length
  }

  /** Per-group top-k with BOUNDED state: each partition keeps at most k
    * (score, key1, key2) rows per group and partial-merges them — the
    * 100 TB alternative to a ranking window, which must SORT every
    * group's full contents under one exchange. Here the exchange carries
    * at most k rows per (group, partition) and the merge is an O(k)
    * two-pointer pass; no per-group sort ever happens. Results are
    * identical to `row_number() <= k` over (score DESC, key1, key2) —
    * asserted against q7's window form in the spec suite and by the x30
    * oracle.
    */
  class TopKRows(k: Int) extends Aggregator[ScoredRow, TopKBuf,
      Seq[ScoredRow]] {
    require(k >= 1, "need k >= 1")

    override def zero: TopKBuf =
      TopKBuf(Array.empty, Array.empty, Array.empty)

    // rank order: score DESC, key1 ASC, key2 ASC — scores compare the
    // way Spark SQL sorts doubles (SQLOrderingUtil semantics): NaN ranks
    // above +Inf (total order, so NaN rows stay partition-order-
    // independent), but -0.0 == +0.0 (primitive equality first — raw
    // Double.compare would order -0.0 < +0.0 and diverge from the
    // row_number() window this aggregator is documented to match)
    private def ranksBefore(s1: Double, a1: Long, b1: Long,
        s2: Double, a2: Long, b2: Long): Boolean = {
      val c = if (s1 == s2) 0 else java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && (a1 < a2 || (a1 == a2 && b1 < b2)))
    }

    override def reduce(buf: TopKBuf, in: ScoredRow): TopKBuf = {
      val n = buf.size
      if (n == k && !ranksBefore(in.score, in.key1, in.key2,
          buf.scores(n - 1), buf.key1s(n - 1), buf.key2s(n - 1)))
        return buf // worse than the current k-th: O(1) reject hot path
      var ins = 0
      while (ins < n && ranksBefore(buf.scores(ins), buf.key1s(ins),
          buf.key2s(ins), in.score, in.key1, in.key2)) ins += 1
      val m = math.min(n + 1, k)
      val scores = new Array[Double](m)
      val key1s = new Array[Long](m)
      val key2s = new Array[Long](m)
      System.arraycopy(buf.scores, 0, scores, 0, ins)
      System.arraycopy(buf.key1s, 0, key1s, 0, ins)
      System.arraycopy(buf.key2s, 0, key2s, 0, ins)
      scores(ins) = in.score; key1s(ins) = in.key1; key2s(ins) = in.key2
      val tail = m - ins - 1 // rows kept after the insertion point
      System.arraycopy(buf.scores, ins, scores, ins + 1, tail)
      System.arraycopy(buf.key1s, ins, key1s, ins + 1, tail)
      System.arraycopy(buf.key2s, ins, key2s, ins + 1, tail)
      TopKBuf(scores, key1s, key2s)
    }

    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      if (a.size == 0) return b
      if (b.size == 0) return a
      val m = math.min(a.size + b.size, k)
      val scores = new Array[Double](m)
      val key1s = new Array[Long](m)
      val key2s = new Array[Long](m)
      var i = 0; var j = 0; var d = 0
      while (d < m) {
        val takeA = j >= b.size || (i < a.size &&
          ranksBefore(a.scores(i), a.key1s(i), a.key2s(i),
            b.scores(j), b.key1s(j), b.key2s(j)))
        if (takeA) {
          scores(d) = a.scores(i); key1s(d) = a.key1s(i); key2s(d) = a.key2s(i)
          i += 1
        } else {
          scores(d) = b.scores(j); key1s(d) = b.key1s(j); key2s(d) = b.key2s(j)
          j += 1
        }
        d += 1
      }
      TopKBuf(scores, key1s, key2s)
    }

    override def finish(buf: TopKBuf): Seq[ScoredRow] =
      buf.scores.indices.map(ix =>
        ScoredRow(buf.scores(ix), buf.key1s(ix), buf.key2s(ix)))

    override def bufferEncoder: Encoder[TopKBuf] =
      Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[ScoredRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredRow]]()
  }

  /** One retained row in the STRING-keyed top-k buffer — [[ScoredRow]]
    * with a string key1 (the id type the long-keyed buffer cannot
    * carry).
    */
  case class ScoredRowS(score: Double, key1: String, key2: Long)

  /** String-keyed top-k buffer in rank order, capped at k. */
  case class TopKBufS(scores: Array[Double], key1s: Array[String],
      key2s: Array[Long]) {
    def size: Int = scores.length
  }

  /** [[TopKRows]] for STRING keys — the same bounded partial-merge
    * top-k, ranking by score DESC then key1 ASC in UNSIGNED UTF-8 BYTE
    * order (Spark SQL's string collation — `UTF8String.compareTo` —
    * NOT Java's UTF-16 `String.compareTo`, which diverges on
    * supplementary characters), then key2 ASC. Byte-equality vs the
    * `row_number()` window form on string-id corpora is spec-asserted;
    * this closes the silent window fallback for non-integral ids.
    */
  class TopKRowsStr(k: Int) extends Aggregator[ScoredRowS, TopKBufS,
      Seq[ScoredRowS]] {
    require(k >= 1, "need k >= 1")

    override def zero: TopKBufS =
      TopKBufS(Array.empty, Array.empty, Array.empty)

    // Spark sorts strings as unsigned UTF-8 bytes; comparing the Java
    // strings directly (UTF-16 code units) would diverge above the
    // BMP, and comparing CODE POINTS diverges on malformed input: an
    // unpaired surrogate encodes as the replacement byte '?' under
    // UTF8String.fromString, so it must rank as 0x3F here too or the
    // aggregate orders such an id differently than the row_number()
    // window form this class is documented to byte-equal. Compare
    // through UTF8String itself — the one ordering Spark's own sort
    // uses, malformed input included.
    private def utf8Cmp(a: String, b: String): Int =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(
          org.apache.spark.unsafe.types.UTF8String.fromString(b))

    private def ranksBefore(s1: Double, a1: String, b1: Long,
        s2: Double, a2: String, b2: Long): Boolean = {
      val c = if (s1 == s2) 0 else java.lang.Double.compare(s1, s2)
      if (c != 0) return c > 0
      val k = utf8Cmp(a1, a2)
      k < 0 || (k == 0 && b1 < b2)
    }

    override def reduce(buf: TopKBufS, in: ScoredRowS): TopKBufS = {
      val n = buf.size
      if (n == k && !ranksBefore(in.score, in.key1, in.key2,
          buf.scores(n - 1), buf.key1s(n - 1), buf.key2s(n - 1)))
        return buf // O(1) reject hot path
      var ins = 0
      while (ins < n && ranksBefore(buf.scores(ins), buf.key1s(ins),
          buf.key2s(ins), in.score, in.key1, in.key2)) ins += 1
      val m = math.min(n + 1, k)
      val scores = new Array[Double](m)
      val key1s = new Array[String](m)
      val key2s = new Array[Long](m)
      System.arraycopy(buf.scores, 0, scores, 0, ins)
      System.arraycopy(buf.key1s, 0, key1s, 0, ins)
      System.arraycopy(buf.key2s, 0, key2s, 0, ins)
      scores(ins) = in.score; key1s(ins) = in.key1; key2s(ins) = in.key2
      val tail = m - ins - 1
      System.arraycopy(buf.scores, ins, scores, ins + 1, tail)
      System.arraycopy(buf.key1s, ins, key1s, ins + 1, tail)
      System.arraycopy(buf.key2s, ins, key2s, ins + 1, tail)
      TopKBufS(scores, key1s, key2s)
    }

    override def merge(a: TopKBufS, b: TopKBufS): TopKBufS = {
      if (a.size == 0) return b
      if (b.size == 0) return a
      val m = math.min(a.size + b.size, k)
      val scores = new Array[Double](m)
      val key1s = new Array[String](m)
      val key2s = new Array[Long](m)
      var i = 0; var j = 0; var d = 0
      while (d < m) {
        val takeA = j >= b.size || (i < a.size &&
          ranksBefore(a.scores(i), a.key1s(i), a.key2s(i),
            b.scores(j), b.key1s(j), b.key2s(j)))
        if (takeA) {
          scores(d) = a.scores(i); key1s(d) = a.key1s(i)
          key2s(d) = a.key2s(i); i += 1
        } else {
          scores(d) = b.scores(j); key1s(d) = b.key1s(j)
          key2s(d) = b.key2s(j); j += 1
        }
        d += 1
      }
      TopKBufS(scores, key1s, key2s)
    }

    override def finish(buf: TopKBufS): Seq[ScoredRowS] =
      buf.scores.indices.map(ix =>
        ScoredRowS(buf.scores(ix), buf.key1s(ix), buf.key2s(ix)))

    override def bufferEncoder: Encoder[TopKBufS] =
      Encoders.product[TopKBufS]
    override def outputEncoder: Encoder[Seq[ScoredRowS]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[ScoredRowS]]()
  }

  /** One retained row in the BINARY-keyed top-k buffer. */
  case class ScoredRowB(score: Double, key1: Array[Byte], key2: Long)

  /** Binary-keyed top-k buffer in rank order, capped at k. */
  case class TopKBufB(scores: Array[Double], key1s: Array[Array[Byte]],
      key2s: Array[Long]) {
    def size: Int = scores.length
  }

  /** [[TopKRows]] for BINARY keys — the same bounded partial-merge
    * top-k, ranking by score DESC then key1 ASC in UNSIGNED
    * lexicographic byte order (exactly Spark SQL's BinaryType
    * ordering), then key2 ASC. This closes the last id-type gap in
    * the window-free family: BinaryType ids rank directly, and any
    * type with an order-preserving binary encoding (DecimalType
    * through [[graft.expressions.DecimalSortKey]]) rides the same
    * buffer.
    */
  class TopKRowsBin(k: Int) extends Aggregator[ScoredRowB, TopKBufB,
      Seq[ScoredRowB]] {
    require(k >= 1, "need k >= 1")

    override def zero: TopKBufB =
      TopKBufB(Array.empty, Array.empty, Array.empty)

    // Spark compares BinaryType as UNSIGNED bytes, shorter-prefix
    // first on ties — mirror it exactly
    private def binCmp(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }

    private def ranksBefore(s1: Double, a1: Array[Byte], b1: Long,
        s2: Double, a2: Array[Byte], b2: Long): Boolean = {
      val c = if (s1 == s2) 0 else java.lang.Double.compare(s1, s2)
      if (c != 0) return c > 0
      val kc = binCmp(a1, a2)
      kc < 0 || (kc == 0 && b1 < b2)
    }

    override def reduce(buf: TopKBufB, in: ScoredRowB): TopKBufB = {
      val n = buf.size
      if (n == k && !ranksBefore(in.score, in.key1, in.key2,
          buf.scores(n - 1), buf.key1s(n - 1), buf.key2s(n - 1)))
        return buf // O(1) reject hot path
      var ins = 0
      while (ins < n && ranksBefore(buf.scores(ins), buf.key1s(ins),
          buf.key2s(ins), in.score, in.key1, in.key2)) ins += 1
      val m = math.min(n + 1, k)
      val scores = new Array[Double](m)
      val key1s = new Array[Array[Byte]](m)
      val key2s = new Array[Long](m)
      System.arraycopy(buf.scores, 0, scores, 0, ins)
      System.arraycopy(buf.key1s, 0, key1s, 0, ins)
      System.arraycopy(buf.key2s, 0, key2s, 0, ins)
      scores(ins) = in.score; key1s(ins) = in.key1; key2s(ins) = in.key2
      val tail = m - ins - 1
      System.arraycopy(buf.scores, ins, scores, ins + 1, tail)
      System.arraycopy(buf.key1s, ins, key1s, ins + 1, tail)
      System.arraycopy(buf.key2s, ins, key2s, ins + 1, tail)
      TopKBufB(scores, key1s, key2s)
    }

    override def merge(a: TopKBufB, b: TopKBufB): TopKBufB = {
      if (a.size == 0) return b
      if (b.size == 0) return a
      val m = math.min(a.size + b.size, k)
      val scores = new Array[Double](m)
      val key1s = new Array[Array[Byte]](m)
      val key2s = new Array[Long](m)
      var i = 0; var j = 0; var d = 0
      while (d < m) {
        val takeA = j >= b.size || (i < a.size &&
          ranksBefore(a.scores(i), a.key1s(i), a.key2s(i),
            b.scores(j), b.key1s(j), b.key2s(j)))
        if (takeA) {
          scores(d) = a.scores(i); key1s(d) = a.key1s(i)
          key2s(d) = a.key2s(i); i += 1
        } else {
          scores(d) = b.scores(j); key1s(d) = b.key1s(j)
          key2s(d) = b.key2s(j); j += 1
        }
        d += 1
      }
      TopKBufB(scores, key1s, key2s)
    }

    override def finish(buf: TopKBufB): Seq[ScoredRowB] =
      buf.scores.indices.map(ix =>
        ScoredRowB(buf.scores(ix), buf.key1s(ix), buf.key2s(ix)))

    override def bufferEncoder: Encoder[TopKBufB] =
      Encoders.product[TopKBufB]
    override def outputEncoder: Encoder[Seq[ScoredRowB]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[ScoredRowB]]()
  }

  /** Per-group k-th-smallest SORT KEY with BOUNDED state — the
    * threshold half of the window-free per-group limit
    * ([[graft.operators.Curation.domainQuota]]): each partition keeps
    * at most k keys per group in a sorted array, partials merge with
    * an O(k) two-pointer pass, and `finish` emits the largest
    * RETAINED key — the k-th smallest overall when the group has ≥ k
    * rows, the group maximum otherwise. Rows with `key <= threshold`
    * are then exactly the k smallest (for distinct keys), selected
    * with no per-group sort: ≤ k keys per (group, partition) cross
    * the exchange, so a mega-domain costs the same per row as any
    * other — the ranking-window alternative sorts the whole group
    * under one task.
    */
  class BottomKKey(k: Int) extends Aggregator[String, BottomKBuf,
      String] {
    require(k >= 1, "need k >= 1")

    override def zero: BottomKBuf = BottomKBuf(Array.empty)

    override def reduce(buf: BottomKBuf, key: String): BottomKBuf = {
      val n = buf.keys.length
      if (n == k && buf.keys(n - 1) <= key) return buf // O(1) reject
      var ins = 0
      while (ins < n && buf.keys(ins) <= key) ins += 1
      val m = math.min(n + 1, k)
      val out = new Array[String](m)
      System.arraycopy(buf.keys, 0, out, 0, ins)
      out(ins) = key
      System.arraycopy(buf.keys, ins, out, ins + 1, m - ins - 1)
      BottomKBuf(out)
    }

    override def merge(a: BottomKBuf, b: BottomKBuf): BottomKBuf = {
      if (a.keys.isEmpty) return b
      if (b.keys.isEmpty) return a
      val m = math.min(a.keys.length + b.keys.length, k)
      val out = new Array[String](m)
      var i = 0; var j = 0; var d = 0
      while (d < m) {
        val takeA = j >= b.keys.length ||
          (i < a.keys.length && a.keys(i) <= b.keys(j))
        if (takeA) { out(d) = a.keys(i); i += 1 }
        else { out(d) = b.keys(j); j += 1 }
        d += 1
      }
      BottomKBuf(out)
    }

    override def finish(buf: BottomKBuf): String =
      if (buf.keys.isEmpty) null else buf.keys(buf.keys.length - 1)

    override def bufferEncoder: Encoder[BottomKBuf] =
      Encoders.product[BottomKBuf]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Sorted ascending, capped at k — a flat one-column product the
    * Tungsten struct encoder serializes directly.
    */
  case class BottomKBuf(keys: Array[String])

  /** Bloom-filter builder over 64-bit key hashes — the build side of
    * the Bloom-pruned join ([[graft.operators.BloomJoin]]): a
    * FIXED-SIZE mergeable bitset (numBits/8 bytes per partition,
    * partials merge by OR), exactly the shape that crosses an exchange
    * cheaply at any key count. Probe arithmetic is shared with the
    * membership kernel ([[graft.expressions.BloomProbe]]) — builder
    * and prober can never drift.
    *
    * Input hashes must be non-null (callers hash with xxhash64 over
    * non-null join keys; null keys never match a join anyway).
    */
  class BloomBuild(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

    override def zero: Array[Long] = new Array[Long](numBits / 64)

    override def reduce(buf: Array[Long], h1: Long): Array[Long] = {
      val hh2 = graft.expressions.BloomProbe.h2(h1)
      var i = 0
      while (i < numHashes) {
        val p = graft.expressions.BloomProbe.pos(h1, hh2, i, numBits.toLong)
        buf((p >>> 6).toInt) |= (1L << (p & 63L))
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}
