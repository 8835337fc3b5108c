package graft

import graft.expressions._
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property tests for the native expression kernels, driven
  * through direct Catalyst `eval` (no Spark jobs — thousands of cases in
  * milliseconds, hitting the edge shapes unit fixtures miss: empty
  * strings, exotic whitespace, single-token docs, duplicate elements).
  */
class PropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(300)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  /** Simulate a distributed aggregation: split the stream into nParts
    * partitions, reduce each independently, merge in partition order —
    * the shape every mergeable-aggregator property here must survive.
    */
  private def partitionedBuild[I, B](items: List[I], nParts: Int,
      zero: => B)(reduce: (B, I) => B)(merge: (B, B) => B): B = {
    val parts = items
      .grouped(math.max(1, (items.size + nParts - 1) / nParts))
      .map(_.foldLeft(zero)(reduce)).toList
    parts match {
      case Nil => zero
      case h :: t => t.foldLeft(h)(merge)
    }
  }

  test("Streaming.packFold: micro-batch boundaries never change the " +
      "emitted sequences (split-invariance), complete sequences tile " +
      "[0, seqLen) exactly, and the carried state is the suffix") {
    import graft.streaming.Streaming.{packFold, PackState, TokDoc}
    def key(s: graft.streaming.Streaming.PackedSeq) =
      (s.strata, s.seq_id, s.token_ids.toSeq,
        s.doc_spans.map(x => (x.pos, x.doc, x.n)).toSeq, s.n_tokens,
        s.complete)
    val docsGen = for {
      n <- Gen.chooseNum(0, 30)
      lens <- Gen.listOfN(n, Gen.chooseNum(0, 25))
    } yield lens.zipWithIndex.map { case (l, i) =>
      TokDoc("s", i.toLong, Array.tabulate(l)(j => (i * 100 + j).toLong))
    }
    val p = Prop.forAll(docsGen, Gen.chooseNum(1, 12),
        Gen.chooseNum(1, 5)) { (docs, seqLen, nSplits) =>
      val zero = PackState(0L, Array.empty, Array.empty)
      val (endA, allAtOnce) = packFold("s", docs.iterator, zero, seqLen)
      // contiguous id-ordered batches (the streaming contract)
      val cuts = (0 until nSplits)
        .map(i => docs.size * i / nSplits).distinct :+ docs.size
      var st = zero
      val emitted = cuts.sliding(2).flatMap { case Seq(a, b) =>
        val (next, out) = packFold("s",
          docs.slice(a, b).iterator, st, seqLen)
        st = next
        out
      }.toList
      val same = emitted.map(key) == allAtOnce.map(key) &&
        st.seqId == endA.seqId && st.ids.toSeq == endA.ids.toSeq &&
        st.spans.toSeq == endA.spans.toSeq
      // tiling: every emission is complete, spans cover [0, seqLen)
      // contiguously, and token count is exactly seqLen
      val tiled = allAtOnce.forall { s =>
        s.complete && s.token_ids.length == seqLen &&
          s.doc_spans.scanLeft(0L)((acc, sp) =>
            { assert(sp.pos == acc); acc + sp.n }).last == seqLen
      }
      // conservation: every token lands in exactly one place
      val total = docs.map(_.ids.length).sum
      val conserved =
        allAtOnce.size * seqLen + endA.ids.length == total
      same && tiled && conserved
    }
    check("packFold split-invariance", p)
  }

  private val token: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaNumChar))
  private val ws: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \r ")
  private val textGen: Gen[String] = for {
    toks <- Gen.listOf(token)
    seps <- Gen.listOfN(toks.size + 1, ws)
  } yield seps.zipAll(toks, " ", "").map { case (s, t) => s + t }.mkString

  private def evalShingles(text: String, k: Int): Seq[String] =
    WordShingles(Literal(UTF8String.fromString(text), StringType), k)
      .eval(null).asInstanceOf[ArrayData].toArray[UTF8String](StringType)
      .map(_.toString).toSeq

  test("WordShingles = sorted distinct sliding k-grams of the token stream") {
    check("shingles", Prop.forAll(textGen, Gen.chooseNum(1, 4)) { (t, k) =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val expected =
        if (toks.length < k) Seq.empty
        else toks.sliding(k).map(_.mkString(" ")).toSeq.distinct.sorted
      evalShingles(t, k) == expected
    })
  }

  private def strArray(xs: Seq[String]): GenericArrayData =
    new GenericArrayData(xs.map(s => UTF8String.fromString(s)).toArray[Any])

  test("SortedArrayIntersectCount = |A ∩ B| for sorted distinct arrays") {
    val setGen = Gen.listOf(token).map(_.distinct.sorted)
    check("intersect", Prop.forAll(setGen, setGen) { (a, b) =>
      val expr = SortedArrayIntersectCount(
        Literal(strArray(a), ArrayType(StringType)),
        Literal(strArray(b), ArrayType(StringType)))
      expr.eval(null) == a.toSet.intersect(b.toSet).size
    })
  }

  test("MinHashSignature(A ∪ B) = elementwise min of signatures") {
    val setGen = Gen.nonEmptyListOf(token).map(_.distinct)
    check("minhash", Prop.forAll(setGen, setGen) { (a, b) =>
      def sig(xs: Seq[String]) =
        MinHashSignature(Literal(strArray(xs), ArrayType(StringType)), 32)
          .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      val u = sig((a ++ b).distinct)
      u == sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
    })
  }

  test("SimHash64 is invariant under token permutation (bag-of-words)") {
    check("simhash", Prop.forAll(Gen.nonEmptyListOf(token),
        Gen.chooseNum(0L, Long.MaxValue)) { (toks, seed) =>
      def h(ts: Seq[String]) =
        SimHash64(Literal(UTF8String.fromString(ts.mkString(" ")), StringType))
          .eval(null)
      h(toks) == h(new scala.util.Random(seed).shuffle(toks))
    })
  }

  test("WinnowFingerprints: shared substring of length >= w+k-1 shares a print") {
    val k = 5
    val w = 4
    check("winnow", Prop.forAll(textGen, textGen, textGen) { (pre, mid, post) =>
      val shared = if (mid.length < k + w - 1)
        mid.padTo(k + w - 1, 'q').mkString else mid
      def prints(s: String): Set[Long] =
        WinnowFingerprints(Literal(UTF8String.fromString(s), StringType), k, w)
          .eval(null).asInstanceOf[ArrayData].toLongArray().toSet
      val d1 = prints(pre + shared)
      val d2 = prints(shared + post)
      (d1 & d2).nonEmpty
    })
  }

  test("VecDot/VecNormSq equal the plain fold for random float vectors") {
    val vec = Gen.listOf(Gen.chooseNum(-100, 100).map(_ / 7.0f))
    check("vecdot", Prop.forAll(vec, vec) { (a, b) =>
      val at = ArrayType(FloatType, containsNull = false)
      val la = Literal(new GenericArrayData(a.map(Float.box).toArray[Any]), at)
      val lb = Literal(new GenericArrayData(b.map(Float.box).toArray[Any]), at)
      val dot = VecDot(la, lb).eval(null).asInstanceOf[Double]
      val nsq = VecNormSq(la).eval(null).asInstanceOf[Double]
      val expDot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble }
      val expN = a.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble)
      dot == expDot && nsq == expN
    })
  }

  test("TopKRows equals sort-take-k for random streams, k, and " +
      "partitionings (with score ties)") {
    import graft.functions.Aggregators.{ScoredRow, TopKRows}
    val rows = Gen.listOf(for {
      s <- Gen.chooseNum(-5, 5) // narrow score range → many ties
      a <- Gen.chooseNum(0L, 9L)
      b <- Gen.chooseNum(0L, 999L)
    } yield ScoredRow(s.toDouble, a, b))
    check("topk", Prop.forAll(rows, Gen.chooseNum(1, 5),
        Gen.chooseNum(1, 4)) { (items, k, nParts) =>
      val agg = new TopKRows(k)
      val expected = items.distinct
        .sortBy(r => (-r.score, r.key1, r.key2)).take(k)
      // duplicates of the SAME (score,key1,key2) may appear in a random
      // stream; the buffer treats rows as ranked values, so compare on
      // the deduped stream (callers feed unique-keyed rows)
      val uniq = items.distinct
      val merged = partitionedBuild(uniq, nParts, agg.zero)(
        agg.reduce)(agg.merge)
      agg.finish(merged) == expected
    })
  }

  test("DecimalSortKey: unsigned byte order of the encoding equals " +
      "numeric order, and the inverse kernel round-trips exactly, " +
      "for random decimals spanning the sign flip") {
    import graft.expressions.{DecimalSortKey, SortKeyDecimal}
    import org.apache.spark.sql.types.Decimal
    val precision = 12; val scale = 4
    val enc = DecimalSortKey(
      org.apache.spark.sql.catalyst.expressions.Literal(1), precision,
      scale)
    val dec = SortKeyDecimal(
      org.apache.spark.sql.catalyst.expressions.Literal(1), precision,
      scale)
    def key(v: java.math.BigDecimal): Array[Byte] =
      enc.kernel(Decimal(v, precision, scale)).asInstanceOf[Array[Byte]]
    def binCmp(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      while (i < a.length && i < b.length) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
    val decGen = for {
      unscaled <- Gen.chooseNum(-99999999999L, 99999999999L)
    } yield java.math.BigDecimal.valueOf(unscaled, scale)
    check("decimal-sort-key", Prop.forAll(decGen, decGen) { (x, y) =>
      val (kx, ky) = (key(x), key(y))
      val orderOk = Integer.signum(binCmp(kx, ky)) ==
        Integer.signum(x.compareTo(y))
      val rtOk = dec.kernel(kx).asInstanceOf[Decimal]
        .toJavaBigDecimal.compareTo(x) == 0
      orderOk && rtOk
    })
  }

  test("Double/FloatSortKey: signed-long order of the encoding " +
      "equals the double ordering (NaN greatest, -0.0 ties +0.0 via " +
      "canonicalization), and the inverse round-trips bit-exactly " +
      "on the canonical value") {
    import graft.expressions.{DoubleSortKey, FloatSortKey,
      SortKeyDouble, SortKeyFloat}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val enc = DoubleSortKey(Literal(1))
    val dec = SortKeyDouble(Literal(1))
    def key(d: Double): Long = enc.kernel(d).asInstanceOf[Long]
    def canon(d: Double): Double = if (d == 0.0) 0.0 else d
    val gen = Gen.oneOf(
      Gen.chooseNum(-1e300, 1e300),
      Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, java.lang.Double.MIN_VALUE,
        -java.lang.Double.MIN_VALUE, 1e-310, -1e-310))
    check("double-sort-key", Prop.forAll(gen, gen) { (x, y) =>
      val orderOk = java.lang.Long.signum(
        java.lang.Long.compare(key(x), key(y))) ==
        Integer.signum(java.lang.Double.compare(canon(x), canon(y)))
      val rt = dec.kernel(java.lang.Long.valueOf(key(x)))
        .asInstanceOf[Double]
      val rtOk = java.lang.Double.doubleToLongBits(rt) ==
        java.lang.Double.doubleToLongBits(canon(x))
      orderOk && rtOk
    })
    // the float twin across the full special-value ladder: keys must
    // be STRICTLY increasing and round-trip bit-exactly
    val fenc = FloatSortKey(Literal(1))
    val fdec = SortKeyFloat(Literal(1))
    def fkey(f: Float): Long = fenc.kernel(f).asInstanceOf[Long]
    val ladder = Seq(Float.NegativeInfinity, -1e30f, -1f,
      -java.lang.Float.MIN_VALUE, 0f, java.lang.Float.MIN_VALUE, 1f,
      1e30f, Float.PositiveInfinity, Float.NaN)
    ladder.sliding(2).foreach { case Seq(a, b) =>
      assert(fkey(a) < fkey(b), s"float key order broke at $a < $b")
    }
    assert(fkey(-0f) == fkey(0f), "float -0.0 must tie +0.0")
    (ladder :+ -0f).foreach { f =>
      val rt = fdec.kernel(java.lang.Long.valueOf(fkey(f)))
        .asInstanceOf[Float]
      val cf = if (f == 0f) 0f else f
      assert(java.lang.Float.floatToIntBits(rt) ==
        java.lang.Float.floatToIntBits(cf), s"float round trip of $f")
    }
  }

  test("FrequentItems invariants on random streams and partitionings") {
    import graft.functions.Aggregators.FrequentItems
    val stream = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
    check("spacesaving", Prop.forAll(stream, Gen.chooseNum(2, 6),
        Gen.chooseNum(1, 4)) { (items, cap, nParts) =>
      val agg = new FrequentItems(cap, cap)
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val merged = partitionedBuild(items, nParts, agg.zero)(
        agg.reduce)(agg.merge)
      agg.finish(merged).forall { f =>
        f.count >= truth(f.item) && f.count - f.error <= truth(f.item)
      }
    })
  }

  test("Bloom build/probe: zero false negatives under arbitrary " +
      "partitioned builds and merge orders") {
    val hashes = Gen.listOf(Gen.long)
    val parts = Gen.chooseNum(1, 5)
    check("bloom", Prop.forAll(hashes, parts) { (hs, np) =>
      val agg = new graft.functions.Aggregators.BloomBuild(1 << 12, 5)
      val bits = partitionedBuild(hs, np, agg.zero)(agg.reduce)(agg.merge)
      val arr = new GenericArrayData(bits.map(Long.box).toArray[Any])
      hs.forall { h =>
        graft.expressions.BloomContains(
          Literal(arr, ArrayType(LongType, containsNull = false)),
          Literal(h, LongType), 5).eval(null).asInstanceOf[Boolean]
      }
    })
  }
}
