package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Shared float-array extraction for the vector kernels, callable from
  * both `eval` and generated code.
  *
  * `ArrayData.toFloatArray` has representation-dependent null behavior:
  * the Unsafe path silently reads null slots as 0.0f while the generic
  * path throws. [[floats]] pins ONE semantic — null elements read as
  * 0.0f — for every physical representation, which for dot/norm sums is
  * exactly DuckDB's `list_sum` null-skipping that the oracle uses.
  */
object VecKernels {
  def floats(ad: ArrayData): Array[Float] = ad match {
    // bulk primitive copy; the unsafe format already reads null slots as 0.0f
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
      u.toFloatArray()
    case _ =>
      val n = ad.numElements()
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        if (!ad.isNullAt(i)) out(i) = ad.getFloat(i)
        i += 1
      }
      out
  }
}

/** Native codegen'd dense-vector kernels over `ArrayType(FloatType)`.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) are evaluated
  * interpreted — per-element lambda dispatch with boxing — which makes
  * them ~1000× slower than a compiled loop on the similarity-join hot
  * path (a 2k×2k cosine self-join took 27 min interpreted; these
  * expressions bring it under seconds). Both `eval` and `doGenCode` are
  * tight primitive loops; accumulation is left-to-right in double
  * (float→double widening is exact), bit-identical to the
  * `list_sum(list_transform(...))` fold the DuckDB oracle runs — the
  * correctness gate relies on that.
  *
  * The reference has no vector ops at all (its only kernels are the
  * JSON transcode, GenericRecordJsonEncoder.java:42-138); these back the
  * similarity-search extension operators.
  */
/** Length-mismatch semantics (deliberate): the loops run over
  * min(|a|,|b|) — the same value DuckDB's
  * `list_sum(list_transform(list_zip(a,b), …))` oracle produces, because
  * list_zip pads with NULL and list_sum SKIPS nulls. The stricter
  * NULL-on-mismatch behavior of Spark's own `aggregate(zip_with(…))`
  * lives in [[VecDotHofCompat]], which the optimizer rule substitutes
  * for that pattern.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = VecKernels.floats(a.asInstanceOf[ArrayData])
    val ys = VecKernels.floats(b.asInstanceOf[ArrayData])
    val n = math.min(xs.length, ys.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += xs(i).toDouble * ys(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |float[] $xs = graft.expressions.VecKernels.floats($a);
         |float[] $ys = graft.expressions.VecKernels.floats($b);
         |int $n = Math.min($xs.length, $ys.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += (double) $xs[$i] * (double) $ys[$i]; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Σ xᵢ² over a float vector, double accumulation, left-to-right. */
case class VecNormSq(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_normsq"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = VecKernels.floats(a.asInstanceOf[ArrayData])
    var acc = 0.0
    var i = 0
    while (i < xs.length) { acc += xs(i).toDouble * xs(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xs = ctx.freshName("xs")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |float[] $xs = graft.expressions.VecKernels.floats($a);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $xs.length; $i++) { $acc += (double) $xs[$i] * (double) $xs[$i]; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNormSq =
    copy(child = newChild)
}

/** Squared L2 distance, double accumulation, left-to-right. */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = VecKernels.floats(a.asInstanceOf[ArrayData])
    val ys = VecKernels.floats(b.asInstanceOf[ArrayData])
    val n = math.min(xs.length, ys.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = xs(i).toDouble - ys(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |float[] $xs = graft.expressions.VecKernels.floats($a);
         |float[] $ys = graft.expressions.VecKernels.floats($b);
         |int $n = Math.min($xs.length, $ys.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $xs[$i] - (double) $ys[$i];
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Drop-in compiled replacement for the higher-order-function dot
  * product `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0,
  * _+_)`, reproducing its null semantics exactly: NULL result when the
  * lengths differ (zip_with pads with nulls) or any element is null;
  * otherwise the left-to-right double fold. Used by
  * [[VecKernelRewrite]], which may substitute it anywhere, any
  * nullability.
  */
case class VecDotHofCompat(left: Expression, right: Expression)
    extends BinaryExpression with BinaryKernelCodegenNullable {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot_hof"

  override def kernel(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotHofCompat =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric-distance (ADC) dot product for product quantization
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011): `codes` holds one centroid index per subspace for a
  * corpus vector; `table` is the query's flattened per-subspace dot
  * table — `table[s·nCentroids + c] = ⟨q_s, codebook_s[c]⟩`. The
  * approximate dot is Σ_s table[s·K + codes[s]] — `numSubspaces` lookups
  * instead of `dim` multiplies per (query, corpus) pair, which is the
  * whole PQ speedup. One compiled pass, no nulls expected (codes and
  * tables are both engine-built).
  */
case class PqAdcDot(left: Expression, right: Expression, nCentroids: Int)
    extends BinaryExpression with BinaryKernelCodegen {

  require(nCentroids >= 1, s"nCentroids must be >= 1, got $nCentroids")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_dot"

  override def kernel(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    var acc = 0.0
    var s = 0
    val m = codes.numElements()
    while (s < m) {
      acc += table.getDouble(s * nCentroids + codes.getInt(s))
      s += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane sign-bit LSH bucket packed into a long.
  *
  * Hyperplane coefficients are a deterministic splitmix-style hash of
  * (bit, dim) — no broadcast state, reproducible across executors (same
  * scheme the interpreted version used; see
  * [[graft.functions.VectorFunctions.hyperplaneBucket]]'s scaladoc
  * history). Single compiled pass per row instead of nBits×dim
  * interpreted column ops.
  */
case class HyperplaneBucket(child: Expression, nBits: Int, dim: Int = -1)
    extends UnaryExpression with UnaryKernelCodegen {

  require(nBits >= 1 && nBits <= 64,
    s"nBits must be in [1, 64] (bits are packed into one long), got $nBits")
  require(dim == -1 || dim >= 1,
    s"dim must be -1 (use the vector's own length) or >= 1, got $dim")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_hyperplane_bucket"

  override def kernel(a: Any): Any = {
    val xs = VecKernels.floats(a.asInstanceOf[ArrayData])
    // dim > 0 projects over only the first dim dimensions (a caller that
    // passed dim pre-round-2 got exactly this; honor it rather than
    // silently ignoring the parameter)
    val lim = if (dim > 0) math.min(dim, xs.length) else xs.length
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var proj = 0.0
      var j = 0
      while (j < lim) {
        proj += xs(j).toDouble * HyperplaneBucket.coef(b, j)
        j += 1
      }
      if (proj >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** Per-band random-hyperplane LSH buckets: `bands` longs, each packing
  * `bitsPerBand` sign bits (hyperplane index = band·bitsPerBand + bit, so
  * the total signature can exceed 64 bits — unlike [[HyperplaneBucket]],
  * which packs everything into one long). Used by the banded near-dup
  * join: vectors sharing any (band, bucket) become candidates.
  */
case class HyperplaneBands(child: Expression, bands: Int, bitsPerBand: Int)
    extends UnaryExpression with UnaryKernelCodegen {

  require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 64,
    s"need bands >= 1 and 1 <= bitsPerBand <= 64, got ($bands, $bitsPerBand)")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_bands"

  override def kernel(a: Any): Any = {
    val xs = VecKernels.floats(a.asInstanceOf[ArrayData])
    val out = new Array[Long](bands)
    var band = 0
    while (band < bands) {
      var bucket = 0L
      var bit = 0
      while (bit < bitsPerBand) {
        val plane = band * bitsPerBand + bit
        var proj = 0.0
        var j = 0
        while (j < xs.length) {
          proj += xs(j).toDouble * HyperplaneBucket.coef(plane, j)
          j += 1
        }
        if (proj >= 0) bucket |= (1L << bit)
        bit += 1
      }
      out(band) = bucket
      band += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.map(Long.box).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Deterministic pseudo-random coefficient in [-1, 1). */
  def coef(bit: Int, j: Int): Double = {
    var z = (bit.toLong * 0x9E3779B97F4A7C15L) + (j.toLong * 0xBF58476D1CE4E5B9L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }
}

/** The `nProbe` nearest centroid indices (squared-L2, ties → lower
  * index) for a float vector — the IVF assign/probe step as ONE map-side
  * compiled pass, no exchange.
  *
  * The centroid table rides inside the expression (it is bounded by
  * nCells — tens to a few thousand vectors — the same thing a broadcast
  * would ship, without the cross-join + per-row window the broadcast
  * formulation needed: that window shuffled corpus×nCells rows on a
  * unique per-row key, 16× the corpus through an exchange at any scale).
  * Participates in whole-stage codegen via a reference-object call, so
  * the enclosing stage stays compiled.
  */
case class NearestCells(child: Expression, centroids: Seq[Seq[Float]],
    nProbe: Int) extends UnaryExpression with UnaryKernelCodegen {

  require(centroids.nonEmpty, "need at least one centroid")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  @transient private lazy val cents: Array[Array[Float]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val k: Int = math.min(nProbe, centroids.length)

  /** Distances to all centroids, then k rounds of selection (k = nProbe
    * is small — 1 for assignment, single digits for probing — so k·nCells
    * beats a heap).
    */
  override def kernel(a: Any): Any = {
    val xs = VecKernels.floats(a.asInstanceOf[ArrayData])
    val nc = cents.length
    val d2 = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val cv = cents(c)
      val n = math.min(xs.length, cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = xs(i).toDouble - cv(i).toDouble
        acc += d * d
        i += 1
      }
      d2(c) = acc
      c += 1
    }
    val out = new Array[Any](k)
    val taken = new Array[Boolean](nc)
    var r = 0
    while (r < k) {
      var best = -1
      var bestD = Double.MaxValue
      var j = 0
      while (j < nc) {
        // strict < keeps the lowest index on ties
        if (!taken(j) && d2(j) < bestD) { best = j; bestD = d2(j) }
        j += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** The per-QUERY ADC lookup table (`numSubspaces × nCentroids`
  * subspace dots against the PQ codebooks) computed PER ROW as one
  * compiled pass — what [[graft.operators.SimilaritySearch.pqScore]]
  * builds driver-side for a collected query set, made streamable: on an
  * ingest stream the "queries" are the arriving vectors themselves, so
  * the table must be a map-side projection, not a driver loop
  * ([[graft.streaming.Streaming.annScreenStreamPq]]). Cost per row is
  * dim × nCentroids multiplies; the table then prices every scored code
  * row at `numSubspaces` lookups via [[PqAdcDot]].
  */
case class PqAdcTable(child: Expression,
    codebooks: Seq[Seq[Seq[Float]]], nCentroids: Int)
    extends UnaryExpression with UnaryKernelCodegen {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "need non-empty codebooks")
  // stride must be the INDEX's nCentroids parameter, not the largest
  // trained codebook: small corpora train short codebooks, and PqAdcDot
  // indexes adc[s * nCentroids + code]
  require(nCentroids >= codebooks.map(_.length).max,
    s"nCentroids $nCentroids below a codebook's size")

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_adc_table"

  @transient private lazy val cbs: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def kernel(a: Any): Any = {
    val qv = VecKernels.floats(a.asInstanceOf[ArrayData])
    val numSubspaces = cbs.length
    val sub = cbs(0)(0).length
    val table = new Array[Any](numSubspaces * nCentroids)
    java.util.Arrays.fill(table, 0.0d)
    var s = 0
    while (s < numSubspaces) {
      var ci = 0
      while (ci < cbs(s).length) {
        val cent = cbs(s)(ci)
        var d = 0.0
        var j = 0
        val n = math.min(sub, math.max(0, qv.length - s * sub))
        while (j < n) {
          d += qv(s * sub + j).toDouble * cent(j).toDouble
          j += 1
        }
        table(s * nCentroids + ci) = d
        ci += 1
      }
      s += 1
    }
    new GenericArrayData(table)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqAdcTable = copy(child = newChild)
}

/** The IVF-PQ residual `v − centroid[cell]` for one float vector, as ONE
  * map-side compiled pass — the encode step of a composed
  * coarse-quantizer + product-quantizer index
  * ([[graft.operators.IvfPqIndex]]): PQ codebooks trained on residuals
  * quantize a far tighter distribution than raw vectors (Jégou et al.
  * TPAMI'11 §IV), and computing the residual must not cost an exchange
  * at corpus scale. The centroid table rides inside the expression like
  * [[NearestCells]]'s. Out-of-range cell indices fail loudly — they mean
  * the cell column and the centroid table are from different builds.
  */
case class ResidualVec(left: Expression, right: Expression,
    centroids: Seq[Seq[Float]])
    extends BinaryExpression with BinaryKernelCodegen {

  require(centroids.nonEmpty, "need at least one centroid")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_residual_vec"

  @transient private lazy val cents: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  override def kernel(a: Any, b: Any): Any = {
    val xs = VecKernels.floats(a.asInstanceOf[ArrayData])
    val cell = b.asInstanceOf[Int]
    require(cell >= 0 && cell < cents.length,
      s"cell $cell out of range for ${cents.length} centroids — " +
        "cell assignment and centroid table are from different builds")
    val cv = cents(cell)
    val out = new Array[Any](xs.length)
    var i = 0
    while (i < xs.length) {
      out(i) = xs(i) - (if (i < cv.length) cv(i) else 0.0f)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResidualVec =
    copy(left = newLeft, right = newRight)
}

/** Symmetric int8 quantization audit for one float vector, as ONE
  * map-side compiled pass: struct(dim, max_q, min_q, mse) where the
  * per-dim squared reconstruction errors are quantized to 1e-12 longs
  * before the (exact, order-independent) sum — arithmetic identical to
  * the posexplode/aggregate form in x33 (asserted in the spec suite),
  * which exists only because it is the DuckDB-oracle-checkable twin.
  * This expression is the corpus-scale path: no explode, no shuffle, no
  * per-vector row blowup. An all-zero (or empty) vector has no scale;
  * it reports (dim, 0, 0, 0.0) and is for the caller to filter, exactly
  * like the explode form's `maxabs > 0` gate.
  *
  * Overflow-safe for ANY input magnitude: the quantized unit is the
  * DIMENSIONLESS error (d/scale)² — bounded by 0.25 per dim, so the
  * 1e-12 fixed-point sum stays ≤ dim·2.5e11 (no long overflow below
  * ~3.7e7 dims); the mse scales back by scale² at the end. Quantizing
  * the absolute d² instead would wrap negative for |x| ≳ 1e4 at
  * embedding-like dims.
  */
case class Int8QuantStats(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen {

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("dim", IntegerType,
        nullable = false),
      org.apache.spark.sql.types.StructField("max_q",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("min_q",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("mse", DoubleType,
        nullable = false)))
  override def prettyName: String = "graft_int8_quant_stats"

  override def kernel(a: Any): Any = {
    val xs = VecKernels.floats(a.asInstanceOf[ArrayData])
    val n = xs.length
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(xs(i).toDouble)
      if (v > maxabs) maxabs = v
      i += 1
    }
    if (maxabs == 0.0)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n, 0L, 0L, 0.0))
    else {
      val scale = maxabs / 127.0
      var maxQ = Long.MinValue
      var minQ = Long.MaxValue
      var sumEq = 0L
      i = 0
      while (i < n) {
        val x = xs(i).toDouble
        val q = math.floor(x / scale + 0.5).toLong
        val r = x / scale - q.toDouble // dimensionless error, |r| <= 0.5
        sumEq += math.floor(r * r * 1e12).toLong
        if (q > maxQ) maxQ = q
        if (q < minQ) minQ = q
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n, maxQ, minQ,
          sumEq.toDouble / 1e12 / n * (scale * scale)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

/** Mean-centered matrix projection `y = P(x − μ)` for one float vector,
  * as ONE map-side compiled pass — the PCA/dimension-reduction apply
  * step ([[graft.operators.Embeddings]]). The k×d projection matrix and
  * the mean ride inside the expression (k·d doubles — the same payload
  * a broadcast would ship) via the codegen reference object, so the
  * enclosing stage stays whole-stage compiled and NOTHING shuffles:
  * reducing a 100 TB embedding column is a pure scan.
  *
  * Output is float (the engine's embedding element type) so projected
  * vectors compose with every existing kernel (VecDot, banding, IVF).
  */
case class MatProject(child: Expression, mean: Seq[Double],
    components: Seq[Seq[Double]])
    extends UnaryExpression with UnaryKernelCodegen {

  require(components.nonEmpty, "need at least one component")
  require(components.forall(_.length == mean.length),
    "component dims must match the mean dim")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_mat_project"

  @transient private lazy val mu: Array[Double] = mean.toArray
  @transient private lazy val p: Array[Array[Double]] =
    components.map(_.toArray).toArray

  override def kernel(a: Any): Any = {
    val xs = VecKernels.floats(a.asInstanceOf[ArrayData])
    val d = math.min(xs.length, mu.length)
    val k = p.length
    val out = new Array[Any](k)
    var r = 0
    while (r < k) {
      val row = p(r)
      var acc = 0.0
      var i = 0
      while (i < d) {
        acc += row(i) * (xs(i).toDouble - mu(i))
        i += 1
      }
      out(r) = acc.toFloat
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MatProject =
    copy(child = newChild)
}
