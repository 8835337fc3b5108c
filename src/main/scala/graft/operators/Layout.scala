package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional file layout: Z-order (Morton) clustering so that
  * parquet min/max footers stay TIGHT on every clustered column at
  * once — the data-skipping property a single-column sort can only give
  * to its leading column.
  *
  * Why this matters at 100 TB: a range-clustered table answers
  * `WHERE a BETWEEN ...` by pruning files on `a`'s footer stats, but a
  * predicate on `b` still scans everything — each file spans `b`'s full
  * range. Interleaving the bits of (a, b, ...) into one sort key makes
  * every file a small hyper-rectangle, so per-file min/max is narrow in
  * EVERY dimension and scans with a predicate on ANY clustered column
  * skip most files. The curve is pure integer bit arithmetic — an
  * engine-exact, oracle-checkable expression, not a library call.
  *
  * Scale shape: computing the key is map-side; the write is one
  * repartitionByRange on the key (the same shuffle any clustered write
  * pays) + a partition-local sort. Nothing here is driver-side.
  */
object Layout {

  /** Morton interleave of `cols` (non-negative integers, `bits` low
    * bits each): bit j of column c lands at output bit `j·n + c`.
    * Columns must already be scaled to [0, 2^bits) — rank/bucket
    * normalization is the caller's modeling decision (quantile buckets,
    * modulo, truncation...), not hidden here. With n·bits ≤ 62 the key
    * fits a long.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits > 0 && cols.size * bits <= 62,
      s"${cols.size} cols × $bits bits must fit a long")
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * n + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** `df` re-arranged along the Z-curve of `clusterCols`: each column
    * is rank-bucketed to `bits` bits (so arbitrary skewed numeric
    * columns interleave meaningfully — see [[rankBuckets]]), the Morton
    * key range-partitions the frame (into `numFiles` when given, else
    * Spark's default parallelism) and orders rows within partitions,
    * and the scaffolding columns are dropped. This is the reusable
    * half of [[writeZOrdered]]; [[graft.core.Collection]]'s `zOrderBy`
    * write mode routes through it so the engine's own table format
    * gets multi-dimension clustering natively.
    */
  def zClustered(df: DataFrame, clusterCols: Seq[String], bits: Int,
      numFiles: Option[Int] = None): DataFrame = {
    val bucketed = clusterCols.foldLeft(df)(
      (acc, c) => rankBuckets(acc, c, bits))
    val z = zValue(clusterCols.map(c => col(s"${c}_bucket")), bits)
    val keyed = bucketed.withColumn("__z", z)
    val rp = numFiles match {
      case Some(n) => keyed.repartitionByRange(n, col("__z"))
      case None => keyed.repartitionByRange(col("__z"))
    }
    rp.sortWithinPartitions(col("__z"))
      .drop("__z" +: clusterCols.map(c => s"${c}_bucket"): _*)
  }

  /** Write `df` clustered on the Z-curve of `clusterCols` (each scaled
    * to `bits` bits): range-partition by the Morton key into
    * `numFiles` files, sort within each, drop the key from the stored
    * schema. Every output file covers a compact curve segment — a
    * hyper-rectangle union — so its footer min/max is tight on every
    * clustered column and predicates on any of them prune files.
    */
  def writeZOrdered(df: DataFrame, path: String, clusterCols: Seq[String],
      bits: Int, numFiles: Int): Unit = {
    val z = zValue(clusterCols.map(col), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Rank-normalize a numeric column into `[0, 2^bits)` bucket ids for
    * [[zValue]]: approximate quantile boundaries (collected once — at
    * most 2^bits+1 doubles on the driver) become a broadcast band
    * table, and every row picks its bucket with a map-side
    * [[RangeJoin.bandJoin]] probe. This is what makes Z-order practical
    * on real columns: raw value bits interleave badly when the
    * distribution is skewed (most buckets empty, hot buckets huge), but
    * rank buckets are near-equal-mass by construction, so the curve
    * splits data — not value space — evenly.
    *
    * Heavy repetition collapses duplicate boundaries (fewer, still
    * ordered buckets); the outermost bands are widened to ±∞ so every
    * non-null value lands somewhere. The bucket id column is named
    * `<col>_bucket`.
    */
  def rankBuckets(df: DataFrame, colName: String, bits: Int,
      relativeError: Double = 0.001): DataFrame = {
    require(bits > 0 && bits <= 16, s"bits must be in [1,16], got $bits")
    val n = 1 << bits
    val probs = (0 to n).map(_.toDouble / n).toArray
    val bounds = df.stat.approxQuantile(colName, probs, relativeError)
      .distinct.sorted
    val spark = df.sparkSession
    import spark.implicits._
    val bands = bounds.sliding(2).zipWithIndex.collect {
      case (Array(lo, hi), i) => (i, lo, hi)
    }.toSeq match {
      case Seq() => Seq((0, Double.NegativeInfinity,
        Double.PositiveInfinity)) // constant column: one bucket
      case bs =>
        // widen the outer bands so min/max round-off never drops rows
        val w = bs.updated(0, (0, Double.NegativeInfinity, bs.head._3))
        w.updated(w.size - 1,
          (w.last._1, w.last._2, Double.PositiveInfinity))
    }
    val dim = bands.toDF("__bucket_id", "__lo", "__hi")
    RangeJoin.bandJoin(df, dim, colName, "__lo", "__hi")
      .withColumn(s"${colName}_bucket", col("__bucket_id"))
      .drop("__bucket_id", "__lo", "__hi")
  }

  /** Per-file tightness report for a written table: for each file and
    * each column, the fraction of the column's global range the file
    * spans (the exact quantity file-skipping prunes on — parquet
    * footers store these min/max per file). `avg_span` near 1/numFiles
    * on every clustered column is the Z-order win; a single-column sort
    * shows ~1.0 on every non-leading column.
    */
  def fileSpans(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
      .withColumn("__file", input_file_name())
    val perFile = df.groupBy(col("__file"))
      .agg(cols.flatMap(c => Seq(
        min(col(c).cast("long")).as(s"__min_$c"),
        max(col(c).cast("long")).as(s"__max_$c"))).head,
        cols.flatMap(c => Seq(
          min(col(c).cast("long")).as(s"__min_$c"),
          max(col(c).cast("long")).as(s"__max_$c"))).tail: _*)
    val global = df.agg(
      cols.flatMap(c => Seq(
        min(col(c).cast("long")).as(s"__gmin_$c"),
        max(col(c).cast("long")).as(s"__gmax_$c"))).head,
      cols.flatMap(c => Seq(
        min(col(c).cast("long")).as(s"__gmin_$c"),
        max(col(c).cast("long")).as(s"__gmax_$c"))).tail: _*)
    val joined = perFile.crossJoin(broadcast(global))
    cols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(s"span_$c",
        (col(s"__max_$c") - col(s"__min_$c") + 1).cast("double") /
        (col(s"__gmax_$c") - col(s"__gmin_$c") + 1).cast("double"))
    }.select((col("__file").as("file") +:
      cols.map(c => col(s"span_$c"))): _*)
  }
}
