package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band/interval) join: attach to each fact row the dimension row
  * whose `[lo, hi)` interval contains `valueCol`.
  *
  * The dimension side is broadcast, so the physical plan is a
  * BroadcastNestedLoopJoin — the correct shape when the band table is
  * small (the usual case: price bands, SLA tiers, histogram buckets). The
  * fact side streams through executors with no shuffle at all; at 100 TB
  * this is a map-only operation. For a *large* interval side one would
  * bucket both sides by floor(value/width) and equi-join on the bucket —
  * that variant lives in the caller's hands via `bucketedBandJoin`.
  */
object RangeJoin {

  /** Broadcast band join — dim must be small (driver-collectable). */
  def bandJoin(
      fact: DataFrame,
      dim: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String): DataFrame =
    fact.join(broadcast(dim),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))

  /** Equi-join variant for uniform band width: both sides are bucketed by
    * floor(value/width) and the join is a plain shuffle/broadcast hash
    * join on the bucket id — scales to arbitrarily large interval tables
    * as long as intervals do not span more than one bucket (callers split
    * wider intervals into per-bucket rows first).
    */
  def bucketedBandJoin(
      fact: DataFrame,
      dim: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      width: Double): DataFrame = {
    val f = fact.withColumn("__bucket", floor(col(valueCol) / width))
    val d = dim.withColumn("__bucket", floor(col(loCol) / width))
    f.join(d, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
