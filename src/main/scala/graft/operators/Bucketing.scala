package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffling a table ONCE at write time so
  * every subsequent equi-join/aggregation on the bucket key runs with NO
  * exchange — the standard way to amortize the dominant shuffle of a
  * repeatedly-joined 100 TB fact table. (The reference has no notion of
  * this; its collections are opaque to the query layer.)
  *
  * Both sides of a join must be bucketed into the same number of buckets
  * on the join key; `sortBy` additionally allows sort-merge join without
  * a per-task sort.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (Hive-style layout in
    * the session warehouse; the bucket spec lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
