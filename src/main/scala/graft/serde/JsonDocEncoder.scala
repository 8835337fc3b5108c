package graft.serde

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Row→JSON document rendering — the engine's counterpart of the
  * reference's GenericRecordJsonEncoder + per-logical-type converter
  * registry (A4–A6 in SURVEY §2.1).
  *
  * Two modes:
  *  - default: Spark's codegen'd `to_json(struct("*"))` — clean JSON
  *    semantics (base64 binary, ISO timestamps), the right choice for
  *    new pipelines;
  *  - quirk-compat ([[QuirkJson]]): byte-compatible with the reference
  *    encoder's field order, NaN/Infinity quoting, `{"bytes": ...}`
  *    binary rendering, and escape table.
  *
  * Converters mirror the reference's `addTypeConverter(LogicalType, fn)`
  * (ParquetArangoLoader.java:74-76): a map from Spark `DataType` to a
  * column transform, applied to every column of that type *before*
  * encoding — e.g. `TimestampType -> (c => date_format(c,
  * "yyyy-MM-dd'T'HH:mm:ss"))` reproduces the reference Javadoc's
  * canonical ISO-8601 example (:44-53).
  */
object JsonDocEncoder {

  /** Apply per-DataType column transforms (the converter registry). */
  def applyConverters(df: DataFrame,
      converters: Map[DataType, Column => Column]): DataFrame =
    if (converters.isEmpty) df
    else {
      val cols = df.schema.fields.map { f =>
        converters.get(f.dataType) match {
          case Some(fn) => fn(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }
      df.select(cols.toSeq: _*)
    }

  /** All columns of `df` rendered to one JSON string per row. */
  def encode(df: DataFrame,
      converters: Map[DataType, Column => Column] = Map.empty,
      quirkCompat: Boolean = false): DataFrame = {
    val converted = applyConverters(df, converters)
    val doc =
      if (quirkCompat)
        ColumnBridge.column(QuirkJson(
          ColumnBridge.expression(struct(converted.columns.map(col).toSeq: _*))))
      else to_json(struct(converted.columns.map(col).toSeq: _*))
    converted.withColumn("doc", doc)
  }
}
