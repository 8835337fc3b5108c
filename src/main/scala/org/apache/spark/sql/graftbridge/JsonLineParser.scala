package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Bridge to Catalyst's JSON parser for the graft-docs V2 read path:
  * `JacksonParser`/`JSONOptions` are `private[sql]`, so the wrapper
  * lives in the `org.apache.spark.sql` package tree (same pattern as
  * [[ColumnBridge]]). Parsing against the REQUIRED schema only is what
  * makes the source's column pruning real — unprojected fields are
  * skipped at the tokenizer, never materialized.
  */
class JsonLineParser(schema: StructType) extends Serializable {

  @transient private lazy val parser =
    new JacksonParser(schema,
      new JSONOptions(Map.empty[String, String], "UTC"),
      allowArrayAsStructs = false)

  /** Rows parsed from one JSON document line (empty on blank lines).
    * Malformed lines yield the parser's partial result (fields that
    * parsed before the failure; all-null when nothing did) —
    * PERMISSIVE semantics, the same contract Spark's own json source
    * gets from FailureSafeParser. ONLY BadRecordException (the
    * malformed-input signal) is mapped; any other exception is a real
    * defect and still fails the scan loudly.
    */
  def parse(line: String): Seq[InternalRow] =
    if (line.trim.isEmpty) Nil
    else
      try parser.parse(line, CreateJacksonParser.string,
        UTF8String.fromString).toSeq
      catch {
        case e: org.apache.spark.sql.catalyst.util.BadRecordException =>
          val partial = e.partialResults()
          if (partial.nonEmpty) partial.toSeq
          else Seq(new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(schema.length))
      }
}
