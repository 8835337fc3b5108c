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
    * Malformed lines yield one all-null row — PERMISSIVE semantics,
    * matching what the constructed JSONOptions default claims (Spark's
    * own json source gets this from FailureSafeParser; without the
    * catch, the internal BadRecordException would fail the whole scan
    * job over one truncated line).
    */
  def parse(line: String): Seq[InternalRow] =
    if (line.trim.isEmpty) Nil
    else
      try parser.parse(line, CreateJacksonParser.string,
        UTF8String.fromString).toSeq
      catch {
        case _: org.apache.spark.sql.catalyst.util.BadRecordException |
            _: RuntimeException =>
          Seq(new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(schema.length))
      }
}
