package graft.serde

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-compatible re-implementation of the reference's row→JSON
  * transcoder (GenericRecordJsonEncoder.java:42-216) as a Catalyst
  * expression over a struct column. Matches the reference's quirks
  * exactly, which `to_json` does not:
  *
  *  - NaN / ±Infinity floats render as QUOTED strings ("NaN",
  *    "Infinity", "-Infinity") to keep the JSON valid
  *    (GenericRecordJsonEncoder.java:118-124);
  *  - binary renders as the nested object {"bytes": "<ISO-8859-1>"}
  *    rather than base64 (:113-117);
  *  - map keys are always quoted strings (:90-108);
  *  - fields appear in schema order (:63);
  *  - logical types pass through as raw numbers — timestamp as epoch
  *    micros, date as epoch days — matching the reference's
  *    no-converter-registered default (:34-40); callers register
  *    converters (column transforms) to override, exactly like the
  *    reference's addTypeConverter (ParquetArangoLoader.java:74-76);
  *  - string escaping covers `"` `\` \b \f \n \r \t plus hex escapes
  *    for remaining C0 controls, C1 (0x7F–0x9F), and U+2000–U+20FF
  *    (:178-216).
  *
  * The circular-reference guard of the reference (:49-58) has no Spark
  * counterpart: rows are trees by construction.
  */
case class QuirkJson(child: Expression)
    extends UnaryExpression with graft.expressions.UnaryKernelCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_quirk_json"

  private lazy val schema = child.dataType.asInstanceOf[StructType]

  override def kernel(v: Any): Any = {
    val sb = new java.lang.StringBuilder(256)
    QuirkJson.writeStruct(v.asInstanceOf[InternalRow], schema, sb)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): QuirkJson =
    copy(child = newChild)
}

object QuirkJson {

  private[graft] def writeStruct(row: InternalRow, st: StructType,
      sb: java.lang.StringBuilder): Unit = {
    sb.append('{')
    var i = 0
    while (i < st.fields.length) {
      if (i > 0) sb.append(", ")
      writeEscapedString(st.fields(i).name, sb)
      sb.append(": ")
      if (row.isNullAt(i)) sb.append("null")
      else writeValue(row.get(i, st.fields(i).dataType), st.fields(i).dataType, sb)
      i += 1
    }
    sb.append('}')
  }

  private def writeArray(arr: ArrayData, et: DataType,
      sb: java.lang.StringBuilder): Unit = {
    sb.append('[')
    var i = 0
    while (i < arr.numElements()) {
      if (i > 0) sb.append(", ")
      if (arr.isNullAt(i)) sb.append("null")
      else writeValue(arr.get(i, et), et, sb)
      i += 1
    }
    sb.append(']')
  }

  private def writeMap(m: MapData, kt: DataType, vt: DataType,
      sb: java.lang.StringBuilder): Unit = {
    sb.append('{')
    val ks = m.keyArray()
    val vs = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      if (i > 0) sb.append(", ")
      // map keys render as quoted strings regardless of type
      // (reference: Avro map keys are always CharSequence, :97-100)
      writeEscapedString(String.valueOf(ks.get(i, kt) match {
        case u: UTF8String => u.toString
        case other => other
      }), sb)
      sb.append(": ")
      if (vs.isNullAt(i)) sb.append("null")
      else writeValue(vs.get(i, vt), vt, sb)
      i += 1
    }
    sb.append('}')
  }

  private def writeValue(v: Any, dt: DataType,
      sb: java.lang.StringBuilder): Unit = dt match {
    case st: StructType => writeStruct(v.asInstanceOf[InternalRow], st, sb)
    case ArrayType(et, _) => writeArray(v.asInstanceOf[ArrayData], et, sb)
    case MapType(kt, vt, _) => writeMap(v.asInstanceOf[MapData], kt, vt, sb)
    case _: StringType => writeEscapedString(v.asInstanceOf[UTF8String].toString, sb)
    case BinaryType =>
      // {"bytes": "<ISO-8859-1 decoded>"} — reference :113-117
      sb.append("{\"bytes\": ")
      val bytes = v.asInstanceOf[Array[Byte]]
      val chars = new Array[Char](bytes.length)
      var i = 0
      while (i < bytes.length) { chars(i) = (bytes(i) & 0xff).toChar; i += 1 }
      writeEscapedString(new String(chars), sb)
      sb.append('}')
    case DoubleType =>
      val d = v.asInstanceOf[Double]
      if (d.isNaN || d.isInfinite) writeEscapedString(d.toString, sb)
      else sb.append(d)
    case FloatType =>
      val f = v.asInstanceOf[Float]
      if (f.isNaN || f.isInfinite) writeEscapedString(f.toString, sb)
      else sb.append(f)
    case _: DecimalType =>
      sb.append(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.toPlainString)
    // logical types unconverted: timestamp = epoch micros, date = epoch
    // days (reference default, GenericRecordJsonEncoder.java:34-40)
    case _ => sb.append(String.valueOf(v))
  }

  /** Escaping per GenericRecordJsonEncoder.java:178-216. */
  private[serde] def writeEscapedString(s: CharSequence,
      sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          if (c < 0x20 || (c >= 0x7f && c <= 0x9f) ||
              (c >= 0x2000 && c <= 0x20ff))
            // uppercase hex digits, zero-padded to 4 — reference :205-210
            sb.append("\\u").append(f"${c.toInt}%04X")
          else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}
