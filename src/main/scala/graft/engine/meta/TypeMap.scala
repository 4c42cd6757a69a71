package graft.engine.meta

import org.apache.spark.sql.types._

/** Engine-agnostic type dialect ⇄ Spark `DataType`.
  *
  * The reference library declares table schemas in metadata JSON using a
  * deliberately narrow, engine-neutral set of type names (`character`,
  * `int`, `long`, `float`, `double`, `boolean`, `date`, `datetime`) and
  * translates them per target engine (SURVEY.md §1.1 [RECONSTRUCTED]).
  * We keep that dialect for metadata compatibility and extend it with the
  * types the LLM-pipeline surface needs: `decimal(p,s)`, `array<T>`,
  * `map<K,V>`, `struct<name:T,...>`, `binary`.
  */
object TypeMap {

  /** Parse an agnostic type name into a Spark DataType. */
  def toSpark(name: String): DataType = {
    val s = name.trim
    val lower = s.toLowerCase
    lower match {
      case "character" | "string" | "text"    => StringType
      case "int" | "integer"                  => IntegerType
      case "long" | "bigint"                  => LongType
      case "short" | "smallint"               => ShortType
      case "byte" | "tinyint"                 => ByteType
      case "float" | "real"                   => FloatType
      case "double"                           => DoubleType
      case "boolean" | "bool"                 => BooleanType
      case "date"                             => DateType
      case "datetime" | "timestamp"           => TimestampType
      case "binary"                           => BinaryType
      case _ if lower.startsWith("decimal") =>
        val args = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')')).split(',')
        DecimalType(args(0).trim.toInt, args(1).trim.toInt)
      case _ if lower.startsWith("array<") && s.endsWith(">") =>
        ArrayType(toSpark(inner(s, "array<")))
      case _ if lower.startsWith("map<") && s.endsWith(">") =>
        val Seq(k, v) = splitTop(inner(s, "map<"))
        MapType(toSpark(k), toSpark(v))
      case _ if lower.startsWith("struct<") && s.endsWith(">") =>
        StructType(splitTop(inner(s, "struct<")).map { f =>
          val i = f.indexOf(':')
          StructField(f.substring(0, i).trim, toSpark(f.substring(i + 1)))
        })
      case other =>
        throw new IllegalArgumentException(s"unknown agnostic type: $other")
    }
  }

  /** Render a Spark DataType back into the agnostic dialect. */
  def fromSpark(dt: DataType): String = dt match {
    case StringType          => "character"
    case IntegerType         => "int"
    case LongType            => "long"
    case ShortType           => "short"
    case ByteType            => "byte"
    case FloatType           => "float"
    case DoubleType          => "double"
    case BooleanType         => "boolean"
    case DateType            => "date"
    case TimestampType       => "datetime"
    case BinaryType          => "binary"
    case d: DecimalType      => s"decimal(${d.precision},${d.scale})"
    case ArrayType(et, _)    => s"array<${fromSpark(et)}>"
    case MapType(k, v, _)    => s"map<${fromSpark(k)},${fromSpark(v)}>"
    case StructType(fields)  =>
      fields.map(f => s"${f.name}:${fromSpark(f.dataType)}")
        .mkString("struct<", ",", ">")
    case other =>
      throw new IllegalArgumentException(s"no agnostic name for: $other")
  }

  private def inner(s: String, prefix: String): String =
    s.substring(prefix.length, s.length - 1)

  /** Split a comma-separated list at nesting depth zero. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case c @ ('<' | '(') => depth += 1; cur += c
      case c @ ('>' | ')') => depth -= 1; cur += c
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }
}
