package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Thrift TBinaryProtocol row serde — the reference's `ThriftDeserializer`
  * (`serde/src/java/.../thrift/ThriftDeserializer.java:57`, protocol
  * defaults to TBinaryProtocol) and schema-on-read `DynamicSerDe`
  * (`serde/src/java/.../dynamic_type/DynamicSerDe.java` — deserializes
  * thrift records from a DDL-declared field list, no compiled class)
  * re-expressed Spark-first: a compiled `mapPartitions` kernel parses the
  * strict (non-versioned) TBinaryProtocol struct encoding —
  * `[type:1][field-id:2 BE][value]*` terminated by STOP, values
  * big-endian, STRING = i32 length + utf8, LIST = elem-type + i32 count +
  * elements — into typed columns named by a (field-id, type, name)
  * projection, exactly the DynamicSerDe contract.
  *
  * Dynamic-type semantics carried over:
  *  - fields are matched by THRIFT FIELD ID, not position — a payload may
  *    carry them in any order;
  *  - unknown/unprojected fields are SKIPPED structurally (the
  *    `SkippableTProtocol` contract), so readers tolerate
  *    forward-evolved writers;
  *  - missing projected fields read as NULL (schema-on-read tolerance);
  *  - a malformed payload follows the PERMISSIVE rescue discipline: the
  *    row survives with `status='corrupt'` and NULL columns — one bad
  *    record never fails a 100 TB scan.
  *
  * Scale shape: parse is a per-partition compiled map — no shuffle, no
  * driver collection, constant memory per row; the encoder exists for
  * test-data generation and round-trip specs.
  */
object ThriftBinarySerde {

  // TBinaryProtocol type bytes (public thrift wire constants)
  val STOP: Byte = 0
  val BOOL: Byte = 2
  val BYTE: Byte = 3
  val DOUBLE: Byte = 4
  val I16: Byte = 6
  val I32: Byte = 8
  val I64: Byte = 10
  val STRING: Byte = 11
  val STRUCT: Byte = 12
  val LIST: Byte = 15

  /** One projected field: thrift id, wire type byte, output column name. */
  final case class Field(id: Short, tpe: Byte, name: String)

  private def sparkType(t: Byte): DataType = t match {
    case BOOL => BooleanType
    case BYTE => ByteType
    case DOUBLE => DoubleType
    case I16 => ShortType
    case I32 => IntegerType
    case I64 => LongType
    case STRING => StringType
    case LIST => ArrayType(LongType) // lists projected as list<i64>
    case other => throw new IllegalArgumentException(s"type $other")
  }

  // ---------------------------------------------------------------- encode

  /** Strict TBinaryProtocol struct writer (test-data generation + specs).
    * `values` = (field id, wire type, value); emitted in given order. */
  def encode(values: Seq[(Short, Byte, Any)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    val d = new java.io.DataOutputStream(out)
    values.foreach { case (id, tpe, v) =>
      d.writeByte(tpe); d.writeShort(id)
      writeValue(d, tpe, v)
    }
    d.writeByte(STOP)
    d.flush()
    out.toByteArray
  }

  private def writeValue(d: java.io.DataOutputStream, tpe: Byte,
      v: Any): Unit = tpe match {
    case BOOL => d.writeByte(if (v.asInstanceOf[Boolean]) 1 else 0)
    case BYTE => d.writeByte(v.asInstanceOf[Byte].toInt)
    case DOUBLE => d.writeDouble(v.asInstanceOf[Double])
    case I16 => d.writeShort(v.asInstanceOf[Short].toInt)
    case I32 => d.writeInt(v.asInstanceOf[Int])
    case I64 => d.writeLong(v.asInstanceOf[Long])
    case STRING =>
      val b = v.asInstanceOf[String].getBytes("UTF-8")
      d.writeInt(b.length); d.write(b)
    case LIST =>
      val xs = v.asInstanceOf[Seq[Long]]
      d.writeByte(I64.toInt); d.writeInt(xs.length)
      xs.foreach(d.writeLong)
    case other => throw new IllegalArgumentException(s"encode type $other")
  }

  // ---------------------------------------------------------------- decode

  private final class Reader(bytes: Array[Byte]) {
    private var p = 0
    private def need(n: Int): Unit =
      if (p + n > bytes.length)
        throw new IllegalArgumentException("truncated thrift payload")
    def i8(): Byte = { need(1); p += 1; bytes(p - 1) }
    def i16(): Short = { need(2)
      val v = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
      p += 2; v.toShort }
    def i32(): Int = { need(4)
      var v = 0; var i = 0
      while (i < 4) { v = (v << 8) | (bytes(p + i) & 0xff); i += 1 }
      p += 4; v }
    def i64(): Long = { need(8)
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (bytes(p + i) & 0xffL); i += 1 }
      p += 8; v }
    def str(): String = { val n = i32(); need(n)
      val s = new String(bytes, p, n, "UTF-8"); p += n; s }

    /** Reject a list count that cannot fit in the remaining bytes at the
      * element type's minimum wire width — shared by skip and value so both
      * paths enforce the same bound on malformed payloads. */
    private def checkListCount(et: Byte, n: Int): Unit = {
      val minW = et match {
        case BOOL | BYTE => 1; case I16 => 2; case I32 | STRING => 4
        case DOUBLE | I64 => 8; case _ => 1
      }
      require(n >= 0 && n.toLong * minW <= (bytes.length - p).toLong,
        s"bad list length $n")
    }

    /** Structurally skip one value of wire type `t`. Every advance is
      * bounds-checked and list counts are capped by remaining bytes /
      * min element width, so a malformed count fails fast instead of
      * spinning ~2^31 no-op iterations before the truncation surfaces. */
    def skip(t: Byte): Unit = t match {
      case BOOL | BYTE => need(1); p += 1
      case I16 => need(2); p += 2
      case I32 => need(4); p += 4
      case DOUBLE | I64 => need(8); p += 8
      case STRING => val n = i32(); require(n >= 0, s"bad string length $n"); need(n); p += n
      case LIST =>
        val et = i8(); val n = i32()
        checkListCount(et, n)
        var i = 0; while (i < n) { skip(et); i += 1 }
      case STRUCT =>
        var ft = i8()
        while (ft != STOP) { i16(); skip(ft); ft = i8() }
      case other =>
        throw new IllegalArgumentException(s"cannot skip type $other")
    }

    def value(t: Byte): Any = t match {
      case BOOL => i8() != 0
      case BYTE => i8()
      case DOUBLE => java.lang.Double.longBitsToDouble(i64())
      case I16 => i16()
      case I32 => i32()
      case I64 => i64()
      case STRING => str()
      case LIST =>
        val et = i8(); val n = i32()
        checkListCount(et, n)
        if (et == I64) {
          val a = new Array[Long](n)
          var i = 0; while (i < n) { a(i) = i64(); i += 1 }
          a.toSeq
        } else { // projected as list<i64>: non-i64 lists read as NULL
          var i = 0; while (i < n) { skip(et); i += 1 }
          null
        }
      case other =>
        throw new IllegalArgumentException(s"cannot read type $other")
    }

    /** Parse one struct into (field id → value) for the projected ids;
      * everything else is skipped structurally. */
    def struct(want: Map[Short, Byte]): Map[Short, Any] = {
      var out = Map.empty[Short, Any]
      var ft = i8()
      while (ft != STOP) {
        val id = i16()
        want.get(id) match {
          case Some(t) if t == ft => out += (id -> value(ft))
          case _ => skip(ft) // unknown id OR type-diverged: skip
        }
        ft = i8()
      }
      out
    }
  }

  /** Parse `binCol` of `df` into the projected columns (+ `status`:
    * 'ok' | 'corrupt'; corrupt rows keep NULL columns). Every other
    * column of `df` passes through. */
  def parse(df: DataFrame, binCol: String, fields: Seq[Field]): DataFrame = {
    val passThrough = df.schema.fields.filter(_.name != binCol)
    val outSchema = StructType(passThrough ++
      fields.map(f => StructField(f.name, sparkType(f.tpe))) :+
      StructField("status", StringType))
    val want = fields.map(f => f.id -> f.tpe).toMap
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    val passIdx = passThrough.map(f => df.schema.fieldIndex(f.name))
    df.mapPartitions { it =>
      it.map { r =>
        val base = passIdx.map(r.get)
        val parsed: (Seq[Any], String) =
          try {
            val m = new Reader(r.getAs[Array[Byte]](binIdx)).struct(want)
            (fields.map(f => m.get(f.id).orNull), "ok")
          } catch {
            case _: Exception => (fields.map(_ => null), "corrupt")
          }
        Row.fromSeq(base ++ parsed._1 :+ parsed._2)
      }
    }(enc)
  }
}
