package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Fixed-width big-endian binary codecs for KV-cell storage — the Spark-native
  * re-expression of the reference's HBase `Bytes.toBytes`/`Bytes.toLong` value
  * encoding that `hbase.columns.mapping`'s `#b` (binary storage) specifier
  * selects per column (`hbase-handler/.../ColumnMappings.java:146-233`,
  * "byte, short, int, long, float, and double have a binary byte oriented
  * storage option"). Widths match HBase: BOOLEAN 1, SHORT 2, INT 4, LONG 8,
  * FLOAT 4 (via `floatToIntBits`), DOUBLE 8 (via `doubleToLongBits`) —
  * byte-compatible with what an HBase client would have written, so a table
  * migrated cell-for-cell decodes identically.
  *
  * Both directions are native codegen'd Catalyst expressions (no UDF boxing):
  * the decode sits in the scan's hot loop, once per visible cell.
  */
object KvBytes {
  /** HBase binary-storage width in bytes for a primitive type. */
  def widthOf(t: DataType): Int = t match {
    case BooleanType => 1
    case ShortType => 2
    case IntegerType | FloatType => 4
    case LongType | DoubleType => 8
    case other => throw new IllegalArgumentException(
      s"kv binary storage supports boolean/short/int/long/float/double, got ${other.sql}")
  }
}

/** Encode a primitive to fixed-width big-endian bytes (HBase `Bytes.toBytes`). */
case class KvEncodeFixed(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BooleanType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kv_encode_fixed: unsupported type ${other.sql}")
  }

  private def putBe(buf: Array[Byte], bits: Long, w: Int): Array[Byte] = {
    var i = 0
    while (i < w) { buf(i) = ((bits >>> ((w - 1 - i) * 8)) & 0xff).toByte; i += 1 }
    buf
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    // HBase Bytes.toBytes(boolean) encodes true as (byte) -1 (0xFF), not 1
    case BooleanType => Array[Byte](if (v.asInstanceOf[Boolean]) -1 else 0)
    case ShortType => putBe(new Array[Byte](2), v.asInstanceOf[Short].toLong, 2)
    case IntegerType => putBe(new Array[Byte](4), v.asInstanceOf[Int].toLong, 4)
    case LongType => putBe(new Array[Byte](8), v.asInstanceOf[Long], 8)
    case FloatType =>
      putBe(new Array[Byte](4), java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong, 4)
    case DoubleType =>
      putBe(new Array[Byte](8), java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8)
    case other => throw new IllegalStateException(s"unreachable: ${other.sql}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val buf = ctx.freshName("buf")
      val bits = ctx.freshName("bits")
      val i = ctx.freshName("i")
      val w = KvBytes.widthOf(child.dataType)
      val toBits = child.dataType match {
        case BooleanType => s"long $bits = $x ? 0xffL : 0L;" // Bytes.toBytes(true) == 0xFF
        case FloatType => s"long $bits = (long) java.lang.Float.floatToIntBits($x);"
        case DoubleType => s"long $bits = java.lang.Double.doubleToLongBits($x);"
        case _ => s"long $bits = (long) $x;"
      }
      s"""
         |$toBits
         |byte[] $buf = new byte[$w];
         |for (int $i = 0; $i < $w; $i++) {
         |  $buf[$i] = (byte) (($bits >>> (($w - 1 - $i) * 8)) & 0xff);
         |}
         |${ev.value} = $buf;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Decode fixed-width big-endian bytes back to `target` (HBase `Bytes.toLong`
  * et al.). Raises on width mismatch — a silent zero-pad would turn a
  * corrupted or mis-mapped cell into a plausible value. */
case class KvDecodeFixed(child: Expression, target: DataType) extends UnaryExpression {

  override def dataType: DataType = target

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"kv_decode_fixed: input must be binary, got ${child.dataType.sql}")
    else target match {
      case BooleanType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kv_decode_fixed: unsupported target ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val w = KvBytes.widthOf(target)
    if (b.length != w) throw new IllegalArgumentException(
      s"kv_decode_fixed: expected $w bytes for ${target.sql}, got ${b.length}")
    var bits = 0L
    var i = 0
    while (i < w) { bits = (bits << 8) | (b(i) & 0xffL); i += 1 }
    target match {
      case BooleanType => bits != 0L
      case ShortType => bits.toShort
      case IntegerType => bits.toInt
      case LongType => bits
      case FloatType => java.lang.Float.intBitsToFloat(bits.toInt)
      case DoubleType => java.lang.Double.longBitsToDouble(bits)
      case other => throw new IllegalStateException(s"unreachable: ${other.sql}")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val bits = ctx.freshName("bits")
      val i = ctx.freshName("i")
      val w = KvBytes.widthOf(target)
      val out = target match {
        case BooleanType => s"${ev.value} = ($bits != 0L);"
        case ShortType => s"${ev.value} = (short) $bits;"
        case IntegerType => s"${ev.value} = (int) $bits;"
        case LongType => s"${ev.value} = $bits;"
        case FloatType => s"${ev.value} = java.lang.Float.intBitsToFloat((int) $bits);"
        case DoubleType => s"${ev.value} = java.lang.Double.longBitsToDouble($bits);"
        case other => throw new IllegalStateException(s"unreachable: ${other.sql}")
      }
      s"""
         |if ($x.length != $w) {
         |  throw new IllegalArgumentException(
         |    "kv_decode_fixed: expected $w bytes, got " + $x.length);
         |}
         |long $bits = 0L;
         |for (int $i = 0; $i < $w; $i++) {
         |  $bits = ($bits << 8) | ((long) $x[$i] & 0xffL);
         |}
         |$out
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
