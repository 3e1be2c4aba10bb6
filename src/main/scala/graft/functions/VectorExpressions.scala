package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: dot product of two float32 arrays, accumulated
  * in double, with whole-stage codegen. The SQL-function route
  * (`aggregate(zip_with(a, b, ...), ...)`) allocates an intermediate array and
  * boxes every element; at ANN scale (candidates × 64 floats) this expression
  * is the hot loop, so it reads both `ArrayData` buffers directly — the shape
  * Hive's vectorized kernels get from templates
  * (`ql/src/gen/vectorization/ExpressionTemplates/ColumnArithmeticColumn.txt`),
  * re-expressed as Tungsten codegen.
  *
  * Null semantics: null if either array is null; null array *elements* are
  * treated as 0 (documented deviation — embeddings have no null elements).
  * A dimension mismatch raises (a silent min-length truncation would turn a
  * malformed embedding into a plausible-but-wrong score).
  */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 requires array<float> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"dot_f32: dimension mismatch (${x.numElements()} vs ${y.numElements()}) — " +
          "a silent min-length truncation would skew every score")
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  throw new IllegalArgumentException("dot: dimension mismatch (" +
         |    $x.numElements() + " vs " + $y.numElements() + ")");
         |}
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen dot product of two int64 arrays (quantized-embedding
  * scoring path — exact integer arithmetic, so the DuckDB oracle reproduces
  * the result bit-for-bit). Null arrays → null; null elements → 0. */
case class DotI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i64 requires array<bigint> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"dot_i64: dimension mismatch (${x.numElements()} vs ${y.numElements()}) — " +
          "a silent min-length truncation would skew every score")
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  throw new IllegalArgumentException("dot: dimension mismatch (" +
         |    $x.numElements() + " vs " + $y.numElements() + ")");
         |}
         |int $n = $x.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += $x.getLong($i) * $y.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen dot product of two int8 code vectors stored as `binary`
  * (the int8-quantized embedding format — [[graft.operators.Int8Quantize]]).
  * Works on the raw byte[] with no per-element null slots: a code vector is
  * dense by construction, so this is the tightest inner loop of the three dot
  * kernels (1 byte/element vs 8 for [[DotI64]]). Accumulates in long
  * (|code| ≤ 127 ⇒ a 64-dim dot fits in 21 bits — no overflow at any
  * realistic dimension). Null binary → null; dimension mismatch raises. */
case class DotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i8 requires binary inputs, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"dot_i8: dimension mismatch (${x.length} vs ${y.length}) — " +
          "a silent min-length truncation would skew every score")
    var acc = 0L
    var i = 0
    while (i < x.length) { acc += x(i).toLong * y(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.length != $y.length) {
         |  throw new IllegalArgumentException("dot_i8: dimension mismatch (" +
         |    $x.length + " vs " + $y.length + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $x.length; $i++) {
         |  $acc += (long) $x[$i] * (long) $y[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen Hamming distance between two sign-bit code vectors stored
  * as `binary` (the 1-bit embedding codec — [[graft.operators.BinaryAnn]]):
  * XOR byte-by-byte, popcount, sum. This is the binary-index hot loop
  * (faiss `IndexBinaryFlat`'s `hamming()` kernel re-expressed for Tungsten):
  * per candidate it touches dim/8 bytes — at 64 dims ONE long's worth —
  * vs 8 bytes/dim for [[DotI64]], which is why a binary shortlist scan is
  * memory-bandwidth-cheap enough to run ahead of exact rescoring at corpus
  * scale. `Integer.bitCount` on the zero-extended byte JIT-compiles to
  * POPCNT. Null binary → null; length mismatch raises (same contract as the
  * dot kernels — silent truncation would skew every distance). */
case class HammingBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_bits requires binary inputs, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"hamming_bits: code length mismatch (${x.length} vs ${y.length}) — " +
          "a silent min-length truncation would skew every distance")
    var acc = 0L
    var i = 0
    while (i < x.length) {
      acc += java.lang.Integer.bitCount((x(i) ^ y(i)) & 0xff)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.length != $y.length) {
         |  throw new IllegalArgumentException("hamming_bits: code length mismatch (" +
         |    $x.length + " vs " + $y.length + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $x.length; $i++) {
         |  $acc += java.lang.Integer.bitCount(($x[$i] ^ $y[$i]) & 0xff);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
