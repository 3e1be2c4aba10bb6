package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, NumericType}

/** Hive `field(needle, v1, v2, ...)` — 1-based index of the first haystack
  * argument equal to `needle`, 0 when absent or when `needle` is null.
  * Reference semantics: `ql/.../udf/generic/GenericUDFField.java` (registered
  * at `exec/FunctionRegistry.java:255`). Spark has no equivalent built-in.
  *
  * Comparison is on Catalyst internal values (UTF8String / boxed
  * primitives); mixed numeric widths are compared on their double value
  * (Hive coerces the arguments to a common type — boxed Integer==Long is
  * false in Java, which would silently return 0 for field(1, 1L)).
  */
case class FieldIndex(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.size < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("field() requires a needle and at least one haystack value")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  // lazy: the expression is constructed (and copied) before resolution,
  // when children's dataType is not yet callable
  @transient private lazy val numeric: Array[Boolean] =
    children.map(_.dataType.isInstanceOf[NumericType]).toArray

  // Catalyst Decimal is NOT a java.lang.Number — without its own case,
  // field(1, CAST(1 AS DECIMAL(10,2))) would return 0 where Hive coerces
  // decimal with the other numerics and returns 1
  private def dbl(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
    case _ => Double.NaN // non-numeric value under a NumericType slot: no match
  }

  private def eq(a: Any, ai: Int, b: Any, bi: Int): Boolean =
    if (a == b) true
    // mixed-width/representation numerics compare on their double value
    else if (numeric(ai) && numeric(bi)) dbl(a) == dbl(b)
    else false

  override def eval(input: InternalRow): Any = {
    val needle = children.head.eval(input)
    if (needle == null) 0
    else {
      var i = 1
      while (i < children.length) {
        val v = children(i).eval(input)
        if (v != null && eq(needle, 0, v, i)) return i
        i += 1
      }
      0
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
