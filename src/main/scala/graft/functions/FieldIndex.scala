package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Hive `field(needle, v1, v2, ...)` — 1-based index of the first haystack
  * argument equal to `needle`, 0 when absent or when `needle` is null.
  * Reference semantics: `ql/.../udf/generic/GenericUDFField.java` (registered
  * at `exec/FunctionRegistry.java:255`). Spark has no equivalent built-in.
  *
  * Children must share one type (strings in practice); comparison is on
  * Catalyst internal values (UTF8String / boxed primitives), which is
  * well-defined for atomic types.
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

  override def eval(input: InternalRow): Any = {
    val needle = children.head.eval(input)
    if (needle == null) 0
    else {
      var i = 1
      while (i < children.length) {
        val v = children(i).eval(input)
        if (v != null && v == needle) return i
        i += 1
      }
      0
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
