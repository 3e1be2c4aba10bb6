package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `in_file(str, filename)` — true iff `str` equals a full line of the file
  * (reference: `ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
  * GenericUDFInFile.java`, registered at `FunctionRegistry.java:255`).
  *
  * The file is read once per deserialized expression instance (≈ once per
  * task) and cached as a hash set — the same lifetime as Hive's lazy
  * per-operator-instance load, so a file replaced between queries is
  * re-read by the next query rather than served stale from a JVM-wide
  * cache. At cluster scale the path must be task-visible — ship it with
  * `SparkContext.addFile` and pass `SparkFiles.get(name)`, same contract as
  * Hive's requirement that the file be a shared filesystem path. Lookup
  * files are small dimension-like side inputs; this is deliberately an
  * eval-cached expression, not a join, to match Hive's semantics (exact
  * whole-line match, no type coercion).
  */
case class InFile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"in_file requires (string, string), got (${left.dataType}, ${right.dataType})")
    else if (!right.foldable)
      // the side-file contract (matching GenericUDFInFile): a constant path.
      // A per-row filename would mean unbounded cache growth plus file I/O
      // on the eval path — reject at analysis instead of degrading at run.
      TypeCheckResult.TypeCheckFailure("in_file filename must be a constant")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_file"

  // per-instance (≈ per-task after deserialization): a fresh query picks up
  // a rewritten lookup file instead of a stale JVM-wide entry
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()

  override protected def nullSafeEval(str: Any, file: Any): Any = {
    val lines = cache.computeIfAbsent(file.toString, p =>
      Files.readAllLines(Paths.get(p), StandardCharsets.UTF_8).asScala.toSet)
    lines.contains(str.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InFile =
    copy(left = newLeft, right = newRight)
}
