package graft.functions

import java.net.URL
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** `parse_url_tuple(url, part1, part2, ...)` — the reference UDTF
  * (`ql/udf/generic/GenericUDTFParseUrlTuple.java`), as a real Catalyst
  * Generator so Spark SQL's `LATERAL VIEW parse_url_tuple(...) t AS c1, c2`
  * works verbatim. Semantics mirrored: parts resolve through
  * `java.net.URL` accessors (`:214-222` — HOST/PATH/QUERY/REF/PROTOCOL/
  * FILE/AUTHORITY/USERINFO), `QUERY:<key>` extracts group 2 of
  * `(&|^)key=([^&]*)` over `getQuery()` (`:234`), an unknown part name or
  * malformed URL yields NULL in that column, and exactly ONE output row is
  * forwarded per input row. Part names must be literals (the reference
  * requires constant ObjectInspectors the same way). */
case class ParseUrlTuple(children: Seq[Expression])
    extends Generator with CodegenFallback {

  private lazy val parts: Array[String] = children.tail.map { e =>
    val v = e.eval(InternalRow.empty)
    if (v == null) "" else v.toString
  }.toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.size < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "parse_url_tuple needs a url and at least one part name")
    else if (!children.tail.forall(c => c.foldable && c.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "parse_url_tuple part names must be string literals")
    else if (children.head.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "parse_url_tuple url must be a string")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def elementSchema: StructType =
    StructType(parts.zipWithIndex.map { case (p, i) =>
      StructField(s"c$i", StringType, nullable = true)
    })

  private def part(url: URL, p: String): String = p.toUpperCase match {
    case "HOST" => url.getHost
    case "PATH" => url.getPath
    case "QUERY" => url.getQuery
    case "REF" => url.getRef
    case "PROTOCOL" => url.getProtocol
    case "FILE" => url.getFile
    case "AUTHORITY" => url.getAuthority
    case "USERINFO" => url.getUserInfo
    case q if q.startsWith("QUERY:") =>
      val query = url.getQuery
      if (query == null) null
      else {
        val m = Pattern.compile("(&|^)" + Pattern.quote(p.substring(6)) +
          "=([^&]*)").matcher(query)
        if (m.find()) m.group(2) else null
      }
    case _ => null // the reference maps unknown names to NULLNAME
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val u = children.head.eval(input)
    val out = new Array[Any](parts.length)
    if (u != null) {
      try {
        val url = new URL(u.toString)
        var i = 0
        while (i < parts.length) {
          val v = part(url, parts(i))
          out(i) = if (v == null) null else UTF8String.fromString(v)
          i += 1
        }
      } catch { case _: java.net.MalformedURLException => () } // all-null row
    }
    Seq(new GenericInternalRow(out))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ParseUrlTuple = copy(children = newChildren)
}

/** `reflect2(obj, 'method', args...)` — the reference's
  * GenericUDFReflect2 (`ql/udf/generic/GenericUDFReflect2.java`): invokes a
  * Java method ON the value itself (vs `reflect`/`java_method`, which call
  * static methods). The method is resolved at analysis time from the
  * receiver's Spark type's Java box and the argument types (primitive
  * signatures tried first, then boxed), so the return DataType is static.
  * NULL receiver or NULL argument → NULL. Eval-only (reflection has no
  * codegen win); like the reference, the method name must be a literal. */
case class Reflect2(children: Seq[Expression])
    extends Expression with CodegenFallback {

  private def javaBox(t: DataType): Class[_] = t match {
    case StringType => classOf[java.lang.String]
    case IntegerType => classOf[java.lang.Integer]
    case LongType => classOf[java.lang.Long]
    case ShortType => classOf[java.lang.Short]
    case ByteType => classOf[java.lang.Byte]
    case BooleanType => classOf[java.lang.Boolean]
    case DoubleType => classOf[java.lang.Double]
    case FloatType => classOf[java.lang.Float]
    case other => throw new IllegalArgumentException(
      s"reflect2: unsupported receiver/argument type ${other.sql}")
  }

  private def primitive(c: Class[_]): Class[_] =
    if (c == classOf[java.lang.Integer]) java.lang.Integer.TYPE
    else if (c == classOf[java.lang.Long]) java.lang.Long.TYPE
    else if (c == classOf[java.lang.Short]) java.lang.Short.TYPE
    else if (c == classOf[java.lang.Byte]) java.lang.Byte.TYPE
    else if (c == classOf[java.lang.Boolean]) java.lang.Boolean.TYPE
    else if (c == classOf[java.lang.Double]) java.lang.Double.TYPE
    else if (c == classOf[java.lang.Float]) java.lang.Float.TYPE
    else c

  private lazy val methodName: String =
    children(1).eval(InternalRow.empty).toString

  @transient private lazy val method: java.lang.reflect.Method = {
    val recv = javaBox(children.head.dataType)
    val argBoxes = children.drop(2).map(c => javaBox(c.dataType))
    try recv.getMethod(methodName, argBoxes.map(primitive): _*)
    catch { case _: NoSuchMethodException =>
      recv.getMethod(methodName, argBoxes: _*)
    }
  }

  override def dataType: DataType = {
    val r = method.getReturnType
    if (r == classOf[String]) StringType
    else if (r == java.lang.Integer.TYPE || r == classOf[java.lang.Integer]) IntegerType
    else if (r == java.lang.Long.TYPE || r == classOf[java.lang.Long]) LongType
    else if (r == java.lang.Short.TYPE || r == classOf[java.lang.Short]) ShortType
    else if (r == java.lang.Byte.TYPE || r == classOf[java.lang.Byte]) ByteType
    else if (r == java.lang.Boolean.TYPE || r == classOf[java.lang.Boolean]) BooleanType
    else if (r == java.lang.Double.TYPE || r == classOf[java.lang.Double]) DoubleType
    else if (r == java.lang.Float.TYPE || r == classOf[java.lang.Float]) FloatType
    else throw new IllegalArgumentException(
      s"reflect2: unsupported return type ${r.getName} of $methodName")
  }

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.size < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "reflect2 needs a receiver and a method name")
    else if (!children(1).foldable || children(1).dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "reflect2 method name must be a string literal")
    else scala.util.Try { method; dataType } match {
      case scala.util.Success(_) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case scala.util.Failure(e) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"reflect2: ${e.getMessage}")
    }
  }

  private def toJava(v: Any): AnyRef = v match {
    case u: UTF8String => u.toString
    case other => other.asInstanceOf[AnyRef]
  }

  override def eval(input: InternalRow): Any = {
    val recv = children.head.eval(input)
    if (recv == null) return null
    val args = children.drop(2).map(_.eval(input))
    if (args.contains(null)) return null
    val out = method.invoke(toJava(recv), args.map(toJava): _*)
    out match {
      case null => null
      case s: String => UTF8String.fromString(s)
      case other => other
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Reflect2 = copy(children = newChildren)
}

/** Hive `ngrams(tokens, n, k)` UDAF
  * (`ql/udf/generic/GenericUDAFnGrams.java`): top-k n-gram frequencies over
  * per-row token arrays, returned as the reference's
  * `array<struct<ngram:array<string>, estfrequency:double>>`, frequency
  * descending (ties broken by the gram — deterministic where the reference
  * leaves ties unspecified). EXACT counts: the reference's fourth
  * `precision_factor` argument sizes a lossy in-memory heuristic; a shuffle
  * aggregation needs no such cap, so estfrequency here is the true
  * frequency (accuracy strictly ≥ the reference; documented deviation).
  * Buffer is a gram→count map — bounded by DISTINCT grams, with partial
  * aggregation upstream of the shuffle like any hash aggregate. */
class NGramsAgg extends org.apache.spark.sql.expressions.Aggregator[
    (Seq[String], Int, Int), (Map[String, Long], Int), Seq[NGramFreq]] {
  override def zero: (Map[String, Long], Int) = (Map.empty, 0)
  override def reduce(b: (Map[String, Long], Int),
      a: (Seq[String], Int, Int)): (Map[String, Long], Int) = {
    val (toks, n, k) = a
    var m = b._1
    if (toks != null && n > 0 && toks.length >= n) {
      var i = 0
      while (i <= toks.length - n) {
        val g = toks.slice(i, i + n).mkString(" ")
        m = m.updated(g, m.getOrElse(g, 0L) + 1L)
        i += 1
      }
    }
    (m, math.max(b._2, k))
  }
  override def merge(x: (Map[String, Long], Int),
      y: (Map[String, Long], Int)): (Map[String, Long], Int) =
    (y._1.foldLeft(x._1) { case (m, (g, c)) =>
      m.updated(g, m.getOrElse(g, 0L) + c)
    }, math.max(x._2, y._2))
  override def finish(b: (Map[String, Long], Int)): Seq[NGramFreq] =
    b._1.toSeq.sortBy { case (g, c) => (-c, g) }.take(b._2)
      .map { case (g, c) => NGramFreq(g.split(" ").toSeq, c.toDouble) }
  override def bufferEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Map[String, Long], Int)]()
  override def outputEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[NGramFreq]]()
}

/** One `ngrams`/`context_ngrams` result entry — the reference's output
  * struct field names (`GenericUDAFnGrams`: ngram, estfrequency). */
case class NGramFreq(ngram: Seq[String], estfrequency: Double)

/** Hive `context_ngrams(tokens, context, k)` UDAF
  * (`ql/udf/generic/GenericUDAFContextNGrams.java`): `context` is a token
  * pattern whose NULL slots are holes; each window of the row's tokens that
  * matches every non-null slot contributes its hole-fillers as one gram.
  * Same output shape and exactness note as [[NGramsAgg]]. */
class ContextNGramsAgg extends org.apache.spark.sql.expressions.Aggregator[
    (Seq[String], Seq[String], Int), (Map[String, Long], Int), Seq[NGramFreq]] {
  override def zero: (Map[String, Long], Int) = (Map.empty, 0)
  override def reduce(b: (Map[String, Long], Int),
      a: (Seq[String], Seq[String], Int)): (Map[String, Long], Int) = {
    val (toks, ctx, k) = a
    var m = b._1
    if (toks != null && ctx != null && ctx.nonEmpty && toks.length >= ctx.length) {
      val n = ctx.length
      var i = 0
      while (i <= toks.length - n) {
        var ok = true
        var j = 0
        while (ok && j < n) {
          if (ctx(j) != null && ctx(j) != toks(i + j)) ok = false
          j += 1
        }
        if (ok) {
          val fillers = (0 until n).collect { case j if ctx(j) == null => toks(i + j) }
          val g = fillers.mkString(" ")
          m = m.updated(g, m.getOrElse(g, 0L) + 1L)
        }
        i += 1
      }
    }
    (m, math.max(b._2, k))
  }
  override def merge(x: (Map[String, Long], Int),
      y: (Map[String, Long], Int)): (Map[String, Long], Int) =
    (y._1.foldLeft(x._1) { case (m, (g, c)) =>
      m.updated(g, m.getOrElse(g, 0L) + c)
    }, math.max(x._2, y._2))
  override def finish(b: (Map[String, Long], Int)): Seq[NGramFreq] =
    b._1.toSeq.sortBy { case (g, c) => (-c, g) }.take(b._2)
      .map { case (g, c) => NGramFreq(g.split(" ").toSeq, c.toDouble) }
  override def bufferEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Map[String, Long], Int)]()
  override def outputEncoder =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[NGramFreq]]()
}
