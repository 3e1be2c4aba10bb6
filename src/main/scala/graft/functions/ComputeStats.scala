package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedException
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Hive's `compute_stats(col, numBitVectors)` UDAF — the internal aggregate
  * behind `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS`
  * (`ql/src/java/org/apache/hadoop/hive/ql/udf/generic/GenericUDAFComputeStats.java:53`).
  *
  * Output is a struct whose shape is dispatched on the input's primitive
  * category (`GenericUDAFComputeStats.getEvaluator`, `:70-98`):
  *   - boolean               → {columntype='Boolean', counttrues, countfalses, countnulls}
  *   - byte/short/int/long/timestamp → {columntype='Long',   min, max, countnulls, numdistinctvalues, ndvbitvector}
  *   - float/double          → {columntype='Double',  min, max, countnulls, numdistinctvalues, ndvbitvector}
  *   - decimal               → {columntype='Decimal', min, max, countnulls, numdistinctvalues, ndvbitvector}
  *   - date                  → {columntype='Date',    min, max, countnulls, numdistinctvalues, ndvbitvector}
  *   - string/char/varchar   → {columntype='String',  maxlength, avglength, countnulls, numdistinctvalues, ndvbitvector}
  *   - binary                → {columntype='Binary',  maxlength, avglength, countnulls}
  *
  * Spark-first re-expression: instead of a single imperative evaluator with
  * an FM-sketch NDV estimator (`NumDistinctValueEstimator`), the call is
  * rewritten at ANALYSIS time into a struct of native distributed aggregates
  * (min/max/count/count-distinct) — every leg is codegen'd, partial-aggregated
  * map-side, and `count(distinct)` is planned as Spark's two-phase expanded
  * distinct aggregate, so there is no per-group driver state at any scale.
  * Faithfulness notes:
  *   - Hive returns `numdistinctvalues = 0` when `numBitVectors = 0` (the
  *     estimator is disabled); we reproduce that. For `numBitVectors > 0`
  *     Hive returns the FM *estimate*; we return the exact distinct count —
  *     the value the estimator approximates (same stance as the exact
  *     `ngrams` UDAF: a lossy memory heuristic a shuffle aggregate doesn't
  *     need).
  *   - `ndvbitvector` is the serialized-sketch transport field consumed by
  *     the ANALYZE pipeline; with no sketch there is nothing to transport,
  *     so it is the empty string (schema parity is kept).
  *   - `avglength = sumlength / (count + countnulls)` — nulls count in the
  *     denominator with zero contribution (`:1016`, `:1264`), 0.0 on empty.
  *   - timestamps aggregate as epoch seconds (Hive's long view of TIMESTAMP).
  */
object ComputeStats {

  /** Unresolved placeholder produced by the SQL builder; rewritten by
    * [[ComputeStatsRewrite]] once the child's type is known. */
  case class Placeholder(child: Expression, numBitVectors: Expression)
      extends Expression with Unevaluable {
    override def children: Seq[Expression] = Seq(child, numBitVectors)
    override lazy val resolved: Boolean = false
    override def dataType: DataType = throw new UnresolvedException("compute_stats")
    override def nullable: Boolean = false
    override def prettyName: String = "compute_stats"
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0), numBitVectors = newChildren(1))
  }

  private def agg(f: AggregateFunction): Expression = f.toAggregateExpression()
  private def lit(s: String): Expression = Literal(s)

  /** count(*) - count(x): rows where x is null. */
  private def countNulls(child: Expression): Expression =
    Subtract(agg(Count(Literal(1))), agg(Count(child)))

  /** Exact distributed NDV — 0 when the estimator is disabled (nbv = 0). */
  private def ndv(child: Expression, nbv: Int): Expression =
    if (nbv == 0) Literal(0L)
    else Count(child).toAggregateExpression(isDistinct = true)

  private def named(pairs: (String, Expression)*): Expression =
    CreateNamedStruct(pairs.flatMap { case (n, e) => Seq(lit(n), e) })

  private def minMaxStats(
      tag: String, child: Expression, target: Option[DataType], nbv: Int): Expression = {
    val v = target.map(t => Cast(child, t)).getOrElse(child)
    named(
      "columntype" -> lit(tag),
      "min" -> agg(Min(v)),
      "max" -> agg(Max(v)),
      "countnulls" -> countNulls(child),
      "numdistinctvalues" -> ndv(child, nbv),
      "ndvbitvector" -> lit(""))
  }

  private def lengthStats(
      tag: String, child: Expression, withNdv: Boolean, nbv: Int): Expression = {
    val len = Cast(Length(child), LongType)
    val total = agg(Count(Literal(1)))
    val avg = Coalesce(Seq(
      Divide(Cast(agg(Sum(len)), DoubleType), Cast(total, DoubleType)),
      Literal(0.0d)))
    val base = Seq(
      "columntype" -> lit(tag),
      "maxlength" -> Coalesce(Seq(agg(Max(len)), Literal(0L))),
      "avglength" -> avg,
      "countnulls" -> countNulls(child))
    val ext =
      if (withNdv) Seq("numdistinctvalues" -> ndv(child, nbv), "ndvbitvector" -> lit(""))
      else Nil
    named(base ++ ext: _*)
  }

  /** The resolved rewrite: type-dispatched struct of native aggregates. */
  def build(child: Expression, nbv: Int): Expression = child.dataType match {
    case BooleanType =>
      // count(CASE WHEN x THEN TRUE END) counts only non-null-and-true rows.
      def countIf(p: Expression) =
        agg(Count(CaseWhen(Seq((p, Literal(true))), None)))
      named(
        "columntype" -> lit("Boolean"),
        "counttrues" -> countIf(child),
        "countfalses" -> countIf(Not(child)),
        "countnulls" -> countNulls(child))
    case ByteType | ShortType | IntegerType | LongType =>
      minMaxStats("Long", child, Some(LongType), nbv)
    case TimestampType =>
      minMaxStats("Long", child, Some(LongType), nbv) // epoch seconds
    case TimestampNTZType =>
      // NTZ→long is not a direct cast; route through TIMESTAMP (session is
      // pinned UTC, so the instant — and the epoch seconds — are unchanged).
      minMaxStats("Long", Cast(child, TimestampType), Some(LongType), nbv)
    case FloatType | DoubleType =>
      minMaxStats("Double", child, Some(DoubleType), nbv)
    case _: DecimalType =>
      minMaxStats("Decimal", child, None, nbv)
    case DateType =>
      minMaxStats("Date", child, None, nbv)
    case _: StringType =>
      lengthStats("String", child, withNdv = true, nbv)
    case BinaryType =>
      lengthStats("Binary", child, withNdv = false, nbv)
    case other =>
      throw new IllegalArgumentException(
        "compute_stats: only integer/long/timestamp/date/float/double/" +
          s"string/binary/boolean/decimal type argument is accepted but $other is passed.")
  }
}

/** Analysis-time rewrite of [[ComputeStats.Placeholder]] — runs inside the
  * resolution fixed point, so the `GlobalAggregates` pass that follows turns
  * the emitted aggregate legs into a proper Aggregate node even when the
  * query had no explicit GROUP BY. */
object ComputeStatsRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case p =>
      p.transformExpressionsUp {
        case ComputeStats.Placeholder(child, nbvExpr)
            if child.resolved && nbvExpr.foldable =>
          val nbv = nbvExpr.eval() match {
            case null => 0
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"compute_stats: numBitVectors must be an integer literal, got $other")
          }
          ComputeStats.build(child, nbv)
      }
  }
}
