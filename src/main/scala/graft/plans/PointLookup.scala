package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Hive's PointLookupOptimizer re-expressed as an injected Catalyst rule
  * (`ql/src/java/org/apache/hadoop/hive/ql/optimizer/PointLookupOptimizer.java:89`,
  * applied at `optimizer/Optimizer.java:89`): a disjunction of equality
  * comparisons against the same expression becomes an IN list —
  * `c=1 OR c=2 OR c=3` → `c IN (1,2,3)`. Null semantics are identical
  * (both yield NULL when c is null and no disjunct matches).
  *
  * Spark benefits the same way Hive does: IN lists convert to `InSet`
  * (hash lookup) past `spark.sql.optimizer.inSetConversionThreshold` and
  * push to Parquet as a single `In` filter instead of an OR tree.
  * Threshold mirrors Hive's `hive.optimize.point.lookup.min` spirit
  * (conversion only pays past a few disjuncts; we use 3).
  */
object PointLookupRule extends Rule[LogicalPlan] {

  private val MinDisjuncts = 3

  private def disjuncts(e: Expression): Seq[Expression] = e match {
    case Or(l, r) => disjuncts(l) ++ disjuncts(r)
    case other => Seq(other)
  }

  /** (lookup-target, literal) when the disjunct is `expr = lit`. */
  private def asPointLookup(e: Expression): Option[(Expression, Literal)] = e match {
    case EqualTo(x, lit: Literal) => Some((x, lit))
    case EqualTo(lit: Literal, x) => Some((x, lit))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case or: Or =>
      val parts = disjuncts(or)
      val (eqs, rest) = parts.partition(p => asPointLookup(p).isDefined)
      val grouped = eqs.flatMap(asPointLookup).groupBy(_._1.canonicalized)
      val (converted, kept) = grouped.values.toSeq.partition(_.size >= MinDisjuncts)
      if (converted.isEmpty) or
      else {
        val ins = converted.map { g => In(g.head._1, g.map(_._2).distinct) }
        val leftover = kept.flatMap(_.map(p => EqualTo(p._1, p._2): Expression))
        (ins ++ leftover ++ rest).reduceLeft(Or(_, _))
      }
  }
}
