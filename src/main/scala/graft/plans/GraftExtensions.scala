package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy for graft's custom logical operators. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case MatchPathPlan(pattern, symbols, output, child) =>
      MatchPathExec(pattern, symbols, output, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** SparkSessionExtensions entry point — Hive-specific optimizer rewrites and
  * custom-operator planning, registered the way any Catalyst extension
  * library does it:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(_ => graft.functions.ComputeStatsRewrite)
    e.injectOptimizerRule(_ => PointLookupRule)
    e.injectOptimizerRule(_ => StatsOnlyAnsweringRule)
    e.injectOptimizerRule(_ => RelyConstraintRule)
    e.injectPlannerStrategy(_ => GraftStrategies)
  }
}
