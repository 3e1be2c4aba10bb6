package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.CatalogColumnStat
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Hive's StatsOptimizer re-expressed as an injected Catalyst rule
  * (`ql/src/java/org/apache/hadoop/hive/ql/optimizer/StatsOptimizer.java:97`,
  * gated there by `hive.compute.query.using.stats`): a global aggregate of
  * only `count(*)` / `count(col)` / `min(col)` / `max(col)` over a bare
  * analyzed catalog table is answered from metastore statistics — the plan
  * collapses to a [[LocalRelation]], no scan is scheduled at all. On a
  * 100 TB table that turns a full-table aggregate into a catalog read.
  *
  * Safety contract (mirrors Hive's COLUMN_STATS_ACCURATE gate): the rewrite
  * fires only when `ANALYZE TABLE`-computed stats are present, and Spark
  * clears the catalog `rowCount` whenever data is written through the
  * catalog after the last ANALYZE, so a stale rewrite self-disables. Spark's
  * ANALYZE ndv is approximate (HLL), so `count(DISTINCT ...)` is never
  * answered from stats. Disable with
  * `SET spark.graft.statsOnlyAnswering=false`.
  */
object StatsOnlyAnsweringRule extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.statsOnlyAnswering"

  /** Unwrap pass-through projections (column pruning inserts them between
    * the aggregate and the relation). */
  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(child)
    case other => other
  }

  /** The stats-answered value for one aggregate, if answerable. */
  private def answer(ae: AggregateExpression, rowCount: BigInt,
      colStats: Map[String, CatalogColumnStat]): Option[Any] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case Count(Seq(e)) if e.foldable =>
        if (e.eval() != null) Some(rowCount.toLong) else Some(0L)
      case Count(Seq(a: AttributeReference)) =>
        colStats.get(a.name).flatMap(_.nullCount)
          .map(nulls => (rowCount - nulls).toLong)
      case Min(a: AttributeReference) => bound(a, colStats, _.min)
      case Max(a: AttributeReference) => bound(a, colStats, _.max)
      case _ => None
    }
  }

  private def bound(a: AttributeReference,
      colStats: Map[String, CatalogColumnStat],
      side: CatalogColumnStat => Option[String]): Option[Any] = {
    val statTyped = a.dataType match {
      // types whose catalog min/max round-trips exactly
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | _: DecimalType |
           DateType | TimestampType | BooleanType => true
      case _ => false
    }
    if (!statTyped) None
    else colStats.get(a.name).flatMap { cs =>
      side(cs).map(v =>
        ColumnBridge.colStatInternal(v, a.name, a.dataType, cs.version))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "true").equalsIgnoreCase("true")) return plan
    plan.transform {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        stripProjects(child) match {
          case rel: LogicalRelation if rel.catalogTable.flatMap(_.stats)
              .flatMap(_.rowCount).isDefined =>
            val stats = rel.catalogTable.get.stats.get
            val rowCount = stats.rowCount.get
            val values = aggExprs.map {
              case Alias(ae: AggregateExpression, _) =>
                answer(ae, rowCount, stats.colStats)
              case _ => None
            }
            if (values.forall(_.isDefined)) {
              logInfo(s"answering aggregate over " +
                s"${rel.catalogTable.get.identifier} from catalog stats")
              LocalRelation(aggExprs.map(_.toAttribute),
                Seq(InternalRow.fromSeq(values.map(_.get))))
            } else agg
          case _ => agg
        }
    }
  }
}
