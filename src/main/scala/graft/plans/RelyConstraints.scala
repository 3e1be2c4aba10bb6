package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.operators.TableConstraints

/** Optimizer consumption of RELY PK/FK declarations
  * ([[TableConstraints]] — HIVE-13290 metadata; the reference stores the
  * RELY bit for its CBO, this rule is the Spark-first consumer):
  *
  *  1. **FK join elimination** — an INNER join child⋈parent whose condition
  *     is exactly the declared FK=PK column pairing, whose parent side is a
  *     bare scan of the PK table, and whose output uses no parent column,
  *     rewrites to the child filtered by `fk IS NOT NULL`. Soundness: the
  *     RELY FK promises every non-null FK value has a matching parent row
  *     (so no child row is lost) and the RELY PK promises parent keys are
  *     unique (so no child row is duplicated); the inner join's only
  *     residual effect is dropping null FKs — the filter reproduces it.
  *     At 100 TB this deletes an entire shuffle + parent scan from star
  *     queries whose dimension columns got pruned away.
  *
  *  2. **PK distinct elimination** — `Aggregate` whose output is exactly its
  *     grouping columns (a DISTINCT) over Filter/Project of a single scan,
  *     where the grouping set contains the table's full RELY PK: every row
  *     is already unique, the aggregate is a rename — replaced by a Project.
  *
  * Both fire only on catalog tables with declared RELY constraints (temp
  * views never match), mirroring Hive's contract that RELY is the user's
  * explicit opt-in to unvalidated-metadata rewrites. Disable with
  * `SET spark.graft.relyConstraintRewrites=false`.
  */
object RelyConstraintRule extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.relyConstraintRewrites"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (TableConstraints.isEmpty) return plan
    if (conf.getConfString(ConfKey, "true") != "true") return plan
    plan.transformUp {
      case p @ Project(pl, j: Join) =>
        eliminateJoin(j, pl.flatMap(_.references))
          .map(newChild => p.copy(child = newChild)).getOrElse(p)
      case a: Aggregate =>
        val a2 = a.child match {
          case j: Join =>
            eliminateJoin(j,
              (a.groupingExpressions ++ a.aggregateExpressions).flatMap(_.references))
              .map(c => a.withNewChildren(Seq(c)).asInstanceOf[Aggregate])
              .getOrElse(a)
          case _ => a
        }
        eliminateDistinct(a2).getOrElse(a2)
    }
  }

  // --------------------------------------------------- FK join elimination

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** The catalog table a side of the join is a *bare* scan of: only
    * attribute-Projects and IsNotNull-Filters above a [[LogicalRelation]]
    * (a real filter could drop matching parent rows — elimination unsound). */
  private def bareScan(p: LogicalPlan): Option[(String, Seq[AttributeReference])] =
    p match {
      case lr: LogicalRelation =>
        lr.catalogTable.map(ct => ct.identifier.table.toLowerCase ->
          lr.output.map(_.asInstanceOf[AttributeReference]))
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        bareScan(child)
      case Filter(cond, child)
          if conjuncts(cond).forall(_.isInstanceOf[IsNotNull]) =>
        bareScan(child)
      case _ => None
    }

  /** The scan each join-key attribute on the child side comes from —
    * resolved by exprId against the leaf relations, so aliasing or derived
    * columns (which would break the name↔constraint correspondence) simply
    * fail to resolve and the rewrite declines. */
  private def leafTableOf(left: LogicalPlan, a: Attribute):
      Option[String] =
    left.collectLeaves().collectFirst {
      case lr: LogicalRelation
          if lr.catalogTable.isDefined && lr.outputSet.contains(a) =>
        lr.catalogTable.get.identifier.table.toLowerCase
    }

  private def eliminateJoin(j: Join,
      usedAbove: Seq[Attribute]): Option[LogicalPlan] = {
    if (j.joinType != Inner || j.condition.isEmpty) return None
    // which side is the bare PK parent? try right, then left (mirrored)
    tryEliminate(j.left, j.right, j.condition.get, usedAbove)
      .orElse(tryEliminate(j.right, j.left, j.condition.get, usedAbove))
  }

  private def tryEliminate(child: LogicalPlan, parent: LogicalPlan,
      cond: Expression, usedAbove: Seq[Attribute]): Option[LogicalPlan] = {
    if (!usedAbove.forall(child.outputSet.contains)) return None
    val (parentTable, _) = bareScan(parent).getOrElse(return None)
    val pk = TableConstraints.primaryKeyOf(parentTable).filter(_.rely)
      .getOrElse(return None)
    // every conjunct must be one declared FK=PK equality
    val pairs = conjuncts(cond).map {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if child.outputSet.contains(l) && parent.outputSet.contains(r) =>
        (l, r)
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if child.outputSet.contains(r) && parent.outputSet.contains(l) =>
        (r, l)
      case _ => return None
    }
    val childTable = pairs.map(p => leafTableOf(child, p._1)).distinct match {
      case Seq(Some(t)) => t
      case _ => return None
    }
    val fk = TableConstraints.foreignKeysOf(childTable)
      .filter(c => c.rely && c.refTable == parentTable)
      .find { c =>
        val declared = c.cols.zip(c.refCols).toSet
        val actual = pairs.map { case (l, r) =>
          (l.name.toLowerCase, r.name.toLowerCase) }.toSet
        actual == declared && declared.map(_._2) == pk.cols.toSet
      }.getOrElse(return None)
    val _ = fk
    // inner join's residual effect: null FKs never match — keep that
    val notNull = pairs.map(p => IsNotNull(p._1): Expression).reduce(And)
    Some(Filter(notNull, child))
  }

  // ------------------------------------------------ PK distinct elimination

  /** Filter/Project chain over exactly one catalog scan (row identity of
    * the base table preserved — a join below could duplicate PK values). */
  private def singleTableChain(p: LogicalPlan): Option[LogicalRelation] = p match {
    case lr: LogicalRelation if lr.catalogTable.isDefined => Some(lr)
    case Project(_, child) => singleTableChain(child)
    case Filter(_, child) => singleTableChain(child)
    case _ => None
  }

  private def eliminateDistinct(a: Aggregate): Option[LogicalPlan] = {
    // output must be purely the grouping attributes (a DISTINCT shape)
    val groupAttrs = a.groupingExpressions.flatMap {
      case ar: AttributeReference => Some(ar)
      case _ => return None
    }
    val pure = a.aggregateExpressions.forall {
      case ar: AttributeReference => groupAttrs.exists(_.semanticEquals(ar))
      case Alias(ar: AttributeReference, _) => groupAttrs.exists(_.semanticEquals(ar))
      case _ => false
    }
    if (!pure) return None
    val lr = singleTableChain(a.child).getOrElse(return None)
    val table = lr.catalogTable.get.identifier.table.toLowerCase
    val pk = TableConstraints.primaryKeyOf(table).filter(_.rely)
      .getOrElse(return None)
    // the PK attrs must be the SCAN's own columns by exprId — an
    // intermediate Project aliasing a derived expression to a PK column
    // name must not qualify (same-name ≠ same-column)
    val fromScan = groupAttrs.filter(lr.outputSet.contains)
      .map(_.name.toLowerCase).toSet
    if (!pk.cols.forall(fromScan.contains)) return None
    // grouping keys contain the whole RELY PK → rows already unique
    Some(Project(a.aggregateExpressions, a.child))
  }
}
