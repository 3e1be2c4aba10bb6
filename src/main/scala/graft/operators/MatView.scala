package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, PlanExpression, SortOrder, Ascending, Descending, NullsFirst, NullsLast}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Sort, SubqueryAlias}
import org.apache.spark.sql.functions.{coalesce, col, lit, max, min, sum}
import org.apache.spark.sql.types.DoubleType

/** Materialized views over txn tables: incremental REBUILD + transparent
  * query rewrite.
  *
  * The reference era carries only the stub (`ql/src/java/org/apache/hadoop/
  * hive/ql/metadata/Table.java:97` — a `materializedTable` flag with no
  * surface); the finished feature is the later Hive shape (`CREATE
  * MATERIALIZED VIEW`, `ALTER MATERIALIZED VIEW ... REBUILD`, transparent
  * Calcite rewrite under `CalcitePlanner`), where REBUILD is a full
  * recompute. This re-expression goes further on both halves:
  *
  *  - **REBUILD is incremental** — the state is an [[IncrementalAgg]]
  *    materialization, so a rebuild folds ONLY the CDC range committed
  *    since the last one (O(changes + touched groups), never O(table)).
  *  - **Rewrite is plan-shaped, not textual** — [[tryRewrite]] pattern-
  *    matches the query's ANALYZED Catalyst plan: an [[Aggregate]] whose
  *    grouping keys are a subset of the view's, whose aggregates derive
  *    from the stored (`cnt`, `sum_*`, `min_*`/`max_*`) columns
  *    (`count(*)` → `sum(cnt)`, `sum(x)` → `sum(sum_x)`, `avg(x)` →
  *    `sum(sum_x)/sum(cnt)`, and for DECLARED min/max columns `min(x)` →
  *    `min(min_x)` / `max(x)` → `max(max_x)` — the classic rollup
  *    derivations; min/max maintenance under deletion recomputes touched
  *    groups, see [[IncrementalAgg]]), and whose filters mention grouping
  *    columns only, is answered from the state parquet; anything else
  *    falls through to the base table untouched. Correctness is never at
  *    stake — the rewrite only changes WHERE the answer is computed.
  *
  * Freshness contract (Hive's `hive.materializedview.rewriting` with a
  * zero staleness window): the rewrite fires ONLY while the state version
  * equals the table head. Any committed DML disables it silently-correct
  * (queries revert to the base table) until the next [[rebuild]].
  *
  * SQL surface (routed by [[graft.Engine.sql]]):
  * {{{
  *   CREATE MATERIALIZED VIEW <mv> AS
  *     SELECT g1, ..., count(*) AS c, sum(x) AS sx, ... FROM <txnTable>
  *     GROUP BY g1, ...                       -- defines keys + stored sums
  *   ALTER MATERIALIZED VIEW <mv> REBUILD     -- incremental refresh
  *   DROP MATERIALIZED VIEW <mv>
  * }}}
  * The defining statement must be a plain aggregate over one registered
  * txn table (no WHERE — a filtered view would need containment checking
  * on every rewrite) with at least one `sum`/`avg` column; its aliases are
  * irrelevant to rewriting, which matches shapes, not names.
  */
object MatView {

  /** name → (table root, state dir, view anchor, group cols, sum cols,
    * min/max cols). */
  final case class Def(root: String, stateDir: String, table: String,
      groupCols: Seq[String], sumCols: Seq[String], minMaxCols: Seq[String])

  private val views = new java.util.concurrent.ConcurrentHashMap[String, Def]()

  def definitionOf(name: String): Option[Def] =
    Option(views.get(name.toLowerCase))

  // ---- lifecycle ---------------------------------------------------------

  /** Define + materialize from the defining SELECT's analyzed plan. */
  def create(spark: SparkSession, name: String, selectSql: String): Def = {
    val df = spark.sql(TxnSql.rewriteReads(spark, selectSql))
    val m = matchAggregate(df.queryExecution.analyzed).getOrElse(
      throw new IllegalArgumentException(
        "materialized view must be a single-table aggregate over a " +
        s"registered txn table (GROUP BY + count/sum/avg): $selectSql"))
    require(m.filters.isEmpty,
      s"materialized view definition must not carry WHERE: $selectSql")
    require(m.groupCols.nonEmpty, s"materialized view needs GROUP BY: $selectSql")
    require(m.sumCols.nonEmpty,
      s"materialized view needs at least one sum/avg column: $selectSql")
    val root = TxnSql.rootOf(m.table).getOrElse(throw new IllegalArgumentException(
      s"'${m.table}' is not a registered txn table: $selectSql"))
    val d = Def(root, s"${root}_mv_${name.toLowerCase}", m.table,
      m.groupCols, m.sumCols, m.minMaxCols)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d.stateDir))
    IncrementalAgg.init(spark, root, d.stateDir, d.groupCols, d.sumCols,
      d.minMaxCols)
    views.put(name.toLowerCase, d)
    d
  }

  /** Incremental refresh — folds the CDC range since the last state
    * version ([[IncrementalAgg.refresh]]). Returns (fromV, toV). */
  def rebuild(spark: SparkSession, name: String): (Long, Long) = {
    val d = definitionOf(name).getOrElse(
      throw new IllegalArgumentException(s"no materialized view '$name'"))
    IncrementalAgg.refresh(spark, d.root, d.stateDir)
  }

  def drop(spark: SparkSession, name: String): Unit = {
    Option(views.remove(name.toLowerCase)).foreach { d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d.stateDir))
    }
  }

  // ---- plan matching -----------------------------------------------------

  /** One matched aggregate-over-txn-table query shape. */
  private final case class Matched(table: String, groupCols: Seq[String],
      sumCols: Seq[String], minMaxCols: Seq[String],
      filters: Seq[Expression], agg: Aggregate, order: Seq[SortOrder])

  /** Peel Filter/attribute-Project/alias layers down to the txn-table
    * anchor ([[TxnSql.rewriteReads]]' `graft_txn_<name>` view). */
  private def peel(p: LogicalPlan,
      filters: mutable.Buffer[Expression]): Option[String] = p match {
    case SubqueryAlias(id, child) =>
      val n = id.name.toLowerCase
      if (n.startsWith("graft_txn_") && !n.matches(".*_v\\d+$"))
        Some(n.stripPrefix("graft_txn_"))
      else peel(child, filters)
    case f: Filter => filters += f.condition; peel(f.child, filters)
    case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      peel(pr.child, filters)
    case _ => None
  }

  private def matchAggregate(plan: LogicalPlan): Option[Matched] = {
    val (order, core) = plan match {
      case s: Sort if s.global => (s.order, s.child)
      case other => (Seq.empty[SortOrder], other)
    }
    core match {
      case agg: Aggregate =>
        val filters = mutable.Buffer.empty[Expression]
        peel(agg.child, filters).flatMap { table =>
          val groups = agg.groupingExpressions.map {
            case a: AttributeReference => Some(a.name)
            case _ => None
          }
          if (groups.exists(_.isEmpty)) None
          else {
            // attributes under sum/avg and min/max — what a view stores
            val fns = agg.aggregateExpressions
              .flatMap(_.collect { case ae: AggregateExpression =>
                ae.aggregateFunction })
            val sums = fns.flatMap {
              case s: Sum => s.child match {
                case a: AttributeReference => Seq(a.name)
                case _ => Nil
              }
              case a: Average => a.child match {
                case ar: AttributeReference => Seq(ar.name)
                case _ => Nil
              }
              case _ => Nil
            }
            val mms = fns.flatMap {
              case m: Min => m.child match {
                case a: AttributeReference => Seq(a.name)
                case _ => Nil
              }
              case m: Max => m.child match {
                case a: AttributeReference => Seq(a.name)
                case _ => Nil
              }
              case _ => Nil
            }
            Some(Matched(table, groups.flatten.toSeq, sums.distinct.toSeq,
              mms.distinct.toSeq, filters.toSeq, agg, order))
          }
        }
      case _ => None
    }
  }

  // ---- transparent rewrite ----------------------------------------------

  /** Answer `df` from a fresh materialized view's state when its analyzed
    * plan derives from one; None = not rewritable (caller runs the
    * original). The returned frame's schema (names, types, column order)
    * is identical to the original's — the rewrite is observationally
    * invisible apart from what gets scanned. */
  def tryRewrite(spark: SparkSession, df: DataFrame): Option[DataFrame] = {
    if (views.isEmpty) return None
    val m = matchAggregate(df.queryExecution.analyzed).getOrElse(return None)
    candidatesFor(m.table).flatMap { d =>
      rewriteWith(spark, d, m)
    }.headOption
  }

  private def candidatesFor(table: String): Seq[Def] = {
    import scala.jdk.CollectionConverters._
    views.values.asScala.filter(_.table == table.toLowerCase).toSeq
  }

  private def rewriteWith(spark: SparkSession, d: Def,
      m: Matched): Option[DataFrame] = {
    // shape containment: query groups ⊆ view groups, filters over view
    // groups only, deterministic, subquery-free
    if (!m.groupCols.forall(d.groupCols.contains)) return None
    val filterOk = m.filters.forall { f =>
      f.deterministic &&
        !f.exists(_.isInstanceOf[PlanExpression[_]]) &&
        f.references.forall(a => d.groupCols.contains(a.name))
    }
    if (!filterOk) return None
    // every output item must derive from (group cols, cnt, sum_*)
    val derived = m.agg.aggregateExpressions.map {
      case a: AttributeReference if d.groupCols.contains(a.name) =>
        Some(col(a.name))
      case Alias(a: AttributeReference, n) if d.groupCols.contains(a.name) =>
        Some(col(a.name).as(n))
      case Alias(ae: AggregateExpression, n)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case c: Count if c.children.forall {
            case Literal(_, _) => true
            case _ => false
          } => // count(*) / count(1): never-null per definition row
            Some(coalesce(sum(col("cnt")), lit(0L)).as(n))
          case s: Sum => s.child match {
            // only DOUBLE sums: the state stores doubles, and rewriting an
            // integral sum would silently change the result type
            case a: AttributeReference
                if d.sumCols.contains(a.name) && a.dataType == DoubleType =>
              Some(sum(col(s"sum_${a.name}")).as(n))
            case _ => None
          }
          case av: Average => av.child match {
            case a: AttributeReference if d.sumCols.contains(a.name) =>
              Some((sum(col(s"sum_${a.name}")) / sum(col("cnt"))).as(n))
            case _ => None
          }
          case mn: Min => mn.child match {
            // stored at the attribute's NATIVE type, so min-of-mins is
            // both value- and type-exact under rollup
            case a: AttributeReference if d.minMaxCols.contains(a.name) =>
              Some(min(col(s"min_${a.name}")).as(n))
            case _ => None
          }
          case mx: Max => mx.child match {
            case a: AttributeReference if d.minMaxCols.contains(a.name) =>
              Some(max(col(s"max_${a.name}")).as(n))
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }
    if (derived.contains(None)) return None
    // freshness: state version must equal the table head (zero staleness
    // window) — two metadata reads, no data touched
    val fresh = IncrementalAgg.currentStateVersion(spark, d.stateDir)
      .contains(TxnMergeOnRead.currentVersion(spark, d.root))
    if (!fresh) return None

    var st = IncrementalAgg.read(spark, d.stateDir)
    // render conditions unqualified — the state relation has no view alias
    m.filters.foreach { f =>
      st = st.where(f.transform {
        case a: AttributeReference => a.withQualifier(Seq.empty)
      }.sql)
    }
    val names = m.agg.aggregateExpressions.map(_.name)
    if (names.distinct.length != names.length) return None
    val exprs = derived.flatten
    val grouped = st.groupBy(m.groupCols.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
    // groupBy().agg prepends keys — restore the SELECT's column order
    var out = grouped.select(names.map(col): _*)
    if (m.order.nonEmpty) {
      val sortable = m.order.forall(_.child match {
        case a: AttributeReference => names.contains(a.name)
        case _ => false // ordering on a non-output expression
      })
      if (!sortable) return None
      val sortCols = m.order.map { so =>
        val c = col(so.child.asInstanceOf[AttributeReference].name)
        (so.direction, so.nullOrdering) match {
          case (Ascending, NullsFirst) => c.asc_nulls_first
          case (Ascending, NullsLast) => c.asc_nulls_last
          case (Descending, NullsFirst) => c.desc_nulls_first
          case (Descending, NullsLast) => c.desc_nulls_last
        }
      }
      out = out.orderBy(sortCols: _*)
    }
    Some(out)
  }

  // ---- SQL routing -------------------------------------------------------

  def handles(sqlText: String): Boolean = {
    val up = sqlText.trim.toUpperCase
    up.startsWith("CREATE MATERIALIZED VIEW") ||
      up.startsWith("ALTER MATERIALIZED VIEW") ||
      up.startsWith("DROP MATERIALIZED VIEW")
  }

  /** Execute one MV DDL statement; returns the state frame for CREATE /
    * REBUILD so the caller has something to show. */
  def exec(spark: SparkSession, sqlText: String): DataFrame = {
    val s = sqlText.trim.stripSuffix(";").trim
    val up = s.toUpperCase
    if (up.startsWith("CREATE MATERIALIZED VIEW")) {
      val rest = s.substring("CREATE MATERIALIZED VIEW".length).trim
      val asIdx = "(?i)\\bAS\\b".r.findFirstMatchIn(rest).getOrElse(
        throw new IllegalArgumentException(
          s"CREATE MATERIALIZED VIEW needs AS <select>: $s")).start
      val name = rest.substring(0, asIdx).trim
      require(name.nonEmpty && name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"bad materialized view name '$name': $s")
      val d = create(spark, name, rest.substring(asIdx + 2).trim)
      IncrementalAgg.read(spark, d.stateDir)
    } else if (up.startsWith("ALTER MATERIALIZED VIEW")) {
      val rest = s.substring("ALTER MATERIALIZED VIEW".length).trim
      val m = "(?i)^([A-Za-z_][A-Za-z0-9_]*)\\s+REBUILD$".r.findFirstMatchIn(rest)
        .getOrElse(throw new IllegalArgumentException(
          s"expected ALTER MATERIALIZED VIEW <name> REBUILD: $s"))
      rebuild(spark, m.group(1))
      IncrementalAgg.read(spark, definitionOf(m.group(1)).get.stateDir)
    } else if (up.startsWith("DROP MATERIALIZED VIEW")) {
      val name = s.substring("DROP MATERIALIZED VIEW".length).trim
      drop(spark, name)
      spark.emptyDataFrame
    } else throw new IllegalArgumentException(s"not an MV statement: $s")
  }
}
