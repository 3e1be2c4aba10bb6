package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{ColumnBridge => CB}
import org.apache.spark.sql.types.{DoubleType, LongType}
import scala.collection.mutable.ArrayBuffer

/** The reference's `matchpath` PTF (`ql/src/java/org/apache/hadoop/hive/ql/
  * udf/ptf/MatchPath.java:81`) as a first-class Catalyst operator — the full
  * custom-operator mechanism (SURVEY.md §7): a logical node, a physical
  * `UnaryExecNode`, and a planner `Strategy` injected through
  * [[GraftExtensions]].
  *
  * Contract: the child emits exactly
  * `(user_id BIGINT, event_id BIGINT, ts_us BIGINT, event_type STRING,
  * value DOUBLE)`. The physical node declares
  * `ClusteredDistribution(user_id)` + per-partition ordering
  * `(user_id, ts_us, event_id)`, so Catalyst inserts exactly one shuffle and
  * one sort (both elided when the child already satisfies them) — then each
  * partition streams grouped runs of one user through a compiled
  * `java.util.regex` matcher. State is one user's run — the same
  * per-partition contract as Hive's PTFPartition, without materializing
  * whole partitions.
  */
case class MatchPathPlan(pattern: String, symbols: Map[String, String],
    output: Seq[Attribute], child: LogicalPlan) extends UnaryNode {
  // the node mints its output attributes (they are not child passthroughs)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet
  // consumes every child column positionally — stops ColumnPruning from
  // projecting the child away
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): MatchPathPlan =
    copy(child = newChild)
}

object MatchPathPlan {

  /** Build the matchpath DataFrame over an events-shaped input (user_id,
    * event_id, ts timestamp, event_type, value). */
  def apply(events: DataFrame, symbols: Map[String, String],
      pattern: String): DataFrame = {
    // the exec subscripts its row buffers with regex match indices, which
    // only works when every symbol maps to exactly one char; an event type
    // with no mapping gets the default symbol 'x' (same convention as the
    // flatMapGroups variant and the reference's one-char Symbol args)
    require(symbols.values.forall(_.length == 1),
      s"matchpath symbols must map to single characters, got: $symbols")
    // null user/ts/type rows cannot participate in a path (and would NPE the
    // char builder); value may be null → contributes 0 to sum_value
    val prepared = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(
        col("user_id").cast("bigint"),
        col("event_id").cast("bigint"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_type").cast("string"),
        coalesce(col("value").cast("double"), lit(0.0)).as("value"))
    val out = Seq(
      AttributeReference("user_id", LongType)(),
      AttributeReference("start_event", LongType)(),
      AttributeReference("end_event", LongType)(),
      AttributeReference("n_steps", LongType)(),
      AttributeReference("sum_value", DoubleType)())
    CB.ofRows(events.sparkSession,
      new MatchPathPlan(pattern, symbols, out, CB.logicalPlan(prepared)))
  }
}

case class MatchPathExec(pattern: String, symbols: Map[String, String],
    output: Seq[Attribute], child: SparkPlan) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(child.output.head)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(child.output(0), Ascending),
      SortOrder(child.output(2), Ascending),
      SortOrder(child.output(1), Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val pat = pattern
    val syms = symbols
    val attrs = output
    child.execute().mapPartitions { it =>
      val compiled = java.util.regex.Pattern.compile(pat)
      val proj = UnsafeProjection.create(attrs.map(_.dataType).toArray)
      val ids = new ArrayBuffer[Long]()
      val values = new ArrayBuffer[Double]()
      val symChars = new java.lang.StringBuilder()
      var curUser = 0L
      var hasRun = false

      def flush(): Iterator[InternalRow] = {
        if (!hasRun || ids.isEmpty) Iterator.empty
        else {
          val m = compiled.matcher(symChars)
          val out = new ArrayBuffer[InternalRow]()
          // reference semantics (MatchPath.java:81): attempt a match at
          // EVERY row (overlapping matches emit; find() would skip a match
          // starting inside a previous one); zero-width matches are skipped
          var start = 0
          while (start < symChars.length()) {
            m.region(start, symChars.length())
            if (m.lookingAt() && m.end() > m.start()) {
              var sum = 0.0
              var i = m.start()
              while (i < m.end()) { sum += values(i); i += 1 }
              val row = new GenericInternalRow(5)
              row.setLong(0, curUser)
              row.setLong(1, ids(m.start()))
              row.setLong(2, ids(m.end() - 1))
              row.setLong(3, (m.end() - m.start()).toLong)
              row.setDouble(4, sum)
              out += proj(row).copy()
            }
            start += 1
          }
          ids.clear(); values.clear(); symChars.setLength(0)
          out.iterator
        }
      }

      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        private def advance(): Unit = {
          while (!pending.hasNext && it.hasNext) {
            val r = it.next()
            val uid = r.getLong(0)
            if (!hasRun || uid != curUser) {
              pending = flush()
              curUser = uid
              hasRun = true
            }
            ids += r.getLong(1)
            symChars.append(syms.getOrElse(r.getUTF8String(3).toString, "x"))
            values += r.getDouble(4)
          }
          if (!pending.hasNext && !it.hasNext) pending = flush()
        }
        override def hasNext: Boolean = { advance(); pending.hasNext }
        override def next(): InternalRow = { advance(); pending.next() }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): MatchPathExec =
    copy(child = newChild)
}
