package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hive's UNIQUEJOIN — the n-way single-pass join on one key expression per
  * table (`FROM UNIQUEJOIN [PRESERVE] t1 a (expr), ...`), parsed by
  * `ql/.../parse/HiveParser.g` (KW_UNIQUEJOIN) and executed as
  * `JoinDesc.UNIQUE_JOIN` in `ql/.../exec/JoinOperator`.
  *
  * Semantics, pinned against the reference's golden
  * `ql/src/test/queries/clientpositive/uniquejoin.q(.out)` and replicated
  * row-for-row in UniqueJoinSpec:
  *
  *  - all tables join on their key expression; several rows sharing a key
  *    cross-product within the key group (standard join fan-out);
  *  - a key group is EMITTED iff the key occurs in at least one PRESERVE'd
  *    table; with no PRESERVE at all, the key must occur in EVERY table
  *    (n-way inner);
  *  - tables without the key contribute NULL columns in the emitted rows.
  *
  * Spark-first re-expression: a chain of FULL OUTER equi-joins on the key
  * (running-coalesced across the chain so later tables match groups formed
  * by any earlier subset), then one filter implementing the PRESERVE rule.
  * Catalyst plans each hop as a regular shuffled/broadcast hash join — the
  * reference needs a dedicated operator only because its join runtime is
  * tag-based single-pass; the *semantics* are exactly this plan. Scale shape:
  * n−1 equi-joins on the same key, no cartesian, AQE-skew-splittable.
  */
object UniqueJoin {

  /** One input: the (aliased) table, its join-key expressions, PRESERVE flag.
    * Caller guarantees column names are globally unambiguous (alias first). */
  final case class Side(df: DataFrame, keys: Seq[Column], preserve: Boolean)

  def uniqueJoin(sides: Seq[Side]): DataFrame = {
    require(sides.size >= 2, s"UNIQUEJOIN needs >= 2 tables (got ${sides.size})")
    // positional field names inside the key struct: each side's struct must
    // have the IDENTICAL type for the cross-side coalesce/equality.
    // A key with any NULL component becomes a NULL struct: struct equality
    // in Spark is null-safe FIELD-wise, so struct(null)===struct(null) would
    // otherwise be TRUE and glue every null-key row across all tables into
    // one cross-product group — SQL (and Hive join) semantics are that NULL
    // keys never match. Presence for the PRESERVE rule is tracked by a
    // separate marker, so a preserved table's null-key rows still emit
    // NULL-extended (as an outer join preserves its null-key rows).
    val tagged = sides.zipWithIndex.map { case (s, i) =>
      val anyNull = s.keys.map(_.isNull).reduce(_ || _)
      s.df
        .withColumn(s"__uk$i", when(anyNull, lit(null)).otherwise(
          struct(s.keys.zipWithIndex.map { case (k, j) => k.as(s"k$j") }: _*)))
        .withColumn(s"__pr$i", lit(true))
    }
    var acc = tagged.head
    var runningKey: Column = col("__uk0")
    for (i <- 1 until tagged.size) {
      acc = acc.join(tagged(i), runningKey === col(s"__uk$i"), "full_outer")
      runningKey = coalesce(runningKey, col(s"__uk$i"))
    }
    val present = sides.indices.map(i => col(s"__pr$i").isNotNull)
    val keep =
      if (sides.exists(_.preserve))
        sides.indices.collect { case i if sides(i).preserve => present(i) }
          .reduce(_ || _)
      else present.reduce(_ && _)
    acc.filter(keep)
      .drop(sides.indices.map(i => s"__uk$i"): _*)
      .drop(sides.indices.map(i => s"__pr$i"): _*)
  }
}
