package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level DML (UPDATE / DELETE / MERGE) over plain parquet catalog
  * tables, re-expressed as copy-on-write plan rewrites.
  *
  * The reference implements this surface as ACID delta files merged at read
  * time (`ql/src/java/org/apache/hadoop/hive/ql/io/AcidUtils.java:226-228`,
  * `ql/src/test/queries/clientpositive/acid_*.q`, MERGE from
  * `parse/MergeSemanticAnalyzer`). Spark's parquet source has no delta
  * runtime, and bolting one on would re-build Hive's read-path merge inside
  * every scan; the Spark-native equivalent — identical to what
  * copy-on-write lakehouse formats do — is a *rewrite*: recompute the
  * affected rows and atomically swap them in via INSERT OVERWRITE.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - For a partitioned table the rewrite is **partition-pruned**: one scan
  *    finds the distinct partition values containing affected rows (an
  *    O(#affected-partitions) driver sync — same class as a SHOW PARTITIONS),
  *    the rewrite then reads ONLY those partitions (static IN-filter →
  *    partition-pruned scan) and dynamically overwrites ONLY the partitions
  *    present in its output. Untouched partitions are neither read nor
  *    written.
  *  - Partitions emptied by a DELETE (or an UPDATE that moves every row to
  *    another partition value) produce no output under dynamic overwrite, so
  *    they are explicitly dropped afterwards — without this, deleted rows
  *    would silently survive.
  *  - An unpartitioned table degrades to a full rewrite — exactly the cost
  *    profile of a major compaction in the reference.
  *
  * Like Hive (`MergeSemanticAnalyzer`, `hive.merge.cardinality.check`
  * default true), MERGE raises a cardinality-violation error when one
  * target row matches several source rows — without the check the
  * left_outer match join would fan the target row out and silently
  * duplicate it in the rewrite. The check costs one extra aggregation over
  * the match join; `checkCardinality = false` opts out, accepting Hive's
  * documented undefined behavior for that case.
  */
object CopyOnWriteDml {

  private def stagingDir(spark: SparkSession, tbl: String): String =
    spark.conf.getOption("graft.dml.stagingDir")
      .getOrElse(sys.props("java.io.tmpdir") + "/graft_dml") + s"/$tbl"

  private def partitionCols(spark: SparkSession, tbl: String): Seq[String] =
    spark.catalog.listColumns(tbl).collect()
      .filter(_.isPartition).map(_.name).toSeq

  /** Static partition-pruning filter for the given partition-value rows, or
    * None when the table is unpartitioned (full rewrite). */
  private def scopeFilter(pcols: Seq[String], parts: Array[Row]): Option[Column] =
    if (pcols.isEmpty) None
    else if (parts.isEmpty) Some(lit(false))
    else Some(parts.map { r =>
      pcols.zipWithIndex.map { case (c, i) =>
        if (r.isNullAt(i)) col(c).isNull else col(c) === lit(r.get(i))
      }.reduce(_ && _)
    }.reduce(_ || _))

  /** Literal for a DROP PARTITION spec. A null partition value lives in the
    * `__HIVE_DEFAULT_PARTITION__` directory; rendering it as `NULL` would
    * match nothing and the emptied partition would silently survive. */
  private def sqlLiteral(v: Any): String = v match {
    case null => "'__HIVE_DEFAULT_PARTITION__'"
    case s: String => "'" + s.replace("'", "''") + "'"
    case other => "'" + other.toString + "'"
  }

  /** Hive rejects SET on a partition column (`UpdateDeleteSemanticAnalyzer`):
    * a row moving between partitions under a partition-scoped rewrite would
    * dynamically overwrite the destination partition with only the moved
    * rows, dropping its pre-existing data. Mirror the rejection. */
  private def requireNoPartitionSet(set: Seq[(String, String)],
      pcols: Seq[String], op: String): Unit = {
    val hit = set.map(_._1).filter(c => pcols.exists(_.equalsIgnoreCase(c)))
    require(hit.isEmpty,
      s"$op SET targets partition column(s) ${hit.mkString(", ")}: " +
        "not supported (matches Hive, which rejects SET on partition columns)")
  }

  /** Resolve SET keys against the table's columns case-insensitively (Hive
    * identifiers are case-insensitive) and reject unknown names — a silently
    * dropped SET key would rewrite the table as a no-op. Returns the map
    * keyed by the table's own column spelling. */
  private def resolveSet(set: Seq[(String, String)], cols: Seq[String],
      op: String): Map[String, String] = {
    val byLower = cols.map(c => c.toLowerCase -> c).toMap
    val resolved = set.map { case (k, v) =>
      byLower.getOrElse(k.toLowerCase,
        throw new IllegalArgumentException(
          s"$op SET references unknown column '$k' (table columns: " +
            cols.mkString(", ") + ")")) -> v
    }
    // Hive rejects duplicate assignment targets; a silent last-wins .toMap
    // would drop the earlier expression
    require(resolved.map(_._1).distinct.size == resolved.size,
      s"$op SET assigns the same column more than once")
    resolved.toMap
  }

  /** Write `rewritten` into `tbl`: stage to parquet (breaking the
    * read-from-overwrite-target cycle — the new-files-then-swap step of any
    * CoW commit), dynamically overwrite, then drop affected partitions that
    * ended up with no rows. */
  private def commit(spark: SparkSession, tbl: String, rewritten: DataFrame,
      pcols: Seq[String], affected: Array[Row]): Unit = {
    val cols = spark.table(tbl).columns
    val staging = stagingDir(spark, tbl)
    rewritten.select(cols.map(col).toSeq: _*)
      .write.mode("overwrite").parquet(staging)
    val back = spark.read.parquet(staging)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try back.select(cols.map(col).toSeq: _*).write.mode("overwrite").insertInto(tbl)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    if (pcols.nonEmpty) {
      val remaining = back.select(pcols.map(col).toSeq: _*).distinct()
        .collect().map(_.toSeq).toSet
      affected.filterNot(r => remaining.contains(r.toSeq)).foreach { r =>
        val spec = pcols.zipWithIndex
          .map { case (c, i) => s"$c = ${sqlLiteral(r.get(i))}" }.mkString(", ")
        spark.sql(s"ALTER TABLE $tbl DROP IF EXISTS PARTITION ($spec)")
      }
    }
  }

  /** UPDATE tbl SET (col -> expr)* WHERE cond. Set expressions see the
    * pre-update row (standard SQL UPDATE semantics). */
  def update(spark: SparkSession, tbl: String,
      set: Seq[(String, String)], cond: String): Unit = {
    val pcols = partitionCols(spark, tbl)
    requireNoPartitionSet(set, pcols, "UPDATE")
    val t = spark.table(tbl)
    val affected =
      if (pcols.isEmpty) Array.empty[Row]
      else t.filter(expr(cond)).select(pcols.map(col).toSeq: _*).distinct().collect()
    val scoped = scopeFilter(pcols, affected).map(t.filter).getOrElse(t)
    val setMap = resolveSet(set, t.columns.toSeq, "UPDATE")
    val rewritten = scoped.select(t.columns.map { c =>
      setMap.get(c) match {
        case Some(e) => when(coalesce(expr(cond), lit(false)), expr(e))
          .otherwise(col(c)).as(c)
        case None => col(c)
      }
    }.toSeq: _*)
    commit(spark, tbl, rewritten, pcols, affected)
  }

  /** DELETE FROM tbl WHERE cond — rows where cond is not TRUE survive
    * (three-valued logic: a NULL predicate keeps the row, as in HiveQL). */
  def delete(spark: SparkSession, tbl: String, cond: String): Unit = {
    val pcols = partitionCols(spark, tbl)
    val t = spark.table(tbl)
    val affected =
      if (pcols.isEmpty) Array.empty[Row]
      else t.filter(expr(cond)).select(pcols.map(col).toSeq: _*).distinct().collect()
    val scoped = scopeFilter(pcols, affected).map(t.filter).getOrElse(t)
    val rewritten = scoped.filter(!coalesce(expr(cond), lit(false)))
    commit(spark, tbl, rewritten, pcols, affected)
  }

  /** MERGE INTO tbl t USING source s ON onCond
    *   [WHEN MATCHED AND matchedDelete THEN DELETE]
    *   [WHEN MATCHED THEN UPDATE SET matchedSet]
    *   [WHEN NOT MATCHED THEN INSERT notMatchedInsert]
    * Expressions reference the aliases `t` and `s`; `notMatchedInsert` must
    * cover every target column. Delete-before-update precedence matches the
    * reference's clause order.
    */
  def merge(spark: SparkSession, tbl: String, source: DataFrame, onCond: String,
      matchedSet: Seq[(String, String)] = Nil,
      matchedDelete: Option[String] = None,
      notMatchedInsert: Option[Seq[(String, String)]] = None,
      checkCardinality: Boolean = true): Unit = {
    val pcols = partitionCols(spark, tbl)
    requireNoPartitionSet(matchedSet, pcols, "MERGE")
    val tcols = spark.table(tbl).columns
    // persist pins ONE evaluation of the source for the whole merge: the
    // scoping collect, the cardinality check, and the rewrite all observe
    // the same snapshot — a nondeterministic source (sample/limit, or a
    // table being appended to) re-evaluated per job could otherwise insert
    // into a partition outside `affected`, which dynamic overwrite would
    // then replace with ONLY the inserted rows (Hive materializes the
    // source once for the same reason).
    val src = source.withColumn("__src", lit(1)).persist()
    try {
      def joined(t: DataFrame) = t.as("t").join(src.as("s"), expr(onCond), "left_outer")

      val inserts = notMatchedInsert.map { ins =>
        // column names resolve case-insensitively, like SET (Hive identifiers)
        val byLower = tcols.map(c => c.toLowerCase -> c).toMap
        val resolved = ins.map { case (k, v) =>
          byLower.getOrElse(k.toLowerCase, throw new IllegalArgumentException(
            s"MERGE INSERT references unknown column '$k'")) -> v
        }
        require(resolved.map(_._1).distinct.size == resolved.size,
          "MERGE INSERT assigns the same column more than once")
        val insMap = resolved.toMap
        require(tcols.forall(insMap.contains),
          s"INSERT clause must cover all target columns of $tbl")
        src.as("s").join(spark.table(tbl).as("t"), expr(onCond), "left_anti")
          .select(tcols.map(c => expr(insMap(c)).as(c)).toSeq: _*)
      }

      // rewrite scope: partitions holding matched target rows, plus partitions
      // the inserts land in (dynamic overwrite replaces whole partitions, so
      // existing rows of an insert-target partition must be carried along)
      val affected: Array[Row] =
        if (pcols.isEmpty) Array.empty[Row]
        else {
          val matchedParts = joined(spark.table(tbl)).filter(col("__src").isNotNull)
            .select(pcols.map(c => col(s"t.$c").as(c)).toSeq: _*).distinct()
          val insertParts = inserts.map(_.select(pcols.map(col).toSeq: _*).distinct())
          insertParts.fold(matchedParts)(matchedParts.union).distinct().collect()
        }

      val t = spark.table(tbl)
      val scoped = scopeFilter(pcols, affected).map(t.filter).getOrElse(t)

      if (checkCardinality) {
        // any target row matching the source lives in an affected partition,
        // so the duplicate-match check runs on the SCOPED table — at 100 TB
        // the partition-pruned rewrite contract must cover the check too
        val tKeyed = scoped.withColumn("__rid", monotonically_increasing_id())
        val dups = tKeyed.as("t").join(src.as("s"), expr(onCond))
          .groupBy(col("t.__rid")).count().filter(col("count") > 1).limit(1).count()
        require(dups == 0, s"MERGE cardinality violation: a row of $tbl matches " +
          "more than one source row")
      }

      val matched = col("__src").isNotNull
      val delCond = matchedDelete
        .map(c => matched && coalesce(expr(c), lit(false))).getOrElse(lit(false))
      val setMap = resolveSet(matchedSet, tcols.toSeq, "MERGE")
      val kept = joined(scoped).filter(!delCond)
        .select(tcols.map { c =>
          val base = col(s"t.$c")
          setMap.get(c) match {
            case Some(e) => when(matched, expr(e)).otherwise(base).as(c)
            case None => base.as(c)
          }
        }.toSeq: _*)
      val rewritten = inserts.fold(kept)(kept.unionByName(_))
      commit(spark, tbl, rewritten, pcols, affected)
    } finally src.unpersist(blocking = false)
  }
}
