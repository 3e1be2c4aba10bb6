package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** EXPORT / IMPORT TABLE — the reference's table-relocation pair
  * (`ql/src/java/org/apache/hadoop/hive/ql/parse/ExportSemanticAnalyzer.java:47`,
  * `ImportSemanticAnalyzer.java`): EXPORT writes the table's data plus a
  * `_metadata` descriptor to a directory; IMPORT re-creates an equivalent
  * table (possibly under a new name, at a new location) from that
  * directory alone — no access to the source catalog.
  *
  * Re-expression: data goes out as parquet through the normal distributed
  * writer (dynamic-partition layout preserved, so a partitioned table
  * exports one directory per partition, exactly the reference's per-
  * partition subdirs); the descriptor is a 1-row JSON dataset under
  * `_metadata` (the underscore prefix keeps data globs from seeing it, the
  * same convention as `_SUCCESS`). The descriptor carries the FULL storage
  * descriptor the reference's `EximUtil.createExportDump` serializes —
  * schema, partition columns, and the bucket spec (bucket columns, sorted
  * columns, bucket count) — so a bucketed table round-trips into a bucketed
  * table and keeps its shuffle-free SMB-join property (dropping the bucket
  * spec is the silent-perf-loss failure mode the reference guards against
  * by dumping the whole descriptor). Column lists are JSON arrays and all
  * identifiers re-enter DDL backtick-quoted, so names with commas, dots,
  * backticks, or reserved words survive.
  *
  * Scale shape: both directions are full-width distributed scans/writes —
  * no driver materialization beyond the 1-row descriptor; a 100 TB export
  * is exactly one distributed copy. Import's insert preserves the partition
  * layout without a shuffle (partition values are carried by the directory
  * structure); re-bucketing on import pays the one hash-distribution the
  * bucket contract requires — the price of restoring every future join's
  * shuffle elision.
  */
object ExportImport {

  /** Backtick-quote an identifier for DDL (embedded backticks doubled). */
  private def q(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Fixed descriptor schema — read back with an EXPLICIT schema so an
    * empty array or absent field never trips JSON inference. */
  private val MetaSchema = StructType(Seq(
    StructField("table", StringType),
    StructField("schema_json", StringType),
    StructField("part_cols", ArrayType(StringType)),
    StructField("bucket_cols", ArrayType(StringType)),
    StructField("sort_cols", ArrayType(StringType)),
    StructField("n_buckets", IntegerType)))

  /** Export `table` (data + metadata descriptor) under `exportDir`. */
  def exportTable(spark: SparkSession, table: String, exportDir: String): Unit = {
    import spark.implicits._
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table))
    val partCols = meta.partitionColumnNames
    val bucket = meta.bucketSpec
    val df = spark.table(table)
    val dataCols = df.columns.filterNot(partCols.contains).toSeq
    val ordered = df.select((dataCols ++ partCols).map(col): _*)
    val w = ordered.write.mode("overwrite")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .parquet(s"$exportDir/data")
    val schema = StructType((dataCols ++ partCols).map(n => df.schema(n)))
    Seq((table, schema.json, partCols,
        bucket.map(_.bucketColumnNames).getOrElse(Seq.empty),
        bucket.map(_.sortColumnNames).getOrElse(Seq.empty),
        bucket.map(_.numBuckets).getOrElse(0)))
      .toDF(MetaSchema.fieldNames.toSeq: _*)
      .coalesce(1).write.mode("overwrite").json(s"$exportDir/_metadata")
  }

  /** Re-create the exported table as `newName` from `exportDir` alone —
    * schema, partitioning, bucketing, and data all come from the export. */
  def importTable(spark: SparkSession, exportDir: String, newName: String): Unit = {
    val m = spark.read.schema(MetaSchema).json(s"$exportDir/_metadata").head()
    val schema = DataType.fromJson(m.getAs[String]("schema_json"))
      .asInstanceOf[StructType]
    val partCols = m.getAs[scala.collection.Seq[String]]("part_cols").toSeq
    val bucketCols = m.getAs[scala.collection.Seq[String]]("bucket_cols").toSeq
    val sortCols = m.getAs[scala.collection.Seq[String]]("sort_cols").toSeq
    val nBuckets = m.getAs[Int]("n_buckets")
    val partClause =
      if (partCols.nonEmpty) s" PARTITIONED BY (${partCols.map(q).mkString(", ")})"
      else ""
    val bucketClause = if (nBuckets > 0) {
      val sorted = if (sortCols.nonEmpty)
        s" SORTED BY (${sortCols.map(q).mkString(", ")})" else ""
      s" CLUSTERED BY (${bucketCols.map(q).mkString(", ")})$sorted INTO $nBuckets BUCKETS"
    } else ""
    spark.sql(s"CREATE TABLE ${q(newName)} (${schema.toDDL}) " +
      s"USING parquet$bucketClause$partClause")
    // align to the declared schema: the partition-directory read infers
    // partition column types from path values, so cast back explicitly
    val aligned = spark.read.parquet(s"$exportDir/data")
      .select(schema.fields.toSeq.map(f => col(f.name).cast(f.dataType)): _*)
    aligned.write.mode("append").insertInto(q(newName))
  }
}
