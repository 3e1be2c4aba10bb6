package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}

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
  * `_metadata` (schema JSON with partition columns last + the partition
  * column list — the underscore prefix keeps data globs from seeing it,
  * the same convention as `_SUCCESS`). IMPORT rebuilds the table DDL from
  * the descriptor and appends the data through a dynamic-partition insert.
  *
  * Scale shape: both directions are full-width distributed scans/writes —
  * no driver materialization beyond the 1-row descriptor; a 100 TB export
  * is exactly one distributed copy, and import's insert preserves the
  * partition layout without a shuffle (partition values are carried by the
  * directory structure).
  */
object ExportImport {

  /** Export `table` (data + metadata descriptor) under `exportDir`. */
  def exportTable(spark: SparkSession, table: String, exportDir: String): Unit = {
    import spark.implicits._
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table))
    val partCols = meta.partitionColumnNames
    val df = spark.table(table)
    val dataCols = df.columns.filterNot(partCols.contains).toSeq
    val ordered = df.select((dataCols ++ partCols).map(col): _*)
    val w = ordered.write.mode("overwrite")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .parquet(s"$exportDir/data")
    val schema = StructType((dataCols ++ partCols).map(n => df.schema(n)))
    Seq((table, schema.json, partCols.mkString(",")))
      .toDF("table", "schema_json", "part_cols")
      .coalesce(1).write.mode("overwrite").json(s"$exportDir/_metadata")
  }

  /** Re-create the exported table as `newName` from `exportDir` alone —
    * schema, partitioning, and data all come from the export. */
  def importTable(spark: SparkSession, exportDir: String, newName: String): Unit = {
    val m = spark.read.json(s"$exportDir/_metadata").head()
    val schema = DataType.fromJson(m.getAs[String]("schema_json"))
      .asInstanceOf[StructType]
    val partCols = m.getAs[String]("part_cols").split(",")
      .filter(_.nonEmpty).toSeq
    val partClause =
      if (partCols.nonEmpty) s" PARTITIONED BY (${partCols.mkString(", ")})" else ""
    spark.sql(s"CREATE TABLE $newName (${schema.toDDL}) USING parquet$partClause")
    // align to the declared schema: the partition-directory read infers
    // partition column types from path values, so cast back explicitly
    val aligned = spark.read.parquet(s"$exportDir/data")
      .select(schema.fields.toSeq.map(f => col(f.name).cast(f.dataType)): _*)
    aligned.write.mode("append").insertInto(newName)
  }
}
