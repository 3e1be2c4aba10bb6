package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.HiveHash
import org.apache.spark.sql.graftshim.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.functions._

/** The Hive built-in functions Spark 4 lacks (or whose Hive semantics
  * differ), per SURVEY.md §2.8/§7. Reference registry:
  * `ql/src/java/org/apache/hadoop/hive/ql/exec/FunctionRegistry.java:183-492`.
  *
  * Everything composes existing codegen'd Catalyst expressions where
  * possible; `field` is the one genuinely new expression.
  */
object HiveFunctionPack {

  /** Hive `field(needle, v1, v2, ...)` (GenericUDFField). */
  def field(needle: Column, haystack: Column*): Column =
    ExpressionUtils.column(
      FieldIndex((needle +: haystack).map(ExpressionUtils.expression)))

  /** Hive `hash(...)` — exact Hive hash semantics (Java hashCode chain,
    * `serde2/objectinspector/ObjectInspectorUtils.hashCode`). Spark ships the
    * identical algorithm as the HiveHash expression (used for Hive-bucketing
    * compatibility); we surface it as a function. */
  def hive_hash(cols: Column*): Column =
    ExpressionUtils.column(HiveHash(cols.map(ExpressionUtils.expression)))

  /** Hive `create_union(tag, v0, v1, ...)` — uniontype encoded as a
    * struct-with-tag (SURVEY.md §1: Spark has no union type). Only the field
    * selected by `tag` is non-null. */
  def create_union(tag: Column, values: Column*): Column = {
    val fields = values.zipWithIndex.map { case (c, i) =>
      when(tag === i, c).otherwise(lit(null)).as(s"field$i")
    }
    struct((tag.cast("int").as("tag")) +: fields: _*)
  }

  /** Hive `extract_union(u)` — the struct of all alternatives (null except
    * the active one). */
  def extract_union(u: Column): Column = u.dropFields("tag")

  /** Hive `extract_union(u, i)` — the i-th alternative (null unless active). */
  def extract_union(u: Column, i: Int): Column = u.getField(s"field$i")

  /** Hive `parse_url_tuple(url, p1, p2, ...)` UDTF
    * (`ql/.../udf/generic/GenericUDTFParseUrlTuple.java`) — as a struct of
    * parse_url calls (one row in → one struct; explode-free equivalent).
    * Supports Hive's `QUERY:<key>` part form: the key becomes parse_url's
    * third argument. */
  def parse_url_tuple(url: Column, parts: String*): Column =
    struct(parts.map { p =>
      val c =
        if (p.toUpperCase.startsWith("QUERY:"))
          call_function("parse_url", url, lit("QUERY"),
            lit(p.substring("QUERY:".length)))
        else call_function("parse_url", url, lit(p))
      c.as(p.toLowerCase.replace(':', '_'))
    }: _*)

  // --- Hive 2.1 masking family (FunctionRegistry.java:486-491) -------------
  // Defaults: upper→X, lower→x, digit→n, other kept — same as Hive's
  // GenericUDFMask* defaults. Composed from Spark's `mask` + substr.

  private def maskAll(c: Column): Column = mask(c)

  /** mask_first_n(str, n): first n chars masked, rest kept. */
  def mask_first_n(c: Column, n: Int): Column =
    concat(maskAll(substring(c, 1, n)), c.substr(lit(n + 1), length(c)))

  /** mask_last_n(str, n): last n chars masked, rest kept. */
  def mask_last_n(c: Column, n: Int): Column =
    concat(c.substr(lit(1), greatest(length(c) - n, lit(0))),
      maskAll(c.substr(greatest(length(c) - n + 1, lit(1)), lit(n))))

  /** mask_show_first_n(str, n): first n kept, rest masked. */
  def mask_show_first_n(c: Column, n: Int): Column =
    concat(substring(c, 1, n), maskAll(c.substr(lit(n + 1), length(c))))

  /** mask_show_last_n(str, n): last n kept, rest masked. */
  def mask_show_last_n(c: Column, n: Int): Column =
    concat(maskAll(c.substr(lit(1), greatest(length(c) - n, lit(0)))),
      c.substr(greatest(length(c) - n + 1, lit(1)), lit(n)))

  /** mask_hash(str) — md5 hex, as in Hive 2.1's GenericUDFMaskHash. */
  def mask_hash(c: Column): Column = md5(c)

  /** Register SQL-callable names (CREATE TEMPORARY FUNCTION analog,
    * `parse/FunctionSemanticAnalyzer.java`). Idempotent. */
  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("field", exprs => FieldIndex(exprs), "hive")
    reg.createOrReplaceTempFunction("hive_hash", exprs => HiveHash(exprs), "hive")
    reg.createOrReplaceTempFunction("dot_f32",
      exprs => DotF32(exprs(0), exprs(1)), "hive")
    reg.createOrReplaceTempFunction("in_file",
      exprs => InFile(exprs(0), exprs(1)), "hive")
    reg.createOrReplaceTempFunction("ewah_bitmap_and",
      exprs => EwahBitmapAnd(exprs(0), exprs(1)), "hive")
    reg.createOrReplaceTempFunction("ewah_bitmap_or",
      exprs => EwahBitmapOr(exprs(0), exprs(1)), "hive")
    reg.createOrReplaceTempFunction("ewah_bitmap_empty",
      exprs => EwahBitmapEmpty(exprs(0)), "hive")
    reg.createOrReplaceTempFunction("ewah_bitmap_count",
      exprs => EwahBitmapCount(exprs(0)), "hive")
    spark.udf.register("ewah_bitmap",
      org.apache.spark.sql.functions.udaf(new EwahBitmapAgg,
        org.apache.spark.sql.Encoders.LONG)) // boxed: NULL positions reach reduce() and are ignored

    // ---- §2.8 gap closure: the last reference registry names ------------
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Cast, CreateNamedStruct, EqualTo, Literal, UpdateFields, DropField}
    import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
    import org.apache.spark.sql.types.IntegerType
    reg.createOrReplaceTempFunction("parse_url_tuple",
      exprs => ParseUrlTuple(exprs), "hive")
    reg.createOrReplaceTempFunction("reflect2",
      exprs => Reflect2(exprs), "hive")
    // create_union(tag, v0, v1, ...) — uniontype as tagged struct (§1:
    // Spark has no union type; only the tag-selected alternative is
    // non-null). CaseWhen-without-else nulls the inactive fields while
    // leaving their types to the analyzer.
    reg.createOrReplaceTempFunction("create_union", exprs => {
      val tag = Cast(exprs.head, IntegerType)
      CreateNamedStruct(Literal("tag") +: tag +:
        exprs.tail.zipWithIndex.flatMap { case (e, i) =>
          Seq(Literal(s"field$i"),
            CaseWhen(Seq((EqualTo(tag, Literal(i)), e)), None))
        })
    }, "hive")
    // extract_union(u) → the alternatives struct; extract_union(u, i) → the
    // i-th alternative (GenericUDFExtractUnion's two arities).
    reg.createOrReplaceTempFunction("extract_union", {
      case Seq(u) => UpdateFields(u, Seq(DropField("tag")))
      case Seq(u, Literal(i: Int, IntegerType)) =>
        UnresolvedExtractValue(u, Literal(s"field$i"))
      case _ => throw new IllegalArgumentException(
        "extract_union(union[, tag_literal])")
    }, "hive")
    // compute_stats(col, numBitVectors) — the ANALYZE-backing UDAF
    // (GenericUDAFComputeStats). Placeholder here; type-dispatched into a
    // struct of native aggregates by the ComputeStatsRewrite analysis rule.
    reg.createOrReplaceTempFunction("compute_stats", {
      case Seq(c, n) => ComputeStats.Placeholder(c, n)
      case _ => throw new IllegalArgumentException(
        "compute_stats: exactly two arguments are expected.")
    }, "hive")
    spark.udf.register("ngrams", org.apache.spark.sql.functions.udaf(new NGramsAgg))
    spark.udf.register("context_ngrams",
      org.apache.spark.sql.functions.udaf(new ContextNGramsAgg))
  }
}
