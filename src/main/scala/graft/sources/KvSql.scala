package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.sources.KvStorageHandler.{parseMapping, KvMapping}

/** Textual SQL surface for KV (HBase/Accumulo handler) tables — the
  * reference's spelling is `CREATE TABLE … STORED BY
  * 'org.apache.hadoop.hive.hbase.HBaseStorageHandler' WITH SERDEPROPERTIES
  * ('hbase.columns.mapping' = ':key,f:c') TBLPROPERTIES (…)`
  * (`HBaseStorageHandler.java`, `hbase_queries.q`); like
  * `CREATE TRANSACTIONAL TABLE` in [[graft.operators.TxnSql]], the explicit
  * `KV` keyword keeps the routing decision in the statement text instead of
  * a properties map:
  *
  * {{{
  *   CREATE KV TABLE t (k STRING, a BIGINT, m MAP<STRING,STRING>)
  *     LOCATION '<root>' MAPPING ':key,f:a#b,f:*'
  *     [VISIBILITY '<label>'] [AUTHORIZATIONS 'a,b'] [REGIONS <n>]
  *   INSERT INTO t <select>            -- a Put batch (upsert per cell)
  *   INSERT OVERWRITE TABLE t <select> -- ALSO a Put batch: Hive on HBase
  *                                     -- documents that OVERWRITE cannot
  *                                     -- truncate the KV table, it upserts
  *   ALTER KV TABLE t COMPACT          -- major_compact admin analog
  *   DROP KV TABLE t                   -- managed drop: unregister + delete
  *                                     -- (HBaseStorageHandler.preDropTable
  *                                     -- deletes the HBase table unless
  *                                     -- the Hive table is EXTERNAL)
  *   SELECT …                          -- plain engine SQL: the row view is
  *                                     -- kept registered as a temp view,
  *                                     -- refreshed after every mutation
  * }}}
  *
  * UPDATE/DELETE/MERGE raise the same refusal Hive 2.1 gives: ACID DML is
  * not supported on storage-handler tables.
  */
object KvSql {

  private final case class KvTable(root: String, schema: StructType,
      m: KvMapping, visibility: String, regions: Int,
      auths: Option[Set[String]])

  /** Session registry — the metastore analog, like TxnSql.tables. */
  private val tables = new ConcurrentHashMap[String, KvTable]()

  def handlesDdl(sqlText: String): Boolean = {
    val up = sqlText.trim.toUpperCase
    up.startsWith("CREATE KV TABLE") || up.startsWith("DROP KV TABLE") ||
      up.startsWith("ALTER KV TABLE")
  }

  /** INSERT / refused-DML routing: the target is a registered KV table. */
  def handles(sqlText: String): Boolean = {
    val t = targetOf(sqlText)
    t.exists(n => tables.containsKey(n.toLowerCase))
  }

  private def targetOf(sqlText: String): Option[String] = {
    val toks = sqlText.trim.split("\\s+").toSeq
    val up = toks.map(_.toUpperCase)
    up match {
      case Seq("INSERT", "INTO", _*) | Seq("INSERT", "OVERWRITE", _*) =>
        toks.lift(if (up.lift(2).contains("TABLE")) 3 else 2)
      case Seq("UPDATE", _*) => toks.lift(1)
      case Seq("DELETE", "FROM", _*) => toks.lift(2)
      case Seq("MERGE", "INTO", _*) => toks.lift(2)
      case _ => None
    }
  }

  private def refresh(spark: SparkSession, name: String): DataFrame = {
    val t = tables.get(name.toLowerCase)
    // a mutation refreshes EVERY registered table over the same store —
    // multiple Hive tables can map one KV table (different column subsets
    // or authorization bounds), and all of their views must see the write
    import scala.jdk.CollectionConverters._
    tables.asScala.foreach { case (n, other) =>
      if (other.root == t.root && n != name.toLowerCase)
        KvStorageHandler.read(spark, other.root, other.m, other.auths)
          .createOrReplaceTempView(n)
    }
    // the table's declared scan authorizations (accumulo.authorizations)
    // bound every read through the registered view
    val view = KvStorageHandler.read(spark, t.root, t.m, t.auths)
    view.createOrReplaceTempView(name)
    view
  }

  /** Execute a KV statement; returns the target table's (refreshed) row
    * view so a statement result is always inspectable. */
  def exec(spark: SparkSession, sqlText: String): DataFrame = {
    val s = sqlText.trim.stripSuffix(";").trim
    val up = s.toUpperCase
    if (up.startsWith("CREATE KV TABLE")) execCreate(spark, s)
    else if (up.startsWith("DROP KV TABLE")) {
      val name = s.split("\\s+")(3)
      val t = Option(tables.remove(name.toLowerCase)).getOrElse(
        fail(s, s"unknown KV table $name"))
      spark.catalog.dropTempView(name)
      // managed drop (preDropTable) — but only when NO other registered
      // table maps the same store (multiple Hive tables over one KV table
      // is the supported aliasing pattern; deleting under a sibling would
      // destroy its data and dangle its view)
      import scala.jdk.CollectionConverters._
      val shared = tables.asScala.values.exists(_.root == t.root)
      if (!shared) {
        val p = new Path(t.root)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      spark.emptyDataFrame
    } else if (up.startsWith("ALTER KV TABLE")) {
      val toks = s.split("\\s+")
      val name = toks(3)
      require(toks.length >= 5 && toks(4).equalsIgnoreCase("COMPACT"),
        s"only ALTER KV TABLE <name> COMPACT is supported: $s")
      val t = Option(tables.get(name.toLowerCase)).getOrElse(
        fail(s, s"unknown KV table $name"))
      KvStorageHandler.compact(spark, t.root, t.regions)
      refresh(spark, name)
    } else if (up.startsWith("INSERT")) {
      val name = targetOf(s).getOrElse(fail(s, "no INSERT target"))
      val t = Option(tables.get(name.toLowerCase)).getOrElse(
        fail(s, s"unknown KV table $name"))
      // body = everything after the target TOKEN, located by the statement
      // head (a plain indexOf would find the name inside INSERT/INTO for
      // short or lowercase names); optional column list is NOT supported —
      // Hive inserts into storage-handler tables positionally
      val head = ("(?i)^INSERT\\s+(INTO|OVERWRITE)\\s+(TABLE\\s+)?" +
        java.util.regex.Pattern.quote(name)).r
      val bodyIdx = head.findFirstMatchIn(s).map(_.end).getOrElse(
        fail(s, s"cannot locate INSERT target $name"))
      val select = s.substring(bodyIdx).trim
      require(select.toUpperCase.startsWith("SELECT") ||
        select.toUpperCase.startsWith("VALUES") || select.startsWith("("),
        s"INSERT body must be a query: $s")
      val src = spark.sql(select)
      require(src.columns.length == t.schema.length,
        s"INSERT arity ${src.columns.length} != table arity ${t.schema.length}")
      // positional bind to the declared schema (Hive semantics)
      val aligned = src.toDF(t.schema.fieldNames.toSeq: _*)
        .select(t.schema.fields.toSeq.map(f =>
          org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)): _*)
      KvStorageHandler.put(spark, t.root, aligned, t.m, t.regions, t.visibility)
      refresh(spark, name)
    } else if (up.startsWith("UPDATE") || up.startsWith("DELETE") ||
        up.startsWith("MERGE")) {
      // the reference's exact behavior: Hive 2.1 refuses ACID DML on
      // storage-handler tables (transactional tables only)
      throw new UnsupportedOperationException(
        "UPDATE/DELETE/MERGE is not supported on KV (storage handler) " +
          "tables — Hive 2.1 allows ACID DML only on transactional tables")
    } else fail(s, "unrecognized KV statement")
  }

  private def execCreate(spark: SparkSession, s: String): DataFrame = {
    // CREATE KV TABLE <name> ( <ddl> ) LOCATION '<p>' MAPPING '<spec>'
    //   [VISIBILITY '<label>'] [REGIONS <n>]
    val name = s.split("\\s+")(3)
    val open = s.indexOf('(')
    require(open > 0, s"CREATE KV TABLE needs a column list: $s")
    var depth = 0
    var close = -1
    var i = open
    while (close < 0 && i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ => ()
      }
      i += 1
    }
    require(close > open, s"unbalanced column list: $s")
    val schema = StructType.fromDDL(s.substring(open + 1, close))
    val tail = s.substring(close + 1)
    def strOpt(kw: String): Option[String] = {
      val m = ("(?i)\\b" + kw + "\\s+'([^']*)'").r.findFirstMatchIn(tail)
      m.map(_.group(1))
    }
    val root = strOpt("LOCATION").getOrElse(fail(s, "CREATE KV TABLE needs LOCATION"))
    val spec = strOpt("MAPPING").getOrElse(fail(s, "CREATE KV TABLE needs MAPPING " +
      "(the hbase.columns.mapping analog)"))
    val visibility = strOpt("VISIBILITY").getOrElse("")
    // AUTHORIZATIONS 'a,b' — the accumulo.authorizations scan-side bound
    // (AccumuloSerDeParameters.java:57); absent = full-auth connector user
    val auths = strOpt("AUTHORIZATIONS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val regions = "(?i)\\bREGIONS\\s+(\\d+)".r.findFirstMatchIn(tail)
      .map(_.group(1).toInt).getOrElse(8)
    val m = parseMapping(schema, spec)
    if (visibility.nonEmpty) KvStorageHandler.VisibilityExpr.parse(visibility)
    val prev = tables.putIfAbsent(name.toLowerCase,
      KvTable(root, schema, m, visibility, regions, auths))
    require(prev == null, s"KV table $name already exists")
    refresh(spark, name)
  }

  private def fail(s: String, why: String): Nothing =
    throw new IllegalArgumentException(s"$why: $s")

  /** Test/bench hygiene: drop every registration (not the data). */
  def reset(): Unit = tables.clear()
}
