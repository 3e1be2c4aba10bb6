package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ONE TEXTUAL DDL SURFACE OVER THE INDEX ZOO (VERDICT r15 task 5): the
  * vector and full-text index families all have programmatic
  * build/probe lifecycles (q345–q381); this routes them from SQL text the
  * way [[TxnSql.execIndexDdl]] routes `CREATE INDEX … AS
  * 'COMPACT'|'BLOOM'|'BITMAP'` onto the skipping/bloom/bitmap sidecars
  * (the reference's index-handler DDL,
  * `ql/.../index/HiveIndexHandler.java:60`, generalized to the engine's
  * retrieval indexes — the reference itself has no vector surface).
  *
  * {{{
  *   CREATE VECTOR INDEX <i> ON <t> (<col>) AS 'GRAPH'|'BINARY'|'IVF_PQ'
  *     [OPTIONS (k=v, ...)]            -- m/m1/buckets, stride/ncent, path
  *   CREATE FULLTEXT INDEX <i> ON <t> (<col>) AS 'BM25'|'POSITIONAL'
  *     [OPTIONS (buckets=64, path=...)]
  *   DROP VECTOR INDEX <i> / DROP FULLTEXT INDEX <i>
  *   SHOW VECTOR INDEXES              -- both families, one frame
  *   VECTOR TOPK ON <t> (<col>) QUERIES <qview> LIMIT <k> [OPTIONS (...)]
  *   FULLTEXT TOPK ON <t> (<col>) QUERIES ((1,'spark join'), ...) LIMIT <k>
  *   PHRASE TOPK ON <t> (<col>) PHRASES ((1,'spark join'), ...) LIMIT <k>
  * }}}
  *
  * The PROBE statements address the TABLE, not the index — exactly how
  * the reference's queries stay unchanged while `CompactIndexHandler`
  * decides whether an index accelerates them: when a registered index
  * covers (table, column) the probe routes to its persisted form
  * ([[GraphAnn.probeIndex]], [[BinaryAnn.probeIndex]],
  * [[IvfPq.probeIndex]], [[Retrieval.bm25TopKIndexed]],
  * [[Retrieval.phraseTopKIndexed]]); after DROP the SAME statement
  * degrades to the full-scan path ([[AnnSearch.bruteTopK]] /
  * [[Retrieval.bm25TopK]] / [[Retrieval.phraseTopK]]) — degraded means
  * slower, never wrong, the [[TxnMergeOnRead.dropSidecars]] posture.
  * 'SQ8' is deliberately absent: it is a codec whose engine form
  * re-encodes per probe (q360, [[ScalarQuantizer.sqTopK]]) — declaring it
  * an at-rest index here would misrepresent what is persisted.
  *
  * Registry is session-scoped (the metastore analog, like
  * [[TxnSql.tables]]); the index files live at the managed path and a
  * DROP retires them. Statements this object does not handle fall
  * through to `spark.sql` in [[sql]].
  */
object IndexZooSql {

  private case class Entry(name: String, family: String, kind: String,
    table: String, col: String, path: String, opts: Map[String, String])

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Managed root for indexes whose CREATE carries no `path` option. */
  @volatile var managedRoot: String = "/root/repo/target/ddl/indexzoo"

  def handles(sqlText: String): Boolean = {
    val up = sqlText.trim.toUpperCase
    Seq("CREATE VECTOR INDEX", "CREATE FULLTEXT INDEX",
      "DROP VECTOR INDEX", "DROP FULLTEXT INDEX", "SHOW VECTOR INDEXES",
      "VECTOR TOPK", "FULLTEXT TOPK", "PHRASE TOPK")
      .exists(up.startsWith)
  }

  /** Execute one statement; non-index statements delegate to spark.sql. */
  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    val s = sqlText.trim.stripSuffix(";").trim
    val up = s.toUpperCase
    if (!handles(s)) spark.sql(s)
    else if (up.startsWith("CREATE")) execCreate(spark, s)
    else if (up.startsWith("DROP")) execDrop(spark, s)
    else if (up.startsWith("SHOW")) show(spark)
    else if (up.startsWith("VECTOR TOPK")) execVectorTopK(spark, s)
    else if (up.startsWith("FULLTEXT TOPK")) execFulltextTopK(spark, s)
    else execPhraseTopK(spark, s)
  }

  private def fail(s: String, why: String): Nothing =
    throw new IllegalArgumentException(s"$why: $s")

  private def parseOpts(tail: String, s: String): Map[String, String] =
    "(?is)OPTIONS\\s*\\(([^)]*)\\)".r.findFirstMatchIn(tail) match {
      case None => Map.empty
      case Some(m) => m.group(1).split(",").iterator.map(_.trim)
        .filter(_.nonEmpty).map { kv =>
          val parts = kv.split("=", 2)
          require(parts.length == 2, s"OPTIONS must be k=v pairs: $s")
          parts(0).trim.toLowerCase ->
            parts(1).trim.stripPrefix("'").stripSuffix("'")
        }.toMap
    }

  private def intOpt(o: Map[String, String], k: String, dflt: Int): Int =
    o.get(k).map(_.toInt).getOrElse(dflt)

  private def deleteDir(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def show(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    reg.values.asScala.toSeq
      .map(e => (e.name, e.family, e.kind, e.table, e.col, e.path))
      .sortBy(_._1)
      .toDF("idx_name", "family", "idx_kind", "tbl_name", "col_name", "path")
  }

  /** The registered index covering (table, col) among `kinds`, if any.
    * VECTOR probes accept any vector kind (so CREATE enforces one vector
    * index per column — probe routing stays deterministic); the two
    * FULLTEXT kinds serve DIFFERENT probe statements (BM25 scoring vs
    * positional phrases) and may coexist on one column. */
  private def covering(family: String, table: String, col: String,
      kinds: Set[String]): Option[Entry] = {
    import scala.jdk.CollectionConverters._
    reg.values.asScala.find(e => e.family == family && kinds(e.kind) &&
      e.table == table.toLowerCase && e.col == col.toLowerCase)
  }

  private def execCreate(spark: SparkSession, s: String): DataFrame = {
    val m = ("(?is)^CREATE\\s+(VECTOR|FULLTEXT)\\s+INDEX\\s+" +
      "([A-Za-z_][A-Za-z0-9_]*)\\s+ON\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*" +
      "\\(\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\)\\s+AS\\s+'([A-Za-z0-9_]+)'(.*)$").r
      .findFirstMatchIn(s).getOrElse(fail(s,
        "CREATE VECTOR|FULLTEXT INDEX <i> ON <t> (<col>) AS '<kind>' " +
          "[OPTIONS (...)] expected"))
    val family = m.group(1).toUpperCase
    val name = m.group(2).toLowerCase
    val (table, cname) = (m.group(3), m.group(4))
    val kind = m.group(5).toUpperCase
    val opts = parseOpts(m.group(6), s)
    val validKinds =
      if (family == "VECTOR") Set("GRAPH", "BINARY", "IVF_PQ")
      else Set("BM25", "POSITIONAL")
    require(validKinds(kind),
      s"$family index kind must be one of ${validKinds.mkString("|")} " +
        s"(got '$kind'; SQ8 is a per-probe codec — see q360): $s")
    require(!reg.containsKey(name), s"index $name already exists")
    val clashKinds = if (family == "VECTOR") validKinds else Set(kind)
    covering(family, table, cname, clashKinds).foreach(e => fail(s,
      s"index ${e.name} (${e.kind}) already covers $table($cname)"))
    val df = spark.table(table)
    require(df.columns.map(_.toLowerCase).contains(cname.toLowerCase),
      s"column $cname does not exist on $table")
    val path = opts.getOrElse("path", s"$managedRoot/$name")
    deleteDir(spark, path)
    family match {
      case "VECTOR" =>
        val vdf = df.select(col("id"), df(cname).as("embedding"))
        kind match {
          case "GRAPH" => GraphAnn.writeIndex(vdf, path,
            m = intOpt(opts, "m", 8), m1 = intOpt(opts, "m1", 4),
            nBuckets = intOpt(opts, "buckets", 16))
          case "BINARY" => BinaryAnn.buildIndex(vdf, path)
          case "IVF_PQ" => IvfPq.buildIndex(vdf, path,
            centroidStride = intOpt(opts, "stride", 40),
            m = intOpt(opts, "m", 16),
            ncent = intOpt(opts, "ncent", 16),
            pqStride = intOpt(opts, "pqstride", 7))
        }
      case "FULLTEXT" =>
        val tdf = df.select(df("doc_id"), df(cname).as("text"))
        kind match {
          case "BM25" => Retrieval.bm25WriteIndex(tdf, path,
            nBuckets = intOpt(opts, "buckets", 64))
          case "POSITIONAL" => Retrieval.phraseWriteIndex(tdf, path,
            nBuckets = intOpt(opts, "buckets", 64))
        }
    }
    reg.put(name, Entry(name, family, kind, table.toLowerCase,
      cname.toLowerCase, path, opts))
    show(spark)
  }

  private def execDrop(spark: SparkSession, s: String): DataFrame = {
    val m = ("(?is)^DROP\\s+(VECTOR|FULLTEXT)\\s+INDEX\\s+" +
      "([A-Za-z_][A-Za-z0-9_]*)\\s*$").r.findFirstMatchIn(s)
      .getOrElse(fail(s, "DROP VECTOR|FULLTEXT INDEX <i> expected"))
    val name = m.group(2).toLowerCase
    val e = Option(reg.get(name)).getOrElse(
      fail(s, s"no ${m.group(1).toLowerCase} index $name"))
    require(e.family == m.group(1).toUpperCase,
      s"index $name is a ${e.family} index")
    reg.remove(name)
    deleteDir(spark, e.path) // managed semantics, as TxnSql's DROP TABLE
    show(spark)
  }

  /** Parse `((1,'spark join'), (2,'dup'))` into (id, terms) pairs —
    * queries tokenize on single spaces, the [[Retrieval]] convention. */
  private def parseQueryLits(lit: String, s: String): Seq[(Int, Seq[String])] = {
    val pairs = "\\(\\s*(\\d+)\\s*,\\s*'([^']*)'\\s*\\)".r
      .findAllMatchIn(lit)
      .map(m => m.group(1).toInt -> m.group(2).split(" ").toSeq
        .filter(_.nonEmpty)).toSeq
    require(pairs.nonEmpty, s"no (id,'terms') pairs in: $s")
    pairs
  }

  private def execVectorTopK(spark: SparkSession, s: String): DataFrame = {
    val m = ("(?is)^VECTOR\\s+TOPK\\s+ON\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*" +
      "\\(\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\)\\s+QUERIES\\s+" +
      "([A-Za-z_][A-Za-z0-9_.]*)\\s+LIMIT\\s+(\\d+)(.*)$").r
      .findFirstMatchIn(s).getOrElse(fail(s,
        "VECTOR TOPK ON <t> (<col>) QUERIES <q> LIMIT <k> [OPTIONS (...)] " +
          "expected"))
    val (table, c, qname) = (m.group(1), m.group(2), m.group(3))
    val k = m.group(4).toInt
    val opts = parseOpts(m.group(5), s)
    val qdf = spark.table(qname)
      .select(col("id"), spark.table(qname)(c).as("embedding"))
    val out = covering("VECTOR", table, c,
        Set("GRAPH", "BINARY", "IVF_PQ")) match {
      case Some(e) => e.kind match {
        case "GRAPH" => GraphAnn.probeIndex(qdf, e.path, k,
          ef1 = intOpt(opts, "ef1", 8), hops1 = intOpt(opts, "hops1", 2),
          ef = intOpt(opts, "ef", 16), hops = intOpt(opts, "hops", 2))
        case "BINARY" => BinaryAnn.probeIndex(qdf, e.path, k,
          shortlist = intOpt(opts, "shortlist", math.max(k, 64)))
        case "IVF_PQ" =>
          val corpus = spark.table(e.table).select(col("id"),
            spark.table(e.table)(e.col).as("embedding"))
          IvfPq.probeIndex(qdf, corpus,
            IvfPq.openIndex(spark, e.path), k,
            nprobe = intOpt(opts, "nprobe", 4),
            shortlist = intOpt(opts, "shortlist", 64))
      }
      case None =>
        // DEGRADED: the exact full-scan path — slower, never wrong
        val corpus = spark.table(table).select(col("id"),
          spark.table(table)(c).as("embedding"))
        AnnSearch.bruteTopK(qdf, corpus, k)
    }
    out.select(col("qid"), col("cid"), col("rk").cast("bigint").as("rk"),
      col("cos"))
  }

  private def execFulltextTopK(spark: SparkSession, s: String): DataFrame = {
    val m = ("(?is)^FULLTEXT\\s+TOPK\\s+ON\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*" +
      "\\(\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\)\\s+QUERIES\\s*" +
      "\\((.*)\\)\\s+LIMIT\\s+(\\d+)\\s*$").r.findFirstMatchIn(s)
      .getOrElse(fail(s,
        "FULLTEXT TOPK ON <t> (<col>) QUERIES ((id,'terms'), ...) " +
          "LIMIT <k> expected"))
    val (table, c) = (m.group(1), m.group(2))
    val queries = parseQueryLits(m.group(3), s)
    val k = m.group(4).toInt
    covering("FULLTEXT", table, c, Set("BM25")) match {
      case Some(e) => Retrieval.bm25TopKIndexed(spark, e.path, queries, k)
      case None =>
        // DEGRADED: one-shot scoring over the raw table — identical rows
        // (the index changes where bytes are read, never a score)
        val docs = spark.table(table).select(col("doc_id"),
          spark.table(table)(c).as("text"))
        Retrieval.bm25TopK(docs, queries, k)
    }
  }

  private def execPhraseTopK(spark: SparkSession, s: String): DataFrame = {
    val m = ("(?is)^PHRASE\\s+TOPK\\s+ON\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*" +
      "\\(\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\)\\s+PHRASES\\s*" +
      "\\((.*)\\)\\s+LIMIT\\s+(\\d+)\\s*$").r.findFirstMatchIn(s)
      .getOrElse(fail(s,
        "PHRASE TOPK ON <t> (<col>) PHRASES ((id,'terms'), ...) " +
          "LIMIT <k> expected"))
    val (table, c) = (m.group(1), m.group(2))
    val phrases = parseQueryLits(m.group(3), s)
    val k = m.group(4).toInt
    covering("FULLTEXT", table, c, Set("POSITIONAL")) match {
      case Some(e) => Retrieval.phraseTopKIndexed(spark, e.path, phrases, k)
      case None =>
        val docs = spark.table(table).select(col("doc_id"),
          spark.table(table)(c).as("text"))
        Retrieval.phraseTopK(docs, phrases, k)
    }
  }

  /** Test/lifecycle hook: clear the session registry (files untouched). */
  private[graft] def reset(): Unit = reg.clear()
}
