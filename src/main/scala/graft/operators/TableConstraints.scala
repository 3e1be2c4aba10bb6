package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Informational PK/FK constraints — HIVE-13290, shipped in the reference
  * at exactly this version (2.1.0): `CREATE TABLE … ([CONSTRAINT n] PRIMARY
  * KEY (cols) DISABLE NOVALIDATE [RELY|NORELY], [CONSTRAINT n] FOREIGN KEY
  * (cols) REFERENCES parent(cols) DISABLE NOVALIDATE [RELY|NORELY])`,
  * `ALTER TABLE t ADD CONSTRAINT n …` / `ALTER TABLE t DROP CONSTRAINT n`
  * (`ql/src/test/queries/clientpositive/create_with_constraints.q`,
  * parse + validation in `parse/BaseSemanticAnalyzer.java` processPrimaryKeys
  * /processForeignKeys, storage in the metastore `ObjectStore.addPrimaryKeys`
  * /`addForeignKeys`).
  *
  * Semantics matched to the reference era:
  *  - constraints are INFORMATIONAL: `DISABLE NOVALIDATE` is mandatory —
  *    `ENABLE` and `VALIDATE` are rejected at parse with the reference's
  *    "not supported yet" discipline (`ErrorMsg.INVALID_(PK|FK)_SYNTAX`);
  *    no data is checked at write or DDL time.
  *  - `RELY` is the opt-in that lets the OPTIMIZER trust the declaration
  *    (default NORELY). The reference stores the flag for Calcite's later
  *    use; here [[graft.plans.RelyConstraintRule]] consumes it for FK join
  *    elimination and PK distinct elimination — a rewrite that deletes a
  *    whole shuffle at 100 TB, which is the entire point of declaring keys
  *    the engine cannot afford to validate.
  *  - one PK per table; an FK must reference the parent's CURRENT declared
  *    PK columns in order (the metastore resolves FK parents against
  *    registered PKs); column counts must match; duplicate constraint names
  *    are rejected; DROP of an unknown constraint is an error.
  *  - unnamed constraints get DETERMINISTIC generated names (`pk_<table>`,
  *    `fk_<table>_<k>`) — the reference generates random UUID names
  *    (`BaseSemanticAnalyzer.java`), which no replayed oracle can pin down;
  *    determinism is the documented deviation (the KV-handler timestamp
  *    discipline).
  *
  * The registry is session-scoped (the metastore analog, like
  * [[TxnSql]]'s table map); the ledger surface is `SHOW CONSTRAINTS` —
  * the reference renders the same facts through DESCRIBE EXTENDED/FORMATTED.
  */
object TableConstraints {

  final case class Constraint(
      name: String, kind: String, // "PRIMARY KEY" | "FOREIGN KEY"
      cols: Seq[String],
      refTable: String, refCols: Seq[String], // empty for PK
      rely: Boolean, ord: Int)

  /** table (lowercase) → insertion-ordered constraints. */
  private val reg = TrieMap[String, Vector[Constraint]]()

  def constraintsOf(table: String): Seq[Constraint] =
    reg.getOrElse(table.toLowerCase, Vector.empty)

  def primaryKeyOf(table: String): Option[Constraint] =
    constraintsOf(table).find(_.kind == "PRIMARY KEY")

  def foreignKeysOf(table: String): Seq[Constraint] =
    constraintsOf(table).filter(_.kind == "FOREIGN KEY")

  def isEmpty: Boolean = reg.isEmpty

  /** Forget constraints (table re-create / test isolation). */
  def clear(tables: String*): Unit =
    if (tables.isEmpty) reg.clear() else tables.foreach(t => reg.remove(t.toLowerCase))

  // ------------------------------------------------------------- routing

  private val AlterAdd =
    "(?is)^\\s*ALTER\\s+TABLE\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s+ADD\\s+CONSTRAINT\\s+(.*)$".r
  private val AlterDrop =
    "(?is)^\\s*ALTER\\s+TABLE\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s+DROP\\s+CONSTRAINT\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*;?\\s*$".r
  private val Show =
    "(?is)^\\s*SHOW\\s+CONSTRAINTS(?:\\s+(?:ON|IN)\\s+([A-Za-z_][A-Za-z0-9_.]*))?\\s*;?\\s*$".r
  private val KeyClause = "(?is)\\b(PRIMARY|FOREIGN)\\s+KEY\\b".r

  /** Claims: CREATE TABLE with a PK/FK item in its column list, ALTER ADD
    * CONSTRAINT … PRIMARY/FOREIGN KEY, DROP CONSTRAINT of a name THIS
    * registry holds (CHECK-constraint DROP belongs to [[TxnSql]]), and
    * SHOW CONSTRAINTS. */
  def handlesDdl(sqlText: String): Boolean = sqlText match {
    case AlterAdd(_, rest) => KeyClause.findFirstIn(rest).isDefined
    case AlterDrop(t, n) =>
      constraintsOf(stripDb(t)).exists(_.name.equalsIgnoreCase(n))
    case Show(_) => true
    case _ =>
      val up = sqlText.trim.toUpperCase
      up.startsWith("CREATE TABLE") && KeyClause.findFirstIn(sqlText).isDefined
  }

  private def stripDb(t: String): String =
    t.substring(t.lastIndexOf('.') + 1).toLowerCase

  /** Execute one statement; SHOW returns the ledger, DDL returns it too
    * (deterministic observable state, the q343 discipline). */
  def execDdl(spark: SparkSession, sqlText: String): DataFrame = {
    val s = sqlText.trim.stripSuffix(";").trim
    s match {
      case AlterAdd(t0, rest) =>
        val t = stripDb(t0)
        val (c, tail) = parseConstraintItem(t, s"CONSTRAINT $rest", nextOrd(t))
        require(tail.trim.isEmpty, s"trailing tokens after constraint: $tail")
        add(t, c)
      case AlterDrop(t0, n) =>
        val t = stripDb(t0)
        val cur = reg.getOrElse(t, Vector.empty)
        require(cur.exists(_.name.equalsIgnoreCase(n)),
          s"constraint $n does not exist on table $t")
        reg.update(t, cur.filterNot(_.name.equalsIgnoreCase(n)))
      case Show(t) =>
        return show(spark, Option(t))
      case _ => // CREATE TABLE with inline constraint items
        val up = s.toUpperCase
        require(up.startsWith("CREATE TABLE"), s"unsupported statement: $s")
        val open = s.indexOf('(')
        val close = matchParen(s, open)
        require(open > 0 && close > open, s"CREATE TABLE needs a column list: $s")
        val t = stripDb(s.substring("CREATE TABLE".length, open).trim
          .stripPrefix("IF NOT EXISTS").trim)
        val items = splitTopCommas(s.substring(open + 1, close))
        val (consItems, colItems) = items.partition { it =>
          val u = it.trim.toUpperCase
          u.startsWith("CONSTRAINT") || u.startsWith("PRIMARY KEY") ||
            u.startsWith("FOREIGN KEY") ||
            u.matches("(?s)PRIMARY\\s+KEY\\b.*") || u.matches("(?s)FOREIGN\\s+KEY\\b.*")
        }
        require(consItems.nonEmpty, s"no constraint items found: $s")
        reg.remove(t) // CREATE replaces the table — and its constraints
        val parsed = consItems.zipWithIndex.map { case (it, i) =>
          val (c, tail) = parseConstraintItem(t, it.trim, i)
          require(tail.trim.isEmpty, s"trailing tokens after constraint: $tail")
          c
        }
        // run the sanitized DDL through Spark, then register
        val sanitized = s.substring(0, open + 1) + colItems.mkString(", ") +
          s.substring(close)
        spark.sql(sanitized)
        parsed.foreach(add(t, _))
    }
    show(spark, None)
  }

  private def nextOrd(t: String): Int =
    reg.getOrElse(t, Vector.empty).map(_.ord).reduceOption(_ max _).map(_ + 1).getOrElse(0)

  private def add(t: String, c: Constraint): Unit = synchronized {
    val cur = reg.getOrElse(t, Vector.empty)
    require(!cur.exists(_.name.equalsIgnoreCase(c.name)),
      s"constraint ${c.name} already exists on table $t")
    if (c.kind == "PRIMARY KEY")
      require(!cur.exists(_.kind == "PRIMARY KEY"),
        s"table $t already has a primary key")
    if (c.kind == "FOREIGN KEY") {
      val pk = primaryKeyOf(c.refTable).getOrElse(throw new IllegalArgumentException(
        s"foreign key references table ${c.refTable} which has no declared primary key"))
      require(pk.cols == c.refCols.map(_.toLowerCase),
        s"foreign key must reference the primary key of ${c.refTable} " +
          s"(${pk.cols.mkString(", ")}), got (${c.refCols.mkString(", ")})")
      require(c.cols.length == c.refCols.length,
        "foreign key column count must match referenced column count")
    }
    reg.update(t, cur :+ c)
  }

  /** Parse `[CONSTRAINT name] PRIMARY KEY (cols) DISABLE NOVALIDATE [RELY]`
    * or the FOREIGN KEY form, returning (constraint, unconsumed tail). */
  private def parseConstraintItem(table: String, item0: String,
      ord: Int): (Constraint, String) = {
    var s = item0.trim
    def eat(word: String): Boolean = {
      val r = ("(?is)^" + word.replace(" ", "\\s+") + "\\b").r
      r.findFirstMatchIn(s) match {
        case Some(m) => s = s.substring(m.end).trim; true
        case None => false
      }
    }
    def parenList(): Seq[String] = {
      require(s.startsWith("("), s"expected column list at: $s")
      val close = matchParen(s, 0)
      val cols = splitTopCommas(s.substring(1, close)).map(_.trim.toLowerCase)
      s = s.substring(close + 1).trim
      require(cols.nonEmpty && cols.forall(_.nonEmpty), "empty column list")
      cols
    }
    val explicitName = if (eat("CONSTRAINT")) {
      val m = "^[A-Za-z_][A-Za-z0-9_]*".r.findFirstIn(s).getOrElse(
        throw new IllegalArgumentException(s"CONSTRAINT needs a name: $s"))
      s = s.substring(m.length).trim
      Some(m.toLowerCase)
    } else None
    val isPk =
      if (eat("PRIMARY KEY")) true
      else if (eat("FOREIGN KEY")) false
      else throw new IllegalArgumentException(
        s"expected PRIMARY KEY or FOREIGN KEY at: $s")
    val cols = parenList()
    val (refTable, refCols) = if (!isPk) {
      require(eat("REFERENCES"), s"FOREIGN KEY needs REFERENCES: $s")
      val m = "^[A-Za-z_][A-Za-z0-9_.]*".r.findFirstIn(s).getOrElse(
        throw new IllegalArgumentException(s"REFERENCES needs a table: $s"))
      s = s.substring(m.length).trim
      (stripDb(m), parenList())
    } else ("", Seq.empty[String])
    // reference-era validation: ENABLE/VALIDATE are "not supported yet"
    val kindName = if (isPk) "Primary Key" else "Foreign Key"
    if (eat("ENABLE")) throw new IllegalArgumentException(
      s"Invalid $kindName syntax: ENABLE feature not supported yet")
    require(eat("DISABLE"), s"$kindName must be declared DISABLE (informational)")
    if (eat("VALIDATE")) throw new IllegalArgumentException(
      s"Invalid $kindName syntax: VALIDATE feature not supported yet")
    require(eat("NOVALIDATE"), s"$kindName must be declared NOVALIDATE")
    val rely = eat("RELY") || { eat("NORELY"); false }
    val name = explicitName.getOrElse(
      if (isPk) s"pk_$table" else s"fk_${table}_$ord")
    if (!isPk) require(cols.length == refCols.length,
      "foreign key column count must match referenced column count")
    (Constraint(name, if (isPk) "PRIMARY KEY" else "FOREIGN KEY",
      cols, refTable, refCols, rely, ord), s)
  }

  /** The ledger: one row per constraint, deterministic order. */
  def show(spark: SparkSession, table: Option[String]): DataFrame = {
    val rows = reg.toSeq
      .filter { case (t, _) => table.forall(x => stripDb(x) == t) }
      .flatMap { case (t, cs) => cs.map(c =>
        (t, c.name, c.kind, c.cols.mkString(","), c.refTable,
          c.refCols.mkString(","), c.rely, c.ord)) }
      .sortBy { case (t, _, _, _, _, _, _, o) => (t, o) }
    spark.createDataFrame(rows).toDF(
      "tbl", "cname", "kind", "cols", "ref_tbl", "ref_cols", "rely", "ord")
  }

  // ----------------------------------------------------------- tokenizing

  /** Index of the ')' matching the '(' at `open`. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0; var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in: $s")
  }

  /** Split on commas at paren depth 0 (types like DECIMAL(10,2) nest). */
  private def splitTopCommas(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == ',' && depth == 0) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
