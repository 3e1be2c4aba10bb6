package graft.procedural

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal HPL/SQL interpreter — the procedural layer of the reference
  * (`hplsql/src/main/java/org/apache/hive/hplsql/Exec.java:52`: an
  * ANTLR-driven tree walker with variables, control flow, and cursors whose
  * SQL statements execute on the engine). This re-expression covers the
  * subset a migrating stored procedure hits first — DECLARE / SET / IF /
  * WHILE / FOR-cursor / EXIT [WHEN] / BEGIN…EXCEPTION WHEN OTHERS / PRINT —
  * with the same division of labor as the
  * reference: control flow and scalar variables live on the driver, every
  * SQL statement (including cursor queries and scalar-subquery
  * initializers) executes on the engine via `spark.sql`. The rest of the
  * module (OPEN/FETCH cursors, named condition handlers, stored-procedure
  * definitions, host-command execution) stays descoped — SURVEY.md §2.12.
  *
  * Two deliberate reference-faithful quirks:
  *  - variable references in SQL text are substituted by IDENTIFIER match
  *    (the reference rewrites matching identifiers before execution), so a
  *    variable shadowing a column name wins — scripts own their namespace;
  *  - a FOR-cursor materializes its query driver-side and iterates rows
  *    sequentially (`Exec.java` fetches the cursor row-by-row the same
  *    way). Cursor loops are for small control sets; bulk work belongs in
  *    the SQL statements themselves, which run fully distributed.
  *
  * The script's RESULT is the last top-level/branch SELECT executed — how
  * the reference returns the final query of a procedure to the client.
  */
object HplSql {

  // ---------- statements ----------
  private sealed trait Stmt
  private case class Declare(name: String, init: Option[String]) extends Stmt
  private case class SetVar(name: String, expr: String) extends Stmt
  private case class IfStmt(branches: Seq[(String, Seq[Stmt])],
      orElse: Seq[Stmt]) extends Stmt
  private case class WhileStmt(cond: String, body: Seq[Stmt]) extends Stmt
  private case class ForCursor(rec: String, query: String,
      body: Seq[Stmt]) extends Stmt
  private case class PrintStmt(expr: String) extends Stmt
  private case class SqlStmt(text: String) extends Stmt
  private case class ExitStmt(when: Option[String]) extends Stmt
  private case class BeginBlock(body: Seq[Stmt],
      handler: Option[Seq[Stmt]]) extends Stmt

  // ---------- tokenizer (structure only; statement text is sliced raw) ----
  private case class Tok(text: String, start: Int, end: Int, quoted: Boolean) {
    def up: String = if (quoted) text else text.toUpperCase
  }

  private def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && src.charAt(i + 1) == '-') {
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src.charAt(i + 1) == '*') {
        val e = src.indexOf("*/", i + 2)
        i = if (e < 0) n else e + 2
      } else if (c == '\'') {
        // SQL string literal with '' escaping
        val s = i
        i += 1
        var done = false
        while (i < n && !done) {
          if (src.charAt(i) == '\'') {
            if (i + 1 < n && src.charAt(i + 1) == '\'') i += 2
            else { done = true; i += 1 }
          } else i += 1
        }
        out += Tok(src.substring(s, i), s, i, quoted = true)
      } else if (c.isLetter || c == '_') {
        val s = i
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        out += Tok(src.substring(s, i), s, i, quoted = false)
      } else if (c == ':' && i + 1 < n && src.charAt(i + 1) == '=') {
        out += Tok(":=", i, i + 2, quoted = false); i += 2
      } else {
        out += Tok(c.toString, i, i + 1, quoted = false); i += 1
      }
    }
    out.result()
  }

  // ---------- parser (recursive descent over tokens) ----------
  private final class Parser(src: String, toks: Vector[Tok]) {
    private var p = 0
    private def peek: Option[Tok] = if (p < toks.length) Some(toks(p)) else None
    private def next(): Tok = {
      require(p < toks.length, "unterminated statement: unexpected end of script")
      val t = toks(p); p += 1; t
    }
    private def expect(word: String): Tok = {
      val t = next()
      require(t.up == word, s"expected $word, got '${t.text}' at offset ${t.start}")
      t
    }

    /** Raw source text from the current token until a top-level terminator
      * word or ';' (paren depth tracked); consumes the terminator and
      * returns (text, terminator). */
    private def rawUntil(terminators: Set[String]): (String, String) = {
      val from = toks(p).start
      var depth = 0
      while (p < toks.length) {
        val t = toks(p)
        if (!t.quoted && t.text == "(") depth += 1
        else if (!t.quoted && t.text == ")") depth -= 1
        else if (depth == 0 && terminators.contains(t.up)) {
          val text = src.substring(from, t.start).trim
          p += 1
          return (text, t.up)
        }
        p += 1
      }
      throw new IllegalArgumentException(
        s"unterminated statement: expected one of $terminators after offset $from")
    }

    def parseStmts(stopWords: Set[String]): Seq[Stmt] = {
      val out = Seq.newBuilder[Stmt]
      var done = false
      while (!done) {
        peek match {
          case None => done = true
          case Some(t) if stopWords.contains(t.up) => done = true
          case Some(t) => out += parseStmt(t)
        }
      }
      out.result()
    }

    private def parseStmt(t: Tok): Stmt = t.up match {
      case "DECLARE" =>
        next(); val name = next().text
        // optional type words up to := / DEFAULT / ;
        var init: Option[String] = None
        var scan = true
        while (scan) {
          val w = next()
          w.up match {
            case ";" => scan = false
            case ":=" | "DEFAULT" =>
              init = Some(rawUntil(Set(";"))._1); scan = false
            case _ => () // type token (BIGINT, STRING, DECIMAL(10,2) parens...)
          }
        }
        Declare(name, init)
      case "SET" =>
        next(); val name = next().text
        val eq = next()
        require(eq.text == "=" || eq.text == ":=",
          s"SET expects = or :=, got '${eq.text}'")
        SetVar(name, rawUntil(Set(";"))._1)
      case "IF" =>
        next()
        val branches = Seq.newBuilder[(String, Seq[Stmt])]
        var cond = rawUntil(Set("THEN"))._1
        var orElse: Seq[Stmt] = Nil
        var closed = false
        while (!closed) {
          val body = parseStmts(Set("ELSIF", "ELSEIF", "ELSE", "END"))
          branches += ((cond, body))
          next().up match {
            case "ELSIF" | "ELSEIF" => cond = rawUntil(Set("THEN"))._1
            case "ELSE" =>
              orElse = parseStmts(Set("END")); expect("END"); expect("IF")
              expect(";"); closed = true
            case "END" => expect("IF"); expect(";"); closed = true
            case other => throw new IllegalArgumentException(s"bad IF tail: $other")
          }
        }
        IfStmt(branches.result(), orElse)
      case "WHILE" =>
        next()
        val (cond, kw) = rawUntil(Set("LOOP", "DO"))
        val body = parseStmts(Set("END"))
        expect("END")
        val tail = next().up // LOOP (Oracle form) or WHILE (HPL/SQL DO form)
        require(tail == "LOOP" || tail == "WHILE", s"bad WHILE tail: $tail")
        expect(";")
        val _ = kw
        WhileStmt(cond, body)
      case "FOR" =>
        next(); val rec = next().text
        expect("IN"); expect("(")
        val from = toks(p).start
        var depth = 1
        while (depth > 0) {
          val w = next()
          if (!w.quoted && w.text == "(") depth += 1
          else if (!w.quoted && w.text == ")") depth -= 1
        }
        val query = src.substring(from, toks(p - 1).start).trim
        expect("LOOP")
        val body = parseStmts(Set("END"))
        expect("END"); expect("LOOP"); expect(";")
        ForCursor(rec, query, body)
      case "PRINT" =>
        next(); PrintStmt(rawUntil(Set(";"))._1)
      case "EXIT" =>
        // exit_stmt: T_EXIT (T_WHEN bool_expr)? — Hplsql.g4
        next()
        peek match {
          case Some(w) if w.up == "WHEN" =>
            next(); ExitStmt(Some(rawUntil(Set(";"))._1))
          case _ => expect(";"); ExitStmt(None)
        }
      case "BEGIN" =>
        // begin_end_block with optional exception_block:
        // T_EXCEPTION T_WHEN T_OTHERS T_THEN block — Hplsql.g4
        next()
        val body = parseStmts(Set("EXCEPTION", "END"))
        next().up match {
          case "EXCEPTION" =>
            expect("WHEN"); expect("OTHERS"); expect("THEN")
            val handler = parseStmts(Set("END"))
            expect("END"); expect(";")
            BeginBlock(body, Some(handler))
          case "END" => expect(";"); BeginBlock(body, None)
          case other => throw new IllegalArgumentException(s"bad BEGIN tail: $other")
        }
      case _ =>
        SqlStmt(rawUntil(Set(";"))._1)
    }
  }

  // ---------- evaluator ----------
  /** Runaway-loop guard: conditions evaluate through the engine, so an
    * unbounded WHILE is a driver-side hot loop of engine calls — fail loudly
    * instead. Overridable for tests. */
  private[graft] var MaxLoopIters = 100000

  /** EXIT unwinds to the INNERMOST enclosing loop — a ControlThrowable so
    * it never trips a generic exception handler on the way out. */
  private object LoopExit extends scala.util.control.ControlThrowable

  private final class Interp(spark: SparkSession) {
    private val vars = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    var lastResult: Option[DataFrame] = None

    private def literal(v: Any): String = v match {
      case null => "NULL"
      case s: String => "'" + s.replace("'", "''") + "'"
      case b: Boolean => if (b) "TRUE" else "FALSE"
      case d: java.sql.Date => s"DATE '$d'"
      case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
      case other => other.toString // numeric types
    }

    /** Identifier-match substitution of declared variables (longest name
      * first so `rec.col` wins over a var named `rec`), applied only OUTSIDE
      * string literals. */
    private def substitute(sql: String): String = {
      if (vars.isEmpty) return sql
      val names = vars.keys.toSeq.sortBy(-_.length)
      // split into quoted/unquoted segments; substitute unquoted only
      val seg = new StringBuilder
      val out = new StringBuilder
      var inQ = false
      var i = 0
      def flush(): Unit = {
        var s = seg.toString
        if (!inQ) names.foreach { nm =>
          // identifier-boundary match; the AS-lookbehind keeps output aliases
          // (`SELECT v AS v`) stable instead of rewriting them to literals
          s = s.replaceAll("(?i)(?<![A-Za-z0-9_.])(?<!\\bAS\\s{1,6})" +
            java.util.regex.Pattern.quote(nm) + "(?![A-Za-z0-9_.])",
            java.util.regex.Matcher.quoteReplacement(literal(vars(nm))))
        }
        out.append(s); seg.clear()
      }
      while (i < sql.length) {
        val c = sql.charAt(i)
        if (c == '\'') { flush(); inQ = !inQ; out.append(c) }
        else seg.append(c)
        i += 1
      }
      flush()
      out.toString
    }

    private def evalScalar(expr: String): Any = {
      val row = spark.sql(s"SELECT (${substitute(expr)}) AS v").head()
      if (row.isNullAt(0)) null else row.get(0)
    }

    private def evalCond(expr: String): Boolean = evalScalar(expr) match {
      case b: Boolean => b
      case null => false // SQL three-valued logic: NULL condition is not taken
      case other => throw new IllegalArgumentException(
        s"condition '$expr' evaluated to non-boolean $other")
    }

    def run(stmts: Seq[Stmt]): Unit = stmts.foreach {
      case Declare(name, init) =>
        vars(name) = init.map(evalScalar).orNull
      case SetVar(name, expr) =>
        require(vars.contains(name), s"SET of undeclared variable $name")
        vars(name) = evalScalar(expr)
      case IfStmt(branches, orElse) =>
        branches.find(b => evalCond(b._1)) match {
          case Some((_, body)) => run(body)
          case None => run(orElse)
        }
      case WhileStmt(cond, body) =>
        var iters = 0
        try while (evalCond(cond)) {
          run(body)
          iters += 1
          require(iters <= MaxLoopIters,
            s"WHILE exceeded $MaxLoopIters iterations — non-terminating loop?")
        } catch { case LoopExit => () }
      case ForCursor(rec, query, body) =>
        val df = spark.sql(substitute(query))
        val cols = df.columns
        try df.collect().foreach { row => // driver-side cursor, by design (see scaladoc)
          cols.zipWithIndex.foreach { case (c, ci) =>
            vars(s"$rec.$c") = if (row.isNullAt(ci)) null else row.get(ci)
          }
          run(body)
        } catch { case LoopExit => () }
        finally cols.foreach(c => vars.remove(s"$rec.$c"))
      case PrintStmt(expr) =>
        org.slf4j.LoggerFactory.getLogger(getClass).info(s"[hplsql] ${evalScalar(expr)}")
      case ExitStmt(when) =>
        if (when.forall(evalCond)) throw LoopExit
      case BeginBlock(body, handler) =>
        handler match {
          case None => run(body)
          case Some(h) =>
            // WHEN OTHERS catches engine/script errors, never loop control.
            // SQLERRM carries the message into the handler's scope, as in
            // the reference's error variables (Exec.java signal handling).
            try run(body) catch {
              case e: Exception =>
                vars("SQLERRM") = e.getMessage
                try run(h) finally vars.remove("SQLERRM")
            }
        }
      case SqlStmt(text) =>
        val df = spark.sql(substitute(text))
        val head = text.trim.takeWhile(!_.isWhitespace).toUpperCase
        if (head == "SELECT" || head == "WITH" || head == "VALUES") lastResult = Some(df)
        else df.collect() // force commands/DML eagerly, in statement order
    }
  }

  /** Run a script against the warehouse at `dir`; returns the last SELECT's
    * DataFrame (the procedure's result set). */
  def run(spark: SparkSession, dir: String, script: String): DataFrame = {
    graft.Engine.registerAll(spark, dir)
    val interp = new Interp(spark)
    interp.run(new Parser(script, tokenize(script)).parseStmts(Set.empty))
    interp.lastResult.getOrElse(
      throw new IllegalArgumentException("script produced no result set"))
  }
}
