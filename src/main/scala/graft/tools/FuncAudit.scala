package graft.tools

import scala.io.Source

import graft.Engine

/** §2.8 conformance audit: every UDF/UDAF/UDTF name registered by the
  * reference (`exec/FunctionRegistry.java` register* calls, extracted to a
  * name list) is checked against this engine's resolvable function surface
  * (Spark built-ins + [[graft.functions.HiveFunctionPack]]). Prints the
  * names that do NOT resolve — the residual gap list for SURVEY §2.8. */
object FuncAudit {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 2, appName = "graft-func-audit")
    graft.functions.HiveFunctionPack.register(spark)
    val names = Source.fromFile(args.headOption.getOrElse("/tmp/ref_funcs.txt"))
      .getLines().map(_.trim.stripSuffix("\"")).filter(_.nonEmpty).toSeq
    // operators/keywords the SQL grammar provides rather than the registry
    val grammar = Set("!", "!=", "$sum0", "%", "&", "*", "+", "-", "/", "<",
      "<=", "<=>", "<>", "=", "==", ">", ">=", "^", "|", "~", "and", "or",
      "not", "case", "when", "between", "in", "div", "like", "rlike", "regexp",
      "index")
    val missing = names.filterNot { n =>
      grammar.contains(n.toLowerCase) || {
        try { spark.sql(s"DESCRIBE FUNCTION `$n`"); true }
        catch { case _: Exception => false }
      }
    }
    println("UNRESOLVED: " + missing.mkString(", "))
    println(s"total=${names.size} unresolved=${missing.size}")
    spark.stop()
  }
}
