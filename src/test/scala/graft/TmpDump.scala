package graft
object TmpDump {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftshim.{ColumnBridge => CB}
    def dump(e: org.apache.spark.sql.catalyst.expressions.Expression, d: Int = 0): Unit = {
      println(("  " * d) + e.getClass.getName + " -> " + e)
      e.children.foreach(dump(_, d + 1))
    }
    dump(CB.expression(col("k") >= "b" && col("x") === 1))
    dump(CB.expression(col("k").isin("a", "c")))
    dump(CB.expression(lit("g") <= col("k")))
  }
}
