package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Algorithm-equivalence oracle for q22's `histogram_numeric` (DuckDB has no
  * counterpart, so the CORRECTNESS row is rows-only — this spec carries the
  * value check instead).
  *
  * [[HistOracle]] is a compact Scala re-expression of the reference's
  * streaming histogram (`ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
  * NumericHistogram.java:38`, the Ben-Haim & Tom-Tov JMLR 11 (2010)
  * streaming-parallel-decision-tree heuristic): binary-search insert,
  * exact-bin increment, and closest-pair merge with `Random(31183)`
  * tie-breaking. Spark's built-in is a port of the same algorithm with the
  * same fixed seed, so over a SINGLE partition in a deterministic row order
  * (no partial-histogram merges, no extra PRNG draws) the results must agree
  * bit-for-bit — any divergence in search, merge arithmetic, or tie-break
  * order fails the exact-equality assert.
  */
class NumericHistogramSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-hist")
  override def afterAll(): Unit = spark.stop()

  /** Reference-algorithm port (test oracle only). */
  private final class HistOracle(nbins: Int) {
    private final class Bin(var x: Double, var y: Double)
    private val bins = scala.collection.mutable.ArrayBuffer.empty[Bin]
    private val prng = new java.util.Random(31183)

    def add(v: Double): Unit = {
      // binary search for the insertion point; equal x breaks out early
      var bin = 0
      var l = 0
      var r = bins.length
      var exact = false
      while (l < r && !exact) {
        bin = (l + r) / 2
        if (bins(bin).x > v) r = bin
        else if (bins(bin).x < v) { bin += 1; l = bin }
        else exact = true
      }
      if (bin < bins.length && bins(bin).x == v) bins(bin).y += 1
      else {
        bins.insert(bin, new Bin(v, 1))
        if (bins.length > nbins) trim()
      }
    }

    private def trim(): Unit = {
      while (bins.length > nbins) {
        // closest adjacent pair; ties broken uniformly via the seeded PRNG
        // (one nextDouble per tie candidate, same draw order as the reference)
        var smallest = bins(1).x - bins(0).x
        var loc = 0
        var count = 1
        var i = 1
        while (i < bins.length - 1) {
          val diff = bins(i + 1).x - bins(i).x
          if (diff < smallest) { smallest = diff; loc = i; count = 1 }
          else if (diff == smallest) {
            count += 1
            if (prng.nextDouble() <= 1.0 / count) loc = i
          }
          i += 1
        }
        // height-weighted average position, summed height
        val d = bins(loc).y + bins(loc + 1).y
        bins(loc).x *= bins(loc).y / d
        bins(loc).x += bins(loc + 1).x / d * bins(loc + 1).y
        bins(loc).y = d
        bins.remove(loc + 1)
      }
    }

    def result: Seq[(Double, Double)] = bins.map(b => (b.x, b.y)).toSeq
  }

  private def histOf(df: org.apache.spark.sql.DataFrame, colName: String,
      nbins: Int): Seq[(Double, Double)] =
    df.agg(expr(s"histogram_numeric(CAST($colName AS DOUBLE), $nbins)"))
      .head().getSeq[Row](0)
      .map(r => (r.getDouble(0), r.getDouble(1)))

  test("histogram_numeric == reference-algorithm port, bit-for-bit (1 partition)") {
    import spark.implicits._
    // deterministic value stream with heavy exact repeats (exercises the
    // equal-bin increment path) AND distinct-value pressure (exercises
    // insert+trim with tie-breaks on equally spaced bins)
    val vals = (0 until 5000).map(i => ((i * 2654435761L) % 1000L).toDouble / 7.0)
    val df = vals.toDF("v").coalesce(1) // one partition, input order preserved
    val got = histOf(df, "v", 12)
    val oracle = new HistOracle(12)
    vals.foreach(oracle.add)
    assert(got == oracle.result,
      "built-in histogram diverged from the reference algorithm port")
    assert(got.size == 12 && got.map(_._2).sum == 5000.0)
  }

  test("histogram bin invariants hold on multi-partition real data") {
    val li = Engine.table(spark, "/root/testdata/sf0.001", "lineitem")
    val bins = histOf(li, "l_quantity", 10)
    val stats = li.agg(count(lit(1)), min(col("l_quantity").cast("double")),
      max(col("l_quantity").cast("double"))).head()
    val (n, lo, hi) = (stats.getLong(0), stats.getDouble(1), stats.getDouble(2))
    assert(bins.size <= 10, "more bins than requested")
    assert(bins.map(_._1) == bins.map(_._1).sorted &&
      bins.map(_._1).distinct.size == bins.size, "bin centers not strictly increasing")
    // heights are integer counts combined only by addition → exact as doubles
    assert(bins.map(_._2).sum == n.toDouble, "bin heights must sum to the row count")
    // merged centers are convex combinations — they can never leave the data range
    assert(bins.head._1 >= lo && bins.last._1 <= hi, "bin center outside data range")
    assert(bins.forall(_._2 > 0), "empty bin")
  }
}
