package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Engine
import graft.sources.KvStorageHandler
import graft.sources.KvStorageHandler.{parseMapping, KeyFilter}

/** SURVEY §6 scale evidence for the KV storage handler (q333–q336): does
  * manifest pruning keep point-gets and bounded range scans FLAT while the
  * table grows ×64 — the property HBase region servers provide via HFile
  * trailers, re-expressed here as the per-file [kmin,kmax] manifest?
  *
  * Builds region-sharded stores at ×1/×16/×64 rows (region count grows with
  * the table, like real region splits), then measures best-of-2 wall and
  * the (scanned, total) region-file counts for:
  *  - a point multi-get (3 keys)           → expect O(1) files, flat wall
  *  - a ~100k-row key range                → expect O(range) files, flat wall
  *  - a full scan (contrast)               → expect linear wall
  *
  * Usage: sbt "runMain graft.tools.KvScale"
  */
object KvScale {
  def main(args: Array[String]): Unit = {
    val s = Engine.session(cores = 32, appName = "graft-kvscale")
    val root0 = "/root/repo/target/kvscale"
    val fs = new org.apache.hadoop.fs.Path(root0)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root0), true)

    val m = parseMapping(
      StructType(Seq(StructField("k", StringType), StructField("a", LongType),
        StructField("b", StringType))), ":key,f:a#b,f:b")

    def build(tag: String, rows: Long, regions: Int): String = {
      val root = s"$root0/$tag"
      val df = s.range(0, rows).select(
        lpad(col("id").cast("string"), 12, "0").as("k"),
        (col("id") * 37L % 1000003L).as("a"),
        concat(lit("v"), (col("id") % 8191L).cast("string")).as("b"))
      val t0 = System.nanoTime()
      KvStorageHandler.put(s, root, df, m, regions = regions)
      println(f"[kvscale] $tag build rows=$rows regions=$regions " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      root
    }

    def best2(label: String, root: String, kf: KeyFilter): Unit = {
      val p = KvStorageHandler.scanProfile(s, root, kf)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val pred = (kf.points, kf.lower, kf.upper) match {
          case (Some(ps), _, _) => col("k").isin(ps: _*)
          case (_, Some((lo, loIncl)), Some((hi, hiIncl))) =>
            (if (loIncl) col("k") >= lo else col("k") > lo) &&
              (if (hiIncl) col("k") <= hi else col("k") < hi)
          case _ => lit(true)
        }
        val n = KvStorageHandler.scan(s, root, m, pred).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[kvscale] $label files=${p._1}/${p._2} rows=${ts.head._2} " +
        f"best=${ts.map(_._1).min}%.2fs (runs: ${ts.map(t => f"${t._1}%.2f").mkString(",")})")
    }

    val sizes = Seq(("x1", 1000000L, 8), ("x16", 16000000L, 32), ("x64", 64000000L, 128))
    for ((tag, rows, regions) <- sizes) {
      val root = build(tag, rows, regions)
      val mid = rows / 2
      val keys = Seq(mid - 1, mid, mid + 12345).map(i => f"$i%012d")
      best2(s"$tag point-get", root, KeyFilter.points(keys))
      val lo = f"$mid%012d"; val hi = f"${mid + 100000}%012d"
      best2(s"$tag range-100k", root, KeyFilter(None, Some((lo, true)), Some((hi, false))))
      best2(s"$tag full-scan", root, KeyFilter.full)
      // the ×64 store is ~GBs — drop each size before building the next
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(root0), true)
    s.stop()
  }
}
