package graft

import graft.operators.GroupSample
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Bottom-k minwise per-group sampling ([[graft.operators.GroupSample]]):
  * bit-equality with the window-idiom formulation (the equivalence that
  * makes it a drop-in for rank-over-random), short-group behavior, rerun
  * and append consistency, the saturated-buffer fast path, and the sketch
  * merge across many partials.
  */
class GroupSampleSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-gs")

  override def afterAll(): Unit = spark.stop()

  private def data(n: Int, groups: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"g${i % groups}"))
      .toDF("id", "g").repartition(9) // many partials → merge path
  }

  private def windowIdiom(df: DataFrame, seed: String, k: Int): Set[(String, Long)] = {
    val h = GroupSample.drawHash(seed, col("id"))
    df.withColumn("h", h)
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("h"), col("id"))))
      .filter(col("rn") <= k)
      .select("g", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
  }

  test("sketch equals the rank-over-hash window idiom exactly") {
    val df = data(5000, groups = 7)
    val got = GroupSample.bottomK(df, Seq("g"), "id", "s1", k = 13)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == windowIdiom(df, "s1", 13))
    assert(got.size == 7 * 13)
  }

  test("groups smaller than k return every member") {
    val df = data(20, groups = 6) // groups of size 3-4
    val got = GroupSample.bottomK(df, Seq("g"), "id", "s2", k = 10)
    assert(got.count() == 20)
  }

  test("rerun-stable and append-consistent: old rows keep their draws") {
    val small = data(1000, groups = 4)
    val grown = data(3000, groups = 4) // superset (same ids 0..999 + more)
    val s1 = GroupSample.bottomK(small, Seq("g"), "id", "s3", k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val s1again = GroupSample.bottomK(small, Seq("g"), "id", "s3", k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s1 == s1again)
    // growing the corpus can only displace by smaller hashes, never
    // reshuffle: the grown sample per group is the bottom-k of a superset,
    // so every surviving old member was in the old sample too
    val s2 = GroupSample.bottomK(grown, Seq("g"), "id", "s3", k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val survivors = s2.filter(_._2 < 1000)
    assert(survivors.subsetOf(s1))
  }

  test("BottomK buffer never exceeds k; saturated fast path is exact") {
    val bk = new GroupSample.BottomK(3)
    var b = bk.zero
    for (x <- Seq((9L, 1L), (5L, 2L), (7L, 3L), (1L, 4L), (8L, 5L), (1L, 0L)))
      b = bk.reduce(b, x)
    assert(b == Vector((1L, 0L), (1L, 4L), (5L, 2L)))
    assert(b.length <= 3)
  }

  test("merge of sorted partials is the bottom-k of the union") {
    val bk = new GroupSample.BottomK(3)
    val a = Vector((1L, 1L), (4L, 2L), (9L, 3L))
    val c = Vector((2L, 4L), (3L, 5L), (8L, 6L))
    assert(bk.merge(a, c) == Vector((1L, 1L), (2L, 4L), (3L, 5L)))
    assert(bk.merge(c, a) == Vector((1L, 1L), (2L, 4L), (3L, 5L)))
    assert(bk.merge(a, Vector.empty) == a)
  }

  test("topKBy equals the rank-over-value window idiom, ties broken by id") {
    import spark.implicits._
    val df = (0 until 3000).map { i =>
      (i.toLong, s"g${i % 5}", (i * 7919 % 100).toLong) // many value ties
    }.toDF("id", "g", "v").repartition(9)
    val got = GroupSample.topKBy(df, Seq("g"), "v", "id", k = 7)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val want = df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
      .filter(col("rk") <= 7)
      .select(col("g"), col("rk"), col("id"), col("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(got.size == 5 * 7)
  }

  test("sort-based fallback (the 100 TB group-count path) preserves" +
      " exactness for both sketch aggregations") {
    // ObjectHashAggregate falls back to sort-based aggregation when a
    // partition holds more groups than the threshold — at production
    // group counts this WILL trigger, and the fallback path exercises
    // buffer serialization + sorted merge instead of in-memory upsert
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "2") // force the fallback almost immediately
      val df = data(4000, groups = 50)
      val got = GroupSample.bottomK(df, Seq("g"), "id", "fb", k = 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == windowIdiom(df, "fb", 5))
      import spark.implicits._
      val vdf = (0 until 4000).map(i => (i.toLong, s"g${i % 50}",
        (i * 31 % 1000).toLong)).toDF("id", "g", "v").repartition(7)
      val topk = GroupSample.topKBy(vdf, Seq("g"), "v", "id", k = 4)
      val want = vdf.withColumn("rk", row_number().over(
          Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
        .filter(col("rk") <= 4).count()
      assert(topk.count() == want)
    } finally spark.conf.set(key, old)
  }

  test("multi-column grouping works") {
    import spark.implicits._
    val df = (0 until 400).map(i => (i.toLong, s"a${i % 2}", s"b${i % 3}"))
      .toDF("id", "g1", "g2").repartition(5)
    val got = GroupSample.bottomK(df, Seq("g1", "g2"), "id", "s4", k = 5)
    assert(got.count() == 2 * 3 * 5)
    assert(got.columns.toSeq == Seq("g1", "g2", "id"))
  }
}
