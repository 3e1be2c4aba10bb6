package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Corpus-op contracts beyond the q170-q174 oracle checks: determinism
  * (keyed hashes must reproduce bit-exact run-to-run — the resumability
  * contract), partition/coverage invariants (every doc lands in exactly one
  * shard/split, positions are dense, samples respect k per stratum), and
  * hand-computable small-case semantics for the overlap/df counts. */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-corpus")

  override def afterAll(): Unit = spark.stop()

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("decontaminate counts distinct shared 3-gram shingles") {
    // bench doc: "a b c d" → shingles {a b c, b c d}
    // t1 shares exactly one ("a b c"), t2 both, t3 none, t4 too short
    val bench = docsDf(Seq((100L, "a b c d", "bench")))
    val train = docsDf(Seq(
      (1L, "x y a b c z", "s"), // "a b c" only
      (2L, "a b c d e", "s"),   // both bench shingles
      (3L, "p q r s t", "s"),   // disjoint
      (4L, "a b", "s")))        // < 3 words → no shingles
    val out = CorpusOps.decontaminate(train, bench, minHits = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out == Map(1L -> (1L, false), 2L -> (2L, true)))
  }

  test("decontaminate counts repeated shingles once (distinct sets)") {
    val bench = docsDf(Seq((100L, "a b c", "bench")))
    val train = docsDf(Seq((1L, "a b c a b c a b c", "s")))
    // "a b c" occurs 3 times in the doc but is ONE distinct shingle
    val row = CorpusOps.decontaminate(train, bench, minHits = 1).collect()
    assert(row.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 1L)))
  }

  test("shuffleShards: exactly-once coverage, dense positions, deterministic") {
    val docs = docsDf((0L until 200L).map(i => (i, s"doc $i text", "s")))
    val a = CorpusOps.shuffleShards(docs, "seedA", 8).collect()
    assert(a.length == 200)
    assert(a.map(_.getLong(0)).toSet == (0L until 200L).toSet)
    // dense 1..n positions per shard
    a.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      val ps = rows.map(_.getInt(2)).sorted
      assert(ps.toSeq == (1 to rows.length))
    }
    // bit-exact rerun with the same seed; different seed permutes
    val a2 = CorpusOps.shuffleShards(docs, "seedA", 8).collect()
    assert(a.map(_.toSeq).toSet == a2.map(_.toSeq).toSet)
    val b = CorpusOps.shuffleShards(docs, "seedB", 8).collect()
    assert(a.map(_.toSeq).toSet != b.map(_.toSeq).toSet)
  }

  test("trainTestSplit: pure function of (seed, doc_id), near target rate") {
    val docs = docsDf((0L until 2000L).map(i => (i, "t", if (i % 2 == 0) "en" else "de")))
    val out = CorpusOps.trainTestSplit(docs, "source", testPermille = 250, seed = "s7")
    val rows = out.collect()
    assert(rows.length == 2000)
    val testN = rows.count(_.getString(2) == "test")
    // keyed-md5 buckets are uniform: 250‰ of 2000 = 500 expected, ±20%
    assert(testN > 400 && testN < 600, s"test fraction off: $testN/2000")
    // assignment independent of the strat column and of corpus membership:
    // a doc keeps its side in a 10-doc subset
    val sub = CorpusOps.trainTestSplit(docs.limit(10), "source", 250, "s7")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val full = rows.map(r => r.getLong(0) -> r.getString(2)).toMap
    sub.foreach { case (id, side) => assert(full(id) == side) }
  }

  test("decontaminate: empty or shingle-free benchmark yields no hits") {
    val train = docsDf(Seq((1L, "a b c d", "s")))
    val emptyBench = docsDf(Seq.empty)
    assert(CorpusOps.decontaminate(train, emptyBench, 1).count() == 0)
    val shortBench = docsDf(Seq((9L, "a b", "bench"))) // < 3 words
    assert(CorpusOps.decontaminate(train, shortBench, 1).count() == 0)
  }

  test("weightedMix: rates track weights, deterministic, 0/1 boundaries") {
    val docs = docsDf((0L until 3000L).map(i => (i, "t", s"src${i % 3}")))
    val kept = CorpusOps.weightedMix(docs, "source",
      Map("src0" -> 0.0, "src1" -> 1.0), defaultWeight = 0.5, seed = "m")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!bySrc.contains("src0"), "weight 0 must drop everything")
    assert(bySrc("src1") == 1000, "weight 1 must keep everything")
    val n2 = bySrc.getOrElse("src2", 0)
    assert(n2 > 400 && n2 < 600, s"default 0.5 of 1000 expected ~500, got $n2")
    // purity: membership of a doc is independent of the rest of the corpus
    val sub = CorpusOps.weightedMix(docs.filter(col("doc_id") < 30), "source",
      Map("src0" -> 0.0, "src1" -> 1.0), 0.5, "m")
      .collect().map(_.getLong(0)).toSet
    assert(sub == kept.map(_._1).filter(_ < 30).toSet)
  }

  test("boilerplateNgrams: df counts by hand on a 3-doc corpus") {
    // shingle "a b c" appears in all 3 docs (df=3); each doc's second
    // shingle is unique (df=1)
    val docs = docsDf(Seq(
      (1L, "a b c x", "s"),  // {a b c, b c x}
      (2L, "a b c y", "s"),  // {a b c, b c y}
      (3L, "a b c z", "s"))) // {a b c, b c z}
    val out = CorpusOps.boilerplateNgrams(docs, maxDf = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      1L -> (2L, 1L, 0.5), 2L -> (2L, 1L, 0.5), 3L -> (2L, 1L, 0.5)))
    // the salted-shuffle fallback (boiler key set too big to broadcast)
    // must agree exactly, hot path forced with hotOcc=1
    val fb = CorpusOps.boilerplateNgrams(docs, maxDf = 2,
        broadcastBoiler = false, hotOcc = 1L, nSalts = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(fb == out)
  }

  test("dedupLines: hand-computed drop + in-order reassembly + empty-doc result") {
    val s = spark
    import s.implicits._
    // "shared" appears in all 3 docs (df=3), "pair" in two (df=2),
    // uniques in one; within-doc repeat of "shared" must count df ONCE
    val docs = Seq(
      (1L, "u1\nshared\nu2\nshared"),
      (2L, "shared\npair\nu3"),
      (3L, "pair\nshared")).toDF("doc_id", "text")
    val out = CorpusOps.dedupLines(docs, maxDf = 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "u1\nu2", 2L, 2L)),
      "df=3 line dropped at both positions, survivors keep order")
    assert(out(1) == ((2L, "pair\nu3", 2L, 1L)))
    assert(out(2) == ((3L, "pair", 1L, 1L)))
    // tighter threshold: doc 3 loses everything → empty string, not null
    val all = CorpusOps.dedupLines(docs, maxDf = 1)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(all(2) == ((3L, "", 0L, 2L)))
  }

  test("dedupLines: hot-key salted path is result-identical to the cold path") {
    val s = spark
    import s.implicits._
    // every key hot (hotOcc=1) with a small salt fan-out must reproduce the
    // default (nothing-hot) result exactly — the salt only re-routes the
    // join, never changes df or reassembly; includes a within-doc repeat
    // (occ > df) and an all-dropped doc
    val docs = Seq(
      (1L, "u1\nshared\nu2\nshared"),
      (2L, "shared\npair\nu3"),
      (3L, "pair\nshared"),
      (4L, "shared\nshared\nshared")).toDF("doc_id", "text")
    val cold = CorpusOps.dedupLines(docs, maxDf = 2, hotOcc = Long.MaxValue)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    val hot = CorpusOps.dedupLines(docs, maxDf = 2, hotOcc = 1L, nSalts = 4)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(cold.sameElements(hot))
    assert(cold(3) == ((4L, "", 0L, 3L)), "within-doc repeats: df=3 > maxDf")
  }

  test("stratifiedSample: k per stratum, deterministic, subset of stratum") {
    val docs = docsDf((0L until 300L).map(i => (i, "t", s"src${i % 5}")))
    val out = CorpusOps.stratifiedSample(docs, "source", k = 4, seed = "x").collect()
    assert(out.length == 20) // 5 strata × 4
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to 4))
      // sampled ids actually belong to the stratum
      rows.foreach(r => assert(s"src${r.getLong(1) % 5}" == src))
    }
    val again = CorpusOps.stratifiedSample(docs, "source", k = 4, seed = "x").collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
    // a stratum smaller than k yields its full membership
    val tiny = docsDf(Seq((1L, "t", "only"), (2L, "t", "only")))
    assert(CorpusOps.stratifiedSample(tiny, "source", k = 5, seed = "x")
      .count() == 2)
  }

  test("span corruption: splicing targets back into the input reconstructs every doc") {
    val docs = docsDf((0L until 60L).map(i =>
      (i, (0 until 20).map(j => s"w${(i * 7 + j) % 13}").mkString(" "), "s")))
    val out = CorpusOps.spanCorrupt(docs, seed = "t1", startPermille = 200,
        maxSpan = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length == 60)
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    var masked = 0L
    out.foreach { case (id, input, target, nSpans, nMasked) =>
      // parse target into sentinel → tokens
      val spans = "<extra_id_(\\d+)> ([^<]*)".r.findAllMatchIn(target)
        .map(m => m.group(1).toInt -> m.group(2).trim).toMap
      assert(spans.size == nSpans, s"doc $id sentinel count")
      assert(spans.keys.toSeq.sorted == (0 until nSpans.toInt), s"doc $id dense sentinels")
      assert(nMasked == spans.values.map(_.split(" ").length).sum, s"doc $id n_masked")
      val rebuilt = input.split(" ").flatMap { t =>
        if (t.startsWith("<extra_id_"))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt).split(" ")
        else Array(t)
      }.mkString(" ")
      assert(rebuilt == orig(id), s"doc $id reconstruction")
      masked += nMasked
    }
    // startPermille=200, maxSpan=3 → expected mask rate ≈ 0.2·2 = 40% pre-merge
    assert(masked > 200 && masked < 800, s"mask volume sane: $masked of 1200")
    // determinism: a second run is byte-identical
    val again = CorpusOps.spanCorrupt(docs, "t1", 200, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("temperature mix: smallest stratum binds at 1.0, rates are sqrt(n_min/n)") {
    val docs = docsDf(
      (0L until 400L).map(i => (i, "t", "big")) ++
      (400L until 500L).map(i => (i, "t", "small")))
    val out = CorpusOps.temperatureMixSqrt(docs, "source", seed = "tt")
    val rows = out.select("doc_id", "source", "keep_ppm").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every small-stratum doc survives with ppm 1_000_000
    assert(rows.filter(_._2 == "small").map(_._1).sorted.toSeq ==
      (400L until 500L))
    assert(rows.filter(_._2 == "small").forall(_._3 == 1000000L))
    // big stratum: ppm = round(sqrt(100/400)*1e6) = 500000, roughly half kept
    assert(rows.filter(_._2 == "big").forall(_._3 == 500000L))
    val nBig = rows.count(_._2 == "big")
    assert(nBig > 120 && nBig < 280, s"thinned big stratum: $nBig of 400")
    // deterministic
    assert(CorpusOps.temperatureMixSqrt(docs, "source", "tt").count() ==
      rows.length)
  }

  test("span corruption: empty and unmasked docs survive with empty target") {
    val docs = docsDf(Seq((1L, "", "s"), (2L, "solo", "s")))
    val out = CorpusOps.spanCorrupt(docs, seed = "t2", startPermille = 1)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getString(1) == "" && out(0).getString(2) == ""
      && out(0).getLong(3) == 0L && out(0).getLong(4) == 0L)
    // doc 2 is a single token — whatever the draw, the invariants hold
    val in2 = out(1).getString(1)
    assert(in2 == "solo" || in2 == "<extra_id_0>")
  }
}
