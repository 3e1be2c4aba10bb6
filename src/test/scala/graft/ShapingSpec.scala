package graft

import graft.operators.{BpeTrain, CorpusOps, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Corpus shaping ops: repetition signals, blocklist scrub, chunking, and
  * greedy sequence packing — hand-computed small cases plus the structural
  * invariants (coverage, capacity, determinism) the queries' oracles can't
  * see per-row. */
class ShapingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-test")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private def doc(id: Long, text: String) = (id, text)

  test("repetitionSignals: hand-computed duplicate/top-gram fractions") {
    val df = Seq(
      doc(1, "a b a b a"),   // 5 words, 2 distinct; 2-grams: ab,ba,ab,ba → top 2/4; 3-grams: aba,bab,aba → dup 1/3
      doc(2, "x y z"),       // all distinct, all grams unique
      doc(3, "w")            // single word: no 2/3-grams → fractions 0
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df).orderBy("doc_id").collect()

    assert(r(0).getLong(1) == 5 && r(0).getLong(2) == 2)
    assert(r(0).getDouble(3) == 0.6)      // (5-2)/5
    assert(r(0).getDouble(4) == 0.5)      // top2 2 of 4
    assert(math.abs(r(0).getDouble(5) - 0.333333) < 1e-9) // (3-2)/3 round6

    assert(r(1).getDouble(3) == 0.0 && r(1).getDouble(4) == 0.5 && r(1).getDouble(5) == 0.0)
    // doc2 2-grams "x y","y z" distinct → top share 1/2

    assert(r(2).getLong(1) == 1 && r(2).getDouble(4) == 0.0 && r(2).getDouble(5) == 0.0)
  }

  test("blocklistMask: hit counts, C4 verdict, masked text") {
    val df = Seq(doc(1, "fast slow fast crash"), doc(2, "clean text only"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.blocklistMask(df, Set("slow", "crash"))
      .orderBy("doc_id").collect()
    assert(r(0).getLong(2) == 2 && !r(0).getBoolean(4))
    assert(r(0).getString(5) == "fast *** fast ***")
    assert(r(0).getDouble(3) == 0.5)
    assert(r(1).getLong(2) == 0 && r(1).getBoolean(4))
    assert(r(1).getString(5) == "clean text only")
  }

  test("chunkWindows: boundaries, overlap, contained-tail suppression") {
    val w10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq(doc(1, w10), doc(2, "a b c")).toDF("doc_id", "text")
    // window 4, stride 3 → starts 0,3,6 for n=10 (9 would add nothing: 9 >= 10-4+3)
    val r = TextAnalysis.chunkWindows(df, window = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = r.filter(_.getLong(0) == 1)
    assert(d1.map(_.getLong(1)).toSeq == Seq(0, 1, 2))
    assert(d1.map(_.getString(3)).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    // n < window → single full-doc chunk
    val d2 = r.filter(_.getLong(0) == 2)
    assert(d2.length == 1 && d2(0).getString(3) == "a b c" && d2(0).getLong(2) == 3)

    // coverage invariant on real data: every token position lands in ≥1 chunk
    val docs = Engine.table(spark, "/root/testdata/sf0.001", "documents")
    val chunks = TextAnalysis.chunkWindows(docs, 32, 24)
    val covered = chunks.groupBy("doc_id")
      .agg(sum("n_tok").as("s"), max(col("chunk_id") * 24 + col("n_tok")).as("last"))
    val words = docs.select(col("doc_id"),
      size(split(col("text"), " ", -1)).cast("long").as("n"))
    val bad = covered.join(words, "doc_id").filter(col("last") =!= col("n")).count()
    assert(bad == 0, "some document's final chunk does not end at its last token")
  }

  test("packGreedy: capacity invariant, exactly-once, determinism, order") {
    val docs = Engine.table(spark, "/root/testdata/sf0.001", "documents")
    val p1 = CorpusOps.packGreedy(docs, "s1", nShards = 4, capacity = 128L)
    val rows = p1.collect()

    // exactly-once: every doc packed exactly once
    assert(rows.length == docs.count())
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)

    // capacity: no bin exceeds 128 tokens unless it is a single oversized doc
    val over = p1.groupBy("shard", "bin")
      .agg(sum("n_tok").as("fill"), count(lit(1)).as("n"))
      .filter(col("fill") > 128 && col("n") > 1).count()
    assert(over == 0, "a multi-doc bin exceeds capacity")

    // determinism: same seed → identical assignment; different seed → different
    val p2 = CorpusOps.packGreedy(docs, "s1", 4, 128L)
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty)
    val p3 = CorpusOps.packGreedy(docs, "s2", 4, 128L)
    assert(p3.exceptAll(p1).count() > 0)

    // greedy equivalence: replay the fold driver-side from the same
    // deterministic shard order (shuffleShards shares packGreedy's keying)
    // and require the distributed result to match doc-for-doc
    val order = CorpusOps.shuffleShards(docs, "s1", 4)
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("ntok")), "doc_id")
      .select("doc_id", "shard", "pos", "ntok")
      .as[(Long, Int, Int, Long)].collect()
    val expected = order.groupBy(_._2).toSeq.flatMap { case (shard, ds) =>
      var bin = 0L; var fill = 0L
      ds.sortBy(_._3).toSeq.map { case (id, _, _, ntok) =>
        if (fill > 0L && fill + ntok > 128L) { bin += 1L; fill = ntok }
        else fill += ntok
        (id, shard, bin, ntok)
      }
    }.toSet
    val actual = rows.map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(actual == expected, "distributed packing diverges from the sequential replay")

    // oversized doc gets its own bin
    val big = Seq((1L, (1 to 200).map(_ => "w").mkString(" ")),
      (2L, "a b"), (3L, "c d")).toDF("doc_id", "text")
    val pb = CorpusOps.packGreedy(big, "s", 1, 10L).collect()
    val binOf = pb.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bigBin = binOf(1L)
    assert(pb.filter(_.getLong(2) == bigBin).length == 1, "oversized doc shares a bin")
  }

  test("chunk→pack: bins bounded by capacity; non-final bins fill past capacity − max unit") {
    val docs = Engine.table(spark, "/root/testdata/sf0.001", "documents")
    val chunks = TextAnalysis.chunkWindows(docs, 32, 24)
    val units = chunks.select(
      concat(col("doc_id").cast("string"), lit(":"),
        col("chunk_id").cast("string")).as("unit_id"),
      col("n_tok").cast("long").as("ntok"))
    val packed = CorpusOps.packUnits(units, "cp-spec", 4, 128L)
    // exactly-once at the unit grain
    assert(packed.count() == chunks.count())
    val bins = packed.groupBy("shard", "bin")
      .agg(sum("n_tok").as("fill")).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(bins.values.forall(_ <= 128L), "a bin exceeds capacity (all units ≤ 32)")
    val lastBin = bins.keys.groupBy(_._1).map { case (s, ks) => s -> ks.map(_._2).max }
    val nonFinal = bins.filter { case ((s, b), _) => b < lastBin(s) }
    // greedy bound: a bin is only closed because a ≤32-token unit overflowed it
    assert(nonFinal.values.forall(_ > 128L - 32L),
      s"an interior bin closed below capacity − max_unit: ${nonFinal.filter(_._2 <= 96L)}")
  }

  test("BPE: hand-computed merges, overlap rule, tie-break") {
    // corpus: "abab abab abc" "abab" → wordFreq abab:3, abc:1
    // pairs: ab = 2*3 + 1 = 7, ba = 1*3 = 3, bc = 1
    val df = Seq((1L, "abab abab abc"), (2L, "abab")).toDF("doc_id", "text")
    val pc = BpeTrain.pairCounts(df, 10).collect()
    assert(pc(0).getString(1) == "ab" && pc(0).getLong(2) == 7)
    assert(pc(1).getString(1) == "ba" && pc(1).getLong(2) == 3)

    // merge 1 = (a,b) → abab = [ab,ab], abc = [ab,c]
    // then pairs: (ab,ab) = 3, (ab,c) = 1 → merge 2 = (ab,ab)
    val m = BpeTrain.trainMerges(df, 3).orderBy("rk").collect()
    assert(m(0).getString(3) == "ab" && m(0).getLong(4) == 7)
    assert(m(1).getString(3) == "abab" && m(1).getLong(4) == 3)
    assert(m(2).getString(3) == "abc" && m(2).getLong(4) == 1)

    // left-to-right non-overlap: "aaa" with merge (a,a) → [aa, a]
    assert(BpeTrain.mergeSegs(Array("a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "a"))
  }

  test("BPE trainMerges matches a sequential driver-side replay on real data") {
    val docs = Engine.table(spark, "/root/testdata/sf0.001", "documents")
    val learned = BpeTrain.trainMerges(docs, 8).orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))

    // replay: collect the word dict once, run the whole loop in local Scala
    val dict = scala.collection.mutable.Map.empty[String, Long]
    docs.select("text").collect().foreach(_.getString(0).split(" ", -1)
      .foreach(w => dict(w) = dict.getOrElse(w, 0L) + 1L))
    var seg = dict.toSeq.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val replay = (1 to 8).flatMap { rk =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seg.foreach { case (ss, f) =>
        (0 until ss.length - 1).foreach { i =>
          counts((ss(i), ss(i + 1))) = counts.getOrElse((ss(i), ss(i + 1)), 0L) + f
        }
      }
      if (counts.isEmpty) None
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        seg = seg.map { case (ss, f) => (BpeTrain.mergeSegs(ss, a, b), f) }
        Some((rk.toLong, a, b, c))
      }
    }
    assert(learned.toSeq == replay,
      s"distributed merges ${learned.toSeq} != replay $replay")
  }

  test("BPE tokenize: fixed merges, chained rank order") {
    val df = Seq((1L, "fast era")).toDF("doc_id", "text")
    // (e,r): era → [er,a]; (s,t): fast → [f,a,st]; (a,st): → [f,ast]
    val r = BpeTrain.tokenize(df, Seq(("e", "r"), ("s", "t"), ("a", "st")))
      .collect()
    assert(r(0).getLong(1) == 2)      // words
    assert(r(0).getLong(2) == 4)      // tokens: [f,ast] + [er,a]
    assert(r(0).getDouble(3) == 2.0)
  }

  test("tokenize→pack composition (q191 glue): token totals reconcile, oversized doc gets a singleton bin") {
    // doc 1: "er st" → 2 BPE tokens; doc 2: 40 one-char words → 40 tokens,
    // which exceeds the capacity of 16 → it must sit in a bin of its own
    val df = Seq((1L, "er st"), (2L, Seq.fill(40)("x").mkString(" ")))
      .toDF("doc_id", "text")
    val toks = BpeTrain.tokenize(df, Seq(("e", "r"), ("s", "t")))
    val units = toks.select(col("doc_id").cast("string").as("unit_id"),
      col("n_bpe_tokens").as("ntok"))
    val packed = CorpusOps.packUnits(units, seed = "t", nShards = 2,
      capacity = 16L)
    // every tokenizer-emitted token lands in exactly one bin
    val binned = packed.agg(sum("n_tok")).head().getLong(0)
    val emitted = toks.agg(sum("n_bpe_tokens")).head().getLong(0)
    assert(binned == emitted && emitted == 42L)
    // the composition feeds BPE counts, not word counts: doc 1 is 2 words
    // AND 2 tokens, so distinguish via doc 2 (40 words, 40 tokens) + doc 1's
    // packed n_tok being the post-merge 2, not the 5-char count
    val byDoc = packed.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(byDoc("1") == 2L && byDoc("2") == 40L)
    // oversized unit monopolizes its bin
    val doc2 = packed.filter(col("unit_id") === "2").head()
    val mates = packed.filter(col("shard") === doc2.getInt(1) &&
      col("bin") === doc2.getLong(2)).count()
    assert(mates == 1L)
  }
}
