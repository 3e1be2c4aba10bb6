package graft

import graft.operators.Dsir
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** DSIR selection contracts ([[graft.operators.Dsir]]): the importance
  * weight prefers target-like documents, resampling is deterministic in the
  * seed, and the cutoff-threshold scale path ([[Dsir.selectByCutoff]], the
  * [[graft.operators.NgramLm.bucketByCutoffs]] shape) selects the same set
  * as the exact total-order top-k when the cutoff is the k-th largest
  * Gumbel key. */
class DsirSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = Engine.session(cores = 4, appName = "graft-dsir")
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  // two clearly separated populations: target-looking docs share the
  // target's vocabulary, background docs don't
  private lazy val docs = ((1L to 6L).map(i => (i, "a b c a b c")) ++
    (7L to 12L).map(i => (i, s"x$i y$i z$i w$i v$i u$i"))).toDF("doc_id", "text")

  test("importance weights separate target-like from background docs") {
    val imp = Dsir.importance(docs, col("doc_id") <= 3, buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val tgtLike = (1L to 6L).map(imp)
    val bg = (7L to 12L).map(imp)
    assert(tgtLike.min > bg.max,
      s"target-vocabulary docs must outweigh background: $imp")
  }

  test("selectByCutoff at the k-th largest key agrees with exact top-k resample") {
    val k = 5
    val exact = Dsir.resample(docs, col("doc_id") <= 3, buckets = 256,
      seed = "s1", k = k)
    val exactSel = exact.filter(col("sel")).select("doc_id")
      .as[Long].collect().toSet
    assert(exactSel.size === k)

    val keyed = Dsir.gumbelKeys(docs, col("doc_id") <= 3, buckets = 256,
      seed = "s1")
    // production derives the cutoff from a sampled quantile; here the k-th
    // largest key plays that role exactly
    val cutoff = keyed.orderBy(col("g").desc).select("g").as[Long]
      .collect()(k - 1)
    val byCut = Dsir.selectByCutoff(keyed, cutoff)
      .filter(col("sel")).select("doc_id").as[Long].collect().toSet
    assert(byCut === exactSel,
      "cutoff selection must agree with the total-order top-k")
    // and the non-selected complement agrees too (no row dropped)
    assert(Dsir.selectByCutoff(keyed, cutoff).count() === docs.count())
  }

  test("selection is deterministic in the seed and shifts with it") {
    def sel(seed: String) = Dsir.resample(docs, col("doc_id") <= 3,
      buckets = 256, seed = seed, k = 4)
      .filter(col("sel")).select("doc_id").as[Long].collect().toSet
    assert(sel("s1") === sel("s1"), "same seed, same sample")
    // different seeds reshuffle the Gumbel jitter; the 6 target docs tie on
    // logw, so the chosen 4-subset is jitter-driven and seed-sensitive —
    // at least one of two fresh seeds must differ unless the seed is ignored
    assert((sel("s1") != sel("other-seed")) || (sel("s1") != sel("s2")))
  }
}
