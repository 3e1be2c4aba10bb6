package graft

import graft.functions.EwahBitmap
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the EWAH codec: compression round-trips, cardinality
  * matches the set it encodes, and AND/OR agree with set algebra — over
  * arbitrary position sets including the run-heavy shapes (dense prefixes,
  * sparse tails) the compressor special-cases. */
object EwahBitmapSpec extends Properties("EwahBitmap") {

  private val positions: Gen[Set[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 4096L)).map(_.toSet)

  // dense run shapes: contiguous ranges force all-one run words
  private val ranges: Gen[Set[Long]] = for {
    start <- Gen.chooseNum(0L, 1000L)
    len <- Gen.chooseNum(0L, 700L)
  } yield (start until start + len).toSet

  private val posSet: Gen[Set[Long]] = Gen.oneOf(positions, ranges,
    for (a <- positions; b <- ranges) yield a ++ b)

  private def bitmapOf(s: Set[Long]): Array[Long] = {
    if (s.isEmpty) return EwahBitmap.compress(Array.empty[Long])
    val words = new Array[Long]((s.max >> 6).toInt + 1)
    s.foreach(p => words((p >> 6).toInt) |= 1L << (p & 63))
    EwahBitmap.compress(words)
  }

  private def setOf(c: Array[Long]): Set[Long] = {
    val words = EwahBitmap.decompress(c)
    (for {
      w <- words.indices
      b <- 0 until 64
      if (words(w) & (1L << b)) != 0
    } yield w.toLong * 64 + b).toSet
  }

  property("compress/decompress round-trips") = forAll(posSet) { s =>
    setOf(bitmapOf(s)) == s
  }

  property("cardinality equals set size (no expansion)") = forAll(posSet) { s =>
    EwahBitmap.cardinality(bitmapOf(s)) == s.size.toLong
  }

  property("and equals set intersection") = forAll(posSet, posSet) { (a, b) =>
    setOf(EwahBitmap.and(bitmapOf(a), bitmapOf(b))) == (a intersect b)
  }

  property("or equals set union") = forAll(posSet, posSet) { (a, b) =>
    setOf(EwahBitmap.or(bitmapOf(a), bitmapOf(b))) == (a union b)
  }

  property("all-one run words compress below raw size") =
    forAll(Gen.chooseNum(256L, 2048L)) { len =>
      val c = bitmapOf((0L until len).toSet)
      c.length < (len >> 6).toInt + 1 || len < 128
    }

  property("NULL positions are ignored (Hive GenericUDAFEWAHBitmap.iterate)") = {
    val agg = new graft.functions.EwahBitmapAgg
    val buf = agg.reduce(agg.reduce(agg.zero, 3L), null)
    setOf(agg.finish(agg.reduce(buf, 7L))) == Set(3L, 7L)
  }

  property("malformed compressed input fails cleanly, not with AIOOBE") = {
    def boom(c: Array[Long]): Boolean =
      try { EwahBitmap.decompress(c); false }
      catch { case e: IllegalArgumentException => e.getMessage.contains("EWAH") }
    boom(Array.empty[Long]) &&
      boom(Array(0L, 1L)) && // marker claims 1 literal that isn't there
      boom(Array(-5L)) && // negative word count
      boom(Array(1L, (2L << 32))) // run overruns declared count
  }

  property("ascending dense positions stay fast (geometric buffer growth)") = {
    val agg = new graft.functions.EwahBitmapAgg
    var buf = agg.zero
    val t0 = System.nanoTime()
    var p = 0L
    while (p < 1000000L) { buf = agg.reduce(buf, p); p += 64L } // one bit/word
    val dt = (System.nanoTime() - t0) / 1e9
    EwahBitmap.cardinality(agg.finish(buf)) == 15625L && dt < 5.0
  }
}
