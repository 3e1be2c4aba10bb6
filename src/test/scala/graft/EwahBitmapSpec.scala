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
}
