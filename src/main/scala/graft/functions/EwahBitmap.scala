package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Hive's EWAH bitmap surface (`ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
  * GenericUDAFEWAHBitmap.java`, `GenericUDFEWAHBitmapAnd/Or/Empty.java`)
  * re-expressed Spark-first: `ewah_bitmap` is an [[Aggregator]] (partial
  * aggregation + map-side combine for free — the buffer merges by word-OR),
  * and the bitmap combinators are Catalyst expressions over the compressed
  * `array<bigint>` value.
  *
  * The compressed form is a 64-bit enhanced word-aligned hybrid: word 0 is
  * the uncompressed word count, then repeating groups of one marker word —
  * run bit (63) | run length in words (62..32) | literal count (31..0) —
  * followed by that many literal words. Runs cover both all-zero and all-one
  * words, so dense and sparse bitmaps both compress; this is the published
  * EWAH scheme (Lemire, Kaser, Aouiche — "Sorting improves word-aligned
  * bitmap indexes", DKE 2010), not Hive's serialized JavaEWAH object, since
  * only semantics — not wire bytes — cross the engine boundary.
  *
  * Scale note: a bitmap aggregate's output is one row per group, so the
  * combinators run on agg-sized data, never per-input-row — eval-mode
  * expressions ([[CodegenFallback]]) are fine here; the per-row hot path is
  * the aggregation itself, which stays in the hash-agg codegen.
  * `ewah_bitmap_count`/`ewah_bitmap_empty` operate directly on the
  * compressed form (runs contribute popcounts without expansion).
  */
object EwahBitmap {

  /** Compress an uncompressed word array. */
  def compress(words: Array[Long]): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long](words.length.toLong)
    var i = 0
    while (i < words.length) {
      // run of identical all-zero or all-one words
      val runBit = if (words(i) == -1L) 1L else if (words(i) == 0L) 0L else -1L
      var runLen = 0L
      if (runBit >= 0) {
        val w = if (runBit == 1L) -1L else 0L
        while (i < words.length && words(i) == w && runLen < 0x7FFFFFFFL) {
          runLen += 1; i += 1
        }
      }
      // literals until the next run-compressible word
      val litStart = i
      while (i < words.length && words(i) != 0L && words(i) != -1L) i += 1
      val nLit = i - litStart
      out += (if (runBit == 1L) 1L << 63 else 0L) | (runLen << 32) | nLit.toLong
      var j = litStart
      while (j < i) { out += words(j); j += 1 }
    }
    out.toArray
  }

  private def bad(why: String): Nothing =
    throw new IllegalArgumentException(s"not an EWAH bitmap: $why")

  /** Expand back to the uncompressed word array. The input is SQL-reachable
    * (any array<bigint> literal can be passed to the combinators), so every
    * header field is bounds-checked — malformed input fails with a clean
    * error instead of an index-out-of-bounds deep in a task. */
  def decompress(c: Array[Long]): Array[Long] = {
    if (c.isEmpty) bad("empty array (missing word-count header)")
    if (c(0) < 0 || c(0) > Int.MaxValue) bad(s"word count ${c(0)} out of range")
    val n = c(0).toInt
    val words = new Array[Long](n)
    var i = 1
    var w = 0
    while (i < c.length) {
      val marker = c(i); i += 1
      val runLen = ((marker >>> 32) & 0x7FFFFFFFL).toInt
      val runWord = if ((marker >>> 63) == 1L) -1L else 0L
      val nLit = (marker & 0xFFFFFFFFL).toInt
      if (w + runLen + nLit > n) bad("marker overruns the declared word count")
      if (i + nLit > c.length) bad("marker claims more literal words than present")
      var k = 0
      while (k < runLen) { words(w) = runWord; w += 1; k += 1 }
      k = 0
      while (k < nLit) { words(w) = c(i); i += 1; w += 1; k += 1 }
    }
    if (w != n) bad(s"container encodes $w words, header declares $n")
    words
  }

  /** Set-bit count straight off the compressed form (validated the same
    * way as [[decompress]] — no expansion, but no blind trust either). */
  def cardinality(c: Array[Long]): Long = {
    if (c.isEmpty) bad("empty array (missing word-count header)")
    var total = 0L
    var i = 1
    while (i < c.length) {
      val marker = c(i); i += 1
      val runLen = (marker >>> 32) & 0x7FFFFFFFL
      if ((marker >>> 63) == 1L) total += runLen * 64L
      val nLit = (marker & 0xFFFFFFFFL).toInt
      if (i + nLit > c.length) bad("marker claims more literal words than present")
      var k = 0
      while (k < nLit) { total += java.lang.Long.bitCount(c(i)); i += 1; k += 1 }
    }
    total
  }

  def and(a: Array[Long], b: Array[Long]): Array[Long] = op(a, b, _ & _)
  def or(a: Array[Long], b: Array[Long]): Array[Long] = op(a, b, _ | _)

  private def op(a: Array[Long], b: Array[Long], f: (Long, Long) => Long): Array[Long] = {
    val x = decompress(a)
    val y = decompress(b)
    val n = math.max(x.length, y.length)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val xv = if (i < x.length) x(i) else 0L
      val yv = if (i < y.length) y(i) else 0L
      out(i) = f(xv, yv)
      i += 1
    }
    compress(out)
  }
}

/** `ewah_bitmap(pos)` — aggregate bit positions (non-negative longs) into a
  * compressed bitmap. The buffer is the uncompressed word array (word-OR
  * merge is associative + commutative, so partial aggregation is exact);
  * `finish` compresses once per group. Boxed input: NULL positions are
  * IGNORED, as in the reference (`GenericUDAFEWAHBitmap.iterate` returns on
  * null) — a primitive-Long encoder would instead decode NULL as 0 and set
  * a phantom bit. The final slack trim keeps `finish` exact under the
  * geometric buffer growth. */
class EwahBitmapAgg extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.empty[Long]

  /** Amortized O(1) append: grow geometrically, not to exactly word+1 —
    * ascending positions would otherwise trigger a full copy every 64th
    * row with linearly growing size (O(n²) copied words per group). */
  private def ensure(buf: Array[Long], word: Int): Array[Long] =
    if (word < buf.length) buf
    else {
      val grown = new Array[Long](math.max(word + 1, buf.length * 2))
      System.arraycopy(buf, 0, grown, 0, buf.length)
      grown
    }

  override def reduce(buf: Array[Long], pos: java.lang.Long): Array[Long] = {
    if (pos == null) return buf // Hive ignores null positions
    val p = pos.longValue()
    require(p >= 0, s"ewah_bitmap position must be >= 0, got $p")
    val w = (p >> 6).toInt
    val b = ensure(buf, w)
    b(w) |= 1L << (p & 63)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) |= small(i); i += 1 }
    big
  }

  override def finish(buf: Array[Long]): Array[Long] = {
    // trim the geometric-growth slack so the compressed header's word
    // count reflects the highest set word, not the buffer capacity
    var top = buf.length
    while (top > 0 && buf(top - 1) == 0L) top -= 1
    EwahBitmap.compress(java.util.Arrays.copyOfRange(buf, 0, top))
  }

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

private[functions] trait EwahBinary extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> bitmaps, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }
  protected def combine(a: Array[Long], b: Array[Long]): Array[Long]
  override def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(combine(
      a.asInstanceOf[ArrayData].toLongArray(),
      b.asInstanceOf[ArrayData].toLongArray()))
}

/** `ewah_bitmap_and(b1, b2)` (GenericUDFEWAHBitmapAnd). */
case class EwahBitmapAnd(left: Expression, right: Expression) extends EwahBinary {
  override def prettyName: String = "ewah_bitmap_and"
  override protected def combine(a: Array[Long], b: Array[Long]): Array[Long] =
    EwahBitmap.and(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** `ewah_bitmap_or(b1, b2)` (GenericUDFEWAHBitmapOr). */
case class EwahBitmapOr(left: Expression, right: Expression) extends EwahBinary {
  override def prettyName: String = "ewah_bitmap_or"
  override protected def combine(a: Array[Long], b: Array[Long]): Array[Long] =
    EwahBitmap.or(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

private[functions] trait EwahUnary extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> bitmap, got ${other.sql}")
  }
}

/** `ewah_bitmap_empty(b)` (GenericUDFEWAHBitmapEmpty) — true iff no bit set. */
case class EwahBitmapEmpty(child: Expression) extends EwahUnary {
  override def prettyName: String = "ewah_bitmap_empty"
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(a: Any): Any =
    EwahBitmap.cardinality(a.asInstanceOf[ArrayData].toLongArray()) == 0L
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `ewah_bitmap_count(b)` — set-bit cardinality off the compressed form.
  * Extension beyond Hive's trio (Hive routes counts through
  * `ewah_bitmap_empty` + lateral tricks); counting is the operation every
  * bitmap consumer actually wants. */
case class EwahBitmapCount(child: Expression) extends EwahUnary {
  override def prettyName: String = "ewah_bitmap_count"
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any): Any =
    EwahBitmap.cardinality(a.asInstanceOf[ArrayData].toLongArray())
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
