package graft.operators

import java.nio.charset.StandardCharsets
import scala.util.hashing.MurmurHash3

/** Compiled per-document text kernels shared by the dedup / fingerprint /
  * text-analysis operators. Each function is pure, allocation-light Scala
  * applied inside a `Dataset.mapPartitions` pass — one narrow, shuffle-free
  * map stage per corpus scan, the shape Hive gives per-row UDFs
  * (`ql/src/java/org/apache/hadoop/hive/ql/udf/generic/GenericUDF.java:66`)
  * but compiled instead of reflective.
  *
  * Why not Catalyst higher-order functions: HOF lambdas are interpreted
  * (no whole-stage codegen), and the optimizer may collapse a staged array
  * column *into* a downstream lambda, re-evaluating the producer once per
  * array element — measured as an O(n²)–O(n³) blowup on the shingle →
  * minhash → band chain. A typed map is a hard optimizer boundary and runs
  * the whole per-doc chain in one compiled pass.
  *
  * Cross-engine determinism: every value the DuckDB oracle must reproduce
  * uses [[h60]] (md5-prefix, bit-identical in both engines) or pure integer/
  * rational arithmetic on counts. MinHash permutations and band hashes are
  * Spark-internal only (the oracle checks the *verified* output pairs).
  */
object TextFeatures extends Serializable {

  /** Whitespace tokens; keeps trailing empties like Spark `split(text,' ')`
    * and DuckDB `string_split(text,' ')`. */
  def words(text: String): Array[String] = text.split(" ", -1)

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit cross-engine hash: first 15 hex digits of md5(s).
    * DuckDB: `CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)`. */
  def h60(s: String): Long = {
    val d = mdLocal.get()
    d.reset()
    val b = d.digest(s.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xFFL); i += 1 }
    (v << 4) | ((b(7) >> 4) & 0xFL)
  }

  /** Distinct word 3-gram shingles (first-occurrence order).
    * DuckDB: `list_distinct(list_transform(range(1, len(ws)-1),
    *   i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]))` guarded by `len >= 3`. */
  def shingles3(ws: Array[String]): Array[String] = {
    if (ws.length < 3) return Array.empty[String]
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= ws.length - 3) {
      seen.add(ws(i) + " " + ws(i + 1) + " " + ws(i + 2))
      i += 1
    }
    seen.toArray(new Array[String](seen.size()))
  }

  /** MinHash signature (Broder '97): permutation i re-hashes each murmur3
    * base hash through splitmix64 with a per-permutation seed (an affine map
    * `a*h+b` with positive `a` would be monotonic in h — every permutation
    * would share one argmin and the signatures would be perfectly
    * correlated). Empty set hashes to Long.MaxValue everywhere.
    * Spark-internal (not oracle-visible). */
  def minhashSig(shingles: Array[String], nPerm: Int): Array[Long] = {
    val sig = new Array[Long](nPerm)
    if (shingles.isEmpty) {
      java.util.Arrays.fill(sig, Long.MaxValue)
      return sig
    }
    val base = new Array[Long](shingles.length)
    var j = 0
    while (j < shingles.length) {
      base(j) = MurmurHash3.stringHash(shingles(j), 42).toLong
      j += 1
    }
    var i = 0
    while (i < nPerm) {
      val seed = mix64(i.toLong)
      var mn = Long.MaxValue
      j = 0
      while (j < base.length) {
        val v = mix64(base(j) ^ seed)
        if (v < mn) mn = v
        j += 1
      }
      sig(i) = mn
      i += 1
    }
    sig
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** LSH band bucket keys: signature cut into `nBands` bands of
    * `rowsPerBand`, each band mixed (splitmix64) into one 64-bit key. */
  def bandHashes(sig: Array[Long], nBands: Int, rowsPerBand: Int): Array[Long] = {
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = mix64(b.toLong)
      var r = 0
      while (r < rowsPerBand) { h = mix64(h ^ sig(b * rowsPerBand + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** 64-bit shingle hash (two-seed murmur3 composition — cheap, Spark-
    * internal; used where intersection *counts*, not shingle strings, drive
    * the result). */
  def shingleHash64(s: String): Long =
    (MurmurHash3.stringHash(s, 42).toLong << 32) |
      (MurmurHash3.stringHash(s, 7).toLong & 0xFFFFFFFFL)

  /** 60-bit SimHash (Charikar '02) over [[h60]] word hashes, duplicate
    * tokens weighted by count — matches the DuckDB majority-bit oracle. */
  def simhash60(ws: Array[String]): Long = {
    val counts = new Array[Int](60)
    var n = 0
    var i = 0
    while (i < ws.length) {
      val h = h60(ws(i))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      n += 1
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (2 * counts(b) > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** [[h60]] over every k-char-gram (code points, like SQL `substr`).
    * DuckDB: `list_transform(range(1, length(t)-(k-2)), i -> h60(substr(t,i,k)))`
    * guarded by `length >= k`. */
  def charGramH60(text: String, k: Int): Array[Long] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    if (n < k) return Array.empty[Long]
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) = h60(new String(cps, i, k))
      i += 1
    }
    out
  }

  /** Winnowing fingerprints (Schleimer et al. '03): distinct min of each
    * sliding window of `w` gram hashes (first-occurrence order); degenerates
    * to the distinct grams when fewer than `w` exist. */
  def winnow(grams: Array[Long], w: Int): Array[Long] = {
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (grams.length < w) {
      var i = 0
      while (i < grams.length) { seen.add(grams(i)); i += 1 }
    } else {
      var j = 0
      while (j <= grams.length - w) {
        var mn = Long.MaxValue
        var r = 0
        while (r < w) { if (grams(j + r) < mn) mn = grams(j + r); r += 1 }
        seen.add(mn)
        j += 1
      }
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Code-point count — SQL `length()` semantics (not UTF-16 units). */
  def nCodePoints(text: String): Int = text.codePointCount(0, text.length)

  /** Count of code points outside printable ASCII `[ -~]`. */
  def nonAsciiCount(text: String): Int = {
    var n = 0
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (cp < 0x20 || cp > 0x7E) n += 1
      i += Character.charCount(cp)
    }
    n
  }

  /** Count of code points not in `[a-z0-9 ]` (SQL punct-ratio numerator). */
  def punctCount(text: String): Int = {
    var n = 0
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val keep = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == ' '
      if (!keep) n += 1
      i += Character.charCount(cp)
    }
    n
  }

  def countIn(ws: Array[String], set: Set[String]): Int = {
    var n = 0
    var i = 0
    while (i < ws.length) { if (set.contains(ws(i))) n += 1; i += 1 }
    n
  }

  def nDistinct(ws: Array[String]): Int = {
    val s = new java.util.HashSet[String]()
    var i = 0
    while (i < ws.length) { s.add(ws(i)); i += 1 }
    s.size()
  }

  private val bpePattern = java.util.regex.Pattern.compile("[a-z]+|[0-9]|[^a-z0-9 ]")

  /** BPE-ish token count: letter runs / single digits / single other chars —
    * same regex the oracle feeds `regexp_extract_all`. */
  def bpeTokenCount(text: String): Int = {
    val m = bpePattern.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** SQL ROUND(x, 6) — BigDecimal HALF_UP, matching Spark `round` and DuckDB
    * `ROUND` on the identical input double. */
  def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
