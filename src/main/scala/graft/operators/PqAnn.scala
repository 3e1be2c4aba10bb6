package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantization ANN with asymmetric-distance (ADC) search — the
  * memory-bandwidth scale path past int8 scalar quantization
  * ([[Int8Quantize]]) and IVF ([[AnnSearch.ivfTopK]]): the corpus is stored
  * as `m` one-byte-ish codes per vector (here `m` ints for clarity) instead
  * of `dim` floats, and scoring a candidate is `m` table lookups instead of
  * a `dim`-wide dot product (Jégou, Douze, Schmid — "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011).
  *
  * Pipeline (all int64-quantized arithmetic, the q45/q128 discipline, so the
  * DuckDB oracle replays every stage bit-exactly):
  *   1. codebook — subspace `mi` splits the vector into `dim/m` dims;
  *      centroid `j` of subspace `mi` is the subvector of the corpus row
  *      with `id == j*stride` (deterministic stand-in, same contract as
  *      [[AnnSearch.ivfTopK]]'s stride centroids; the k-means-trained
  *      variant is orthogonal and proven by q274's replayed Lloyd).
  *      O(m·ncent·ds) values, collected once (the KMeansModel.clusterCenters
  *      contract).
  *   2. encode — one narrow compiled pass: per row, per subspace, the
  *      argmin-L2 centroid (ties → smaller j) plus the reconstructed-vector
  *      norm² (sum of the chosen centroids' norms²). No shuffle.
  *   3. ADC scan — the query batch is broadcast (bounded, identical to
  *      [[AnnSearch.bruteTopK]]'s `broadcast(q)`); each task builds the
  *      per-query lookup table `lut(mi)(j) = dot(q_mi, c_mi_j)` once, then
  *      streams its corpus split scoring `approx = Σ_mi lut(mi)(code(mi))`
  *      normalized by `sqrt(qn²·rn²)` — shuffle-free, and the score matrix
  *      never materializes ([[AnnSearch.partitionTopK]] bounded heaps keep
  *      `shortlist` rows per query per partition).
  *   4. exact rescore — the shortlist (O(|queries|·shortlist) rows) joins
  *      back to the true vectors; final rank is exact cosine (approximation
  *      decides WHO is rescored, never the reported score) with the usual
  *      (cos desc, cid) total order and 6-dp rounding.
  *
  * The reference engine has no ANN surface — this is part of the
  * training-data pipeline pack (SURVEY.md §7 step 9).
  */
object PqAnn {

  /** codebook(mi)(j) = int64 subvector; plus per-centroid norm². */
  private final case class Codebook(
      cents: Array[Array[Array[Long]]], norms2: Array[Array[Long]], ds: Int) {
    def m: Int = cents.length
    def ncent: Int = cents.head.length
  }

  private def collectCodebook(
      qc: DataFrame, m: Int, ncent: Int, stride: Int): Codebook = {
    val spark = qc.sparkSession
    import spark.implicits._
    val rows = qc
      .filter(col("id") % stride === 0 && col("id") < ncent.toLong * stride)
      .select(col("id"), col("qe")).as[(Long, Seq[Long])]
      .collect().sortBy(_._1)
    require(rows.length == ncent,
      s"PQ codebook wants $ncent rows with id % $stride == 0 below ${ncent.toLong * stride}, " +
        s"got ${rows.length} — an undersized codebook would silently skew every code")
    val dim = rows.head._2.length
    require(dim % m == 0, s"dim=$dim is not divisible into m=$m subspaces")
    val ds = dim / m
    val cents = Array.tabulate(m, ncent) { (mi, j) =>
      rows(j)._2.slice(mi * ds, mi * ds + ds).toArray
    }
    val norms2 = Array.tabulate(m, ncent) { (mi, j) =>
      val c = cents(mi)(j)
      var acc = 0L; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    }
    Codebook(cents, norms2, ds)
  }

  /** Deterministic per-subspace Lloyd k-means refining the stride codebook
    * — the PQ analog of [[AnnSearch.trainCentroids]] (FAISS trains its PQ
    * codebooks with exactly this subspace-wise k-means; Jégou et al. §II.C).
    * Init = the stride rows' subvectors; assignment = the SAME argmin-L2
    * (ties → smaller j) the encoder uses; update = per-coordinate integer
    * mean with toward-zero truncation; empty cells keep their previous
    * centroid. Every step is closed-form int64 arithmetic, so the DuckDB
    * oracle replays the training bit-exactly (q355).
    *
    * Scale shape: each iteration is ONE compiled mapPartitions pass over
    * the corpus emitting O(partitions × m × ncent) partial (sum, count)
    * rows that reduce to the driver's O(m·ncent·ds) update — the corpus
    * never shuffles, iterations are a small train-once constant. The input
    * `vecs` is any (id, qe) int64 frame — raw subvectors for flat PQ,
    * residuals for IVF-PQ. */
  private[graft] def lloydSubspaces(
      vecs: DataFrame, init: Array[Array[Array[Long]]], ds: Int,
      iters: Int): Array[Array[Array[Long]]] = {
    require(iters >= 0, s"iters >= 0 (got $iters)")
    val spark = vecs.sparkSession
    import spark.implicits._
    var cents = init
    val m = init.length
    val ncent = init.head.length
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val partials = vecs.select(col("qe")).as[Seq[Long]]
        .mapPartitions { it =>
          val book = bc.value
          val sums = Array.fill(m, ncent)(new Array[Long](ds))
          val cnts = Array.fill(m, ncent)(0L)
          it.foreach { e =>
            val v = e.toArray
            var mi = 0
            while (mi < m) {
              val off = mi * ds
              var best = 0; var bestD = Long.MaxValue
              var j = 0
              while (j < ncent) {
                val c = book(mi)(j)
                var d = 0L; var i = 0
                while (i < ds) { val x = v(off + i) - c(i); d += x * x; i += 1 }
                if (d < bestD) { bestD = d; best = j }
                j += 1
              }
              val s = sums(mi)(best)
              var i = 0
              while (i < ds) { s(i) += v(off + i); i += 1 }
              cnts(mi)(best) += 1
              mi += 1
            }
          }
          (for { mi <- (0 until m).iterator; j <- 0 until ncent
                 if cnts(mi)(j) > 0 }
            yield (mi, j, sums(mi)(j).toSeq, cnts(mi)(j))).iterator
        }
        .groupByKey(r => (r._1, r._2))
        .reduceGroups { (a, b) =>
          (a._1, a._2, a._3.zip(b._3).map { case (x, y) => x + y }, a._4 + b._4)
        }
        .map(_._2).collect()
        .map { case (mi, j, s, n) => (mi, j) -> (s.toArray, n) }.toMap
      cents = Array.tabulate(m, ncent) { (mi, j) =>
        partials.get((mi, j)) match {
          case Some((s, n)) => s.map(x => (x.toDouble / n).toLong) // trunc
          case None => cents(mi)(j) // empty cell keeps previous centroid
        }
      }
      bc.destroy()
    }
    cents
  }

  private def withNorms(cents: Array[Array[Array[Long]]], ds: Int): Codebook = {
    val norms2 = cents.map(_.map { c =>
      var acc = 0L; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    })
    Codebook(cents, norms2, ds)
  }

  /** (cid, codes, rn2): PQ codes + reconstructed norm², one compiled pass. */
  private def encode(qc: DataFrame, bc: Broadcast[Codebook]): DataFrame = {
    val spark = qc.sparkSession
    import spark.implicits._
    qc.select(col("id"), col("qe")).as[(Long, Seq[Long])]
      .mapPartitions { it =>
        val cb = bc.value
        it.map { case (id, e) =>
          val v = e.toArray
          val codes = new Array[Int](cb.m)
          var rn2 = 0L
          var mi = 0
          while (mi < cb.m) {
            val off = mi * cb.ds
            var best = 0; var bestD = Long.MaxValue
            var j = 0
            while (j < cb.ncent) {
              val c = cb.cents(mi)(j)
              var d = 0L; var i = 0
              while (i < cb.ds) {
                val diff = v(off + i) - c(i); d += diff * diff; i += 1
              }
              if (d < bestD) { bestD = d; best = j }
              j += 1
            }
            codes(mi) = best
            rn2 += cb.norms2(mi)(best)
            mi += 1
          }
          (id, codes, rn2)
        }
      }
      .toDF("cid", "codes", "rn2")
  }

  /** Deterministic signed permutation — OPQ-lite. Full OPQ (Ge et al.
    * CVPR 2013; FAISS `OPQMatrix`) trains a rotation R minimizing PQ
    * distortion via SVD; float SVD is not bit-replayable across engines,
    * so this implements the exactly-replayable subset: a SIGNED
    * PERMUTATION (an orthogonal matrix with one ±1 per row), derived from
    * the keyed md5 hash like every other randomness in this repo. It
    * redistributes correlated adjacent dimensions across PQ subspaces —
    * the main practical effect OPQ's rotation has on real embeddings —
    * while preserving every int64 dot product and norm EXACTLY:
    * dot(Px, Py) = dot(x, y), so the exact rescore reports the same
    * cosines and the shortlist=∞ brute-degeneracy spec holds under
    * rotation unchanged. Output position j takes input coordinate
    * perm(j) with sign sgn(j); perm = indices ordered by
    * md5("seed:i:perm") (ties by i), sgn(i) = parity of the 60-bit
    * prefix of md5("seed:i:sgn"). */
  private[graft] def signedPerm(seed: String, dim: Int): (Array[Int], Array[Long]) = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val perm = (0 until dim).sortBy(i => (md5hex(s"$seed:$i:perm"), i)).toArray
    val sgn = perm.map { i =>
      val h = java.lang.Long.parseLong(md5hex(s"$seed:$i:sgn").take(15), 16)
      if (h % 2 == 0) 1L else -1L
    }
    (perm, sgn)
  }

  /** Apply the signed permutation to a quantized (id, qe, n2) frame — a
    * compiled narrow pass; norms are preserved exactly so n2 rides along. */
  private def rotate(qc: DataFrame, perm: Array[Int], sgn: Array[Long]): DataFrame = {
    val spark = qc.sparkSession
    import spark.implicits._
    qc.as[(Long, Seq[Long], Long)].mapPartitions { it =>
      it.map { case (id, e, n2) =>
        val v = e.toArray
        (id, Array.tabulate(v.length)(j => sgn(j) * v(perm(j))).toSeq, n2)
      }
    }.toDF("id", "qe", "n2")
  }

  /** PQ-ADC top-k with exact rescore. `queries`/`corpus`: (id, embedding).
    * `iters = 0` keeps the stride codebook (the q347 contract); `iters > 0`
    * refines it with [[lloydSubspaces]] — tighter cells, higher recall at
    * the same m/ncent/shortlist (spec-asserted ≥ the stride baseline). */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, ncent: Int = 16, stride: Int = 7,
      shortlist: Int = 32, iters: Int = 0,
      rotateSeed: Option[String] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cc0 = AnnSearch.quantized(corpus)
    // OPQ-lite: both sides rotate through the SAME signed permutation, so
    // every downstream dot/norm (codebook, ADC, exact rescore) is exactly
    // the unrotated value — only the subspace slicing changes
    val rot = rotateSeed.map { seed =>
      val dim = cc0.select(col("qe")).as[Seq[Long]].head.length
      signedPerm(seed, dim)
    }
    val cc = rot.map { case (p, g) => rotate(cc0, p, g) }.getOrElse(cc0)
    val cb0 = collectCodebook(cc, m, ncent, stride)
    val cb = spark.sparkContext.broadcast(
      if (iters == 0) cb0
      else withNorms(lloydSubspaces(cc, cb0.cents, cb0.ds, iters), cb0.ds))
    val qq0 = AnnSearch.quantized(queries)
    val qq = rot.map { case (p, g) => rotate(qq0, p, g) }.getOrElse(qq0)
    // the probe batch: broadcast-bounded, the bruteTopK broadcast(q) contract
    val qArr = qq.select(col("id"), col("qe"), col("n2"))
      .as[(Long, Seq[Long], Long)].collect().map { case (id, e, n2) => (id, e.toArray, n2) }
    val bq = spark.sparkContext.broadcast(qArr)

    val approxScored = encode(cc, cb).as[(Long, Seq[Int], Long)]
      .mapPartitions { it =>
        val book = cb.value
        val qs = bq.value
        // per-query ADC lookup tables, built once per task: |q|·m·ncent dots
        val luts = qs.map { case (_, qv, _) =>
          Array.tabulate(book.m, book.ncent) { (mi, j) =>
            val c = book.cents(mi)(j)
            val off = mi * book.ds
            var acc = 0L; var i = 0
            while (i < book.ds) { acc += qv(off + i) * c(i); i += 1 }
            acc
          }
        }
        it.flatMap { case (cid, codesSeq, rn2) =>
          val codes = codesSeq.toArray
          qs.iterator.zipWithIndex.collect {
            case ((qid, _, qn2), qi) if qid != cid =>
              val lut = luts(qi)
              var adc = 0L; var mi = 0
              while (mi < book.m) { adc += lut(mi)(codes(mi)); mi += 1 }
              val denom = math.sqrt(qn2.toDouble * rn2.toDouble)
              val score = if (denom == 0.0d) -1.0d else adc.toDouble / denom
              (qid, cid, score)
          }
        }
      }
      .toDF("qid", "cid", "cos")
    val short = AnnSearch.partitionTopK(approxScored, shortlist)
      .groupBy("qid", "cid").agg(max("cos").as("adc")) // merge partition heaps
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("adc").desc, col("cid"))))
      .filter(col("rn") <= shortlist)
      .select("qid", "cid")

    // exact rescore of the shortlist only
    val scored = short
      .join(cc.select(col("id").as("cid"), col("qe").as("ce"), col("n2").as("cn")), "cid")
      .join(broadcast(qq.select(col("id").as("qid"), col("qe"), col("n2").as("qn"))), "qid")
      .withColumn("cos", coalesce(
        AnnSearch.dotI64(col("qe"), col("ce")).cast("double") /
          sqrt(col("qn").cast("double") * col("cn").cast("double")), lit(-1.0)))
    AnnSearch.rankTopK(scored, k)
  }
}
