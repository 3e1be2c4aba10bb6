package graft.operators

import graft.functions.{DotF32, DotI64}
import org.apache.spark.sql.graftshim.{ColumnBridge => CB}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an `array<float>` embedding column — the
  * training-pipeline extension ops (SURVEY.md §7 step 9). Two paths:
  *
  *  - `bruteTopK`: exact cosine top-k of every query vector against the whole
  *    corpus. Uses *quantized integer* arithmetic (round(x*1e6) per element,
  *    int64 dot products via the codegen'd [[graft.functions.DotI64]]) so the
  *    result is bit-identical across engines — the oracle-checkable baseline.
  *    The query set is broadcast; the corpus streams — at 100 TB the corpus
  *    side never shuffles and the work is one scan + a per-query top-k.
  *
  *  - `ivfTopK`: IVF-style two-stage search. A deterministic centroid subset
  *    partitions the corpus into `nlist` inverted lists (cluster assignment =
  *    argmax dot against broadcast centroids); a query probes its `nprobe`
  *    closest centroids and scans only those lists. This is the 100 TB path:
  *    the corpus is written partitioned by cluster id, so a probe is a
  *    partition-pruned scan of nprobe/nlist of the data. Scoring uses the
  *    codegen'd native [[graft.functions.DotF32]] expression.
  *
  * Quantization happens in a compiled typed-map stage (hard optimizer
  * boundary — see [[TextFeatures]] for why staged arrays must not feed
  * Catalyst HOF lambdas).
  */
object AnnSearch {

  def dotF32(a: Column, b: Column): Column =
    CB.column(DotF32(CB.expression(a), CB.expression(b)))

  def dotI64(a: Column, b: Column): Column =
    CB.column(DotI64(CB.expression(a), CB.expression(b)))

  /** round(x*1e6) with SQL ROUND semantics (BigDecimal HALF_UP on the
    * double product) — matches Spark `round` and DuckDB `round` exactly;
    * products fit int64 (|x| < 100). */
  private[operators] def quantizeRow(e: Seq[Float]): Array[Long] = {
    val out = new Array[Long](e.length)
    var i = 0
    while (i < e.length) {
      out(i) = BigDecimal(e(i).toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      i += 1
    }
    out
  }

  /** (id, qe, n2): quantized embedding + its squared norm, one compiled map
    * pass over (id, embedding). */
  private[operators] def quantized(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions(_.map { case (id, e) =>
        val q = quantizeRow(e)
        var n2 = 0L
        var i = 0
        while (i < q.length) { n2 += q(i) * q(i); i += 1 }
        (id, q, n2)
      })
      .toDF("id", "qe", "n2")
  }

  /** [[quantized]] carrying an int `label` column through the ONE compiled
    * pass (the [[quantizedBlocked]] pattern) — no second corpus scan, no
    * corpus-to-corpus join to re-attach the label. */
  private def quantizedLabeled(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("label").cast("int"), col("embedding"))
      .as[(Long, Int, Seq[Float])]
      .mapPartitions(_.map { case (id, lbl, e) =>
        val q = quantizeRow(e)
        var n2 = 0L
        var i = 0
        while (i < q.length) { n2 += q(i) * q(i); i += 1 }
        (id, lbl, q, n2)
      })
      .toDF("id", "label", "qe", "n2")
  }

  /** Per-partition bounded top-k reduction: keeps at most k (cid, cos) rows
    * per qid per partition under the total order (cos desc, cid asc), so the
    * final global rank shuffles ≤ partitions×|queries|×k rows instead of
    * |corpus|×|queries|. Total order ⇒ partition-local pruning is lossless. */
  private[operators] def partitionTopK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // worst candidate at the heap head: smaller cos first, then larger cid
    val evictionOrder: Ordering[(Long, Double)] =
      Ordering.by[(Long, Double), (Double, Long)] { case (cid, cos) => (-cos, cid) }
    scored.select(col("qid"), col("cid"), col("cos")).as[(Long, Long, Double)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.PriorityQueue[(Long, Double)]]
        it.foreach { case (qid, cid, cos) =>
          val h = heaps.getOrElseUpdate(qid,
            scala.collection.mutable.PriorityQueue.empty(evictionOrder))
          h.enqueue((cid, cos))
          if (h.size > k) h.dequeue()
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (cid, cos) => (qid, cid, cos) }
        }
      }
      .toDF("qid", "cid", "cos")
  }

  /** Exact cosine top-k, deterministic tie-break on candidate id.
    * `queries`/`corpus` need (id, embedding) columns.
    *
    * Scale shape: the query set broadcasts, the corpus streams (one scan, no
    * corpus shuffle), and scoring reduces through [[partitionTopK]] before
    * the global rank — the window input is O(partitions × |queries| × k),
    * not the |corpus|×|queries| score matrix. */
  /** int64-quantized cosine between the (qe,qn)/(ce,cn) pairs. A zero-norm
    * side (degenerate all-zero embedding, or one that quantizes to zero)
    * would divide by zero — NULL under the session's ANSI-off semantics —
    * and crash [[partitionTopK]]'s primitive-Double decode; it scores -1.0
    * instead, ranking the degenerate vector last rather than failing the
    * job. */
  private def cosExpr: Column =
    coalesce(dotI64(col("qe"), col("ce")).cast("double") /
      sqrt(col("qn").cast("double") * col("cn").cast("double")), lit(-1.0))

  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = quantized(queries).select(col("id").as("qid"),
      col("qe"), col("n2").as("qn"))
    val c = quantized(corpus).select(col("id").as("cid"),
      col("qe").as("ce"), col("n2").as("cn"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", cosExpr)
    rankTopK(scored, k)
  }

  /** HARD-TRIPLET MINING for embedding-model training data — the
    * contrastive-pair step every retrieval/embedding fine-tune runs over
    * its corpus (triplet/InfoNCE losses train on exactly these): for each
    * anchor, the HARD POSITIVE (same label, LOWEST cosine — the pair the
    * model most needs pulled together) and the top-k HARD NEGATIVES
    * (different label, HIGHEST cosine — the pairs it most needs pushed
    * apart), with the per-row margin (pos − neg, both at the 6-dp output
    * grain) that a curriculum can threshold on. Anchors without any
    * same-label partner drop out (inner join — no positive, no triplet).
    *
    * Scale shape: anchors BROADCAST into one corpus scan (the
    * [[bruteTopK]] contract — the corpus never shuffles); the hard
    * positive reduces through a partial-aggregated lexicographic
    * `min(struct(cos, cid))` — a hash agg, never a corpus-wide window;
    * negatives reduce through [[partitionTopK]]'s bounded heaps before
    * the final |anchors|-sized rank window. Ordering ties break by cid on
    * both sides, and every cosine is the shared int64-exact kernel, so
    * the whole mine replays in the oracle. */
  def tripletMine(anchors: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val q = quantizedLabeled(anchors)
      .select(col("id").as("qid"), col("qe"), col("n2").as("qn"),
        col("label").as("ql"))
    val c = quantizedLabeled(corpus)
      .select(col("id").as("cid"), col("qe").as("ce"), col("n2").as("cn"),
        col("label").as("cl"))
    val pairs = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos", cosExpr)
    val pos = pairs.filter(col("ql") === col("cl"))
      .groupBy("qid")
      .agg(min(struct(col("cos"), col("cid"))).as("m"))
      .select(col("qid"), col("m.cid").as("pos_id"),
        round(col("m.cos"), 6).as("pos_cos"))
    // negatives reduce through the SHARED rankTopK total order (heap
    // reduction + (cos desc, cid) window + 6-dp rounding) — one copy of
    // that contract for the whole ANN family
    val neg = rankTopK(
        pairs.filter(col("ql") =!= col("cl"))
          .select(col("qid"), col("cid"), col("cos")), k)
      .select(col("qid"), col("cid").as("neg_id"),
        col("cos").as("neg_cos"), col("rk").cast("bigint").as("rk"))
    neg.join(pos, Seq("qid"))
      .withColumn("margin",
        round(col("pos_cos") - col("neg_cos"), 6))
      .select(col("qid"), col("rk"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"), col("margin"))
  }

  /** IVF two-stage ANN. Centroids = corpus rows where id % stride == 0
    * (deterministic stand-in for a k-means pass — centroid *choice* is
    * orthogonal to the search plan).
    *
    * All arithmetic is on the int64-quantized vectors (assignment argmax and
    * scoring), so the candidate set and scores are bit-identical across
    * engines — the DuckDB oracle reproduces q45 exactly.
    *
    * Scale shape: centroids are O(nlist) — collected once and broadcast;
    * cluster assignment is a narrow compiled `mapPartitions` argmax over the
    * broadcast table (NOT a crossJoin — no n×nlist row amplification and no
    * shuffle to rank it). The probe join broadcasts the nprobe-expanded
    * query side, so the corpus-side inverted lists never shuffle either; on
    * a real deployment the assigned corpus is written `partitionBy(cent_id)`
    * once and probes become partition-pruned scans. */
  /** O(nlist) rows — the one intentional driver materialization (same
    * contract as KMeansModel.clusterCenters). */
  private[operators] def collectCentroids(qc: DataFrame, centroidStride: Int): Array[(Long, Array[Long])] = {
    val spark = qc.sparkSession
    import spark.implicits._
    val cents = qc.filter(col("id") % centroidStride === 0)
      .select(col("id"), col("qe")).as[(Long, Seq[Long])]
      .collect().map { case (i, e) => (i, e.toArray) }
      .sortBy(_._1)
    require(cents.nonEmpty,
      s"centroidStride=$centroidStride selects no corpus row (id % stride == 0) — " +
        "an empty centroid set would silently return zero results")
    cents
  }

  /** top-`keep` centroid ids by (int64 dot desc, cent_id asc) — exact,
    * compiled argmax over the broadcast centroid table: no crossJoin row
    * amplification, no shuffle. */
  private[operators] def assign(df: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Long])]],
      keep: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("qe"), col("n2")).as[(Long, Seq[Long], Long)]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (id, e, n2) =>
          val v = e.toArray
          val scored = cs.map { case (centId, ce) =>
            val n = math.min(v.length, ce.length)
            var acc = 0L
            var i = 0
            while (i < n) { acc += v(i) * ce(i); i += 1 }
            (centId, acc)
          }
          if (scored.isEmpty) Iterator.empty
          else if (keep == 1) {
            // corpus-assignment hot path: linear argmax, no per-row sort
            var best = 0
            var j = 1
            while (j < scored.length) {
              val b = scored(best); val s = scored(j)
              if (s._2 > b._2 || (s._2 == b._2 && s._1 < b._1)) best = j
              j += 1
            }
            Iterator.single((id, e, n2, scored(best)._1))
          } else
            scored.sortBy { case (centId, d) => (-d, centId) }
              .iterator.take(keep).map { case (centId, _) => (id, e, n2, centId) }
        }
      }
      .toDF("id", "qe", "n2", "cent_id")
  }

  /** Shared exact-rescore + rank tail: partition-local bounded heaps, then
    * the global rank over the O(partitions×|queries|×k) survivors. */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    partitionTopK(scored, k)
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("rk"), round(col("cos"), 6).as("cos"))

  /** md5 keyed-hash Rademacher ±1 plane entry per (seed, table, bit,
    * coordinate) — the q172 discipline: parity of the first 15 hex chars
    * of `md5("<seed>:<t>:<b>:<i>:pln")`, bit-reproducible by ANY engine
    * with an md5 (`CAST(('0x' || substr(md5(k),1,15)) AS BIGINT) % 2` in
    * the DuckDB oracle), replacing a splitmix64 finalizer no SQL engine
    * exposes. The hyperplane "index" stays a pure function of the four
    * values: nothing is materialized, collected, or broadcast, and every
    * executor derives identical planes. */
  private def planeSign(seed: Long, t: Int, b: Int, i: Int): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$t:$b:$i:pln".getBytes("UTF-8"))
    val hex = d.map(x => f"${x & 0xff}%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 2 == 1
  }

  /** Materialized plane signs for one (seed, nTables, nBits, dim) — the
    * md5 derivation runs once per partition per table shape, not per
    * row×coordinate. */
  private def planeMatrix(seed: Long, nTables: Int, nBits: Int,
      dim: Int): Array[Array[Array[Boolean]]] =
    Array.tabulate(nTables, nBits, dim)((t, b, i) => planeSign(seed, t, b, i))

  /** Random-hyperplane LSH bucketed ANN — the LSH-bucketed companion to
    * [[ivfTopK]] (SURVEY §7 step 9). `nTables` signature tables × `nBits`
    * sign-bits; a corpus row lands in one bucket per table, a query joins
    * its buckets, candidates are exact-rescored with the quantized int64
    * dot. Collision probability per bit is 1−θ/π (random projection), so
    * recall tunes with nBits↓ / nTables↑.
    *
    * Scale shape: the corpus explodes ×nTables into (t, sig) keys and
    * *equi-joins* the query side on the bucket key — no corpus broadcast, no
    * cartesian, no centroid collect; skewed buckets split under AQE like any
    * shuffle join. The bucket join carries ONLY ids — a duplication-bomb
    * bucket multiplies narrow (t, sig, id) rows, not ~KB embeddings (the
    * wide-row amplification [[cosineNearDupPairsLsh]]'s x64 run OOMed on);
    * candidate pairs dedupe on (qid, cid) and the vectors re-attach by id
    * once per survivor for the exact rescore. */
  /** Deduped (qid, cid) candidate pairs (with re-attached vectors) from the
    * bucket join — exposed so the pruning property (|candidates| ≪
    * |queries|×|corpus|) is testable, not assumed. */
  private[graft] def lshCandidates(queries: DataFrame, corpus: DataFrame,
      nBits: Int, nTables: Int, seed: Long): DataFrame = {
    require(nBits >= 1 && nBits <= 31 && nTables >= 1,
      s"need 1 <= nBits <= 31 (signature is an Int; got $nBits) and " +
        s"nTables >= 1 (got $nTables)")
    def sigs(df: DataFrame, idN: String): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      quantized(df).as[(Long, Seq[Long], Long)].mapPartitions { it =>
        var planes: Array[Array[Array[Boolean]]] = null
        it.flatMap { case (id, e, _) =>
          val v = e.toArray
          if (planes == null) planes = planeMatrix(seed, nTables, nBits, v.length)
          (0 until nTables).iterator.map { t =>
            var sig = 0
            var b = 0
            while (b < nBits) {
              val row = planes(t)(b)
              var acc = 0L
              var i = 0
              while (i < v.length) {
                acc += (if (row(i)) v(i) else -v(i))
                i += 1
              }
              if (acc >= 0) sig |= (1 << b)
              b += 1
            }
            (id, t, sig)
          }
        }
      }.toDF(idN, "t", "sig")
    }
    val pairs = sigs(corpus, "cid").join(sigs(queries, "qid"), Seq("t", "sig"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"))
      .dropDuplicates("qid", "cid")
    val qv = quantized(queries).select(col("id").as("qid"),
      col("qe"), col("n2").as("qn"))
    val cv = quantized(corpus).select(col("id").as("cid"),
      col("qe").as("ce"), col("n2").as("cn"))
    pairs.join(qv, "qid").join(cv, "cid")
      .select(col("qid"), col("cid"), col("qe"), col("qn"), col("ce"), col("cn"))
  }

  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nBits: Int = 6, nTables: Int = 10, seed: Long = 42L): DataFrame = {
    val scored = lshCandidates(queries, corpus, nBits, nTables, seed)
      .withColumn("cos", cosExpr)
    rankTopK(scored, k)
  }

  /** Shared scoring + top-k tail of both IVF variants. */
  private def scoreAndRank(corpusAssigned: DataFrame, queryProbes: DataFrame,
      k: Int): DataFrame = {
    val scored = corpusAssigned.join(broadcast(queryProbes), Seq("cent_id"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos", cosExpr)
    rankTopK(scored, k)
  }

  /** Deterministic Lloyd k-means over the int64-quantized vectors — the
    * real centroid TRAINING pass replacing the `id % stride` stand-in,
    * while keeping bit-reproducibility (the property the DuckDB oracle
    * needs): seeded init = the stride rows relabeled 0..nlist-1 in id
    * order, assignment = the SAME argmax-int64-dot (ties → lower cent_id)
    * every index probe uses, update = per-coordinate integer mean with
    * toward-zero truncation (computed via exact double division — exact
    * while |coordinate sum| < 2^52/count, which holds by construction at
    * |q| < 1e8 per coordinate up to ~10M-row clusters), empty clusters
    * keep their previous centroid. Every step is closed-form integer
    * arithmetic, so any engine replays it exactly.
    *
    * Scale shape: classic distributed k-means — each iteration is one
    * broadcast-argmax assignment pass (compiled mapPartitions, no
    * shuffle) emitting O(partitions × nlist) partial (sum, count) rows
    * that reduce to the driver's O(nlist × dim) update. Corpus never
    * shuffles; iterations are a small constant (FAISS-style train-once). */
  def trainCentroids(corpus: DataFrame, centroidStride: Int,
      iters: Int): Array[(Long, Array[Long])] = {
    require(iters >= 0, s"iters >= 0 (got $iters)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val qc = quantized(corpus)
    var cents: Array[(Long, Array[Long])] =
      collectCentroids(qc, centroidStride).zipWithIndex
        .map { case ((_, e), i) => (i.toLong, e) }
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      // partial (sum-vector, count) per centroid per partition → tiny
      // reduce; the corpus-bound work is the assignment argmax only
      val partials = assign(qc, bc, 1)
        .select(col("cent_id"), col("qe")).as[(Long, Seq[Long])]
        .mapPartitions { it =>
          val acc = scala.collection.mutable.HashMap
            .empty[Long, (Array[Long], Long)]
          it.foreach { case (cid, e) =>
            val (s, n) = acc.getOrElseUpdate(cid,
              (new Array[Long](e.length), 0L))
            var i = 0
            while (i < e.length) { s(i) += e(i); i += 1 }
            acc(cid) = (s, n + 1)
          }
          acc.iterator.map { case (cid, (s, n)) => (cid, s.toSeq, n) }
        }
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          (a._1, a._2.zip(b._2).map { case (x, y) => x + y }, a._3 + b._3)
        }
        .map(_._2)
        .collect()
        .map { case (cid, s, n) => cid -> (s.toArray, n) }
        .toMap
      cents = cents.map { case (cid, old) =>
        partials.get(cid) match {
          case Some((s, n)) =>
            cid -> s.map(x => (x.toDouble / n).toLong) // trunc toward zero
          case None => cid -> old // empty cluster: keep previous centroid
        }
      }
      bc.destroy()
    }
    cents
  }

  /** [[ivfTopK]] with TRAINED centroids ([[trainCentroids]]): the same
    * two-stage broadcast-argmax search plan over a k-means codebook
    * instead of the stride stand-in — tighter clusters, higher recall at
    * the same nprobe, still bit-reproducible end to end. */
  def ivfTopKTrained(queries: DataFrame, corpus: DataFrame, k: Int,
      centroidStride: Int, nprobe: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    val qc = quantized(corpus)
    val bc = spark.sparkContext.broadcast(
      trainCentroids(corpus, centroidStride, iters))
    val corpusAssigned = assign(qc, bc, 1)
      .select(col("id").as("cid"), col("qe").as("ce"), col("n2").as("cn"),
        col("cent_id"))
    val queryProbes = assign(quantized(queries), bc, nprobe)
      .select(col("id").as("qid"), col("qe"), col("n2").as("qn"), col("cent_id"))
    scoreAndRank(corpusAssigned, queryProbes, k)
  }

  /** [[ivfIndexInit]] with TRAINED centroids: k-means over the first
    * batch, frozen into the `centroids` sidecar — later ingests and
    * probes are untouched (they read the sidecar), completing the FAISS
    * contract: train once (now a real training), add forever. */
  def ivfIndexInitTrained(firstBatch: DataFrame, centroidStride: Int,
      iters: Int, path: String): Unit = {
    val spark = firstBatch.sparkSession
    import spark.implicits._
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(path), true)
    val cents = trainCentroids(firstBatch, centroidStride, iters)
    cents.toSeq.map { case (i, e) => (i, e.toSeq) }
      .toDF("cent_id", "ce")
      .coalesce(1).write.parquet(s"$path/centroids")
    val bc = spark.sparkContext.broadcast(cents)
    assign(quantized(firstBatch), bc, 1)
      .write.mode("append").partitionBy("cent_id").parquet(s"$path/lists")
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroidStride: Int, nprobe: Int): DataFrame = {
    val spark = corpus.sparkSession
    val qc = quantized(corpus)
    val bc = spark.sparkContext.broadcast(collectCentroids(qc, centroidStride))

    val corpusAssigned = assign(qc, bc, 1)
      .select(col("id").as("cid"), col("qe").as("ce"), col("n2").as("cn"),
        col("cent_id"))
    val queryProbes = assign(quantized(queries), bc, nprobe)
      .select(col("id").as("qid"), col("qe"), col("n2").as("qn"), col("cent_id"))

    scoreAndRank(corpusAssigned, queryProbes, k)
  }

  /** Cluster assignment alone — (id, cent_id) by argmax int64 dot against
    * the stride-derived centroid set (ties → lower cent_id), the partition
    * step SemDeDup-style semantic dedup blocks on. Same broadcast-argmax
    * shape as [[ivfTopK]]'s corpus side: no crossJoin, no shuffle. */
  def assignClusters(emb: DataFrame, centroidStride: Int): DataFrame = {
    val spark = emb.sparkSession
    val qc = quantized(emb)
    val bc = spark.sparkContext.broadcast(collectCentroids(qc, centroidStride))
    assign(qc, bc, 1).select(col("id"), col("cent_id"))
  }

  /** Materialize the IVF index: the assigned corpus written
    * `partitionBy(cent_id)` — one directory per inverted list. At 100 TB
    * this is the amortized one-time build; every probe afterwards reads
    * only its nprobe/nlist directories. */
  def ivfWriteIndex(corpus: DataFrame, centroidStride: Int, path: String): Unit = {
    val spark = corpus.sparkSession
    val qc = quantized(corpus)
    val bc = spark.sparkContext.broadcast(collectCentroids(qc, centroidStride))
    assign(qc, bc, 1)
      .write.mode("overwrite").partitionBy("cent_id").parquet(path)
  }

  /** INCREMENTAL materialized IVF index with PINNED centroids — the
    * vector-store ingest path. [[ivfTopKIndexed]] re-derives centroids
    * from the index by stride, which assumes a ONE-SHOT build: appending
    * batches would shift the derived centroid set and silently strand
    * earlier rows under assignments no probe would reach. Here the
    * centroid set is FROZEN at [[ivfIndexInit]] into a `centroids`
    * sidecar; every later [[ivfIndexIngest]] assigns against the frozen
    * set (broadcast argmax, no shuffle) and APPENDS its inverted-list
    * partitions, so ingest is order-independent and the final index
    * equals the one-shot build over the union with the same centroids —
    * which is exactly what the q260 oracle checks. At 100 TB this is the
    * standard IVF contract (FAISS trains once, adds forever; periodic
    * re-train = a new init), and a batch's cost is O(batch × nlist)
    * assignment plus an append — never a corpus rescan. */
  def ivfIndexInit(firstBatch: DataFrame, centroidStride: Int,
      path: String): Unit = {
    val spark = firstBatch.sparkSession
    import spark.implicits._
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(path), true)
    val qc = quantized(firstBatch)
    val cents = collectCentroids(qc, centroidStride)
    cents.toSeq.map { case (i, e) => (i, e.toSeq) }
      .toDF("cent_id", "ce")
      .coalesce(1).write.parquet(s"$path/centroids")
    val bc = spark.sparkContext.broadcast(cents)
    assign(qc, bc, 1)
      .write.mode("append").partitionBy("cent_id").parquet(s"$path/lists")
  }

  /** O(nlist) — the frozen centroid set, sorted (deterministic argmax). */
  private def frozenCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[(Long, Array[Long])] = {
    import spark.implicits._
    spark.read.parquet(s"$path/centroids")
      .as[(Long, Seq[Long])].collect()
      .map { case (i, e) => (i, e.toArray) }.sortBy(_._1)
  }

  /** Append one ingest batch to the index under the frozen centroids. */
  def ivfIndexIngest(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    val bc = spark.sparkContext.broadcast(frozenCentroids(spark, path))
    assign(quantized(batch), bc, 1)
      .write.mode("append").partitionBy("cent_id").parquet(s"$path/lists")
  }

  /** Probe the incremental index — [[ivfTopKIndexed]]'s plan (static IN
    * partition pruning) under the frozen centroid set. */
  def ivfTopKIncremental(queries: DataFrame, path: String, k: Int,
      nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    val bc = spark.sparkContext.broadcast(frozenCentroids(spark, path))
    val queryProbes = assign(quantized(queries), bc, nprobe)
      .select(col("id").as("qid"), col("qe"), col("n2").as("qn"), col("cent_id"))
    val probedCents = queryProbes.select("cent_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val corpusAssigned = spark.read.parquet(s"$path/lists")
      .filter(col("cent_id").isin(probedCents.map(Long.box): _*))
      .select(col("id").as("cid"), col("qe").as("ce"), col("n2").as("cn"),
        col("cent_id").cast("long").as("cent_id"))
    scoreAndRank(corpusAssigned, queryProbes, k)
  }

  /** Probe a materialized IVF index. The probed centroid set is collected
    * (≤ nlist ids — bounded by the centroid count, not the data) and pushed
    * as a static IN filter, so the scan is partition-pruned to the probed
    * inverted lists (PartitionFilters asserted in PlanShapeSpec). Candidate
    * results are identical to [[ivfTopK]] — same assignment, same quantized
    * scoring. */
  def ivfTopKIndexed(queries: DataFrame, indexPath: String, k: Int,
      centroidStride: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    val index = spark.read.parquet(indexPath)
    // centroids re-derived from the index itself (id % stride == 0 rows);
    // the index is self-contained, no side-channel centroid file
    val bc = spark.sparkContext.broadcast(
      collectCentroids(index.select("id", "qe", "n2"), centroidStride))
    val queryProbes = assign(quantized(queries), bc, nprobe)
      .select(col("id").as("qid"), col("qe"), col("n2").as("qn"), col("cent_id"))
    val probedCents = queryProbes.select("cent_id").distinct()
      .collect().map(_.getLong(0)).sorted
    // filter on the raw partition column (prunes), then normalize its
    // read-back-inferred type to long for the probe join key
    val corpusAssigned = index
      .filter(col("cent_id").isin(probedCents.map(Long.box): _*))
      .select(col("id").as("cid"), col("qe").as("ce"), col("n2").as("cn"),
        col("cent_id").cast("long").as("cent_id"))
    scoreAndRank(corpusAssigned, queryProbes, k)
  }

  /** (id, blk, qe, n2): block key + quantized embedding + squared norm, one
    * compiled map pass. */
  private def quantizedBlocked(emb: DataFrame, blockCol: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("id"), col(blockCol).cast("string").as("blk"),
        col("embedding"))
      .as[(Long, String, Seq[Float])]
      .mapPartitions(_.map { case (id, blk, e) =>
        val q = quantizeRow(e)
        var n2 = 0L
        var i = 0
        while (i < q.length) { n2 += q(i) * q(i); i += 1 }
        (id, blk, q, n2)
      })
      .toDF("id", "blk", "qe", "n2")
  }

  /** Embedding-level near-duplicate pairs within a blocking key: cosine >=
    * `threshold` (quantized math — oracle-exact, full recall at ANY
    * threshold).
    *
    * Scale shape — triangle tiling: a plain self-equi-join on `blk` puts each
    * block's n²/2 candidate work in ONE shuffle partition (a 10-value block
    * key ⇒ ≤10 tasks do everything). Instead each row lands in a group
    * g = hash(id) mod `tiles` and the block's pair space is covered by the
    * tiles*(tiles+1)/2 group pairs (g,h), g<=h: side a replicates a row with
    * group g to keys (g, g..tiles-1), side b to keys (0..h, h). Every
    * unordered pair meets in exactly one tile (its (min,max) group pair —
    * diagonal tiles keep a.id < b.id), so the join is an equi-join on
    * (blk, g, h) whose work spreads over blocks × tiles² tasks with ~tiles/2×
    * shuffle replication. The n² candidate arithmetic itself is inherent to
    * an EXACT threshold join at an unselective threshold (q50's 0.4 sits in
    * a near-orthogonal background — see the ρ analysis on
    * [[cosineNearDupPairsLsh]]); what tiling fixes is the single-task wall
    * clock, which is the actual 100 TB failure mode.
    */
  def cosineNearDupPairs(emb: DataFrame, blockCol: String,
      threshold: Double, tiles: Int = 8): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1 (got $tiles)")
    val v = quantizedBlocked(emb, blockCol)
    val a = v.withColumn("g", pmod(hash(col("id")), lit(tiles)))
      .withColumn("h", explode(sequence(col("g"), lit(tiles - 1))))
    val b = v.withColumn("h", pmod(hash(col("id")), lit(tiles)))
      .withColumn("g", explode(sequence(lit(0), col("h"))))
    a.as("a").join(b.as("b"),
        col("a.blk") === col("b.blk") &&
          col("a.g") === col("b.g") && col("a.h") === col("b.h") &&
          // off-diagonal tiles see each pair once (roles fixed by group
          // order); diagonal tiles dedupe by id order
          (col("a.g") =!= col("a.h") || col("a.id") < col("b.id")) &&
          col("a.id") =!= col("b.id"))
      .withColumn("cos", dotI64(col("a.qe"), col("b.qe")).cast("double") /
        sqrt(col("a.n2").cast("double") * col("b.n2").cast("double")))
      .filter(col("cos") >= threshold)
      .select(least(col("a.id"), col("b.id")).as("d1"),
        greatest(col("a.id"), col("b.id")).as("d2"),
        round(col("cos"), 6).as("cos"))
  }

  /** LSH-bucketed near-duplicate pairs within a blocking key — the
    * sub-quadratic scale path for SELECTIVE thresholds. Candidates come from
    * a random-hyperplane bucket self-equi-join on (blk, table, signature)
    * (the [[lshTopK]] scheme), deduped on the pair key, then EXACT-rescored
    * with the quantized int64 dot at `threshold` — so any pair that collides
    * anywhere is scored exactly and the output is a subset of the all-pairs
    * answer with per-pair recall 1 − (1 − p^nBits)^nTables, p = 1 − θ/π.
    *
    * Regime math (why q50's exact form stays all-pairs): candidate volume is
    * ~ nTables·2^-nBits × |pairs| for a near-orthogonal background (p ≈ 0.5),
    * while recall at the threshold needs nTables·p₁^nBits ≳ ln(1/δ). At
    * τ = 0.4, p₁ = 1 − arccos(0.4)/π ≈ 0.631 = 2^-0.664 (ρ ≈ 0.66), so any
    * (nBits, nTables) with usable recall yields MORE candidates than
    * all-pairs — consistent with the Orthogonal-Vectors conjecture (exact
    * threshold join against an orthogonal background is n^{2−o(1)}). At a
    * real near-dup threshold the same operator prunes hard: τ = 0.95 →
    * p₁ ≈ 0.899, and the defaults (nBits=12, nTables=32) give per-pair miss
    * ≤ (1 − 0.899¹²)³² ≈ 3e-5 at the boundary (≈1e-26 at cos 0.999) with
    * candidate volume ≈ 32/4096 ≈ 0.8% of all-pairs.
    */
  def cosineNearDupPairsLsh(emb: DataFrame, blockCol: String,
      threshold: Double, nBits: Int = 12, nTables: Int = 32,
      seed: Long = 42L): DataFrame = {
    require(nBits >= 1 && nBits <= 31 && nTables >= 1,
      s"need 1 <= nBits <= 31 and nTables >= 1 (got $nBits, $nTables)")
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = quantizedBlocked(emb, blockCol)
    // bucket rows carry ONLY (id, blk, t, sig) — never the vector. Carrying
    // the 1 KB quantized embedding through the bucket self-join multiplies
    // every skewed bucket's join output by vector width; with a crawl-like
    // duplication factor d, copy-pairs collide in ALL nTables tables, making
    // the pre-dedup output ~nTables·C(d,2) WIDE rows per duplicated vector —
    // measured OOM at ×64 replication. Narrow pairs + a post-dedup id join
    // (the q41 MinHash shape) keep the exploded intermediate at ~24 B/row.
    val sigs = vecs
      .as[(Long, String, Seq[Long], Long)]
      .mapPartitions { it =>
        var planes: Array[Array[Array[Boolean]]] = null
        it.flatMap { case (id, blk, e, n2) =>
          val v = e.toArray
          if (planes == null) planes = planeMatrix(seed, nTables, nBits, v.length)
          (0 until nTables).iterator.map { t =>
            var sig = 0
            var b = 0
            while (b < nBits) {
              val row = planes(t)(b)
              var acc = 0L
              var i = 0
              while (i < v.length) {
                acc += (if (row(i)) v(i) else -v(i))
                i += 1
              }
              if (acc >= 0) sig |= (1 << b)
              b += 1
            }
            (id, blk, t, sig)
          }
        }
      }
      .toDF("id", "blk", "t", "sig")
    val pairs = sigs.as("a").join(sigs.as("b"),
        col("a.blk") === col("b.blk") && col("a.t") === col("b.t") &&
          col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"))
      .dropDuplicates("d1", "d2")
    // exact rescore: re-attach the quantized vectors by id (two equi-joins
    // against the narrow deduped pair set), then the int64 dot at threshold
    pairs
      .join(vecs.select(col("id").as("d1"), col("qe").as("qa"),
        col("n2").as("na")), Seq("d1"))
      .join(vecs.select(col("id").as("d2"), col("qe").as("qb"),
        col("n2").as("nb")), Seq("d2"))
      .withColumn("cos", dotI64(col("qa"), col("qb")).cast("double") /
        sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("cos") >= threshold)
      .select(col("d1"), col("d2"), round(col("cos"), 6).as("cos"))
  }
}
