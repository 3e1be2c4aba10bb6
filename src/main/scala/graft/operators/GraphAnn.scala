package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-probed ANN: a deterministic k-NN neighborhood graph walked by
  * fixed-schedule beam search — the exactly-replayable core of the
  * HNSW/NSW/DiskANN family (Malkov & Yashunin, TPAMI 2020; Subramanya et
  * al., NeurIPS 2019). True HNSW assigns layers by random draw, which no
  * two engines reproduce; what survives determinization is the part that
  * does the work at query time: a navigable neighbor graph + greedy beam
  * expansion. Both are closed-form here, so the DuckDB oracle replays
  * build AND walk bit-exactly (the q274/q355 trained-structure
  * discipline):
  *
  *   - build: node v's out-neighbors = its top-`m` corpus rows by the
  *     exact int64-quantized cosine, ties → lower id ([[AnnSearch]]'s
  *     total order). One bounded-heap pass ([[AnnSearch.bruteTopK]]
  *     machinery) — at production scale this is the classic blocked
  *     knn-join build, paid once at ingest like every index here.
  *   - walk: entry beam = the `ef` lowest-id nodes (deterministic spread,
  *     no random seeds); each of `hops` rounds expands the current beam's
  *     out-edges, unions the beam (a visited node can stay), scores every
  *     candidate with the EXACT cosine, and keeps the top-`ef` per query
  *     ((cos desc, cid) order). After the fixed schedule, the final beam's
  *     top-`k` is the answer. The graph decides WHO gets scored — the
  *     reported score is always exact, the approximation is ONLY candidate
  *     pruning (the [[IvfPq]] contract; with `ef >= |corpus|` and one hop
  *     the walk degenerates to brute force, spec-asserted).
  *
  * Scale shape: the per-hop frontier is |queries| × ef rows and each hop
  * touches ≤ |queries| × ef × (m+1) candidates — the walk's cost is
  * schedule-bounded, INDEPENDENT of corpus size (that is the entire point
  * of graph ANN: at 100 TB a probe reads `hops × ef × m` adjacency rows,
  * not nprobe/nlist of the corpus). The beam is collected per hop (the
  * bounded-collect contract: |queries| × ef ids, like [[IvfPq]]'s
  * shortlist) so the candidate fetch pushes an id set into the scans and
  * the loop never builds an H-deep lazy plan. The adjacency frame is an
  * equi-join on src — partitioned by node id at rest in production.
  *
  * The reference engine has no ANN surface — this completes the index
  * family (flat / IVF / PQ / IVF-PQ / SQ8 / graph) of the training-data
  * pipeline pack (SURVEY.md §7 step 9).
  */
object GraphAnn {

  /** Persist `df` unless its plan already resolves to a cache entry, and
    * report whether WE own the persist. The walks' loop-invariant frames
    * are persisted on entry and unpersisted in a finally — but when the
    * caller passes an already-cached graph, the (src, dst) projection is
    * a no-op that ALIASES the caller's cache entry (CacheManager matches
    * by sameResult), and the finally would EVICT the caller's cache: a
    * probe over a persisted index silently un-persisted it, and the next
    * consumer recomputed the whole build lineage (GraphScale measured a
    * 3 s delete ballooning to 120 s at the ×64 corpus this way). */
  private def persistUnlessCached(
      df: DataFrame): (DataFrame, Boolean) =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      (df.persist(), true)
    else (df, false)

  /** Directed k-NN graph: (src, dst), dst = src's top-`m` by exact
    * quantized cosine, self excluded — deterministic, so build order
    * cannot change any walk. Exact all-pairs: the gold-standard graph,
    * O(N²) — fine for a sample, not the 100 TB build path (that is
    * [[blockedKnnGraph]]). */
  def knnGraph(corpus: DataFrame, m: Int): DataFrame =
    AnnSearch.bruteTopK(corpus, corpus, m)
      .select(col("qid").as("src"), col("cid").as("dst"))

  /** The SCALABLE graph build — cluster-blocked approximate k-NN, the
    * DiskANN/NN-descent-style answer to the build being the expensive
    * part of graph ANN: assign every row to its top-`keep` coarse
    * centroids (stride centroids, the [[AnnSearch.ivfTopK]] contract —
    * broadcast argmax, no shuffle), self-join WITHIN shared clusters
    * only, and keep each node's top-`m` by exact cosine. Pair work drops
    * from N² to ~N²·keep²/nlist; `keep` ≥ 2 overlaps the blocks so
    * boundary nodes still edge into their true neighborhood and the walk
    * graph stays navigable (keep = 1 would shatter the graph at cluster
    * borders). Deterministic end-to-end (stride centroids, argmax ties →
    * lower cent_id, (cos desc, dst) edge rank), so the DuckDB oracle
    * replays the whole build.
    *
    * Shuffle shape: ONE equi-join on cent_id (both sides N·keep rows),
    * scored rows reduce through [[AnnSearch.partitionTopK]] bounded heaps
    * before the per-src rank — the per-node candidate set (≈ keep ×
    * cluster size) never materializes past the heaps. */
  def blockedKnnGraph(corpus: DataFrame, m: Int, centroidStride: Int,
      keep: Int = 2): DataFrame = {
    require(keep >= 1, s"keep >= 1 (got $keep)")
    val spark = corpus.sparkSession
    val cc = AnnSearch.quantized(corpus)
    val bc = spark.sparkContext.broadcast(
      AnnSearch.collectCentroids(cc, centroidStride))
    val a = AnnSearch.assign(cc, bc, keep)
    val x = a.select(col("id").as("qid"), col("qe"),
      col("n2").as("qn"), col("cent_id"))
    val y = a.select(col("id").as("cid"), col("qe").as("ce"),
      col("n2").as("cn"), col("cent_id"))
    val scored = x.join(y, Seq("cent_id"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cos", coalesce(
        AnnSearch.dotI64(col("qe"), col("ce")).cast("double") /
          sqrt(col("qn").cast("double") * col("cn").cast("double")),
        lit(-1.0)))
      // a pair sharing BOTH overlapped clusters scores twice with the same
      // cos — collapse before ranking
      .groupBy("qid", "cid").agg(max("cos").as("cos"))
    // rows out of the pre-rank groupBy are already (qid, cid)-unique, so
    // partitionTopK's survivors feed the window directly — re-aggregating
    // them would be a no-op costing one more corpus-wide exchange
    AnnSearch.partitionTopK(scored, m)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cos").desc, col("cid"))))
      .filter(col("rn") <= m)
      .select(col("qid").as("src"), col("cid").as("dst"))
  }

  /** Bounded id-set fetch hook: `(frame, idColumn, ids) => matching rows`.
    * The default is the InSet/broadcast-join discipline below; the at-rest
    * index path ([[probeIndex]]) substitutes a fetch that additionally
    * prunes the store's `bucket` partitions, resolves edge generations,
    * and masks tombstoned nodes — the WALK algebra never changes, only
    * where its bytes come from (the [[BinaryAnn.probeIndex]] contract). */
  private[operators] type IdFetch = (DataFrame, String, Array[Long]) => DataFrame

  /** InSet pushdown below the 65536 cap, join fallback above (the
    * [[IvfPq]] shortlist-fetch discipline). */
  private[operators] val defaultFetch: IdFetch = (df, idCol, ids) => {
    if (ids.length <= 65536) df.filter(col(idCol).isin(ids.toSeq: _*))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      df.join(broadcast(ids.toSeq.toDF(idCol)), idCol)
    }
  }

  /** `corpus` in the pre-quantized at-rest shape (id, qe, n2[, bucket])
    * instead of raw (id, embedding)? Decides both whether to run the
    * quantize pass and whether to persist: a parquet-backed store must NOT
    * be persisted — an InMemoryRelation under the per-hop id fetches would
    * materialize the WHOLE store on first use, defeating the partition
    * pruning that is the index's entire point. */
  private def preQuantized(df: DataFrame): Boolean =
    df.columns.contains("qe") && df.columns.contains("n2")

  private def quantizedView(df: DataFrame): DataFrame =
    if (preQuantized(df)) {
      val keep = Seq("id", "qe", "n2") ++
        (if (df.columns.contains("bucket")) Seq("bucket") else Nil)
      df.select(keep.map(col): _*)
    } else AnnSearch.quantized(df)

  /** Beam-search top-k over `graph`. `queries`: (id, embedding);
    * `corpus`: (id, embedding), or the pre-quantized (id, qe, n2[,
    * bucket]) at-rest shape; `graph`: (src, dst) as built by [[knnGraph]]
    * (extra columns — gen, bucket — are the at-rest layout, resolved by
    * `fetchFn`). `ef >= k` required. `entryIds` overrides the default
    * corpus-lowest-ef entry set (shared by every query) — [[insertBatch]]
    * passes the pre-batch graph's sources so walks start on navigable
    * ground. `entrySeeds` goes further: a PER-QUERY seed map (the
    * [[hnswTopK]] layer-descent shape, driver-paced) — each query's walk
    * starts from its own upper-layer winners. */
  def beamTopK(queries: DataFrame, corpus: DataFrame, graph: DataFrame,
      k: Int, ef: Int, hops: Int,
      entryIds: Option[Array[Long]] = None,
      entrySeeds: Option[Map[Long, Array[Long]]] = None,
      fetchFn: IdFetch = defaultFetch): DataFrame = {
    require(ef >= k, s"beam width ef=$ef must cover k=$k")
    val beam = beamWalkArr(queries, corpus, graph, ef, hops, entryIds,
      entrySeeds, fetchFn)
    // final answer: the beam's top-k per query, already exactly scored —
    // re-rank through the shared total order for the usual (rk, 6-dp) shape
    val spark = corpus.sparkSession
    import spark.implicits._
    AnnSearch.rankTopK(beam.toSeq.toDF("qid", "cid", "cos"), k)
  }

  /** The driver-paced walk itself, returning the final beam as an ARRAY
    * (top-ef per query under (cos desc, cid)) — the composable piece the
    * at-rest lifecycle consumes directly: [[addBatch]]/[[probeIndex]]
    * chain walks and derive edge sets driver-side from beams that are
    * driver state anyway, instead of paying a DataFrame round-trip
    * (toDF + rank window + collect) per walk. [[beamTopK]] is the public
    * ranked-DataFrame wrapper. */
  private def beamWalkArr(queries: DataFrame, corpus: DataFrame,
      graph: DataFrame, ef: Int, hops: Int,
      entryIds: Option[Array[Long]],
      entrySeeds: Option[Map[Long, Array[Long]]],
      fetchFn: IdFetch): Array[(Long, Long, Double)] = {
    require(hops >= 1, s"at least one hop (got $hops)")
    require(entryIds.isEmpty || entrySeeds.isEmpty,
      "pass entryIds (global) or entrySeeds (per-query), not both")
    // an empty override would seed every walk with zero candidates and
    // return an empty result with no error (insertBatch on an empty graph
    // would silently insert NOTHING); a larger-than-ef set would widen
    // the first beam past the documented bound
    entryIds.foreach(e => require(e.nonEmpty && e.length <= ef,
      s"entryIds must be 1..$ef ids (got ${e.length} — empty means the " +
        "graph has no sources; build before inserting)"))
    val spark = corpus.sparkSession
    import spark.implicits._
    // PERSIST both loop-invariant frames: every hop re-reads them, and a
    // lazily-passed graph (e.g. [[knnGraph]]'s O(N²) build) would otherwise
    // be RECOMPUTED once per hop — measured 13 s → 3.5 s on the q361 bench
    // body. Unpersisted in the finally below ONLY if we created the cache
    // entry ([[persistUnlessCached]]); the returned frame is built from
    // the collected beam, so it survives the unpersist. At-rest frames
    // (pre-quantized store / gen-carrying adjacency) are NOT persisted —
    // see [[preQuantized]].
    val (cc, ownCc) =
      if (preQuantized(corpus)) (quantizedView(corpus), false)
      else persistUnlessCached(AnnSearch.quantized(corpus))
    val (g, ownG) =
      if (graph.columns.contains("gen")) (graph, false)
      else persistUnlessCached(graph.select(col("src"), col("dst")))
    try {
      // probe batch: broadcast-bounded (the bruteTopK broadcast(q) contract)
      val qArr = AnnSearch.quantized(queries)
        .select(col("id"), col("qe"), col("n2")).as[(Long, Seq[Long], Long)]
        .collect().map { case (id, e, n2) => (id, e.toArray, n2) }
      val qids = qArr.map(_._1)
      entrySeeds.foreach { m =>
        qids.foreach { q =>
          val s = m.getOrElse(q, Array.emptyLongArray)
          require(s.nonEmpty && s.length <= ef,
            s"entrySeeds for query $q must be 1..$ef ids (got ${s.length})")
        }
      }

      // entry set: the ef lowest node ids — deterministic, replayable —
      // unless the caller supplied its own (bounded-by-ef) entry set
      lazy val entry = entryIds.getOrElse(
        cc.select(col("id")).orderBy("id").limit(ef).as[Long].collect())
        .sorted

      def fetch(df: DataFrame, idCol: String, ids: Array[Long]): DataFrame =
        fetchFn(df, idCol, ids)

      /** Exact (cos desc, cid) top-`ef` per query over per-query candidate
        * id sets: ONE distributed pass — candidate vectors are fetched by
        * id-set pushdown and scored on executors; the scored pairs
        * (≤ |queries| × ef × (m+1) rows, schedule-bounded like the beam
        * itself) are collected and the per-query top-ef re-select runs on
        * the driver — a window would add one exchange + stage per ROUND
        * for a rank over rows the driver-paced walk collects anyway
        * (measured ~35% of the q380 lifecycle wall across its 18 rounds).
        * The broadcast is INVERTED to cid → interested query
        * indexes, so per-row work is O(that row's candidate pairs), not
        * O(|queries|): the straight per-row scan over all queries cost
        * |rows|×|Q| membership probes and dominated large-batch walks —
        * GraphScale measured an 85 s ×64-corpus insert (2000-node batch,
        * ~576 M probes per hop) that the inversion removes. */
      def selectBeam(cands: Map[Long, Array[Long]]): Array[(Long, Long, Double)] = {
        val byCid: Map[Long, Array[Int]] = {
          val qIdx = qids.zipWithIndex.toMap
          val b = scala.collection.mutable.HashMap
            .empty[Long, scala.collection.mutable.ArrayBuilder.ofInt]
          cands.foreach { case (qid, ids) =>
            val qi = qIdx(qid)
            ids.foreach { cid =>
              if (cid != qid)
                b.getOrElseUpdate(cid,
                  new scala.collection.mutable.ArrayBuilder.ofInt) += qi
            }
          }
          b.iterator.map { case (cid, ab) => cid -> ab.result() }.toMap
        }
        val candIds = byCid.keysIterator.toArray
        val bc = spark.sparkContext.broadcast(byCid)
        try {
          val scored = fetch(cc, "id", candIds)
            .select(col("id"), col("qe"), col("n2")).as[(Long, Seq[Long], Long)]
            .mapPartitions { it =>
              val qs = qArr // serialized with the closure: bounded probe batch
              val cm = bc.value
              it.flatMap { case (cid, e, cn2) =>
                val cv = e.toArray
                cm.getOrElse(cid, Array.emptyIntArray).iterator.map { qi =>
                  val (qid, qv, qn2) = qs(qi)
                  // the DotI64 contract: silent min-length truncation would
                  // turn a malformed embedding into a plausible-but-wrong
                  // score (and diverge from beamTopKBatch, which raises)
                  if (qv.length != cv.length)
                    throw new IllegalArgumentException(
                      s"beam walk: dimension mismatch (${qv.length} vs ${cv.length})")
                  var acc = 0L; var i = 0
                  val n = qv.length
                  while (i < n) { acc += qv(i) * cv(i); i += 1 }
                  val denom = math.sqrt(qn2.toDouble * cn2.toDouble)
                  (qid, cid,
                    if (denom == 0.0d) -1.0d else acc.toDouble / denom)
                }
              }
            }.collect()
          // per-query top-ef under the shared (cos desc, cid) total order,
          // driver-side over the schedule-bounded scored set
          scored.groupBy(_._1).iterator.flatMap { case (_, rows) =>
            rows.sortBy { case (_, cid, cos) => (-cos, cid) }.take(ef)
          }.toArray
        } finally bc.destroy()
      }

      var beam = selectBeam(entrySeeds match {
        case Some(m) => qids.map(q => q -> m(q).distinct.sorted).toMap
        case None => qids.map(_ -> entry).toMap
      })
      var hop = 0
      while (hop < hops) {
        // expand: out-edges of every beam node, one id-set-pruned scan of the
        // adjacency frame (≤ |queries|·ef src ids per hop); beam nodes stay
        // candidates, so the walk never loses ground. A gen-carrying fetch
        // (the at-rest layout) resolves max-gen-per-src DRIVER-SIDE over
        // the collected bounded rows — a distributed window here costs one
        // exchange per round for rows the walk collects anyway
        val beamIds = beam.map(_._2).distinct
        val fr = fetch(g, "src", beamIds)
        val edges: Array[(Long, Long)] =
          if (fr.columns.contains("gen")) {
            // max-gen per src over the UNMASKED rows, THEN drop tombstone-
            // flagged destinations (the [[indexFetch]] ordering contract)
            val raw = (if (fr.columns.contains("tomb"))
                fr.select(col("src"), col("dst"), col("gen"), col("tomb"))
              else fr.select(col("src"), col("dst"), col("gen"),
                lit(false).as("tomb")))
              .as[(Long, Long, Long, Boolean)].collect()
            val mx = raw.groupBy(_._1)
              .map { case (s0, rows) => s0 -> rows.iterator.map(_._3).max }
            raw.collect { case (s0, d0, gn, tb) if gn == mx(s0) && !tb =>
              (s0, d0) }
          } else fr.select(col("src"), col("dst")).as[(Long, Long)].collect()
        val bySrc = edges.groupBy(_._1)
        // group the beam ONCE (O(|Q|·ef)) — a per-query filter scan over
        // the whole beam array is O(|Q|²·ef) driver work per hop, the same
        // quadratic class the selectBeam inversion above removed
        val byQid = beam.groupBy(_._1)
        val cands: Map[Long, Array[Long]] = qArr.map { case (qid, _, _) =>
          val cur = byQid.getOrElse(qid, Array.empty[(Long, Long, Double)])
            .map(_._2)
          qid -> (cur ++ cur.flatMap(c =>
            bySrc.getOrElse(c, Array.empty[(Long, Long)]).map(_._2)))
            .distinct.sorted
        }.toMap
        beam = selectBeam(cands)
        hop += 1
      }

      beam
    } finally {
      if (ownG) g.unpersist(blocking = false)
      if (ownCc) cc.unpersist(blocking = false)
    }
  }

  /** The DISTRIBUTED beam walk — [[beamTopK]] semantics with the beam kept
    * as a DataFrame end-to-end, for query batches too large to pace from
    * the driver. [[beamTopK]]'s state is |Q|×ef driver rows plus a
    * broadcast candidate map per hop — the right shape for a probe batch
    * (tens to thousands of queries), the wrong one for a 100 TB join-like
    * workload probing millions of rows. Here each hop is declarative:
    * expand = beam ⋈ graph on (cid = src), score = two id equi-joins (the
    * [[trimEdges]] fetch shape) through the shared int64-exact cosine,
    * re-select = one windowed top-ef per qid. Catalyst plans all hops as
    * one job; nothing but the final top-k is ever collected.
    *
    * Bit-identical to [[beamTopK]] by construction (same entry set, same
    * candidate algebra, same (cos desc, cid) total order) — spec-asserted
    * row-for-row, and q365 checks it against the SAME oracle replay as
    * q361. Cost per hop: ≤ |Q|·ef·(m+1) scored rows — schedule-bounded
    * per query, linear in |Q|, independent of corpus size. */
  def beamTopKBatch(queries: DataFrame, corpus: DataFrame, graph: DataFrame,
      k: Int, ef: Int, hops: Int): DataFrame = {
    require(ef >= k, s"beam width ef=$ef must cover k=$k")
    val (cc, ownCc) = persistUnlessCached(AnnSearch.quantized(corpus)
      .select(col("id").as("cid"), col("qe").as("ce"), col("n2").as("cn")))
    val (qq, ownQq) = persistUnlessCached(AnnSearch.quantized(queries)
      .select(col("id").as("qid"), col("qe").as("qv"), col("n2").as("qn")))
    val (g, ownG) =
      persistUnlessCached(graph.select(col("src"), col("dst")))
    try {
      // entry set: the ef lowest node ids, shared by every query (the
      // beamTopK/oracle rule) — ef rows, broadcast into the |Q|·ef seed
      val entry = broadcast(cc.select(col("cid")).orderBy("cid").limit(ef))
      val beam = walkSeeded(qq, cc, g,
        qq.select(col("qid")).crossJoin(entry), ef, hops)
      // the final top-k is |Q|·k rows — checkpoint it (eager, bounded) so
      // every intermediate cache can be released before returning
      val out = AnnSearch.rankTopK(beam, k).localCheckpoint(true)
      beam.unpersist(blocking = false)
      out
    } finally {
      if (ownG) g.unpersist(blocking = false)
      if (ownCc) cc.unpersist(blocking = false)
      if (ownQq) qq.unpersist(blocking = false)
    }
  }

  /** The distributed walk's core: beam-search `g` from a per-query seed
    * frame `(qid, cid)`. Returns the final beam (qid, cid, cos), LEFT
    * PERSISTED — the caller unpersists once consumed. `qq`/`cc` are the
    * quantized query/corpus frames in (qid, qv, qn)/(cid, ce, cn) shape,
    * already persisted by the caller.
    *
    * Each hop's plan references the previous beam TWICE (carry-over ∪
    * expansion), so a lazy chain would duplicate the whole prefix 2^hops
    * times and recompute the graph build per copy (measured 45 s on the
    * sf0.01 fixture, 3 s with the cut). persist() substitutes an
    * InMemoryRelation, cutting the logical lineage; the per-hop count()
    * materializes it so the predecessor can be dropped eagerly. */
  private def walkSeeded(qq: DataFrame, cc: DataFrame, g: DataFrame,
      seed: DataFrame, ef: Int, hops: Int): DataFrame = {
    require(hops >= 1, s"at least one hop (got $hops)")

    /** Exact (cos desc, cid) top-ef per qid over a (qid, cid) candidate
      * frame — the [[beamTopK]] selectBeam contract as one declarative
      * stage; scoring excludes qid = cid exactly as its guard does. */
    def selectBeam(cands: DataFrame): DataFrame =
      cands.join(cc, "cid").join(qq, "qid")
        .filter(col("qid") =!= col("cid"))
        .withColumn("cos", coalesce(
          AnnSearch.dotI64(col("qv"), col("ce")).cast("double") /
            sqrt(col("qn").cast("double") * col("cn").cast("double")),
          lit(-1.0)))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("cos").desc, col("cid"))))
        .filter(col("rn") <= ef)
        .select("qid", "cid", "cos")

    var beam = selectBeam(seed).persist()
    beam.count()
    for (_ <- 1 to hops) {
      val expanded = beam.select(col("qid"), col("cid").as("src"))
        .join(g, "src").select(col("qid"), col("dst").as("cid"))
      // beam nodes stay candidates — the walk never loses ground
      val cands = beam.select("qid", "cid").unionByName(expanded).distinct()
      val next = selectBeam(cands).persist()
      next.count()
      beam.unpersist(blocking = false)
      beam = next
    }
    beam
  }

  /** Nodes on HNSW level ≥ `l`: keyed md5 draw ≡ 0 (mod 8^l) — the
    * deterministic, engine-replayable stand-in for HNSW's geometric level
    * draw (p = 1/8 per level, the q172 keyed-md5 discipline via
    * [[GroupSample.drawHash]]). A pure function of the id: every engine
    * and every run derives the same layer split. */
  def levelNodes(corpus: DataFrame, l: Int): DataFrame = {
    require(l >= 1 && l <= 19, s"level out of the 60-bit draw's range: $l")
    var mod = 1L; var i = 0
    while (i < l) { mod *= 8L; i += 1 }
    corpus.filter(
      GroupSample.drawHash("lvl1", col(corpus.columns.head)) % mod === 0)
  }

  /** [[beamTopKBatch]] with a caller-supplied per-query seed frame
    * `(qid, cid)` instead of the global lowest-ef entry set — the
    * composable piece behind [[hnswTopK]]'s layer descent (each layer's
    * ranked beam seeds the next layer's walk). Returns the ranked
    * (qid, cid, rk, cos) top-k; pass k = ef to get the whole final beam
    * for chaining. */
  def beamTopKSeeded(queries: DataFrame, corpus: DataFrame,
      graph: DataFrame, seed: DataFrame, k: Int, ef: Int,
      hops: Int): DataFrame = {
    require(ef >= k, s"beam width ef=$ef must cover k=$k")
    val (cc, ownCc) = persistUnlessCached(AnnSearch.quantized(corpus)
      .select(col("id").as("cid"), col("qe").as("ce"), col("n2").as("cn")))
    val (qq, ownQq) = persistUnlessCached(AnnSearch.quantized(queries)
      .select(col("id").as("qid"), col("qe").as("qv"), col("n2").as("qn")))
    val (g, ownG) =
      persistUnlessCached(graph.select(col("src"), col("dst")))
    try {
      val beam = walkSeeded(qq, cc, g, seed.select("qid", "cid"), ef, hops)
      val out = AnnSearch.rankTopK(beam, k).localCheckpoint(true)
      beam.unpersist(blocking = false)
      out
    } finally {
      if (ownG) g.unpersist(blocking = false)
      if (ownCc) cc.unpersist(blocking = false)
      if (ownQq) qq.unpersist(blocking = false)
    }
  }

  /** TWO-LAYER HNSW — the actual hierarchy, completing the q361–q365
    * family (which is flat NSW: one graph, one fixed global entry set).
    * HNSW's insight is that the entry point should already be NEAR the
    * query before the expensive bottom-layer walk starts: a sparse upper
    * layer ([[levelNodes]], every 8th node by keyed draw) is walked first
    * with a narrow beam, and each query's upper-layer winners seed its
    * bottom-layer walk. The bottom walk then needs HALF the hops of the
    * flat q361 schedule for comparable recall (spec-measured), because it
    * starts in the right neighborhood instead of at a fixed corner of the
    * id space. A flat walk's length grows with the graph's RADIUS
    * (~N^(1/d) — GraphScale measured recall collapsing 0.37 → 0.05 at
    * ×16 corpus under the fixed schedule); the hierarchy is what caps it
    * at ~log N total hops, every one schedule-bounded (≤ |Q|·ef·(m+1)
    * scored rows — both walks run distributed through [[walkSeeded]]).
    * For corpora past ~8·ef1·m1 upper nodes, stack more layers by
    * chaining [[levelNodes]]/[[beamTopKSeeded]] descents (GraphScale's
    * multi-layer composition).
    *
    * Fully deterministic: level draw, both [[knnGraph]] builds, and the
    * shared (cos desc, cid) walk order — the q366 oracle replays level
    * split → both builds → chained seeded walks bit-exactly. */
  def hnswTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, m1: Int = 4, ef1: Int = 4, hops1: Int = 2,
      ef: Int = 16, hops: Int = 2,
      g1Opt: Option[DataFrame] = None,
      g0Opt: Option[DataFrame] = None): DataFrame = {
    val lvl1 = levelNodes(corpus, 1)
    // upper-layer entry: the ef1 lowest LAYER-1 ids (global, tiny) — a
    // narrow id scan; quantizing the layer just to read ids would run the
    // per-element BigDecimal pass over every upper-layer embedding
    val ent1 = broadcast(
      lvl1.select(col(lvl1.columns.head).as("cid"))
        .orderBy("cid").limit(ef1))
    val qid = queries.select(col(queries.columns.head).as("qid"))
    // callers holding prebuilt (or fixture-cached) layer graphs pass them
    // in — the per-call rebuild is the one-shot convenience, not the
    // contract (the at-rest form is [[writeIndex]]/[[probeIndex]])
    val b1 = beamTopKSeeded(queries, corpus,
      g1Opt.getOrElse(knnGraph(lvl1, m1)),
      qid.crossJoin(ent1), ef1, ef1, hops1)
    beamTopKSeeded(queries, corpus, g0Opt.getOrElse(knnGraph(corpus, m)),
      b1.select("qid", "cid"), k, ef, hops)
  }

  /** Build + walk in one call (the one-shot index shape). */
  def graphTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, ef: Int = 16, hops: Int = 4): DataFrame =
    beamTopK(queries, corpus, knnGraph(corpus, m), k, ef, hops)

  /** Exact-cosine re-rank of an edge multiset: keep each src's top-`m` by
    * (cos desc, dst) — the uniform trim rule shared by build and insert.
    * Two id equi-joins fetch the endpoint vectors; edge count is linear
    * (N·m + inserts), never pairwise. */
  private def trimEdges(edges: DataFrame, corpus: DataFrame,
      m: Int): DataFrame = {
    val cc = quantizedView(corpus)
    // the edge set is bounded by contract (touched sources × m) — the
    // FIRST join broadcasts it (ids only) so the src-vector fetch streams
    // the store. The SECOND join is deliberately UNHINTED: its bounded
    // side carries a vector per edge (|edges|×dim), which a forced
    // broadcast would push past Spark's 8 GB cap on a large batch — AQE
    // still broadcasts it at fixture/batch sizes (runtime-sized decision,
    // same plan in practice) and degrades to a shuffle instead of an
    // OOM/cap failure where it is genuinely huge.
    val withSrc = cc.select(col("id").as("src"), col("qe").as("se"),
        col("n2").as("sn"))
      .join(broadcast(edges.select("src", "dst").distinct()), "src")
    cc.select(col("id").as("dst"), col("qe").as("de"),
        col("n2").as("dn"))
      .join(withSrc, "dst")
      .withColumn("cos", coalesce(
        AnnSearch.dotI64(col("se"), col("de")).cast("double") /
          sqrt(col("sn").cast("double") * col("dn").cast("double")),
        lit(-1.0)))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(col("cos").desc, col("dst"))))
      .filter(col("rn") <= m)
      .select("src", "dst")
  }

  /** HNSW-STYLE INCREMENTAL INSERTION — the graph index's `add` step,
    * completing its lifecycle the way [[IvfPq.addBatch]] does for IVF-PQ:
    * each new node finds its out-edges by BEAM-SEARCHING ITSELF over the
    * existing graph (exactly how HNSW inserts — the search structure is
    * its own build tool), then back-edges old→new keep the graph navigable
    * toward the new nodes, and every touched node re-trims to its top-`m`
    * by exact cosine (the uniform [[trimEdges]] rule — old nodes keep the
    * best of their old edges ∪ new back-edges, HNSW's neighbor pruning).
    *
    * Batch nodes insert against the PRE-batch graph, so inserts within a
    * batch commute (the [[IvfPq.addBatch]] order-independence contract)
    * and the whole step is deterministic — the q363 oracle replays walk →
    * edge selection → back-edges → re-trim bit-exactly.
    *
    * `corpus` must contain BOTH the old nodes and the batch (the walk
    * fetches old candidates, the trim fetches both endpoints); cost is
    * the batch's own walks (schedule-bounded per node) + one linear edge
    * re-rank — never a rebuild. */
  def insertBatch(graph: DataFrame, corpus: DataFrame, batch: DataFrame,
      m: Int, ef: Int, hops: Int): DataFrame = {
    // Walk entries come from the PRE-BATCH GRAPH's nodes, not the merged
    // corpus: batch nodes have no out-edges yet, so if the batch's ids
    // sorted below the existing nodes' (id reuse, non-monotonic keys) a
    // corpus-wide lowest-ef entry rule could seed every walk entirely on
    // edge-less batch nodes — each batch node would then edge only into
    // its own batch, inserting a disconnected island and silently
    // collapsing recall for all later probes. Seeding from graph sources
    // makes the walk start on navigable ground regardless of id order.
    // The walk itself stays DRIVER-PACED ([[beamTopK]] with the entry
    // override): a batch is bounded by contract, and the distributed
    // walk's per-hop persist+count jobs doubled the measured insert wall
    // (q363 10→19 s) for no result change — the entry RULE was the fix,
    // not the walk executor.
    val spark = graph.sparkSession
    import spark.implicits._
    val entryIds = graph.select(col("src")).distinct()
      .orderBy("src").limit(ef).as[Long].collect()
    val newE = beamTopK(batch, corpus, graph, m, ef, hops,
        entryIds = Some(entryIds))
      .select(col("qid").as("src"), col("cid").as("dst"))
    val backE = newE.select(col("dst").as("src"), col("src").as("dst"))
    // Re-trim ONLY touched sources (batch nodes + back-edge targets): an
    // untouched src gained no candidate, its edges are already its top-m,
    // and the trim is per-src independent — identical output, but the
    // expensive part (two embedding equi-joins + the per-src window) runs
    // on O(batch·m) rows instead of the whole O(N·m) edge set, which is
    // what keeps the insert bill flat as the corpus grows (GraphScale:
    // 13.5 s at ×16 vs 12.9 s at ×64 for the same 2000-node batch). The
    // q363 oracle replays the FULL-trim algebra, so the driver compare is
    // the equivalence proof.
    val g0 = graph.select("src", "dst")
    val touched = newE.select("src").unionByName(backE.select("src"))
      .distinct()
    val untouched = g0.join(touched, Seq("src"), "left_anti")
    val toTrim = g0.join(touched, Seq("src"), "left_semi")
      .unionByName(newE).unionByName(backE)
    untouched.unionByName(trimEdges(toTrim, corpus, m))
  }

  /** GRAPH-INDEX DELETE with repair — the lifecycle's last step (IVF-PQ
    * got its delete in r14; this is the graph analog). A plain edge drop
    * would shatter navigability: a node whose whole neighborhood was
    * removed goes unreachable and its queries dead-end. The HNSW repair
    * rule (also FreshDiskANN's delete): BRIDGE THROUGH the removed node —
    * every surviving src that edged into a removed node r inherits r's
    * surviving out-neighbors as candidate edges (src → r → x becomes
    * src → x), then every src re-trims to its top-`m` by exact cosine
    * (the same uniform [[trimEdges]] rule build and insert use, so delete
    * composes with both).
    *
    * Deterministic end-to-end — the q364 oracle replays kept ∪ bridge →
    * re-trim → beam walk bit-exactly.
    *
    * Scale shape: `removed` is a batch — broadcast anti/semi joins mask
    * it without shuffling the edge set; the bridge is ONE equi-join on
    * the removed id whose output is bounded by in-degree(r) × m per
    * removed node (edges are linear in N, never pairwise); the re-trim
    * touches only kept ∪ bridge rows. `survivors` must be the corpus
    * WITHOUT the removed rows (the trim scores both endpoints). */
  def removeNodes(graph: DataFrame, survivors: DataFrame,
      removed: DataFrame, m: Int): DataFrame = {
    // the [[IvfPq.removeIds]] guard: a multi-column frame would silently
    // tombstone whatever happened to be first
    require(removed.columns.length == 1,
      s"removed must be a single id column (got ${removed.columns.mkString(", ")})")
    val rid = broadcast(removed.select(col(removed.columns.head).as("rid")))
    val g = graph.select("src", "dst")
    val kept = g.join(rid, col("src") === col("rid"), "left_anti")
      .join(rid, col("dst") === col("rid"), "left_anti")
    // surviving src → removed mid
    val intoR = g.join(rid, col("dst") === col("rid"), "left_semi")
      .join(rid, col("src") === col("rid"), "left_anti")
      .select(col("src"), col("dst").as("mid"))
    // removed mid → surviving dst
    val outR = g.select(col("src").as("mid"), col("dst"))
      .join(rid, col("mid") === col("rid"), "left_semi")
      .join(rid, col("dst") === col("rid"), "left_anti")
    val bridge = intoR.join(outR, "mid")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
    // Re-trim ONLY bridged sources: a src with no bridge candidates can
    // only have LOST edges (kept ⊆ its previous top-m), so its trim is a
    // no-op — identical output, and the embedding joins + window run on
    // O(|bridge|) rows instead of the whole surviving edge set, keeping
    // the delete bill ~flat as the corpus grows (GraphScale: 6.5 s at ×16
    // vs 8.5 s at ×64 for the same 2000-node batch). The q364 oracle
    // replays the FULL-trim algebra — the driver compare is the
    // equivalence proof.
    val touched = bridge.select("src").distinct()
    val keptUntouched = kept.join(touched, Seq("src"), "left_anti")
    val toTrim = kept.join(touched, Seq("src"), "left_semi")
      .unionByName(bridge)
    keptUntouched.unionByName(trimEdges(toTrim, survivors, m))
  }

  // =====================================================================
  // THE AT-REST FORM — the graph index as files, not a DataFrame
  // (VERDICT r15 task 2/3: "what q370 did for the binary codec — the
  // claim as a plan property"). Layout under one root:
  //
  //   <path>/vectors/bucket=B/…   (id, qe, n2)    bucket = pmod(id, nB)
  //   <path>/adj0/bucket=B/…      (src, dst, gen) bucket = pmod(src, nB)
  //   <path>/radj<l>/bucket=B/…   reverse adjacency (same rows as adj<l>,
  //                               bucket = pmod(DST, nB)) — delete
  //                               repair's in-edge discovery fetches it
  //                               partition-pruned by removed id; any-gen
  //                               discovery state, live truth stays adj.
  //                               LAZY: absent until the first
  //                               removeBatch materializes it (a
  //                               write-mostly index never pays for it);
  //                               appends maintain it once it exists
  //   <path>/adj<l>/bucket=B/…    level-l adjacency (l = 1..layers),
  //                               same shape — the hierarchy STACKS:
  //                               levels are added while a level holds
  //                               > LEVEL_CAP nodes, because a flat walk
  //                               of a big single upper layer re-creates
  //                               the radius problem one level up
  //                               (GraphScale measured the fixed 2-layer
  //                               probe collapsing to recall 0.13 at ×64
  //                               while the stacked descent holds 0.76)
  //   <path>/entries/…            lowest live TOP-level ids (≤ ENTRY_CAP)
  //   <path>/tombstones/…         deleted node ids (append-only)
  //   <path>/_meta                m, m1, nBuckets, layers, gen
  //
  // Probe cost is a PLAN PROPERTY: every walk fetch filters on the bucket
  // partition column first (PartitionFilters — spec-asserted), so a hop
  // reads only the buckets its ≤ |Q|·ef ids live in, never the store.
  // Mutations never rewrite the store: an insert/delete batch APPENDS the
  // re-trimmed edge sets of the touched sources at generation gen+1 and
  // the reader resolves max-gen-per-src over its (bounded, pruned) fetch —
  // the [[IvfPq.addBatch]]/tombstone discipline applied to adjacency.
  // Levels need no storage at all: the HNSW layer draw ([[levelNodes]])
  // is a pure keyed-hash function of the id, so layer membership is
  // derivable forever, and only the layer GRAPHS are materialized.
  //
  // Single-writer contract (the [[TxnMergeOnRead]] counterpart is
  // deliberately out of scope here, as for [[IvfPq]]): concurrent
  // addBatch/removeBatch calls race the generation counter. Ingested ids
  // must be NEW ([[BinaryAnn.addBatch]]'s unique-id contract) — a re-used
  // id would alias its vector row and corrupt trims silently.
  // =====================================================================

  /** Lowest live layer-1 ids kept in the entry sidecar. The cap bounds
    * the sidecar read at probe time; semantics are ALWAYS "the lowest
    * min(cap, live) layer-1 ids" — [[removeBatch]] rebuilds the sidecar
    * from the store whenever a deletion touches it, so the oracle rule
    * (lowest ef1 LIVE layer-1 ids) holds at every generation. */
  private val ENTRY_CAP = 256

  /** Stack another level while the current top holds more nodes than
    * this (≈ 8·ef1·m1, the [[hnswTopK]] scaladoc's stacking rule). */
  private val LEVEL_CAP = 256

  private case class IndexMeta(m: Int, m1: Int, nBuckets: Int,
    layers: Int, gen: Long)

  private def hfs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, mt: IndexMeta): Unit = {
    val f = hfs(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$path/.meta_tmp_${java.util.UUID.randomUUID.toString.take(12)}")
    val out = f.create(tmp, true)
    try out.write(
      (s"m=${mt.m}\nm1=${mt.m1}\nnBuckets=${mt.nBuckets}\n" +
        s"layers=${mt.layers}\ngen=${mt.gen}\n").getBytes("UTF-8"))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(s"$path/_meta")
    f.delete(dst, false)
    require(f.rename(tmp, dst), s"could not publish $path/_meta")
  }

  private def readMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): IndexMeta = {
    val f = hfs(spark, path)
    val p = new org.apache.hadoop.fs.Path(s"$path/_meta")
    require(f.exists(p), s"no graph index at $path (missing _meta)")
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val kv = txt.linesIterator.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
    IndexMeta(kv("m").toInt, kv("m1").toInt, kv("nBuckets").toInt,
      kv("layers").toInt, kv("gen").toLong)
  }

  private def bucketed(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.withColumn("bucket", pmod(col(idCol), lit(n.toLong)))

  /** Write one layer's adjacency at `<path>/adj<l>` (bucketed by src),
    * maintaining the reverse sidecar `<path>/radj<l>` (same rows,
    * bucketed by DST) WHEN IT EXISTS. The reverse form serves one
    * consumer — [[removeBatch]]'s in-edge discovery, a dst predicate
    * src-bucketing cannot prune — and is LAZY: a fresh build writes
    * nothing (a write-mostly index never pays for it — the eager form
    * measured the q382/q384 build-heavy lifecycles 1.5–1.8× slower for
    * a sidecar their queries never read), the FIRST removeBatch
    * materializes it from the adjacency ([[ensureRadj]], one O(layer)
    * copy paid once per index), and every later append maintains it
    * here. `radj` is append-only DISCOVERY state: it may carry
    * stale-generation rows (a superseded source's old edges), which the
    * pruned LIVE re-fetch against `adj` already drops — so it needs no
    * generation resolution of its own, only the mirror discipline
    * (every edge appended to adj lands in radj in the same call once
    * radj exists). */
  private def writeAdj(edges: DataFrame, path: String, layer: Int,
      gen: Long, n: Int, append: Boolean): Unit = {
    val mode = if (append) "append" else "overwrite"
    val stamped = edges.select(col("src"), col("dst"))
      .withColumn("gen", lit(gen))
    // co-locate each bucket's rows before the partitioned write: ONE
    // file per bucket per generation instead of (shuffle partitions ×
    // buckets) shards — the probe's listing cost follows generations,
    // not writer parallelism (and at scale this is the co-located
    // bucket-write shape anyway)
    bucketed(stamped, "src", n)
      .repartition(n, col("bucket"))
      .write.partitionBy("bucket")
      .mode(mode).parquet(s"$path/adj$layer")
    val spark = edges.sparkSession
    val radjDir = s"$path/radj$layer"
    if (append &&
        hfs(spark, path).exists(new org.apache.hadoop.fs.Path(radjDir)))
      bucketed(stamped, "dst", n)
        .repartition(n, col("bucket"))
        .write.partitionBy("bucket")
        .mode("append").parquet(radjDir)
  }

  /** Materialize (or open) layer `l`'s reverse-adjacency sidecar: one
    * dst-bucketed copy of the full adjacency on first use, pruned point
    * fetches forever after. Idempotent; publish is tmp + atomic rename
    * so a racing reader never sees a half-built sidecar. */
  private def ensureRadj(spark: org.apache.spark.sql.SparkSession,
      path: String, layer: Int, n: Int): DataFrame = {
    val f = hfs(spark, path)
    val dir = s"$path/radj$layer"
    if (!f.exists(new org.apache.hadoop.fs.Path(dir))) {
      val tmp = s"$path/.radj${layer}_tmp"
      f.delete(new org.apache.hadoop.fs.Path(tmp), true)
      bucketed(spark.read.parquet(s"$path/adj$layer")
          .select(col("src"), col("dst"), col("gen")), "dst", n)
        .repartition(n, col("bucket"))
        .write.partitionBy("bucket").parquet(tmp)
      require(f.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(dir)),
        s"could not publish $dir")
    }
    spark.read.parquet(dir)
  }

  private def writeEntries(spark: org.apache.spark.sql.SparkSession,
      path: String, ids: Array[Long]): Unit = {
    import spark.implicits._
    // tmp + swap so a reader never sees a half-written sidecar
    val tmp = s"$path/.entries_tmp"
    ids.toSeq.toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = hfs(spark, path)
    val dst = new org.apache.hadoop.fs.Path(s"$path/entries")
    f.delete(dst, true)
    require(f.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"could not publish $path/entries")
  }

  private def readEntries(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Long] = {
    import spark.implicits._
    spark.read.parquet(s"$path/entries").select("id").as[Long]
      .collect().sorted
  }

  private def readTombs(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Long] = {
    val f = hfs(spark, path)
    if (!f.exists(new org.apache.hadoop.fs.Path(s"$path/tombstones")))
      Array.emptyLongArray
    else {
      import spark.implicits._
      // bounded-collect contract: tombstones grow with DELETED ids only
      // (the IvfPq.removeIds posture); a compaction folding them into a
      // rewritten store is the long-run answer, as for every LSM design
      spark.read.parquet(s"$path/tombstones").select("id").as[Long]
        .collect().distinct.sorted
    }
  }

  /** The at-rest fetch: bucket partition pruning first (bucket =
    * pmod(id, nBuckets) is derivable from the requested id set), then the
    * InSet/join id filter; adjacency frames (recognized by their `gen`
    * column) additionally FLAG tombstoned destinations in a `tomb`
    * column. The consumer resolves max-gen-per-src over the UNMASKED
    * rows FIRST and only then drops flagged destinations — either
    * driver-side over its collected bounded fetch (the walk loop — a
    * per-round window exchange measured as a real share of the q380
    * lifecycle wall) or through [[resolveLive]] (the trim paths).
    * Masking before resolution was a live bug: a source whose entire
    * latest-generation edge set is tombstoned (and that got no bridge
    * re-trim because the removed mids had no surviving out-edges) would
    * vanish from the max-gen computation and RESURRECT its superseded
    * earlier generation's trimmed-away edges; the oracle's live view
    * leaves that source edge-less. Exposed private[graft] so the spec
    * can assert the PartitionFilters plan property directly. */
  private[graft] def indexFetch(nBuckets: Int,
      tombs: Array[Long]): IdFetch = (df, idCol, ids) => {
    val bks = ids.map(i => ((i % nBuckets) + nBuckets) % nBuckets)
      .distinct.toSeq
    val pruned = df.filter(col("bucket").isin(bks: _*))
    val base =
      if (ids.length <= 65536) pruned.filter(col(idCol).isin(ids.toSeq: _*))
      else {
        val spark = df.sparkSession
        import spark.implicits._
        pruned.join(broadcast(ids.toSeq.toDF(idCol)), idCol)
      }
    if (df.columns.contains("gen")) {
      val flagged =
        if (tombs.isEmpty) base.withColumn("tomb", lit(false))
        else if (tombs.length <= 65536)
          base.withColumn("tomb", col("dst").isin(tombs.toSeq: _*))
        else {
          val spark = df.sparkSession
          import spark.implicits._
          base.join(broadcast(tombs.toSeq.toDF("dst")
              .withColumn("_t", lit(true))), Seq("dst"), "left")
            .withColumn("tomb", coalesce(col("_t"), lit(false)))
        }
      flagged.select("src", "dst", "gen", "tomb")
    } else base
  }

  /** Driver-side uniform trim for the at-rest mutation paths: fetch the
    * edge set's endpoint vectors ONCE (bucket-pruned, collected — they
    * are bounded by the same contract as the walks' probe batch), score
    * every edge with the exact int64 cosine, keep each source's top-`m`
    * under (cos desc, dst) — [[trimEdges]]' algebra with zero joins,
    * windows, or checkpoints (each cost a scheduling round-trip per trim;
    * the result rows are a LOCAL relation, so the append below has no
    * file lineage to guard). The fetched-row count doubles as the
    * unique-id ingest guard (the [[BinaryAnn.probeIndex]] discipline):
    * a re-used id would alias a vector and corrupt trims silently. */
  private def trimLocal(spark: org.apache.spark.sql.SparkSession,
      vec: DataFrame, fetch: IdFetch, toTrim: Seq[(Long, Long)],
      mDeg: Int): DataFrame = {
    import spark.implicits._
    val dedup = toTrim.distinct
    val endIds = dedup.iterator
      .flatMap { case (s0, d0) => Iterator(s0, d0) }.toArray.distinct
    val fetched = fetch(vec, "id", endIds)
      .select(col("id"), col("qe"), col("n2"))
      .as[(Long, Seq[Long], Long)].collect()
    require(fetched.length == endIds.length,
      s"graph index store returned ${fetched.length} rows for " +
        s"${endIds.length} distinct endpoint ids — duplicate or missing " +
        "ids (ingest contract: batch ids must be new)")
    val vv = fetched.iterator
      .map { case (id, qe, n2) => id -> ((qe.toArray, n2)) }.toMap
    val rows = dedup.groupBy(_._1).iterator.flatMap { case (s0, es) =>
      val (sv, sn) = vv(s0)
      es.iterator.map { case (_, d0) =>
        val (dv, dn) = vv(d0)
        if (sv.length != dv.length)
          throw new IllegalArgumentException(
            s"trim: dimension mismatch (${sv.length} vs ${dv.length})")
        var acc = 0L; var i = 0
        while (i < sv.length) { acc += sv(i) * dv(i); i += 1 }
        val denom = math.sqrt(sn.toDouble * dn.toDouble)
        (d0, if (denom == 0.0d) -1.0d else acc.toDouble / denom)
      }.toArray.sortBy { case (d0, cos) => (-cos, d0) }
        .take(mDeg).map { case (d0, _) => (s0, d0) }
    }.toSeq
    rows.toDF("src", "dst")
  }

  /** Resolve a gen-carrying edge fetch to its live view: max generation
    * per source wins (an insert/delete re-trim REPLACES the source's edge
    * set), and tombstone-flagged destinations drop ONLY AFTER that
    * resolution (the [[indexFetch]] ordering contract — masking first
    * resurrects superseded generations). No-op on flat (src, dst)
    * frames. */
  private[graft] def resolveLive(df: DataFrame): DataFrame =
    if (!df.columns.contains("gen")) df
    else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      val res = df.withColumn("_mg", max("gen").over(w))
        .filter(col("gen") === col("_mg"))
      (if (df.columns.contains("tomb")) res.filter(!col("tomb")) else res)
        .select("src", "dst")
    }

  /** Build and persist the index: one quantize pass writes the bucketed
    * vector store, every layer graph lands bucketed-by-src at generation
    * 1, and the entry sidecar records the lowest TOP-level ids.
    * `centroidStride` switches the layer-0 build to [[blockedKnnGraph]] —
    * the 100 TB build path; None = exact [[knnGraph]] (the fixture-gold
    * standard). Upper levels stack while a level holds > LEVEL_CAP nodes
    * (up to `maxLayers` — fixture queries pin 1 so their oracles replay a
    * fixed two-layer descent at any data size); level ≥ 2 graphs build
    * blocked when `centroidStride` is set (√n-sized strides), exact
    * otherwise. */
  def writeIndex(corpus: DataFrame, path: String, m: Int = 8, m1: Int = 4,
      nBuckets: Int = 16, centroidStride: Option[Int] = None,
      g0Opt: Option[DataFrame] = None,
      g1Opt: Option[DataFrame] = None,
      maxLayers: Int = 19): Unit = {
    require(m >= 1 && m1 >= 1 && nBuckets >= 1 && maxLayers >= 1,
      "bad index parameters")
    val spark = corpus.sparkSession
    import spark.implicits._
    hfs(spark, path).delete(new org.apache.hadoop.fs.Path(path), true)
    bucketed(AnnSearch.quantized(corpus), "id", nBuckets)
      .repartition(nBuckets, col("bucket"))
      .write.partitionBy("bucket").parquet(s"$path/vectors")
    // callers holding prebuilt layer graphs (a fixture cache, a prior
    // export) pass them in; the contract is degree-m over `corpus` /
    // degree-m1 over its layer-1 draw — identical to what would be built
    val g0 = g0Opt.getOrElse(centroidStride
      .map(st => blockedKnnGraph(corpus, m, st))
      .getOrElse(knnGraph(corpus, m)))
    writeAdj(g0, path, 0, 1L, nBuckets, append = false)
    var topNodes: DataFrame = null
    var l = 1
    var done = false
    while (!done) {
      val nodes = levelNodes(corpus, l)
      val nl = nodes.count()
      if (l == 1) require(nl > 0,
        "writeIndex: no layer-1 nodes — corpus too small for a hierarchy " +
          "(the flat beamTopK path covers toy corpora)")
      val gl =
        if (l == 1) g1Opt.getOrElse(knnGraph(nodes, m1))
        else if (centroidStride.isDefined)
          blockedKnnGraph(nodes, m1,
            math.max(1, math.sqrt(nl.toDouble).toInt))
        else knnGraph(nodes, m1)
      writeAdj(gl, path, l, 1L, nBuckets, append = false)
      topNodes = nodes
      // stack another level only while this one is too big to flat-walk
      // AND the next level up would still hold a navigable graph
      if (nl > LEVEL_CAP && l < maxLayers &&
          levelNodes(corpus, l + 1).count() >= 2) l += 1
      else done = true
    }
    val ents = topNodes.select(col(topNodes.columns.head).as("id"))
      .orderBy("id").limit(ENTRY_CAP).as[Long].collect()
    writeEntries(spark, path, ents)
    writeMeta(spark, path, IndexMeta(m, m1, nBuckets, l, 1L))
  }

  /** Probe the persisted index — the HNSW descent with every byte coming
    * from pruned reads: the top-level walk starts at the entry sidecar's
    * ef1 lowest live ids, each level's per-query winners seed the next
    * level down (narrow ef1/hops1 walks — one per stored level), and the
    * final layer-0 walk runs at ef/hops. All walks are driver-paced
    * ([[beamTopK]] — probe batches are bounded by contract) and every
    * fetch goes through [[indexFetch]]: bucket partition pruning +
    * max-gen resolution + tombstone masking. Nothing is rebuilt, nothing
    * unpruned is read; total cost is (layers·ef1·(m1+1)·hops1 +
    * ef·(m+1)·hops) scored rows per query — ~log N with stacked levels. */
  def probeIndex(queries: DataFrame, path: String, k: Int,
      ef1: Int = 8, hops1: Int = 2, ef: Int = 16,
      hops: Int = 2): DataFrame = {
    require(ef1 >= 1 && ef >= k, s"need ef1 >= 1 and ef=$ef >= k=$k")
    val spark = queries.sparkSession
    import spark.implicits._
    val mt = readMeta(spark, path)
    val tombs = readTombs(spark, path)
    val fetch = indexFetch(mt.nBuckets, tombs)
    val vec = spark.read.parquet(s"$path/vectors")
    val adj0 = spark.read.parquet(s"$path/adj0")
    val ents = readEntries(spark, path).filterNot(tombs.contains).take(ef1)
    require(ents.nonEmpty,
      s"probeIndex: entry sidecar exhausted at $path — rebuild the index")
    var seeds: Option[Map[Long, Array[Long]]] = None
    for (l <- mt.layers to 1 by -1) {
      val beam = beamWalkArr(queries, vec,
        spark.read.parquet(s"$path/adj$l"), ef1, hops1,
        if (seeds.isEmpty) Some(ents) else None, seeds, fetch)
      seeds = Some(beam.groupBy(_._1).map { case (q, a) => q -> a.map(_._2) })
    }
    val finalBeam = beamWalkArr(queries, vec, adj0, ef, hops,
      None, seeds, fetch)
    AnnSearch.rankTopK(finalBeam.toSeq.toDF("qid", "cid", "cos"), k)
  }

  /** HNSW-style LEVEL-AWARE incremental insertion against the persisted
    * index (VERDICT r15 task 3). One upper walk serves two purposes: every
    * batch node descends layer 1 from the entry sidecar to find its
    * layer-0 seeds (HNSW's descent — the search structure is its own
    * build tool), and the walk's top-m1 per LAYER-1 batch node are that
    * node's layer-1 out-edges. Each layer then applies the uniform
    * [[insertBatch]] algebra — back-edges + touched-source re-trim — and
    * APPENDS the re-trimmed sources at gen+1; untouched sources' rows are
    * never rewritten (max-gen-per-src resolution at read). All walks run
    * against the PRE-batch generations, so inserts within a batch commute
    * (the [[IvfPq.addBatch]] order-independence contract) and the whole
    * step replays in the oracle. Cost: the batch's own schedule-bounded
    * walks + two O(batch·m) trims + appends — never a rebuild, flat in
    * corpus size (GraphScale's insert discipline). */
  // env-guarded phase timer for tools/GraphIndexProbe tuning runs only
  private def phased[A](label: String)(f: => A): A =
    if (!sys.env.contains("GRAFT_GRAPH_PHASES")) f
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

  def addBatch(path: String, batch: DataFrame, ef1: Int = 8,
      hops1: Int = 2, ef: Int = 16, hops: Int = 2): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val mt = readMeta(spark, path)
    require(mt.m1 <= ef1 && mt.m <= ef,
      s"walk widths must cover edge degrees (m=${mt.m} ef=$ef, " +
        s"m1=${mt.m1} ef1=$ef1)")
    val newGen = mt.gen + 1
    val tombs = readTombs(spark, path)
    val fetch = indexFetch(mt.nBuckets, tombs)
    // vectors first: the trims below fetch BOTH endpoints (incl. batch
    // ids) from the store; the walks only ever fetch pre-batch candidates
    phased("vec append")(
      bucketed(AnnSearch.quantized(batch), "id", mt.nBuckets)
        .repartition(mt.nBuckets, col("bucket"))
        .write.partitionBy("bucket").mode("append").parquet(s"$path/vectors"))
    val vec = spark.read.parquet(s"$path/vectors")
    val adj0 = spark.read.parquet(s"$path/adj0")
    val adjL = (1 to mt.layers).map(l =>
      l -> spark.read.parquet(s"$path/adj$l")).toMap
    val ents = readEntries(spark, path).filterNot(tombs.contains).take(ef1)
    require(ents.nonEmpty,
      s"addBatch: entry sidecar exhausted at $path — rebuild the index")

    /** Per-query top-`deg` edge selection from a walk beam — driver-side
      * over beams that are driver state already (the beamWalkArr rule). */
    def topEdges(beam: Array[(Long, Long, Double)], deg: Int,
        qKeep: Long => Boolean): Seq[(Long, Long)] =
      beam.groupBy(_._1).iterator.collect { case (q, rows) if qKeep(q) =>
        rows.sortBy { case (_, cid, cos) => (-cos, cid) }.take(deg)
          .map { case (_, cid, _) => (q, cid) }.toSeq
      }.flatten.toSeq

    /** The uniform insert algebra on one layer: new edges → back-edges →
      * touched-source re-trim. The touched sources' live rows are a
      * bounded pruned fetch (collected — the bounded-collect contract),
      * so the whole candidate edge set is driver state and [[trimLocal]]
      * reads only endpoint vectors. */
    def layerRows(adj: DataFrame, newE: Seq[(Long, Long)],
        mDeg: Int): DataFrame = {
      val backE = newE.map { case (s0, d0) => (d0, s0) }
      val touchedIds = (newE.iterator.map(_._1) ++ backE.iterator.map(_._1))
        .toArray.distinct
      val old = resolveLive(fetch(adj, "src", touchedIds))
        .as[(Long, Long)].collect()
      trimLocal(spark, vec, fetch, (old ++ newE ++ backE).distinct.toSeq,
        mDeg)
    }

    // batch node ids per level (the keyed draw; level sets are nested)
    val bIdsAt = (1 to mt.layers).map(l => l -> levelNodes(batch, l)
      .select(col(batch.columns.head).cast("long")).as[Long]
      .collect().toSet).toMap
    // ONE walk per stored level, descending: each level's beam both seeds
    // the next level down (HNSW's insert descent) and supplies the
    // top-m1 edge selection for batch nodes drawn AT that level
    var seeds: Option[Map[Long, Array[Long]]] = None
    val newEAt = (mt.layers to 1 by -1).map { l =>
      val beam = phased(s"walk L$l")(beamWalkArr(batch, vec, adjL(l), ef1,
        hops1, if (seeds.isEmpty) Some(ents) else None, seeds, fetch))
      seeds = Some(beam.groupBy(_._1).map { case (q, a) => q -> a.map(_._2) })
      l -> topEdges(beam, mt.m1, bIdsAt(l).contains)
    }.toMap
    val w0Beam = phased("lower walk")(beamWalkArr(batch, vec, adj0, ef,
      hops, None, seeds, fetch))

    val rows0 = phased("trim L0")(
      layerRows(adj0, topEdges(w0Beam, mt.m, _ => true), mt.m))
    val rowsAt = (1 to mt.layers).flatMap { l =>
      if (bIdsAt(l).isEmpty) None
      else Some(l -> phased(s"trim L$l")(
        layerRows(adjL(l), newEAt(l), mt.m1)))
    }
    phased("adj0 append")(
      writeAdj(rows0, path, 0, newGen, mt.nBuckets, append = true))
    rowsAt.foreach { case (l, r) => phased(s"adj$l append")(
      writeAdj(r, path, l, newGen, mt.nBuckets, append = true)) }
    if (bIdsAt(mt.layers).nonEmpty)
      phased("entries")(writeEntries(spark, path,
        (readEntries(spark, path) ++ bIdsAt(mt.layers)).distinct.sorted
          .take(ENTRY_CAP)))
    writeMeta(spark, path, mt.copy(gen = newGen))
  }

  /** Graph-index DELETE against the persisted form — [[removeNodes]]'
    * bridge-repair algebra per layer, expressed as appends: removed ids
    * land in the tombstone sidecar (readers mask dead DESTINATIONS at
    * fetch, which realizes the "kept" edge drop for untouched sources
    * without rewriting them), and every BRIDGED source's re-trimmed edge
    * set appends at gen+1. In-edge discovery reads the dst-bucketed
    * `radj` sidecar — a bucket-partition-pruned fetch by removed id
    * (candidate sources with any-gen edges into the removed set,
    * O(batch·in-degree) rows; the pruned live re-fetch against `adj`
    * then drops stale-generation false positives) — closing the one
    * full-scan FreshDiskANN trade the r16 form documented. `removed`:
    * a single id column, batch-bounded (the [[IvfPq.removeIds]] guard). */
  /** COMPACTION — fold every layer's generation chain into one live
    * generation and physically drop tombstoned rows (the
    * [[IvfPq.compactIndex]] discipline applied to adjacency): per layer,
    * the FULL gen-carrying scan resolves max-gen-per-src, masks
    * tombstoned sources and destinations, and rewrites adj+radj at gen 1
    * via tmp + swap (a reader mid-swap sees old or new, never half);
    * the vector store drops tombstoned ids the same way; tombstones
    * clear; entries rebuild to the lowest live top-level ids; gen resets.
    * Probe results are IDENTICAL before and after (the live view is
    * unchanged — compaction is physical, spec-pinned); what changes is
    * the bill: GraphScale's churn run measured the probe wall doubling
    * across 9 accumulated generations (4.3 → 8.1 s at ×16) because every
    * bucket fetch lists one file per generation — compaction returns it
    * to the fresh-build shape. O(index), so it amortizes like any LSM
    * major compaction: run it when the generation count, not the data,
    * dominates the probe. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import spark.implicits._
    val mt = readMeta(spark, path)
    val tombs = readTombs(spark, path)
    val f = hfs(spark, path)
    def swap(tmp: String, dst: String): Unit = {
      val d = new org.apache.hadoop.fs.Path(dst)
      f.delete(d, true)
      require(f.rename(new org.apache.hadoop.fs.Path(tmp), d),
        s"compactIndex: could not publish $dst")
    }
    val tombDf = tombs.toSeq.toDF("tid")
    for (l <- 0 to mt.layers) {
      val adj = spark.read.parquet(s"$path/adj$l")
      // tomb flag via broadcast join, not an isin literal list — the
      // tombstone set is unbounded by the time compaction runs
      val flagged =
        if (tombs.isEmpty) adj.withColumn("tomb", lit(false))
        else adj.join(broadcast(tombDf.withColumn("_t", lit(true))),
            col("dst") === col("tid"), "left")
          .withColumn("tomb", coalesce(col("_t"), lit(false)))
          .drop("tid", "_t")
      val live = resolveLive(flagged)
        .join(broadcast(tombDf), col("src") === col("tid"), "left_anti")
      // a lazily-materialized radj must survive compaction as a mirror of
      // the compacted adjacency; absent sidecars stay absent (lazy)
      val hadRadj = f.exists(
        new org.apache.hadoop.fs.Path(s"$path/radj$l"))
      writeAdj(live, s"$path/.compact", l, 1L, mt.nBuckets, append = false)
      if (hadRadj) {
        bucketed(spark.read.parquet(s"$path/.compact/adj$l")
            .select(col("src"), col("dst"), col("gen")), "dst", mt.nBuckets)
          .repartition(mt.nBuckets, col("bucket"))
          .write.partitionBy("bucket").parquet(s"$path/.compact/radj$l")
        swap(s"$path/.compact/radj$l", s"$path/radj$l")
      } else
        f.delete(new org.apache.hadoop.fs.Path(s"$path/radj$l"), true)
      swap(s"$path/.compact/adj$l", s"$path/adj$l")
    }
    val liveVec = spark.read.parquet(s"$path/vectors")
      .join(broadcast(tombDf), col("id") === col("tid"), "left_anti")
      .select("id", "qe", "n2", "bucket")
    liveVec.repartition(mt.nBuckets, col("bucket"))
      .write.partitionBy("bucket").parquet(s"$path/.vec_compact")
    swap(s"$path/.vec_compact", s"$path/vectors")
    f.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones"), true)
    f.delete(new org.apache.hadoop.fs.Path(s"$path/.compact"), true)
    val ents = levelNodes(
        spark.read.parquet(s"$path/vectors").select(col("id")), mt.layers)
      .orderBy("id").limit(ENTRY_CAP).as[Long].collect()
    require(ents.nonEmpty, s"compactIndex: no live top-level nodes at $path")
    writeEntries(spark, path, ents)
    writeMeta(spark, path, mt.copy(gen = 1L))
  }

  def removeBatch(path: String, removed: DataFrame): Unit = {
    require(removed.columns.length == 1,
      s"removed must be a single id column (got ${removed.columns.mkString(", ")})")
    val spark = removed.sparkSession
    import spark.implicits._
    val mt = readMeta(spark, path)
    val newGen = mt.gen + 1
    val oldTombs = readTombs(spark, path)
    val fetch = indexFetch(mt.nBuckets, oldTombs)
    val rIds = removed.select(col(removed.columns.head).cast("long"))
      .as[Long].collect().distinct
    require(rIds.nonEmpty, "removeBatch: empty removed set")
    val vec = spark.read.parquet(s"$path/vectors")

    /** Bridge-repair one layer; returns the gen+1 rows for its bridged
      * sources, materialized (same lineage rule as addBatch). The live
      * fetches are bounded (|candidates| × m, |removed| × m) and
      * COLLECTED, so the bridge join and the kept/touched masks are
      * driver work and the trim reads only endpoint vectors. */
    def repair(adj: DataFrame, radj: DataFrame, rSet: Array[Long],
        mDeg: Int): Option[DataFrame] = {
      if (rSet.isEmpty) return None
      val rs = rSet.toSet
      // candidate in-edge sources: a bucket-pruned any-gen fetch of the
      // dst-bucketed reverse sidecar (tombs empty on purpose — discovery
      // wants EVERY edge ever written into the removed set; the pruned
      // LIVE re-fetch below drops stale-generation false positives)
      val candSrc = indexFetch(mt.nBuckets, Array.emptyLongArray)(
          radj, "dst", rSet)
        .filter(!col("src").isin(rSet.toSeq: _*))
        .select("src").distinct().as[Long].collect()
      if (candSrc.isEmpty) return None
      val candLive = resolveLive(fetch(adj, "src", candSrc))
        .as[(Long, Long)].collect()
      val outByMid = resolveLive(fetch(adj, "src", rSet))
        .as[(Long, Long)].collect()
        .filter { case (_, d0) => !rs(d0) }.groupBy(_._1)
      val bridge = candLive
        .filter { case (_, d0) => rs(d0) }
        .flatMap { case (s0, mid) =>
          outByMid.getOrElse(mid, Array.empty[(Long, Long)])
            .collect { case (_, d0) if d0 != s0 => (s0, d0) }
        }.distinct
      val touched = bridge.iterator.map(_._1).toSet
      if (touched.isEmpty) return None
      val keptTouched = candLive.filter { case (s0, d0) =>
        touched(s0) && !rs(d0) }
      Some(trimLocal(spark, vec, fetch,
        (keptTouched ++ bridge).distinct.toSeq, mDeg))
    }

    val adj0 = spark.read.parquet(s"$path/adj0")
    repair(adj0, ensureRadj(spark, path, 0, mt.nBuckets), rIds, mt.m)
      .foreach(r => writeAdj(r, path, 0, newGen, mt.nBuckets, append = true))
    for (l <- 1 to mt.layers) {
      val rl = levelNodes(rIds.toSeq.toDF("id"), l).as[Long].collect()
      // guard BEFORE ensureRadj: a level the batch never drew into should
      // not pay the one-time sidecar materialization
      if (rl.nonEmpty)
        repair(spark.read.parquet(s"$path/adj$l"),
            ensureRadj(spark, path, l, mt.nBuckets), rl, mt.m1).foreach(r =>
          writeAdj(r, path, l, newGen, mt.nBuckets, append = true))
    }
    rIds.toSeq.toDF("id").coalesce(1).write.mode("append")
      .parquet(s"$path/tombstones")
    // the sidecar invariant is "lowest min(cap, live) TOP-level ids": a
    // deletion touching it forces a rebuild from the store (rare, and an
    // id-column-only scan), so the probe entry rule stays exactly the
    // oracle's "lowest ef1 LIVE top-level ids" at every generation
    val ents = readEntries(spark, path)
    if (ents.exists(rIds.contains)) {
      val allTombs = (oldTombs ++ rIds).distinct
      val live = levelNodes(vec.select(col("id")), mt.layers)
        .filter(!col("id").isin(allTombs.toSeq: _*))
        .orderBy("id").limit(ENTRY_CAP).as[Long].collect()
      require(live.nonEmpty,
        s"removeBatch: no live top-level nodes remain at $path")
      writeEntries(spark, path, live)
    }
    writeMeta(spark, path, mt.copy(gen = newGen))
  }
}
