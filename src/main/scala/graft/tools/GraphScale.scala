package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.{AnnSearch, GraphAnn}

/** SURVEY §6 scale evidence for the graph-ANN lifecycle (q361–q364): the
  * three claims the operators make, measured as the corpus grows ×16/×64
  * (sf0.1 embeddings grown by INTERPOLATION, not replication: replica r
  * of base b is a hash-weighted convex mix of b and a deterministic
  * partner base. AnnScale's exact-replica corpus is pathological for a
  * graph index — 16 identical (or near-identical, jitter doesn't help)
  * copies per base form families tighter than any cross-family
  * neighbor, every node's top-m edges stay inside its 16-member family,
  * and the kNN graph disconnects into cliques: recall measured 0.000 at
  * ×16 under both replication variants. Interpolated replicas spread
  * each family into a web that interlinks clusters, which is also what
  * a real grown corpus looks like. Rep 0 stays the exact base, so ×1 is
  * the untouched q362 fixture):
  *
  *  1. BUILD is the expensive part and the blocked build bounds it —
  *     exact all-pairs is N² (printed, not run, past ×1), while
  *     [[GraphAnn.blockedKnnGraph]] pays ~N²·keep²/nlist through one
  *     cent_id equi-join (nlist ≈ √N keeps per-cluster work ~N^1.5 total).
  *  2. PROBE cost is schedule-bounded — hops × ef × m adjacency rows per
  *     query batch, INDEPENDENT of corpus size. The HNSW deal: hold
  *     recall by growing hops ~ log N (×1→×64 is hops 4→7, a 1.75× probe
  *     bill) while brute grows with N (64×).
  *  3. The lifecycle never rebuilds: insert cost = the batch's own walks
  *     (q363), delete cost = one broadcast mask + bridge join + linear
  *     re-trim (q364) — both measured on the ×16 corpus.
  *
  * Usage: sbt "runMain graft.tools.GraphScale"
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(cores = 32, appName = "graft-graphscale")
    import spark.implicits._
    val root = "/root/repo/target/graphscale"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val base = Engine.table(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val stride = base.agg(max("id")).head.getLong(0) + 1L
    val queries = base.filter(col("id") < 30).cache()
    queries.count()

    def corpusAt(factor: Int): DataFrame = {
      val out = s"$root/x$factor"
      val partners = base.select(col("id").as("pid"),
        col("embedding").as("pemb"))
      base.withColumn("__rep", explode(sequence(lit(0L), lit(factor - 1L))))
        // partner base and mix weight, both keyed deterministic; rep 0
        // mixes with itself at w=1 → bit-identical to the base corpus
        .withColumn("pid", when(col("__rep") === 0, col("id"))
          .otherwise(pmod(col("id") + col("__rep") * 131L + 17L, lit(stride))))
        .withColumn("w", when(col("__rep") === 0, lit(1.0f))
          .otherwise(pmod(hash(col("id"), col("__rep")), lit(501))
            .cast("float") / 1000.0f + 0.25f))
        .join(partners, "pid")
        .withColumn("embedding",
          expr("zip_with(embedding, pemb, (a, b) -> CAST(w*a + (1.0F-w)*b AS FLOAT))"))
        .select((col("id") + col("__rep") * stride).as("id"), col("embedding"))
        .repartition(math.max(8, factor / 8))
        .write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    }

    def best2(run: => DataFrame): (Double, Set[(Long, Long)]) = {
      def once(): (Double, Set[(Long, Long)]) = {
        val t0 = System.nanoTime()
        val rows = run.select("qid", "cid").as[(Long, Long)].collect().toSet
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val a = once(); val b = once()
      if (a._1 <= b._1) a else b
    }

    for (factor <- Seq(1, 16, 64)) {
      val corpus = corpusAt(factor)
      val n = corpus.count()
      // nlist ≈ √N via the stride (same sizing rule as AnnScale); the FLAT
      // walk's hops grow ~log N (what a fair fixed-cost scaling would
      // hope suffices) — the measurement shows that hope failing: a flat
      // kNN-graph walk's length grows with the graph's RADIUS, so recall
      // collapses as N grows and the HIERARCHY below is what restores it
      val centStride = math.max(1, (50 * math.sqrt(factor)).toInt)
      val hops = 4 + math.round(2.0 * math.log(factor) / math.log(16)).toInt
      val (bw, brute) = best2(AnnSearch.bruteTopK(queries, corpus, 10))
      val t0 = System.nanoTime()
      val g = GraphAnn.blockedKnnGraph(corpus, m = 8,
        centroidStride = centStride, keep = 2)
      // materialize the build once (an index is persisted in production);
      // count() forces it, persist serves the probes below
      val edges = g.persist().count()
      val build = (System.nanoTime() - t0) / 1e9
      val (pw, got) = best2(
        GraphAnn.beamTopK(queries, corpus, g, 10, ef = 16, hops = hops))
      val recall = (brute & got).size.toDouble / brute.size
      println(f"[graphscale] x$factor rows=$n nlist~${n / centStride} " +
        f"hops=$hops exactPairs=${n.toDouble * n}%.1e blockedEdges=$edges " +
        f"brute=$bw%.2fs build=$build%.2fs probe=$pw%.2fs recall=$recall%.3f")

      // THE HIERARCHY (q366 composed multi-layer): L = ceil(log8(N/500))
      // upper layers (levelNodes keyed draw, blocked builds sized by the
      // same √n rule), descended with a narrow beam; the bottom walk
      // keeps the ×1 schedule because its entry is already NEAR the
      // query. Total hops ~ log N; every walk schedule-bounded.
      val tb = System.nanoTime()
      val layerGs = (1 to math.max(1,
        math.ceil(math.log(n / 500.0) / math.log(8.0)).toInt)).map { l =>
        val nodes = GraphAnn.levelNodes(corpus, l)
        val nl = nodes.count()
        val gl = GraphAnn.blockedKnnGraph(nodes, m = 8,
          centroidStride = math.max(1, math.sqrt(nl.toDouble).toInt),
          keep = 2).persist()
        gl.count()
        (l, nodes, gl, nl)
      }
      val hBuild = (System.nanoTime() - tb) / 1e9
      val top = layerGs.last
      val entrySeed = queries.select(col("id").as("qid")).crossJoin(
        broadcast(top._2.select(col("id").as("cid")).orderBy("cid").limit(8)))
      val (hw, hGot) = best2 {
        var seed: DataFrame = entrySeed
        layerGs.reverse.foreach { case (_, _, gl, _) =>
          seed = GraphAnn.beamTopKSeeded(queries, corpus, gl, seed,
            8, ef = 8, hops = 3).select("qid", "cid")
        }
        GraphAnn.beamTopKSeeded(queries, corpus, g, seed, 10, ef = 16,
          hops = 4)
      }
      val hRecall = (brute & hGot).size.toDouble / brute.size
      println(f"[graphscale] x$factor-hnsw layers=${layerGs.size} " +
        f"upperNodes=${layerGs.map(_._4).mkString("/")} " +
        f"hierBuild=$hBuild%.2fs probe=$hw%.2fs recall=$hRecall%.3f")
      layerGs.foreach(_._3.unpersist(blocking = false))
      g.unpersist(blocking = false)
    }

    // lifecycle rows (q363 insert / q364 delete) at ×16 AND ×64: hold out
    // a FIXED-SIZE batch (1/factor of the corpus = 2000 nodes at both
    // scales), build on the rest, insert the batch — cost is the batch's
    // own schedule-bounded walks + a linear edge re-trim; then delete a
    // different same-size batch — one broadcast mask + the bridge
    // equi-join + the same re-trim. The point of the two scales: batch
    // cost stays ~FLAT while the full-rebuild bill above grows with N
    // (25 s → 71 s), which is what "never a rebuild" buys at 100 TB.
    for (factor <- Seq(16, 64)) {
      val corpus = spark.read.parquet(s"$root/x$factor")
      val old = corpus.filter(col("id") % factor =!= 9)
      val batch = corpus.filter(col("id") % factor === 9)
      val centStride = math.max(1, (50 * math.sqrt(factor)).toInt)
      val hops = 4 + math.round(2.0 * math.log(factor) / math.log(16)).toInt
      val g0 = GraphAnn.blockedKnnGraph(old, m = 8,
        centroidStride = centStride, keep = 2).persist()
      g0.count()
      val t0 = System.nanoTime()
      val g1 = GraphAnn.insertBatch(g0, corpus, batch, m = 8, ef = 16,
        hops = hops).persist()
      val e1 = g1.count()
      val insert = (System.nanoTime() - t0) / 1e9
      val (pw, _) = best2(
        GraphAnn.beamTopK(queries, corpus, g1, 10, ef = 16, hops = hops))
      println(f"[graphscale] x$factor-insert batch=${batch.count()} " +
        f"insert=$insert%.2fs edgesAfter=$e1 probe=$pw%.2fs")

      val removed = corpus.filter(col("id") % factor === 3).select("id")
      val sv = corpus.filter(col("id") % factor =!= 3)
      val t1 = System.nanoTime()
      val g2 = GraphAnn.removeNodes(g1, sv, removed, m = 8).persist()
      val e2 = g2.count()
      val del = (System.nanoTime() - t1) / 1e9
      val (pw2, _) = best2(GraphAnn.beamTopK(
        queries.join(removed, Seq("id"), "left_anti"), sv, g2, 10,
        ef = 16, hops = hops))
      println(f"[graphscale] x$factor-delete batch=${removed.count()} " +
        f"delete=$del%.2fs edgesAfter=$e2 probe=$pw2%.2fs")
      g0.unpersist(blocking = false); g1.unpersist(blocking = false)
      g2.unpersist(blocking = false)
    }

    // THE AT-REST LIFECYCLE (r16, q379–q381): the persisted index —
    // blocked builds land as bucketed parquet, a FIXED 2000-node batch
    // ingests LEVEL-AWARE against the store (one descent walk per node +
    // per-layer endpoint-pruned trims, all APPENDS at gen+1), and the
    // persisted descent probe reads only pruned buckets. Claims: ingest
    // wall ~FLAT ×16→×64 (batch-bounded walks + O(batch·m) trims), and
    // the persisted probe holds the hierarchy's recall.
    for (factor <- Seq(16, 64)) {
      val corpus = spark.read.parquet(s"$root/x$factor")
      val old = corpus.filter(col("id") % factor =!= 9)
      val batch = corpus.filter(col("id") % factor === 9)
      val centStride = math.max(1, (50 * math.sqrt(factor)).toInt)
      val hops = 4 + math.round(2.0 * math.log(factor) / math.log(16)).toInt
      val idx = s"$root/idx_x$factor"
      val lvl1 = GraphAnn.levelNodes(old, 1)
      val nl1 = lvl1.count()
      val t0 = System.nanoTime()
      GraphAnn.writeIndex(old, idx, m = 8, m1 = 8, nBuckets = 64,
        g0Opt = Some(GraphAnn.blockedKnnGraph(old, 8, centStride, 2)),
        g1Opt = Some(GraphAnn.blockedKnnGraph(lvl1, 8,
          math.max(1, math.sqrt(nl1.toDouble).toInt), 2)))
      val build = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      GraphAnn.addBatch(idx, batch, ef1 = 8, hops1 = 3, ef = 16,
        hops = hops)
      val ins = (System.nanoTime() - t1) / 1e9
      val (bw, brute) = best2(AnnSearch.bruteTopK(queries, corpus, 10))
      val (pw, got) = best2(GraphAnn.probeIndex(queries, idx, 10,
        ef1 = 8, hops1 = 3, ef = 16, hops = hops))
      val recall = (brute & got).size.toDouble / brute.size
      println(f"[graphscale] x$factor-atrest upperNodes=$nl1 " +
        f"build=$build%.2fs ingest2000=$ins%.2fs brute=$bw%.2fs " +
        f"probe=$pw%.2fs recall=$recall%.3f")

      // CHURN (r17, VERDICT r16 task 6 — the FreshDiskANN question): does
      // bridge-repair quality decay across interleaved add/remove
      // generations? Four rounds, each adding ~2% NEW nodes (interpolated
      // blends under fresh ids — the unique-id ingest contract) and
      // removing ~2% of the live set, against the at-rest index above;
      // then recall@10 of the CHURNED index vs a FRESH writeIndex of the
      // exact same live set under the same probe schedule. The per-round
      // delete wall is also the task-3 evidence: in-edge discovery now
      // reads the dst-bucketed radj sidecar partition-pruned, so the
      // delete bill follows the batch at BOTH corpus scales instead of
      // paying a full adjacency scan per layer.
      val maxId = corpus.agg(max("id")).head.getLong(0) + 1L
      val partners2 = corpus.select(col("id").as("pid"),
        col("embedding").as("pemb"))
      var live = corpus
      for (r <- 0 until 4) {
        val adds = corpus
          .filter(pmod(hash(col("id"), lit(7 + r)), lit(53)) === 0)
          .withColumn("pid", pmod(col("id") + 997L, lit(maxId)))
          .join(partners2, "pid")
          .select((col("id") + lit(maxId * (r + 1))).as("id"),
            expr("zip_with(embedding, pemb, " +
              "(a, b) -> CAST(0.6F*a + 0.4F*b AS FLOAT))").as("embedding"))
        val nAdd = adds.count()
        val ta = System.nanoTime()
        GraphAnn.addBatch(idx, adds, ef1 = 8, hops1 = 3, ef = 16,
          hops = hops)
        val insW = (System.nanoTime() - ta) / 1e9
        live = live.unionByName(adds).localCheckpoint(true)
        val rm = live.filter(col("id") >= 30 &&
          pmod(hash(col("id"), lit(1000 + r)), lit(53)) === 0).select("id")
        val nRm = rm.count()
        val td = System.nanoTime()
        GraphAnn.removeBatch(idx, rm)
        val delW = (System.nanoTime() - td) / 1e9
        live = live.join(rm, Seq("id"), "left_anti").localCheckpoint(true)
        println(f"[graphscale] x$factor-churn round=$r add=$nAdd " +
          f"ins=$insW%.2fs rm=$nRm del=$delW%.2fs")
      }
      val nLive = live.count()
      val (bw2, brute2) = best2(AnnSearch.bruteTopK(queries, live, 10))
      val (cw, churned) = best2(GraphAnn.probeIndex(queries, idx, 10,
        ef1 = 8, hops1 = 3, ef = 16, hops = hops))
      val cRecall = (brute2 & churned).size.toDouble / brute2.size
      val fIdx = s"$root/fresh_x$factor"
      val fLvl1 = GraphAnn.levelNodes(live, 1)
      val fNl1 = fLvl1.count()
      val tf = System.nanoTime()
      GraphAnn.writeIndex(live, fIdx, m = 8, m1 = 8, nBuckets = 64,
        g0Opt = Some(GraphAnn.blockedKnnGraph(live, 8, centStride, 2)),
        g1Opt = Some(GraphAnn.blockedKnnGraph(fLvl1, 8,
          math.max(1, math.sqrt(fNl1.toDouble).toInt), 2)))
      val fBuild = (System.nanoTime() - tf) / 1e9
      val (fw, fresh) = best2(GraphAnn.probeIndex(queries, fIdx, 10,
        ef1 = 8, hops1 = 3, ef = 16, hops = hops))
      val fRecall = (brute2 & fresh).size.toDouble / brute2.size
      println(f"[graphscale] x$factor-churn live=$nLive brute=$bw2%.2fs " +
        f"churnedProbe=$cw%.2fs churnedRecall=$cRecall%.3f " +
        f"freshBuild=$fBuild%.2fs freshProbe=$fw%.2fs " +
        f"freshRecall=$fRecall%.3f")
      // COMPACTION: folds the generation chain (physical only — probe
      // results identical by contract, spec-pinned), so the probe wall
      // returns to the fresh-build shape while recall stays the churned
      // value; the recall gap to fresh is bridge-repair quality, the
      // wall gap is generation-file accumulation — two different decays,
      // two different fixes (rebuild vs compact).
      val tc = System.nanoTime()
      GraphAnn.compactIndex(spark, idx)
      val compactW = (System.nanoTime() - tc) / 1e9
      val (cw2, compacted) = best2(GraphAnn.probeIndex(queries, idx, 10,
        ef1 = 8, hops1 = 3, ef = 16, hops = hops))
      val c2Recall = (brute2 & compacted).size.toDouble / brute2.size
      println(f"[graphscale] x$factor-compact wall=$compactW%.2fs " +
        f"probe=$cw2%.2fs recall=$c2Recall%.3f " +
        f"(churned ${cw}%.2fs/${cRecall}%.3f, fresh ${fw}%.2fs)")
    }
    spark.stop()
  }
}
