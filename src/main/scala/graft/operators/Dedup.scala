package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextFeatures._

/** Deduplication operators for the training-data pipeline (SURVEY.md §7 step
  * 9). Four families: exact (content hash), MinHash+LSH (set similarity),
  * SimHash (bitwise similarity), and exact n-gram Jaccard within a blocking
  * key.
  *
  * Shape at scale:
  *  - exact dedup is one hash-shuffle groupBy — the canonical map-side-
  *    combine aggregation, no skew (md5 keys are uniform);
  *  - per-doc signatures (shingles / minhash bands / simhash) are computed in
  *    ONE compiled `mapPartitions` pass per corpus scan ([[TextFeatures]]) —
  *    a narrow stage, no shuffle, no driver involvement;
  *  - MinHash LSH materializes (doc, band, bucket) tuples (nBands rows/doc)
  *    and self-joins on the bucket key — the join shuffles on uniformly
  *    distributed 64-bit bucket keys, so it scales linearly and never
  *    broadcasts the corpus; exact verification touches only candidate pairs;
  *  - SimHash blocked variant turns all-pairs into an equi-join on 15-bit
  *    sub-signatures (pigeonhole exact for hamming ≤ 3).
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct content hash with the
    * canonical (min) doc id and the group size. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_dups"))

  /** doc_id + materialized distinct-shingle set column `g` (one compiled map
    * pass; hard optimizer boundary — see [[TextFeatures]]). */
  private[graft] def shingleSets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, shingles3(words(t))) })
      .toDF("doc_id", "g")
  }

  /** Candidate near-dup pairs from MinHash LSH banding, verified with exact
    * shingle Jaccard; returns pairs with jaccard >= `threshold`.
    * With r rows/band and b bands, a pair of true similarity s is missed
    * with probability (1-s^r)^b — r=4, b=32, s=0.8 → ~5e-8, so the output
    * equals the full O(n^2) pairwise result the oracle computes. */
  /** `maxBucketSize`: drop LSH buckets holding more than this many docs
    * before pairing. A bucket of b docs emits b² /2 candidate pairs, so a
    * duplication bomb (a page mirrored thousands of times — routine in web
    * crawls) turns one bucket into millions of pairs. Capped buckets are
    * overwhelmingly exact-duplicate clusters, which the cheaper exact
    * (hash-groupBy) dedup pass already collapses; production pipelines cap
    * for the same reason. Default None = exact LSH semantics (the q41
    * oracle equality). */
  def minhashNearDupPairs(docs: DataFrame, nPerm: Int = 128, nBands: Int = 32,
      threshold: Double = 0.8, maxBucketSize: Option[Int] = None): DataFrame = {
    require(nBands >= 1 && nPerm >= nBands && nPerm % nBands == 0,
      s"need nPerm a positive multiple of nBands (got nPerm=$nPerm, " +
        s"nBands=$nBands) — rows-per-band r=0 would make every band hash " +
        "constant and the bucket join all-pairs")
    val r = nPerm / nBands
    val spark = docs.sparkSession
    import spark.implicits._
    val sets = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val g = shingles3(words(t))
        (id, g, bandHashes(minhashSig(g, nPerm), nBands, r))
      })
      .toDF("doc_id", "g", "bands")
    val allBuckets = sets.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    val buckets = maxBucketSize match {
      case None => allBuckets
      case Some(cap) =>
        // one aggregation over the bucket keys; hot buckets are dropped
        // before the self-join can square them
        val small = allBuckets.groupBy("band", "bh").count()
          .filter(col("count") <= cap).select(col("band"), col("bh"))
        allBuckets.join(small, Seq("band", "bh"), "left_semi")
    }
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    // the verification side needs ONLY the shingle sets: projecting `g` out
    // of `sets` cannot column-prune inside the typed mapPartitions, so it
    // would re-run the full minhash+banding lambda (nPerm splitmix rounds
    // per shingle) once per verify join — recompute just the shingles
    val gs = shingleSets(docs)
    val verified = cand
      .join(gs.select(col("doc_id").as("d1"), col("g").as("g1")), "d1")
      .join(gs.select(col("doc_id").as("d2"), col("g").as("g2")), "d2")
      .withColumn("inter", size(array_intersect(col("g1"), col("g2"))))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("g1")) + size(col("g2")) - col("inter")).cast("double"))
      .filter(col("jac") >= threshold)
    verified.select(col("d1"), col("d2"), round(col("jac"), 6).as("jac"))
  }

  /** Exact n-gram Jaccard between all doc pairs sharing a blocking key, as
    * an inverted-index set-similarity join: explode distinct shingle hashes,
    * equi-join on (block, shingle), count co-occurrences per pair =
    * |intersection|. Work is Σ_pairs |g1 ∩ g2| instead of Σ_pairs
    * (|g1|+|g2|), and it distributes by *shingle*, not by block — a
    * low-cardinality blocking key no longer serializes the job (measured
    * 42.7s → array-carrying block join vs inverted index at sf0.1). Pairs
    * with empty intersections never materialize; they cannot pass a
    * positive `minJaccard` anyway. AQE splits skewed (hot-shingle) keys. */
  def ngramJaccardPairs(docs: DataFrame, blockCol: String,
      minJaccard: Double): DataFrame = {
    require(minJaccard > 0.0, "inverted index cannot emit zero-overlap pairs")
    val spark = docs.sparkSession
    import spark.implicits._
    val tokens = docs.select(col("doc_id"), col(blockCol).cast("string"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.flatMap { case (id, blk, t) =>
        val g = shingles3(words(t))
        g.iterator.map(s => (id, blk, g.length, shingleHash64(s)))
      })
      .toDF("doc_id", "blk", "n", "h")
    tokens.as("a").join(tokens.as("b"),
        col("a.blk") === col("b.blk") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jac", col("inter").cast("double") /
        (col("n1") + col("n2") - col("inter")).cast("double"))
      .filter(col("jac") >= minJaccard)
      .select(col("d1"), col("d2"), round(col("jac"), 6).as("jac"))
  }

  /** Connected components over an undirected pair list (d1, d2) —
    * label-propagation to fixpoint: every vertex takes the minimum label in
    * its neighborhood until nothing changes. The canonical-document
    * selection step of a dedup pipeline (each near-dup cluster keeps
    * min(doc_id)).
    *
    * Scale shape: one shuffle per iteration on the vertex id; iterations =
    * graph diameter (near-dup clusters are small, so a handful);
    * `localCheckpoint` truncates the lineage each round so plans don't grow
    * with iteration count — the standard iterative-Spark contract. The
    * per-iteration driver sync is one aggregate (changed-count), not data.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2"), col("d1")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // candidate label for each vertex = min(own, neighbors' labels)
      val next = edges
        .join(labels.withColumnRenamed("id", "dst_id"),
          col("dst") === col("dst_id"))
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("nbr_comp"))
        .join(labels, "id")
        .select(col("id"),
          least(col("comp"), col("nbr_comp")).as("comp"),
          (col("nbr_comp") < col("comp")).cast("long").as("chg"))
        .localCheckpoint()
      // sum over zero rows is NULL (empty edge list → empty `next`)
      changed = Option(next.agg(sum("chg")).head().get(0))
        .fold(0L)(_.asInstanceOf[Long])
      // the superseded generation's checkpoint blocks are dead the moment
      // `next` is materialized (localCheckpoint is eager) — drop them so
      // storage stays bounded at two generations instead of growing with
      // iteration count. Dataset.unpersist can't do this (checkpoint blocks
      // live on the internal RDD, not in the CacheManager), so unpersist the
      // LogicalRDD leaf directly; `edges`' own leaf is not reachable from
      // labels' plan once labels is checkpointed, so it stays persisted.
      labels.queryExecution.analyzed.collectLeaves().foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
      labels = next.select("id", "comp")
      iter += 1
    }
    if (changed > 0) {
      // non-convergence must not pass silently: labels are still usable
      // (they over-segment, never merge wrongly) but downstream canonical-
      // doc selection would split components — surface it.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents stopped at maxIter=$maxIter with $changed " +
          "labels still changing; components may be over-segmented")
    }
    labels.select(col("id").as("doc_id"), col("comp"))
  }

  /** doc_id + 60-bit simhash signature (one compiled map pass). */
  private[operators] def simhashSigs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, simhash60(words(t))) })
      .toDF("doc_id", "sig")
  }

  /** SimHash near-dup pairs: signatures differing in ≤ maxHamming of 60
    * bits. All-pairs variant (oracle-checkable at test scale). */
  def simhashPairsAll(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = simhashSigs(docs)
    sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("int").as("ham"))
      .filter(col("ham") <= maxHamming)
  }

  /** Scale path: block SimHash comparison on `maxHamming + 1` disjoint
    * sub-signatures of the 60-bit signature — by pigeonhole, a pair within
    * hamming ≤ maxHamming differs in at most maxHamming blocks, so it agrees
    * on at least one, and every true pair surfaces from an equi-join on
    * (block index, block value) instead of all pairs. Exact recall at any
    * maxHamming ≤ 59; candidates per doc stay proportional to near-duplicate
    * density, so the join shuffles on uniform block-value keys and scales
    * linearly (the all-pairs variant is O(n²) and exists only as the
    * test-scale oracle cross-check, [[simhashPairsAll]]). */
  def simhashPairsBlocked(docs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 60, "need 1..60 blocks over 60 bits")
    val nBlocks = maxHamming + 1
    val base = 60 / nBlocks
    val rem = 60 % nBlocks
    // block i covers width(i) = base (+1 for the first `rem` blocks) bits
    val offsets = (0 until nBlocks).scanLeft(0)((off, i) =>
      off + base + (if (i < rem) 1 else 0))
    val blockVals = array((0 until nBlocks).map { i =>
      val width = base + (if (i < rem) 1 else 0)
      shiftright(col("sig"), offsets(i)) % (1L << width)
    }: _*)
    val sigs = simhashSigs(docs)
    val blocks = sigs.select(col("doc_id"), col("sig"),
      posexplode(blockVals).as(Seq("blk", "bv")))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("int").as("ham"))
      .filter(col("ham") <= maxHamming)
      .distinct()
  }
}
