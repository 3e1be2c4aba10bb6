package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data operations beyond per-document kernels
  * (SURVEY.md §7 step 9 extensions): benchmark decontamination,
  * deterministic global shuffle + sharding, stratified train/test splits,
  * corpus-frequency boilerplate analysis, and per-stratum uniform sampling.
  *
  * All randomness is a deterministic keyed hash (md5 of a seed:key string),
  * so every op is reproducible run-to-run and bit-exact reproducible by the
  * DuckDB oracle — the property a production pipeline needs anyway (a
  * re-run after a failed stage must sample the SAME docs).
  *
  * Shape at scale (the 100 TB contract):
  *  - [[decontaminate]] is an equi-join against the benchmark's distinct
  *    n-gram set keyed on 60-bit hashes; benchmark suites are tiny relative
  *    to a crawl (≤ millions of n-grams), so the set broadcasts and the
  *    training side never shuffles. With `broadcastBench=false` it degrades
  *    to a shuffle join on uniform hash keys — still skew-free.
  *  - [[shuffleShards]] / [[trainTestSplit]] / [[stratifiedSample]] are one
  *    narrow map plus (where a position/rank is required) ONE hash-partition
  *    + within-partition sort — never a global total order.
  *  - [[boilerplateNgrams]] shuffles on uniform 60-bit n-gram keys (the
  *    inverted-index shape shared with [[Dedup.ngramJaccardPairs]]); the
  *    document-frequency side aggregates map-side before the join-back.
  */
object CorpusOps {

  /** First 60 bits of an md5-hex column as a non-negative long — bit-exact
    * with the DuckDB oracle's `CAST(('0x' || substr(hex, 1, 15)) AS BIGINT)`.
    * The ONE copy of the bit-exactness-critical conversion; every shard/
    * bucket/join key below derives from it. Stays a builtin-function
    * composition so the whole expression lives inside whole-stage codegen. */
  private def h60hex(hexCol: Column): Column =
    conv(substring(hexCol, 1, 15), 16, 10).cast("long")

  /** 60-bit md5-prefix hash of a value column (≡ [[TextFeatures.h60]]). */
  private[graft] def h60c(c: Column): Column = h60hex(md5(c))

  /** Keyed deterministic unit hash: md5 over "seed:key". `concat` (not
    * concat_ws) so a NULL key propagates to a NULL hash, matching the
    * oracle's `||` semantics — corpora with NULL ids must assign ids first,
    * not silently share one key. */
  private def keyed(seed: String, key: Column): Column =
    md5(concat(lit(seed), lit(":"), key.cast("string")))

  /** Benchmark decontamination: for each training doc, the number of its
    * distinct word-3-gram shingles that appear anywhere in the benchmark
    * corpus, plus the `contaminated` verdict (n_hit >= minHits). Docs with
    * zero hits are omitted (at crawl scale that is almost every doc — the
    * output is the suspect list, not the corpus).
    *
    * Production pipelines use 8–13-gram overlap (see the WMDP/GPT-3 appendix
    * methodology); the 3-gram shingle here reuses the corpus's shared
    * shingle kernel ([[TextFeatures.shingles3]]) — the join shape is
    * identical at any n.
    *
    * Reference frames the need (training-side hygiene for the tables its
    * queries serve); this op exceeds the reference surface (SURVEY §2 notes
    * the training-pipeline pack as first-class). */
  def decontaminate(train: DataFrame, bench: DataFrame, minHits: Int,
      broadcastBench: Boolean = true): DataFrame = {
    val trainSh = Dedup.shingleSets(train)
      .select(col("doc_id"), explode(col("g")).as("s"))
      .select(col("doc_id"), h60c(col("s")).as("h"))
    val benchSh0 = Dedup.shingleSets(bench)
      .select(explode(col("g")).as("s"))
      .select(h60c(col("s")).as("h")).distinct()
    val benchSh = if (broadcastBench) broadcast(benchSh0) else benchSh0
    // per-doc shingle sets are distinct and the bench side is distinct, so
    // count(*) after the join IS the distinct-overlap count
    trainSh.join(benchSh, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"))
      .withColumn("contaminated", col("n_hit") >= minHits)
  }

  /** Deterministic global shuffle + sharding: every doc gets a pseudo-random
    * 128-bit sort key (keyed md5), a shard by 60-bit key prefix mod
    * `nShards`, and a dense position within its shard. The window is
    * hash-partitioned by shard and sorted within the partition — there is NO
    * global total-order sort; at 1000 executors each shard's order resolves
    * independently. Re-running with the same seed reproduces the exact
    * order (the resumability contract for a training-data reader). */
  /** Shared shard keying: the deterministic 128-bit sort key plus its
    * 60-bit-prefix shard, derived from `keyCol`. ONE copy —
    * [[shuffleShards]], [[packGreedy]], and [[packUnits]] must stay in
    * lock-step (the packing spec replays the fold through shuffleShards'
    * order). */
  private def withShardKey(docs: DataFrame, seed: String, nShards: Int,
      keyCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive (got $nShards)")
    docs.withColumn("skey", keyed(seed, col(keyCol)))
      .withColumn("shard", (h60hex(col("skey")) % nShards).cast("int"))
  }

  def shuffleShards(docs: DataFrame, seed: String, nShards: Int): DataFrame =
    withShardKey(docs.select(col("doc_id")), seed, nShards)
      .withColumn("pos",
        row_number().over(Window.partitionBy("shard").orderBy(col("skey"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("pos"))

  /** Stratified deterministic train/test split: assignment is a pure
    * function of (seed, doc_id) — `h60 % 1000 < testPermille` → test — so
    * the split needs no shuffle at all (narrow map; the strat column rides
    * along for reporting). Works identically at any scale and never drifts
    * when the corpus is re-partitioned or appended to: a doc's side depends
    * only on its id. */
  def trainTestSplit(docs: DataFrame, stratCol: String, testPermille: Int,
      seed: String): DataFrame = {
    require(testPermille >= 0 && testPermille <= 1000,
      s"testPermille in [0,1000] (got $testPermille)")
    docs.select(col("doc_id"), col(stratCol),
      when(h60hex(keyed(seed, col("doc_id"))) % 1000 < testPermille, "test")
        .otherwise("train").as("split"))
  }

  /** Salted document-frequency join-back shared by [[dedupLines]] and
    * [[boilerplateNgrams]] — the skew-proof shape for "attach each key's
    * corpus-wide count to every occurrence" when the defining workload is a
    * key present in EVERY document (boilerplate):
    *
    *   - hot keys = `byKey` rows whose occurrence count ≥ hotOcc —
    *     pigeonhole-bounded to ≤ total-occurrences/hotOcc rows,
    *     broadcastable by construction; detection is one broadcast tag
    *     join on the probe side and a plain column test on the build side.
    *   - hot probe rows salt by `hash(saltBy…)` over `salts` buckets; the
    *     build side replicates ONLY hot keys ×salts (cold keys salt 0), so
    *     the universal key spreads over `salts` reducers instead of one.
    *
    * Measured (tools/DedupScale): AQE's OptimizeSkewedJoin structurally
    * cannot split this join (the build side is an aggregate above its
    * shuffle stage), and the salt wins 1.94× at ×256 and grows with scale.
    * `byKey` must have one row per h with columns (h, df, occ). */
  private def saltedDfJoin(probe: DataFrame, byKey: DataFrame, hotOcc: Long,
      nSalts: Int, saltBy: Seq[Column]): DataFrame = {
    require(hotOcc >= 1, s"hotOcc must be >= 1 (got $hotOcc)")
    val salts = if (nSalts > 0) nSalts
      else probe.sparkSession.sessionState.conf.numShufflePartitions
    val hot = byKey.filter(col("occ") >= hotOcc)
      .select(col("h"), lit(true).as("__hot"))
    val probeS = probe.join(broadcast(hot), Seq("h"), "left")
      .withColumn("__salt", when(col("__hot"),
        pmod(hash(saltBy: _*), lit(salts))).otherwise(lit(0)))
      .drop("__hot")
    // the build side reads hotness off its own occ column — no join; its
    // aggregate exchange is shared with the broadcast-hot subtree via
    // ReuseExchange (identical canonical subplans)
    val buildS = byKey
      .select(col("h"), col("df"), explode(when(col("occ") >= hotOcc,
        sequence(lit(0), lit(salts - 1))).otherwise(array(lit(0)))).as("__salt"))
    probeS.join(buildS, Seq("h", "__salt")).drop("__salt")
  }

  /** Corpus-frequency boilerplate analysis: document frequency of every
    * word-3-gram shingle across the corpus, joined back per doc to yield
    * (n_g distinct shingles, n_boiler shingles with df > maxDf, ratio).
    * The RefinedWeb/C4-style signal: docs dominated by corpus-frequent
    * n-grams are templates/boilerplate.
    *
    * Scale shape (r14): the r7 window formulation (`count over
    * partitionBy(h)`) made a universal shingle's window partition the
    * WHOLE corpus — WindowExec BUFFERS each partition, so a navigation
    * shingle in every doc means one task holding ndocs rows; at real
    * cluster partition counts that is a straggler, past memory it is a
    * death. The r14 shape exploits what the op actually needs:
    *
    *   - `n_g` is a plain per-doc count — df-independent.
    *   - `n_boiler` only needs the keys with df > maxDf, and THAT set is
    *     small by definition (≤ total-pairs/maxDf — boilerplate is the
    *     rare head, the long tail never crosses maxDf). So: df via
    *     `groupBy(h).count` (per-doc-distinct rows make plain count ==
    *     count-distinct; map-side partial agg bounds the hot key to one
    *     row per partition), filter to the boiler keys, BROADCAST them,
    *     and both outputs come from ONE narrow lookup + ONE groupBy(doc).
    *     No window, no skewed join, no giant buffered partition.
    *
    * With `broadcastBoiler=false` (a corpus/maxDf combination whose boiler
    * key set outgrows a broadcast) the lookup becomes the [[saltedDfJoin]]
    * shuffle join — skew-proof for the same reason [[dedupLines]] is.
    * Results are identical (spec-pinned). */
  def boilerplateNgrams(docs: DataFrame, maxDf: Long,
      broadcastBoiler: Boolean = true, hotOcc: Long = 1000000L,
      nSalts: Int = 0): DataFrame = {
    val sh = Dedup.shingleSets(docs)
      .select(col("doc_id"), explode(col("g")).as("s"))
      .select(col("doc_id"), h60c(col("s")).as("h"))
    // per-doc sets are distinct → the row count per h IS the document
    // frequency (and the occurrence count — one per doc)
    val dfByH = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val flagged =
      if (broadcastBoiler) {
        val boiler = dfByH.filter(col("df") > maxDf).select(col("h"))
        sh.join(broadcast(boiler).withColumn("__b", lit(1L)), Seq("h"), "left")
          .withColumn("__boiler", coalesce(col("__b"), lit(0L)))
      } else {
        saltedDfJoin(sh, dfByH.withColumn("occ", col("df")), hotOcc, nSalts,
            Seq(col("doc_id")))
          .withColumn("__boiler", when(col("df") > maxDf, 1L).otherwise(0L))
      }
    flagged.groupBy("doc_id")
      .agg(count(lit(1)).as("n_g"), sum(col("__boiler")).as("n_boiler"))
      .withColumn("boiler_ratio",
        round(col("n_boiler").cast("double") / col("n_g"), 6))
  }

  /** Line-level exact dedup that REWRITES documents (FineWeb/Dolma
    * paragraph dedup): drop every line whose corpus-wide document frequency
    * exceeds `maxDf` (navigation chrome, subscribe boxes, license blurbs —
    * the text that repeats across a crawl), reassemble the survivors in
    * original order. [[boilerplateNgrams]] *scores* documents; this
    * produces the cleaned text.
    *
    * Scale shape — this op's DEFINING workload is a line present in every
    * document (navigation chrome), so both the aggregate and the join-back
    * are built skew-proof rather than left to AQE (measured in r14: AQE's
    * OptimizeSkewedJoin cannot split this join — the build side is an
    * aggregate above its shuffle stage, not a bare shuffle, so the skewed
    * probe partition has no map-output subsets to pair against;
    * `tools/DedupScale` demonstrates no `skew=true` ever appears):
    *
    *   1. df aggregate: a two-stage pre-group on `(h, doc_id)` — the pair
    *      shuffle is uniform because doc_id spreads a hot h — then a
    *      partial-agg-bounded count per h. (A bare `countDistinct` plans
    *      its exchange on `h` alone, so the universal key would pile the
    *      whole corpus's distinct pairs into ONE reducer.) The occurrence
    *      count `occ` falls out of the same pass for free.
    *   2. hot-key detection: keys with `occ >= hotOcc` — pigeonhole-bounded
    *      to ≤ total-occurrences/hotOcc rows, broadcastable by
    *      construction (at 10^12 corpus lines and the 10^6 default, ≤10^6
    *      key rows ≈ 16 MB).
    *   3. salted join-back: hot probe rows salt by `hash(doc_id, pos)`
    *      over nSalts buckets; the build side replicates ONLY hot keys
    *      ×nSalts (cold keys salt 0) — the universal line spreads over
    *      nSalts reducers instead of one, at the cost of a few thousand
    *      replicated build rows.
    *
    * Deliberately NOT the window-count formulation boilerplateNgrams uses:
    * a line shared by EVERY document makes that window's partition the
    * whole corpus — a spilled giant sort. Reassembly is a per-doc
    * `collect_list(struct(pos, line))` bounded by document size. */
  def dedupLines(docs: DataFrame, maxDf: Long,
      textCol: String = "text", hotOcc: Long = 1000000L,
      nSalts: Int = 0): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("h", h60c(col("line")))
    val dfByH = lines.groupBy("h", "doc_id").agg(count(lit(1)).as("c"))
      .groupBy("h").agg(count(lit(1)).as("df"), sum("c").as("occ"))
    saltedDfJoin(lines, dfByH, hotOcc, nSalts, Seq(col("doc_id"), col("pos")))
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("df") <= maxDf,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("clean_text"),
        sum(when(col("df") <= maxDf, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("df") > maxDf, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** Deterministic weighted domain mixing: keep each doc with probability
    * `weights(keyCol)` (else `defaultWeight`) via the keyed-hash threshold —
    * the Bernoulli thinning step of a mixture schedule (down-weighting
    * over-represented domains before training). Zero shuffle: a narrow
    * filter whose verdict is a pure function of (seed, doc_id, key), so the
    * mix is append-stable and rerun-stable like [[trainTestSplit]].
    * Thresholds are integerized to parts-per-million in Scala so the engine
    * and the oracle compare against the SAME integer literal — no float
    * boundary can disagree. */
  def weightedMix(docs: DataFrame, keyCol: String, weights: Map[String, Double],
      defaultWeight: Double, seed: String): DataFrame = {
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 0.0 && w <= 1.0, s"weights must be in [0,1] (got $w)"))
    val thCol = weights.foldLeft(lit(math.round(defaultWeight * 1000000)): Column) {
      case (acc, (k, w)) => when(col(keyCol) === k, lit(math.round(w * 1000000)))
        .otherwise(acc)
    }
    docs.filter(h60hex(keyed(seed, col("doc_id"))) % 1000000 < thCol)
  }

  /** TEMPERATURE-SCALED MIXING at α = 0.5 (the XLM-R/mT5 multilingual
    * sampling rule, p_s ∝ n_s^α) realized as pure Bernoulli thinning:
    * keep rate keep_s = sqrt(n_min / n_s), so the smallest stratum is the
    * binding one at 1.0 and every larger stratum thins toward the
    * tempered share — the standard low-resource up-weighting without
    * replication. α is FIXED at 1/2 because sqrt is a single correctly-
    * rounded IEEE op on the exact count ratio (engine and oracle agree
    * bit-for-bit before the ppm rounding); a general pow(x, α) is not
    * cross-engine-reproducible and would break the [[weightedMix]]
    * integer-threshold discipline this reuses.
    *
    * Scale shape: one count agg bounded by |strata| (collected — the
    * weights ARE driver state by design, like every mixture schedule),
    * then the zero-shuffle keyed-hash filter; `keep_ppm` rides along so
    * the schedule itself is value-checked, not just its survivors. */
  def temperatureMixSqrt(docs: DataFrame, keyCol: String,
      seed: String): DataFrame = {
    val spark = docs.sparkSession
    val counted = docs.groupBy(keyCol).agg(count(lit(1)).as("n"))
    val rows = counted.collect()
    require(rows.nonEmpty, "temperatureMixSqrt: empty corpus")
    require(rows.forall(!_.isNullAt(0)),
      s"temperatureMixSqrt: NULL $keyCol stratum — assign strata first")
    val nMin = rows.map(_.getLong(1)).min
    // The (stratum, keep_ppm) schedule rides back as a TINY broadcast frame
    // joined on the NATIVELY-TYPED stratum value: a when()-chain comparing
    // col(keyCol) === key.toString would silently send any stratum whose
    // value doesn't round-trip through a cast-from-string (timestamps,
    // decimals) to the 0-ppm default — dropping the stratum with no error —
    // and its expression tree grows O(|strata|) deep (a real planning cost
    // at thousands of strata). The join is depth-O(1), type-exact, and an
    // INNER join by construction covers every doc row (each stratum value
    // present in `docs` is present in its own count row).
    val rateRows = rows.map { r => org.apache.spark.sql.Row(r.get(0),
      math.round(math.sqrt(nMin.toDouble / r.getLong(1).toDouble) * 1000000.0)) }
    val rateSchema = org.apache.spark.sql.types.StructType(Seq(
      counted.schema.head.copy(name = keyCol),
      org.apache.spark.sql.types.StructField("keep_ppm",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rates = spark.createDataFrame(
      java.util.Arrays.asList(rateRows: _*), rateSchema)
    docs.join(broadcast(rates), Seq(keyCol))
      .filter(h60hex(keyed(seed, col("doc_id"))) % 1000000 < col("keep_ppm"))
  }

  /** C4/Dolma-style PII redaction: structured identifiers (emails, IPv4
    * addresses, 13–16-digit card-like numbers) are counted and replaced
    * with type tags in one pass of codegen'd `regexp_*` expressions — no
    * UDF, no kernel pass, narrow and shuffle-free (the projection fuses
    * into whatever scan or transform precedes it).
    *
    * The patterns deliberately use the Java∩RE2 common subset (character
    * classes, bounded repetition, `\b`) so the DuckDB oracle runs the SAME
    * pattern text; counts are taken on the raw text BEFORE replacement,
    * and replacements apply email → ip → card (card's `\d{13,16}` cannot
    * match inside an IP's ≤3-digit octets, and the tags themselves contain
    * no digits, so the order only matters for emails whose local part could
    * otherwise be eaten by the card pattern).
    */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val card = "\\b\\d{13,16}\\b"
    val t = col(textCol)
    docs.withColumn("n_emails", size(regexp_extract_all(t, lit(email), lit(0))).cast("long"))
      .withColumn("n_ips", size(regexp_extract_all(t, lit(ip), lit(0))).cast("long"))
      .withColumn("n_cards", size(regexp_extract_all(t, lit(card), lit(0))).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(regexp_replace(t,
          email, "<EMAIL>"), ip, "<IP>"), card, "<CARD>"))
  }

  /** Deterministic per-stratum uniform sample: the `k` docs with the
    * smallest keyed hash within each `keyCol` value (rank carried as `rk`).
    * Equivalent to a seeded uniform draw of k per stratum, but reproducible
    * and oracle-checkable. One hash-partition by stratum + per-partition
    * sort; a hot stratum sorts within its own partition only (and Spark's
    * rank-based top-k stays bounded per partition). */
  def stratifiedSample(docs: DataFrame, keyCol: String, k: Int,
      seed: String): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    docs.select(col(keyCol), col("doc_id"),
        keyed(seed, col("doc_id")).as("skey"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(keyCol).orderBy(col("skey"), col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col(keyCol), col("doc_id"), col("rk"))
  }

  /** Greedy sequence packing: assign docs to fixed-capacity token bins
    * (training context windows) by the first-fit-in-order rule — walk each
    * shard in its deterministic [[shuffleShards]] order and start a new bin
    * whenever the next doc would overflow `capacity`. A doc longer than
    * `capacity` gets a bin to itself (pre-chunk long docs with
    * [[TextAnalysis.chunkWindows]] if that matters). The classic pretraining
    * example-packing step, made reproducible: bin membership is a pure
    * function of (seed, corpus), so a resumed packing job rebuilds identical
    * bins.
    *
    * Scale shape: token counts come from a codegen'd `size(split(..))` (no
    * kernel pass), sharding is the keyed-hash map, and the only shuffle is
    * ONE hash repartition by shard + within-partition sort — the sequential
    * fold then runs per shard with O(1) state (current bin + fill). There is
    * no global order and no driver state; parallelism = `nShards`, which at
    * crawl scale is set to O(10⁴–10⁵) so each shard's chain stays short.
    * The fold itself must be sequential per shard — that is the operator's
    * semantics (each bin depends on every earlier doc in the shard), not an
    * implementation shortcut. */
  def packGreedy(docs: DataFrame, seed: String, nShards: Int,
      capacity: Long): DataFrame =
    packUnits(
      docs.select(col("doc_id").cast("string").as("unit_id"),
        size(split(col("text"), " ", -1)).cast("long").as("ntok")),
      seed, nShards, capacity)
      .select(col("unit_id").cast("long").as("doc_id"), col("shard"),
        col("bin"), col("n_tok"))

  /** [[packGreedy]] generalized to pre-tokenized units (`unit_id` string,
    * `ntok`) — the form the chunk→pack composition needs, where a unit is a
    * document WINDOW rather than a document. Same fold, same determinism
    * contract keyed on the unit id. */
  def packUnits(units: DataFrame, seed: String, nShards: Int,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive (got $capacity)")
    val spark = units.sparkSession
    import spark.implicits._
    withShardKey(units.select(col("unit_id"), col("ntok")), seed, nShards,
        keyCol = "unit_id")
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "skey", "unit_id")
      .select(col("unit_id"), col("shard"), col("ntok"))
      .as[(String, Int, Long)]
      .mapPartitions { it =>
        // shards are hashed into partitions (several shards may share one);
        // the sort is (shard, skey, unit_id), so state resets on shard change
        var curShard = Int.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (unitId, shard, ntok) =>
          if (shard != curShard) { curShard = shard; bin = 0L; fill = 0L }
          if (fill > 0L && fill + ntok > capacity) { bin += 1L; fill = ntok }
          else fill += ntok
          (unitId, shard, bin, ntok)
        }
      }
      .toDF("unit_id", "shard", "bin", "n_tok")
  }

  /** T5-STYLE SPAN CORRUPTION — the (input, target) pair generator of
    * span-denoising pretraining (T5/UL2), re-expressed with the pack's
    * keyed-hash determinism so the SAME corrupted pairs come out of every
    * engine and every run: a token at position p STARTS a masked span when
    * `md5("<seed>:s:<doc>:<p>") % 1000 < startPermille`, the span covers
    * `1 + md5("<seed>:l:<doc>:<p>") % maxSpan` tokens, overlapping spans
    * MERGE (distinct covered positions → contiguity islands), and the
    * k-th island (by position) becomes the `<extra_id_k>` sentinel: the
    * input keeps unmasked tokens with one sentinel where each island was;
    * the target lists each sentinel followed by its masked tokens.
    *
    * Expected mask rate ≈ startPermille/1000 × (maxSpan+1)/2 before
    * overlap merging (the T5 defaults ~15% at startPermille=100,
    * maxSpan=2 ≈ mean 1.5... tune per corpus).
    *
    * Scale shape: every draw is a pure function of (seed, doc, pos) — no
    * shuffle decides anything; the only shuffles are the per-doc
    * reassembly aggs (`array_sort(collect_list(struct))`, bounded by
    * document length — the [[dedupLines]] contract) and the doc-bounded
    * island window. Positions follow the raw single-space split
    * convention (empties dropped after assignment). */
  def spanCorrupt(docs: DataFrame, seed: String, startPermille: Int = 100,
      maxSpan: Int = 3, textCol: String = "text"): DataFrame = {
    require(startPermille >= 1 && startPermille <= 999,
      s"startPermille must be in [1, 999] (got $startPermille)")
    require(maxSpan >= 1, s"maxSpan must be >= 1 (got $maxSpan)")
    val tok = docs.select(col("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
    val key = concat(col("doc_id").cast("string"), lit(":"),
      col("pos").cast("string"))
    val starts = tok
      .filter(h60hex(keyed(s"$seed:s", key)) % 1000 < startPermille)
      .withColumn("len",
        lit(1) + pmod(h60hex(keyed(s"$seed:l", key)), lit(maxSpan)))
    val cov = starts.select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + col("len") - 1)).as("pos"))
      .distinct()
    // masked tokens = covered positions that actually hold a token (spans
    // running past the doc end cover nothing there)
    val mtok = tok.join(cov, Seq("doc_id", "pos"), "left_semi")
    val isl = mtok.withColumn("isl",
      col("pos") - row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")))
    val islands = isl.groupBy("doc_id", "isl")
      .agg(min("pos").as("mpos"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("term")))),
          x => x.getField("term")), " ").as("toks"),
        count(lit(1)).as("ntok"))
      .withColumn("sent", row_number().over(
        Window.partitionBy("doc_id").orderBy("mpos")) - 1)
    val unmasked = tok.join(cov, Seq("doc_id", "pos"), "left_anti")
    val inputToks = unmasked.select(col("doc_id"), col("pos"), col("term"))
      .unionByName(islands.select(col("doc_id"), col("mpos").as("pos"),
        concat(lit("<extra_id_"), col("sent"), lit(">")).as("term")))
    val input = inputToks.groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("term")))),
        x => x.getField("term")), " ").as("input_text"))
    val target = islands.groupBy("doc_id")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("mpos"),
            concat(lit("<extra_id_"), col("sent"), lit("> "), col("toks"))
              .as("t")))),
          x => x.getField("t")), " ").as("target_text"),
        count(lit(1)).as("n_spans"),
        sum("ntok").as("n_masked"))
    docs.select(col("doc_id"))
      .join(input, Seq("doc_id"), "left")
      .join(target, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("input_text"), lit("")).as("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"))
  }
}
