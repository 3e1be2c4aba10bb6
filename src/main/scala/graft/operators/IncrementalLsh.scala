package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextFeatures.{bandHashes, minhashSig, shingles3, words}

/** Incrementally-maintained MinHash-LSH near-duplicate index — the
  * PRODUCTION form of [[Dedup.minhashNearDupPairs]]: a crawl ingests
  * batches forever, and re-running LSH over the whole corpus per batch is
  * O(corpus) work for O(batch) new information. Here the bucket postings
  * `(band, bucket, doc_id)` and the shingle store `(doc_id, g)` persist
  * as parquet between batches; ingesting a batch
  *
  *  1. computes the NEW docs' signatures/bands once (map-only pass),
  *  2. probes the EXISTING index with a bucket equi-join (touches only
  *     the buckets the new docs hash into — never a corpus scan),
  *  3. adds new-vs-new candidates from a within-batch self-join,
  *  4. verifies candidates with exact shingle Jaccard, fetching old
  *     shingle sets BY ID from the store (semi-join prune, candidate
  *     ids only),
  *  5. appends the new postings + shingles to the index.
  *
  * Work per batch is O(batch × bucket hits + candidates), independent of
  * corpus size. Because banding is deterministic per doc, the UNION of
  * per-batch outputs over any ingest order equals the one-shot
  * full-corpus LSH result exactly — a pair is discovered precisely when
  * its later member arrives (spec-pinned, and the q249 oracle is the
  * full all-pairs Jaccard join). At 100 TB, bucket postings are narrow
  * 64-bit keys (bucket/sort the parquet by `bh` to make the probe a
  * co-located join) and the shingle store is the only wide table, read
  * per batch only at candidate ids.
  *
  * The reference has no incremental analog (its closest shape is a full
  * `INSERT OVERWRITE` recompute per load); composition with
  * [[TxnMergeOnRead.insertBatch]] turns the appends exactly-once under
  * at-least-once delivery (the q209/q238 discipline).
  */
object IncrementalLsh {

  /** Drop any existing index state. */
  def init(spark: SparkSession, indexDir: String): Unit = {
    val p = new Path(indexDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(p, true)
    ()
  }

  private def readIf(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) Some(spark.read.parquet(path)) else None
  }

  /** Ingest `batch` (`doc_id`, `text`), return the VERIFIED near-dup
    * pairs `(d1, d2, jac)` this batch surfaces (pairs with at least one
    * member in the batch; `d1 < d2`, jaccard ≥ `threshold`). */
  def ingest(spark: SparkSession, indexDir: String, batch: DataFrame,
      nPerm: Int = 128, nBands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    require(nBands >= 1 && nPerm >= nBands && nPerm % nBands == 0,
      "nPerm must be a positive multiple of nBands")
    val r = nPerm / nBands
    import spark.implicits._
    // one compiled pass: shingles + signature + band keys per new doc
    val staged = batch.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        val g = shingles3(words(t))
        (id, g, bandHashes(minhashSig(g, nPerm), nBands, r))
      })
      .toDF("doc_id", "g", "bands")
      .localCheckpoint() // the lambda runs once; probe/verify/append reuse it
    val newPost = staged.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    val newSh = staged.select(col("doc_id"), col("g"))
    // candidates: new-vs-OLD via the index probe, new-vs-NEW within batch
    val oldPairs = readIf(spark, s"$indexDir/buckets").map { oldPost =>
      newPost.as("x").join(oldPost.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("d1"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("d2"))
        .filter(col("d1") =!= col("d2"))
    }
    val newPairs = newPost.as("x").join(newPost.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
    val cand = oldPairs.fold(newPairs)(newPairs.unionByName(_)).distinct()
    // exact verify: shingles for candidate ids only (old store ∪ batch)
    val gs = readIf(spark, s"$indexDir/shingles")
      .fold(newSh)(old => newSh.unionByName(old))
    val verified = cand
      .join(gs.select(col("doc_id").as("d1"), col("g").as("g1")), "d1")
      .join(gs.select(col("doc_id").as("d2"), col("g").as("g2")), "d2")
      .withColumn("inter", size(array_intersect(col("g1"), col("g2"))))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("g1")) + size(col("g2")) - col("inter")).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"), round(col("jac"), 6).as("jac"))
      .localCheckpoint() // materialize BEFORE the index append mutates state
    newPost.write.mode("append").parquet(s"$indexDir/buckets")
    newSh.write.mode("append").parquet(s"$indexDir/shingles")
    verified
  }
}
