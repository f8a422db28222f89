package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.{TextFunctions => T}
import graft.functions.expressions.GraftExpressions.{minhashSig, shingleHashes}
import graft.operators.Dedup
import graft.state.KeyedStore

/** Incremental NEAR-duplicate dedup against all history — the
  * MinHash-LSH companion of [[IncrementalDedup]]'s exact-fingerprint
  * form: each micro-batch is near-dup-deduplicated within itself
  * (first-wins by (ts, id)), then against a durable band-bucket store,
  * and only novel documents flow on; their band keys upsert so the
  * next batch — or a restarted pipeline — rejects their near-copies.
  *
  * Why a store and not a full-corpus re-run? q28's batch form re-LSHes
  * the whole corpus per refresh; at 100 TB the common operation is
  * "dedup TODAY's crawl against everything ever admitted", which must
  * cost O(|batch|), not O(|corpus|). The store is a [[KeyedStore]]
  * keyed on (band, key) — the LSH bucket identity — whose row carries
  * the bucket's members as (doc_id, shingle-set) structs, so the exact
  * Jaccard verify runs directly on the probe result: no second lookup,
  * no scan of stored documents. [[KeyedStore.probe]] prunes the read
  * to the bucket directories the batch's own band keys hash into, so
  * per-batch cost is O(|batch| × bands + touched buckets) against a
  * store of any size.
  *
  * Scale guards, mirroring the batch family:
  *   - a bucket's member list is capped at `maxBucket` (kept = the
  *     lowest doc_ids). A saturated bucket still verifies candidates
  *     against its kept members; what it gives up is detecting dups of
  *     members it evicted — the same recall-for-boundedness trade as
  *     `maxDf` in [[Dedup.jaccardPairs]], and at 16-bands-of-4 a pair
  *     missing in one saturated bucket still collides in any other
  *     shared band.
  *   - member shingle sets ride the store row (≤ bands copies of each
  *     admitted doc's set) — the classical postings-with-payload trade
  *     that buys verify-without-fetch.
  *
  * Replay idempotency (at-least-once foreachBatch): admitted docs are
  * recognized on replay — a stored member with the batch doc's own id
  * is skipped as a self-match, so the replayed batch re-emits exactly
  * its original novel rows, and the member-merge dedups by doc_id so
  * the re-upsert converges to the same member sets. Within a batch,
  * duplicate ids collapse to the minimum (ts, id) row first, so
  * duplicated delivery upstream cannot double-admit.
  *
  * In-batch semantics are the conservative LSH-dedup convention: a doc
  * near-dup of ANY earlier (ts, id) batch doc is dropped, even if that
  * earlier doc was itself dropped (transitive chains over-drop, like
  * every keep-min resolution). Documents too short to shingle (< 3
  * words) can't near-dup — they pass through unexamined and never
  * enter the store.
  */
object IncrementalNearDedup {

  /** One batch step (the foreachBatch body, callable in batch jobs
    * too): returns the novel rows of `batch` and upserts their band
    * keys + shingle sets. `batch`: (id, text, ts, …). */
  def dedupBatch(batch: DataFrame, idCol: String, textCol: String,
      tsCol: String, storePath: String, threshold: Double = 0.5,
      k: Int = 64, bandRows: Int = 4, maxBucket: Int = 64,
      numBuckets: Int = KeyedStore.DefaultBuckets): DataFrame = {
    val spark = batch.sparkSession
    require(k % bandRows == 0, s"bandRows $bandRows must divide k $k")
    val nBands = k / bandRows
    // at-least-once upstream can duplicate ids WITHIN a batch: exact
    // first-wins per id before any similarity work
    val docs = batch
      .groupBy(col(idCol))
      .agg(min_by(struct(batch.columns.map(col): _*),
        struct(col(tsCol), col(idCol))).as("r"))
      .select(col("r.*"))
      .localCheckpoint(eager = true)
    val shingled = docs
      .select(col(idCol).as("doc_id"),
        shingleHashes(T.words(col(textCol)), 3).as("shs"))
      .filter(size(col("shs")) > 0)
    val sigs = shingled
      .select(col("doc_id"), col("shs"), minhashSig(col("shs"), k).as("sig"))
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until bandRows).map(r => col("sig").getItem(b * bandRows + r)): _*)
          .as("key"))
    }
    // band rows feed the probe, the candidate join and the upsert: pin
    val bk = sigs
      .select(col("doc_id"), col("shs"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("shs"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .localCheckpoint(eager = true)

    val hasStore = KeyedStore.isInitialized(spark, storePath)
    // bucket-pruned probe: only the band buckets THIS batch hashes into
    // are read — never the store at large
    val hits =
      if (hasStore)
        KeyedStore.probe(bk.select("band", "key"), Seq("band", "key"),
          storePath, numBuckets).localCheckpoint(eager = true)
      else null

    // near-dups of history: collide on a stored bucket, then EXACT
    // Jaccard against only the collided members (self-matches are the
    // replayed-batch case — skipped, see the idempotency note)
    val histDups =
      if (!hasStore) spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
      else bk.join(hits, Seq("band", "key"))
        .select(col("doc_id"), col("shs"), explode(col("members")).as("m"))
        .select(col("doc_id"), col("shs"),
          col("m.doc_id").as("old_id"), col("m.shs").as("old_shs"))
        .filter(col("old_id") =!= col("doc_id"))
        .dropDuplicates("doc_id", "old_id")
        .withColumn("inter",
          size(array_intersect(col("shs"), col("old_shs"))).cast("double"))
        .withColumn("uni",
          (size(col("shs")) + size(col("old_shs"))).cast("double") - col("inter"))
        .filter(col("inter") / col("uni") >= threshold)
        .select("doc_id").distinct()

    // in-batch near-dups: the batch LSH (same family), first-wins on
    // (ts, id) — X drops iff similar to any earlier Y
    val ord = docs.select(col(idCol).as("doc_id"),
      struct(col(tsCol), col(idCol)).as("o"))
    val pairs = Dedup.minhashLshPairs(shingled, threshold, k, bandRows)
    val sym = pairs.select(col("doc_a").as("x"), col("doc_b").as("y"))
      .unionAll(pairs.select(col("doc_b").as("x"), col("doc_a").as("y")))
    val losers = sym
      .join(ord.select(col("doc_id").as("x"), col("o").as("ox")), Seq("x"))
      .join(ord.select(col("doc_id").as("y"), col("o").as("oy")), Seq("y"))
      .filter(col("oy") < col("ox"))
      .select(col("x").as("doc_id")).distinct()

    val dropIds = histDups.unionAll(losers).distinct()
      .withColumnRenamed("doc_id", idCol)
    val novel = docs.join(dropIds, Seq(idCol), "left_anti")
      .localCheckpoint(eager = true)

    // upsert the admitted docs' band rows: merge with existing members,
    // dedup by doc_id (replay), keep the lowest maxBucket ids
    val admitted = bk.join(novel.select(col(idCol).as("doc_id")),
      Seq("doc_id"), "left_semi")
    val newRows = admitted.select(col("band"), col("key"),
      struct(col("doc_id"), col("shs")).as("m"))
    val existingRows =
      if (!hasStore) newRows.limit(0)
      else hits
        .join(newRows.select("band", "key").distinct(), Seq("band", "key"),
          "left_semi")
        .select(col("band"), col("key"), explode(col("members")).as("m"))
    val merged = existingRows.unionByName(newRows)
      .select(col("band"), col("key"), col("m"), col("m.doc_id").as("mid"))
      .dropDuplicates("band", "key", "mid")
      .groupBy("band", "key")
      .agg(slice(array_sort(collect_list(col("m"))), 1, maxBucket).as("members"))
    if (!merged.isEmpty)
      KeyedStore.upsert(merged, Seq("band", "key"), storePath, numBuckets)
    novel
  }

  /** Continuous form: maintain the band store from a stream, handing
    * each batch's novel rows to `onNovel`. With a checkpoint the
    * pipeline resumes after restart AND the store already rejects
    * near-copies of everything admitted before the restart. */
  def run(stream: DataFrame, idCol: String, textCol: String, tsCol: String,
      storePath: String, checkpointLocation: Option[String] = None,
      threshold: Double = 0.5,
      numBuckets: Int = KeyedStore.DefaultBuckets)(
      onNovel: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = stream.writeStream.outputMode("append")
    checkpointLocation.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, id: Long) =>
        onNovel(dedupBatch(batch, idCol, textCol, tsCol, storePath,
          threshold, numBuckets = numBuckets), id)
        ()
      }
      .start()
  }
}
