package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.state.KeyedStore

/** Shared durable-store layout for the incremental near-dup family
  * ([[IncrementalNearDedup]] for text, [[IncrementalEmbeddingNearDedup]]
  * for vectors): TWO bucket-pruned [[KeyedStore]]s under one root,
  *
  *   - `<root>/bands` — keyed (band, key): the LSH bucket identity,
  *     whose row carries ONLY the bucket's member doc ids (capped at
  *     `maxBucket`, lowest ids kept). No payloads ride the postings.
  *   - `<root>/docs`  — keyed doc_id: each admitted document's verify
  *     payload (shingle set / quantized vector), stored exactly ONCE.
  *
  * Why the side table: the earlier single-store form carried each
  * admitted doc's payload inside every band row it occupied — nBands
  * copies (16× at 16 bands) of the admitted corpus, a real storage
  * bill at 100 TB. Splitting postings from payloads makes store bytes
  * scale ~1× the admitted data; the price is one extra bucket-pruned
  * probe per batch (fetch the collided members' payloads by id) —
  * O(|collided ids|), never a store scan.
  *
  * Both stores share the replay story: member-id merge dedups by id,
  * doc upsert replaces by key, so at-least-once batch replay converges
  * to the identical store.
  */
private[streaming] object NearDupStore {

  def bandsPath(root: String): String = root + "/bands"
  def docsPath(root: String): String = root + "/docs"

  /** The store "exists" when its band table does. The band table is
    * the COMMIT POINT: [[admit]] writes `docs/` strictly before
    * `bands/`, so a crash between the two leaves either a fully
    * consistent store or an uninitialized one plus some unreferenced
    * payload rows (harmless, never probed) — never a band member whose
    * payload is missing. (The reverse order would wedge the stream
    * permanently: a replayed batch probes `docs/` for collided members
    * before it ever reaches [[admit]], so the missing table could not
    * self-heal.) */
  def isInitialized(spark: SparkSession, root: String): Boolean =
    KeyedStore.isInitialized(spark, bandsPath(root))

  /** One bucket-pruned probe of the band store with the batch's own
    * band keys — (band, key, members) for every stored bucket the
    * batch touches. Probed ONCE per batch and shared by
    * [[collisionsFrom]] (history detection) and [[admit]] (member
    * merge); cost is O(|batch| × bands + touched buckets) against a
    * store of any size. Caller must guard with [[isInitialized]]. */
  def probeBands(bk: DataFrame, root: String, numBuckets: Int): DataFrame =
    KeyedStore.probe(bk.select("band", "key").distinct(), Seq("band", "key"),
      bandsPath(root), numBuckets)

  /** Distinct (doc_id, old_id) collision pairs of the batch's band
    * rows against the probed buckets. Self-pairs are dropped here: a
    * stored member with the batch doc's own id is the replayed-batch
    * case, not a duplicate. */
  def collisionsFrom(bk: DataFrame, bandHits: DataFrame): DataFrame =
    bk.join(bandHits, Seq("band", "key"))
      .select(col("doc_id"), explode(col("members")).as("old_id"))
      .filter(col("old_id") =!= col("doc_id"))
      .dropDuplicates("doc_id", "old_id")

  /** Stored payload rows for the given ids — a bucket-pruned point
    * probe of the doc table, O(|ids|) not O(corpus). */
  def payloads(ids: DataFrame, root: String, numBuckets: Int): DataFrame =
    KeyedStore.probe(ids.select(col("old_id").as("doc_id")), Seq("doc_id"),
      docsPath(root), numBuckets)

  /** Admit a batch's novel docs: upsert their payload rows into the
    * doc store (one row per doc), then merge their band rows (ids
    * only) into the band store — union with the PRE-PROBED existing
    * members (`bandHits`, from [[probeBands]] — no second store read),
    * dedup by id (replay), keep the lowest `maxBucket` ids. Write
    * order is docs-then-bands on purpose: see [[isInitialized]]. */
  def admit(bandRows: DataFrame, docRows: DataFrame, bandHits: DataFrame,
      root: String, maxBucket: Int, numBuckets: Int): Unit = {
    val newRows = bandRows.select("band", "key", "doc_id")
    // only buckets an admitted doc actually touches get rewritten
    val existingRows = bandHits
      .join(newRows.select("band", "key").distinct(), Seq("band", "key"),
        "left_semi")
      .select(col("band"), col("key"), explode(col("members")).as("doc_id"))
    val merged = existingRows.unionByName(newRows)
      .dropDuplicates("band", "key", "doc_id")
      .groupBy("band", "key")
      .agg(slice(array_sort(collect_list(col("doc_id"))), 1, maxBucket)
        .as("members"))
    if (!docRows.isEmpty)
      KeyedStore.upsert(docRows, Seq("doc_id"), docsPath(root), numBuckets)
    if (!merged.isEmpty)
      KeyedStore.upsert(merged, Seq("band", "key"), bandsPath(root), numBuckets)
  }
}
