package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.{TextFunctions => T}
import graft.state.KeyedStore

/** Incremental corpus ingestion with dedup against ALL history: each
  * micro-batch of documents is deduplicated within itself, then
  * against the durable fingerprint store, and only novel documents
  * flow on; their fingerprints upsert into the store so the next
  * batch — or a restarted pipeline — rejects them.
  *
  * Why not `dropDuplicates` + watermark? Engine-side streaming dedup
  * state lives behind a watermark TTL: it answers "seen in the last N
  * days". Corpus ingestion needs "seen EVER", which is a durable
  * table, not stream state — the [[KeyedStore]]. The batch never
  * scans that table: [[KeyedStore.probe]] prunes the membership check
  * to the bucket directories the batch's fingerprints hash into, so
  * per-batch cost is O(|batch| + touched buckets) against a store of
  * any size — the same bound as the upsert. (The reference's analog:
  * the 7-day windowed news-dedup store, `covid19-telegram-bot`
  * StateStoresManager; this is the unbounded-history corpus form.)
  *
  * Within a batch, first-wins is deterministic: the minimum
  * (timestamp, id) per fingerprint survives, independent of partition
  * layout. Replay-idempotent INCLUDING the crash window between the
  * store upsert and the downstream commit: a fingerprint already in
  * the store is re-admitted iff the store's recorded (first_id,
  * first_ts) equals the batch's own first-wins pick — i.e. THIS batch
  * admitted it in the failed attempt — so a replayed batch re-emits
  * exactly its original novel rows (never silently drops them), the
  * re-upsert converges to the identical table, and `onNovel(novel,
  * batchId)` can commit transactionally by batch id.
  */
object IncrementalDedup {

  /** One batch step (the foreachBatch body, callable in batch jobs
    * too): returns the novel rows of `batch` and upserts their
    * fingerprints. `batch`: (id, text, ts, …) with `idCol`/`tsCol`
    * naming the identity and arrival order. */
  /** Bloom-superset sketch location for a store. The INVARIANT that
    * makes gating safe: the sketch always over-approximates the store
    * key set (it is written from each batch's admitted fingerprints
    * BEFORE the store upsert, so any crash between the two leaves
    * extra bloom keys — harmless false positives — never missing
    * ones). A bloom-negative fingerprint is therefore provably absent
    * from the store and skips the bucket probe entirely; per-batch
    * probe cost shrinks from "buckets touched by the whole batch" to
    * "buckets touched by actual re-sights + the fpp share". */
  def bloomPath(storePath: String): String = s"$storePath/_bloom/filter.bin"

  def dedupBatch(batch: DataFrame, idCol: String, textCol: String,
      tsCol: String, storePath: String,
      numBuckets: Int = KeyedStore.DefaultBuckets,
      bloomExpectedItems: Option[Long] = None): DataFrame = {
    val spark = batch.sparkSession
    val fp = batch.withColumn("fp", T.fingerprint(col(textCol)))
    // in-batch first-wins: min (ts, id) per fingerprint — deterministic
    // under any partitioning
    val firsts = fp
      .groupBy("fp")
      .agg(min_by(struct(fp.columns.map(col): _*),
        struct(col(tsCol), col(idCol))).as("r"))
      .select(col("r.*"))
    val storeInit = KeyedStore.isInitialized(spark, storePath)
    val bloom: Option[Array[Byte]] =
      if (bloomExpectedItems.isEmpty) None
      else graft.operators.BloomGate.readFile(spark, bloomPath(storePath))
    // filter by the recorded (first_id, first_ts): unseen fp, OR seen
    // with OUR first-wins pick — the replayed-batch case (idempotency
    // note above)
    def probed(candidates: DataFrame): DataFrame = {
      val seen = KeyedStore
        .probe(candidates.select("fp"), Seq("fp"), storePath, numBuckets)
        .select("fp", "first_id", "first_ts")
      candidates.join(seen, Seq("fp"), "left")
        .filter(col("first_id").isNull ||
          (col("first_id") === col(idCol) && col("first_ts") === col(tsCol)))
        .drop("first_id", "first_ts")
    }
    val novel =
      if (!storeInit) firsts
      else bloom match {
        case None => probed(firsts)
        case Some(bytes) =>
          // superset invariant ⇒ bloom-negatives are definitely novel
          val gate = graft.operators.BloomGate.mightContain(bytes, col("fp"))
          firsts.filter(!gate).unionByName(probed(firsts.filter(gate)))
      }
    // pin before the store changes underneath the plan, and because two
    // consumers (upsert + caller) must see the same rows
    val pinned = novel.localCheckpoint(eager = true)
    // On an already-gated store the sketch goes down BEFORE the upsert:
    // a crash between the two leaves extra bloom keys (false positives
    // — safe), never missing ones. Never SEED a sketch against a store
    // that predates gating: a bloom grown from one late batch would
    // miss older store keys and break the superset invariant — gating
    // stays off for such stores until `rebuildBloom` backfills it.
    def writeSketch(items: Long): Unit = {
      val batchSketch = graft.operators.BloomGate.build(pinned, "fp", items)
      graft.operators.BloomGate.writeFile(spark, bloomPath(storePath),
        bloom.map(graft.operators.BloomGate.merge(_, batchSketch))
          .getOrElse(batchSketch))
    }
    if (storeInit) bloomExpectedItems.filter(_ => bloom.isDefined)
      .foreach(writeSketch)
    KeyedStore.upsert(
      pinned.select(col("fp"), col(idCol).as("first_id"), col(tsCol).as("first_ts")),
      Seq("fp"), storePath, numBuckets)
    // The INITIALIZING upsert rewrites the whole store directory (it
    // creates the table), so the first sketch can only be written
    // after it. The crash window here leaves NO sketch at all — and a
    // missing sketch disables gating, which is always correct.
    if (!storeInit) bloomExpectedItems.foreach(writeSketch)
    pinned.drop("fp")
  }

  /** Backfill the bloom sketch from a full store scan — the one-time
    * path that turns gating on for a store created before gating
    * existed (or whose sketch file was lost). Safe at any time: the
    * store is the source of truth and the result is a superset by
    * construction. */
  def rebuildBloom(spark: org.apache.spark.sql.SparkSession,
      storePath: String, expectedItems: Long,
      numBuckets: Int = KeyedStore.DefaultBuckets): Unit = {
    val all = KeyedStore.read(spark, storePath)
    graft.operators.BloomGate.writeFile(spark, bloomPath(storePath),
      graft.operators.BloomGate.build(all, "fp", expectedItems))
  }

  /** Continuous form: maintain the store from a stream, handing each
    * batch's novel rows to `onNovel` (write to the corpus table, queue
    * for embedding, …). With a checkpoint the pipeline resumes after
    * restart AND the store already rejects everything admitted before
    * the restart — no replay needed. */
  def run(stream: DataFrame, idCol: String, textCol: String, tsCol: String,
      storePath: String, checkpointLocation: Option[String] = None,
      numBuckets: Int = KeyedStore.DefaultBuckets,
      bloomExpectedItems: Option[Long] = None)(
      onNovel: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = stream.writeStream.outputMode("append")
    checkpointLocation.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, id: Long) =>
        onNovel(
          dedupBatch(batch, idCol, textCol, tsCol, storePath, numBuckets,
            bloomExpectedItems), id)
        ()
      }
      .start()
  }
}
