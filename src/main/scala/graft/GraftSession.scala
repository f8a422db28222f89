package graft

import org.apache.spark.sql.SparkSession

/** Central place for session configuration so Verify/Bench/tests all run
  * with identical semantics (UTC, AQE on, nanos-parquet readable).
  *
  * Scale posture: shuffle partitions default to the local core count here,
  * but on a real cluster these settings are safe — AQE coalesces and
  * re-plans skewed joins at runtime.
  */
object GraftSession {

  /** Apply graft's standard configuration to a builder. */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE CAN rewrite sort-merge joins to shuffled-hash joins when
      // every post-shuffle partition fits a bounded per-task hash map;
      // an r14 full-subset A/B (48 queries, sf0.1) measured the GLOBAL
      // rewrite as a net loss: the one-shot digest self-joins sped up
      // 1.2-1.6x (q133/q134/q135/q92/q84) but the iterative/k-means
      // classes regressed hard (q68 3.4x, q74 1.9x, q171 1.45x), so
      // the default stays OFF and the winning joins carry a targeted
      // shuffle_hash HINT instead (Dedup.jaccardPairs). Env override
      // kept for re-measurement on other hardware.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "0"))
      // some events.parquet vintages store INT64 TIMESTAMP(NANOS), which
      // Spark's parquet reader rejects by default; read the raw long and
      // let Tables.load normalize whichever vintage is present.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // the engine's read surface includes multi-KB BINARY payload
      // columns (the media store): at the 4096-row default a single
      // columnar batch of ~9 KB payloads is a ~37 MB contiguous vector
      // PER TASK, and 32 concurrent scan tasks OOM the reader
      // (measured: the 400k-doc media_decode stress stage failed with
      // FAILED_READ_FILE before this bound). 1024 rows keeps batch
      // bytes ~9 MB/task for payload scans while costing narrow scans
      // nothing measurable (batch setup amortizes over 1024 rows;
      // full-suite bench rate was flat under A/B).
      .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
      // production streaming state backend (spillable, incremental
      // checkpoints) — the analog of the reference's RocksDB stores
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")

  /** Default parallelism: the driver environment's CPU count (capped at
    * the 32 the target runs with), overridable via SPARK_GRAFT_CPUS. */
  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    math.min(32, Runtime.getRuntime.availableProcessors()).toString)

  def local(cpus: String = defaultCpus): SparkSession = {
    val spark = configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Release every block the last query pinned: several query fns use
    * eager `localCheckpoint(true)` to cut iterative lineage (resolve,
    * PageRank) or pin reused frames, and those checkpoint RDD blocks
    * stay in the block manager until unpersisted. A long multi-query
    * run (Bench's 211 queries in one JVM) that never releases them
    * accumulates block-manager pressure whose eviction cost lands on
    * whichever queries run LATE — the r9 driver record measured q91 at
    * 15.29s in-process vs 0.98s isolated for exactly this reason.
    * Called between Bench queries so each measurement sees a clean
    * block manager; safe anywhere because graft queries never rely on
    * cross-query persisted state. */
  def releaseCaches(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    spark.catalog.clearCache()
  }
}
