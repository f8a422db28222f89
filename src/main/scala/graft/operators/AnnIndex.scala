package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted ANN index artifacts — the build-once/probe-many split the
  * repeated-query economics demand: at 100 TB nobody re-trains k-means
  * or re-encodes the corpus per query batch. `build` runs the
  * one-pass(ish) index construction and writes four artifacts under
  * one root; `load` hands back handles whose probe cost is what a
  * query actually pays.
  *
  * Layout (`root/`):
  *   - `ivf/`       — (vec_id, qv, nsq) PARTITIONED BY cluster: the
  *                    inverted file. An nProbe-list probe's equi-join
  *                    key is the partition column, so partition
  *                    pruning reads nProbe directories, not the
  *                    corpus.
  *   - `codes/`     — (vec_id, code) partitioned by cluster: the
  *                    PQ-compressed corpus (~dims/M·8× smaller); the
  *                    ADC paths scan this and never the vectors.
  *   - `centroids/` — the k-row cluster model (broadcast at probe).
  *   - `codebook/`  — (m, c, cent) rows of the PQ codebook.
  *   - `_graft_ann_ready` — commit marker, written last: a crashed
  *                    build is invisible to [[isBuilt]] and simply
  *                    rebuilt.
  *
  * Everything in the build is deterministic (k-means inits from the
  * first k vec_ids, PQ trains on the first `sample` vec_ids with
  * first-distinct init), so a rebuild over the same corpus produces
  * identical artifacts — asserted in AnnIndexSpec. */
object AnnIndex {

  /** Loaded probe-side handles. `indexed`/`encoded` are lazy parquet
    * scans (cluster-partition-pruned by the probe joins); `centroids`
    * is the model table; `codebook` is driver-side (model-sized, it
    * rides probe plans as literals). */
  case class Handle(indexed: DataFrame, encoded: DataFrame,
      centroids: DataFrame, codebook: Array[Array[Array[Long]]])

  private val Marker = "_graft_ann_ready"

  /** Algorithm version, part of every caller's root path: artifacts
    * persist across JVMs, so a change to the BUILD SEMANTICS
    * (kmeansIndex init/assign, pqTrain, quantize) must bump this or a
    * stale index silently serves results computed by old code. The
    * rebuild-determinism spec protects same-version rebuilds, not
    * cross-version staleness — the version constant is the guard. */
  val AlgoVersion = 1

  def isBuilt(spark: SparkSession, root: String): Boolean = {
    val p = new Path(root, Marker)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Build all artifacts from a quantized corpus (vec_id, qv, nsq). */
  def build(corpus: DataFrame, root: String, kClusters: Int, iters: Int,
      m: Int = 8, pqK: Int = 16, sample: Int = 2048): Unit = {
    val spark = corpus.sparkSession
    val (indexed, cents) = Similarity.kmeansIndex(corpus, kClusters, iters)
    // the assignment pass feeds both the ivf table and the encode pass:
    // pin it so the corpus is scanned once per artifact, not re-assigned
    val pinned = indexed.localCheckpoint(eager = true)
    pinned.write.partitionBy("cluster").mode("overwrite")
      .parquet(s"$root/ivf")
    cents.write.mode("overwrite").parquet(s"$root/centroids")
    val cb = Similarity.pqTrain(corpus, m, pqK, sample = sample)
    val cbRows = for {
      (sub, mm) <- cb.zipWithIndex
      (cent, c) <- sub.zipWithIndex
    } yield Row(mm, c, cent.toSeq)
    val cbSchema = StructType(Seq(
      StructField("m", IntegerType, nullable = false),
      StructField("c", IntegerType, nullable = false),
      StructField("cent", ArrayType(LongType, containsNull = false))))
    spark.createDataFrame(java.util.Arrays.asList(cbRows: _*), cbSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$root/codebook")
    Similarity.pqEncode(pinned, cb)
      .select("vec_id", "cluster", "code")
      .write.partitionBy("cluster").mode("overwrite").parquet(s"$root/codes")
    val mp = new Path(root, Marker)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(mp, true).close()
  }

  def load(spark: SparkSession, root: String): Handle = {
    require(isBuilt(spark, root), s"no ANN index at $root (run build first)")
    val cbRows = spark.read.parquet(s"$root/codebook")
      .orderBy("m", "c").collect()
    val mCount = cbRows.map(_.getInt(0)).max + 1
    val codebook = Array.tabulate(mCount) { mm =>
      cbRows.filter(_.getInt(0) == mm).sortBy(_.getInt(1))
        .map(_.getSeq[Long](2).toArray)
    }
    Handle(
      indexed = spark.read.parquet(s"$root/ivf"),
      encoded = spark.read.parquet(s"$root/codes"),
      centroids = spark.read.parquet(s"$root/centroids"),
      codebook = codebook)
  }

  private val LockFile = "_graft_ann_lock"

  /** Test hook: observes every [[build]] start (the spec injects a slow
    * build to prove concurrent ensure() calls build once). No-op in
    * production. */
  private[graft] var buildObserver: String => Unit = _ => ()

  /** Cross-process build mutex: a create-EXCLUSIVE lock file next to
    * the commit marker (atomic on local FS and HDFS; object stores
    * without atomic create need an external lock service — the
    * documented limit of file-based locking). A holder that died is
    * recognized by lock age: past `staleMs` the lock is broken and
    * re-acquired. Waiters poll; the double-check of [[isBuilt]] inside
    * the critical section makes the post-wait build a no-op when the
    * first holder committed. */
  private def withBuildLock[T](spark: SparkSession, root: String,
      staleMs: Long = 10 * 60 * 1000L)(body: => T): T = {
    val lock = new Path(root, LockFile)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(root))
    var acquired = false
    while (!acquired) {
      acquired =
        try { fs.create(lock, false).close(); true }
        catch { case _: java.io.IOException => false }
      if (!acquired) {
        val stale = try {
          System.currentTimeMillis() -
            fs.getFileStatus(lock).getModificationTime > staleMs
        } catch { case _: java.io.IOException => false } // vanished: retry
        if (stale) fs.delete(lock, false) else Thread.sleep(100)
      }
    }
    try body finally fs.delete(lock, false)
  }

  /** Build-if-absent + load: the registry/bench entry point. The root
    * is derived from the corpus location, a corpus FINGERPRINT, and
    * the index parameters, so distinct datasets, regenerated data, or
    * changed configs never share artifacts. Concurrent callers — other
    * threads AND other JVMs — serialize on the lock file: exactly one
    * runs the build, the rest wait and load the committed artifacts
    * (the in-lock isBuilt double-check). */
  def ensure(corpus: DataFrame, root: String, kClusters: Int, iters: Int,
      m: Int = 8, pqK: Int = 16, sample: Int = 2048): Handle = {
    val spark = corpus.sparkSession
    if (!isBuilt(spark, root))
      withBuildLock(spark, root) {
        if (!isBuilt(spark, root)) {
          buildObserver(root)
          build(corpus, root, kClusters, iters, m, pqK, sample)
        }
      }
    load(spark, root)
  }

  /** Grow a built index by a new corpus slice WITHOUT re-training or
    * re-encoding old rows: assign the new vectors to the EXISTING
    * centroid model, PQ-encode them with the EXISTING codebook, and
    * append the rows into the cluster-partitioned ivf/ and codes/
    * tables (parquet append — existing files are never rewritten).
    * This is production IVF/PQ maintenance: the model is fixed at
    * build time and slices accrete in O(|slice|); re-train via
    * [[build]] only when drift degrades recall (the fingerprint-root
    * scheme already forces a rebuild when the SOURCE regenerates).
    *
    * Caller contract: `newCorpus` ids are disjoint from what the index
    * already holds (appending an existing id duplicates it — this is
    * accretion, not upsert), and a crash between the two appends can
    * leave ivf/ one slice ahead of codes/ — re-run the append only
    * after checking which tables took it, or rebuild. Serialized
    * against concurrent builds/appends by the same lock as [[ensure]]. */
  def append(newCorpus: DataFrame, root: String): Unit = {
    val spark = newCorpus.sparkSession
    require(isBuilt(spark, root), s"no ANN index at $root (run build first)")
    withBuildLock(spark, root) {
      val h = load(spark, root)
      val assigned = Similarity
        .assignToCentroids(newCorpus, h.centroids)
        .localCheckpoint(eager = true) // one assignment pass feeds both tables
      assigned.write.partitionBy("cluster").mode("append")
        .parquet(s"$root/ivf")
      Similarity.pqEncode(assigned, h.codebook)
        .select("vec_id", "cluster", "code")
        .write.partitionBy("cluster").mode("append").parquet(s"$root/codes")
    }
  }

  /** Source fingerprint for index-root derivation: fold (name, len,
    * mtime) over the source's LEAF FILES — not the directory status,
    * whose length is 0 and whose mtime object stores don't report (and
    * some filesystems don't bump on in-place rewrites), which would
    * let a regenerated corpus at the same path fingerprint identically
    * and silently serve a stale index. A file listing, no data scan;
    * any rewritten, added, or removed part file changes the root and
    * forces a rebuild. */
  def sourceFingerprint(spark: SparkSession, sourcePath: String): String = {
    val p = new Path(sourcePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // per-file hashes combine by SUM — listing order is filesystem-
    // dependent and must not change the fingerprint of identical data
    var acc = 7L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      acc += (st.getPath.getName.hashCode.toLong * 31 + st.getLen) * 31 +
        st.getModificationTime
    }
    java.lang.Long.toHexString(acc)
  }
}
