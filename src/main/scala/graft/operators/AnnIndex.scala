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

  /** Build-if-absent + load: the registry/bench entry point. The root
    * is derived from the corpus location, a corpus FINGERPRINT, and
    * the index parameters, so distinct datasets, regenerated data, or
    * changed configs never share artifacts. Serialized within the JVM
    * (concurrent suites would otherwise race overlapping overwrite
    * builds into one root); cross-JVM builders still race — give them
    * distinct roots or build ahead of time. */
  def ensure(corpus: DataFrame, root: String, kClusters: Int, iters: Int,
      m: Int = 8, pqK: Int = 16, sample: Int = 2048): Handle =
    this.synchronized {
      val spark = corpus.sparkSession
      if (!isBuilt(spark, root))
        build(corpus, root, kClusters, iters, m, pqK, sample)
      load(spark, root)
    }

  /** Cheap source fingerprint for index-root derivation: size +
    * modification time of the source file/dir — no data scan, but a
    * regenerated corpus at the same path gets a new root and therefore
    * a rebuild instead of silently stale artifacts. */
  def sourceFingerprint(spark: SparkSession, sourcePath: String): String = {
    val p = new Path(sourcePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    java.lang.Long.toHexString(st.getLen * 31 + st.getModificationTime)
  }
}
