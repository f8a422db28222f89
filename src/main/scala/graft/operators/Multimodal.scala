package graft.operators

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque media payload. */
final case class MediaMeta(
    doc_id: Long,
    n_bytes: Int,
    mime: String,
    width: Int,
    height: Int,
    n_frames: Int)

/** Multimodal-column plumbing for the training-data pipeline: media
  * travels as an opaque `binary` column + typed metadata struct; decode /
  * feature-extract runs partition-wise so a real codec would amortize
  * per-batch model/library setup.
  *
  * NOTE: this container ships no image/audio codecs, so `decodeMeta`'s
  * pixel-level decode is a clearly-marked deterministic STUB (dimensions
  * derived from a payload hash). The Spark-side plumbing — binary
  * column, partition-wise batch decode, typed output schema, pushdown-
  * friendly projections — is real and tested.
  */
object Multimodal {

  /** Attach an opaque payload column (here: utf-8 text bytes standing in
    * for image/audio bytes) plus cheap byte-level metadata. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      octet_length(col("text")).as("n_bytes"))

  /** Partition-wise "decode": one iterator pass per partition, the shape
    * a real codec integration needs (open codec once per partition,
    * stream records through it). STUB: dimensions are a deterministic
    * function of the payload hash, standing in for a real decoder. */
  def decodeMeta(spark: SparkSession, payloads: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val codec = Codec.open() once per partition
        it.map { case (id, bytes) =>
          val h = MurmurHash3.bytesHash(bytes, 42)
          val w = 160 * (1 + math.floorMod(h, 8))
          MediaMeta(
            doc_id = id,
            n_bytes = bytes.length,
            mime = if (math.floorMod(h, 3) == 0) "image/png" else "video/mp4",
            width = w,
            height = w * 9 / 16,
            n_frames = 1 + math.floorMod(h >> 8, 240))
        }
      }
  }

  /** Frame-sampling plan for video payloads: every k-th frame index,
    * computed declaratively so Catalyst can prune/push the rest. */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.withColumn("sampled_frames",
      sequence(lit(0), col("n_frames") - 1, lit(stride)))

  /** Partition-wise resize: payload → re-encoded payload at a target
    * width, the standard image-normalization step before feature
    * extraction. STUB re-encode (deterministic byte resampling at the
    * pixel-count ratio — no codec in this container), but the batch
    * shape is the real one: open the codec once per partition, stream
    * payloads through it, emit the new payload + updated dimensions so
    * downstream metadata stays truthful. */
  def resizeStub(spark: SparkSession, payloads: DataFrame,
      targetWidth: Int): DataFrame = {
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val codec = Codec.open() once per partition
        it.map { case (id, bytes) =>
          if (bytes.isEmpty) {
            // empty payload: nothing to sample from — pass it through
            // (outLen=1 would index bytes(-1))
            (id, bytes, targetWidth, targetWidth * 9 / 16)
          } else {
            val h = MurmurHash3.bytesHash(bytes, 42)
            val w = 160 * (1 + math.floorMod(h, 8))
            val scale = targetWidth.toDouble / w
            val outLen = math.max(1, math.round(bytes.length * scale * scale).toInt)
            val out = new Array[Byte](outLen)
            var i = 0
            while (i < outLen) {
              out(i) = bytes(math.min(bytes.length - 1, (i / (scale * scale)).toInt))
              i += 1
            }
            (id, out, targetWidth, targetWidth * 9 / 16)
          }
        }
      }.toDF("doc_id", "payload", "width", "height")
  }

  /** Partition-wise feature extraction: payload bytes → unit-norm
    * `array<float>` embedding, the column the similarity/dedup stack
    * (Similarity.quantize → kNN/ANN/near-dup) consumes. Partition-wise
    * so a real encoder loads its model once per partition and streams
    * records through it — the mapInPandas batch shape, in Scala.
    *
    * The feature itself is a hashed byte-4-gram profile (feature
    * hashing over sliding byte windows, L2-normalized): deterministic,
    * codec-free, and a legitimate binary fingerprint — identical
    * payloads embed identically (cosine 1) and near-duplicate payloads
    * land close, so the downstream near-dup operators find both. A
    * learned vision/audio encoder would drop into the same
    * mapPartitions slot unchanged. */
  def embedStub(spark: SparkSession, payloads: DataFrame,
      dims: Int = 64): DataFrame = {
    import spark.implicits._
    import graft.functions.expressions.MinHashSig.mix
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val encoder = Encoder.load() once per partition
        it.map { case (id, bytes) =>
          val acc = new Array[Double](dims)
          var i = 0
          while (i + 4 <= bytes.length) {
            var h = 0L
            var j = 0
            while (j < 4) { h = h * 257L + (bytes(i + j) & 0xffL); j += 1 }
            val m = mix(h)
            acc(math.floorMod(m, dims).toInt) += (if (m < 0) -1.0 else 1.0)
            i += 1
          }
          val norm = math.sqrt(acc.map(x => x * x).sum)
          val emb =
            if (norm == 0.0) { val e = new Array[Float](dims); e(0) = 1.0f; e }
            else acc.map(x => (x / norm).toFloat)
          (id, emb)
        }
      }.toDF("doc_id", "embedding")
  }
}
