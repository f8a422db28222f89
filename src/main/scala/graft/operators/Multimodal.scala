package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque media payload by a REAL
  * image decode (JDK ImageIO). `width`/`height` are the decoded raster
  * dimensions; `mean_r/g/b` are exact integer channel means (sum of the
  * channel over every pixel, floor-divided by the pixel count) computed
  * by scanning the decoded raster — not metadata echoes. Undecodable
  * payloads report `application/octet-stream` with -1 dims/means
  * rather than poisoning the partition. */
final case class MediaMeta(
    doc_id: Long,
    n_bytes: Int,
    mime: String,
    width: Int,
    height: Int,
    mean_r: Int,
    mean_g: Int,
    mean_b: Int)

/** Multimodal-column operators for the training-data pipeline: media
  * travels as an opaque `binary` column + typed metadata struct; decode
  * / resize / feature-extract run partition-wise (codec state and
  * buffers initialized once per partition, rows streamed through — the
  * `mapInPandas` batch shape, in Scala) so the per-record cost is the
  * codec call, nothing else.
  *
  * The image codec is the JDK's own ImageIO (PNG/JPEG/GIF/BMP/TIFF
  * readers ship with the JVM): encode, decode, and resize below are
  * REAL pixel-level operations, spec'd by encode→decode round-trips
  * (exact dimensions + exact channel means) and hash-oracled against
  * DuckDB in q34 (dimensions are a pure function of `md5(text)`, which
  * both engines compute identically). Video (MP4/H.264) has no JDK
  * codec, so frame-level video decode stays out of scope; frame
  * SAMPLING (`sampleFrames`) operates on container-declared frame
  * counts, the metadata a real ingest would carry alongside the bytes.
  *
  * Scale posture: payloads never shuffle through any of these
  * operators — each is a narrow mapPartitions over (id, bytes); joins
  * and aggregations downstream run on the extracted metadata or
  * fingerprints, never on the media bytes.
  */
object Multimodal {

  /** Image parameters derived from the MD5 of the source text — the
    * oracle-shared contract: byte 0 picks the width (16..128, step 8),
    * byte 1 the height (8..96, step 8), bytes 2..9 seed the pixel
    * noise. Same text ⇒ byte-identical PNG (the near-dup invariant);
    * q34's DuckDB oracle recomputes width/height from `md5(text)` hex.
    */
  private[graft] def imageParams(text: String): (Int, Int, Long) = {
    val d = MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val w = 8 * (1 + (d(0) & 0xff) % 16)
    val h = 8 * (1 + (d(1) & 0xff) % 12)
    var seed = 0L
    var i = 2
    while (i < 10) { seed = (seed << 8) | (d(i) & 0xffL); i += 1 }
    (w, h, if (seed == 0L) 0x9e3779b97f4a7c15L else seed)
  }

  /** Deterministic full-entropy pixel fill (xorshift64*): high-entropy
    * pixel content keeps the PNG DEFLATE stream incompressible, so two
    * different documents' payloads share almost no byte 4-grams — the
    * property that makes byte-fingerprint near-dup (q45) discriminative
    * instead of collapsing on shared zero-runs. */
  private def fillNoise(img: BufferedImage, seed0: Long): Unit = {
    val w = img.getWidth
    val h = img.getHeight
    val px = new Array[Int](w * h)
    var s = seed0
    var i = 0
    while (i < px.length) {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      val r = s * 0x2545f4914f6cdd1dL
      px(i) = (r >>> 24).toInt & 0xffffff
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream(4096)
    ImageIO.setUseCache(false) // in-memory streams, no tmp-file cache
    require(ImageIO.write(img, "png", baos), "no PNG writer in this JVM")
    baos.toByteArray
  }

  /** Synthesize one PNG payload for a document (test fixtures and
    * `withPayload` share this so the round-trip spec and the corpus
    * path encode identically). */
  private[operators] def pngFor(text: String): Array[Byte] = {
    val (w, h, seed) = imageParams(text)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    fillNoise(img, seed)
    encodePng(img)
  }

  /** Attach a REAL PNG payload column: each document's image is
    * encoded by ImageIO with content derived deterministically from the
    * text's MD5 (dims + noise seed), standing in for bytes a real
    * ingest would fetch from blob storage. Identical text ⇒ identical
    * payload (exact-dup invariant for q45); `n_bytes` is the true
    * encoded payload length. Partition-wise: the encoder's buffers are
    * JVM-local, rows stream through one at a time. */
  def withPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val p = pngFor(text)
          (id, p, p.length)
        }
      }.toDF("doc_id", "payload", "n_bytes")
  }

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')

  private def sniffMime(bytes: Array[Byte]): String =
    if (bytes.length >= 4 && bytes(0) == PngMagic(0) && bytes(1) == PngMagic(1)
        && bytes(2) == PngMagic(2) && bytes(3) == PngMagic(3)) "image/png"
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff
        && (bytes(1) & 0xff) == 0xd8) "image/jpeg"
    else "application/octet-stream"

  private def decode(bytes: Array[Byte]): BufferedImage =
    if (bytes.isEmpty) null
    else ImageIO.read(new ByteArrayInputStream(bytes))

  /** Partition-wise REAL decode: ImageIO.read per payload, true raster
    * dimensions plus exact integer channel means from a full raster
    * scan. One iterator pass per partition; a payload ImageIO cannot
    * read degrades to (-1, -1, ...) with an octet-stream mime instead
    * of failing the task — corrupt media is data, not an exception, at
    * 100 TB. */
  def decodeMeta(spark: SparkSession, payloads: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = decode(bytes)
          if (img == null)
            MediaMeta(id, bytes.length, sniffMime(bytes), -1, -1, -1, -1, -1)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < px.length) {
              val p = px(i)
              sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
              i += 1
            }
            val n = px.length.toLong
            MediaMeta(id, bytes.length, sniffMime(bytes), w, h,
              (sr / n).toInt, (sg / n).toInt, (sb / n).toInt)
          }
        }
      }
  }

  /** Frame-sampling plan over container-DECLARED frame counts (the
    * metadata a video ingest carries; MP4 frame decode has no JDK codec
    * and stays out of scope): every `stride`-th frame index, computed
    * declaratively so Catalyst prunes/pushes around it. */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.withColumn("sampled_frames",
      sequence(lit(0), col("n_frames") - 1, lit(stride)))

  /** Partition-wise REAL resize: ImageIO decode → aspect-preserving
    * Graphics2D rescale to `targetWidth` → PNG re-encode, the standard
    * image-normalization step before feature extraction. Output rows
    * carry the re-encoded payload plus the TRUE output dimensions
    * (height = round(h·targetWidth/w), min 1). Payloads ImageIO cannot
    * decode (including empty ones) pass through unchanged with 0×0
    * dims, so a corrupt record never kills the batch. */
  def resizePng(spark: SparkSession, payloads: DataFrame,
      targetWidth: Int): DataFrame = {
    require(targetWidth >= 1, s"targetWidth must be >= 1, got $targetWidth")
    import spark.implicits._
    payloads.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = decode(bytes)
          if (img == null) (id, bytes, 0, 0)
          else {
            val h2 = math.max(1,
              math.round(img.getHeight.toDouble * targetWidth / img.getWidth).toInt)
            val out = new BufferedImage(targetWidth, h2, BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try g.drawImage(img, 0, 0, targetWidth, h2, null)
            finally g.dispose()
            (id, encodePng(out), targetWidth, h2)
          }
        }
      }.toDF("doc_id", "payload", "width", "height")
  }

  /** Partition-wise feature extraction: payload bytes → unit-norm
    * `array<float>` fingerprint, the column the similarity/dedup stack
    * (Similarity.quantize → kNN/ANN/near-dup) consumes. Partition-wise
    * so a real learned encoder would load its model once per partition
    * and stream records through it — this deterministic stand-in is a
    * hashed byte-4-gram profile (feature hashing over sliding byte
    * windows, L2-normalized): a legitimate binary fingerprint in its
    * own right — identical payloads embed identically (cosine 1), and
    * the high-entropy PNG streams from `withPayload` make different
    * payloads near-orthogonal, so q45's LSH near-dup recovers exactly
    * the payload-duplicate pairs. A vision/audio encoder drops into the
    * same mapPartitions slot unchanged. */
  def embedBytes(spark: SparkSession, payloads: DataFrame,
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
