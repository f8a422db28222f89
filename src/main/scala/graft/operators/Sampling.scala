package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.expressions.GraftExpressions

/** Deterministic corpus selection: hash-based splits, weighted mixture
  * sampling, and per-group quota caps — the selection stages of a
  * training-data pipeline between cleaning/dedup and shard packing.
  *
  * Everything here is DERIVED from row content, never from RNG state:
  * re-running any stage on any cluster layout reproduces the same
  * sample bit-for-bit (speculative tasks, retries and re-partitioning
  * cannot change membership), and the assignment ships as a plain
  * projected column — no shuffle is introduced by selection itself.
  */
object Sampling {

  /** Engine-portable uniform hash to [0, 2^32): the first 8 hex chars
    * of md5 read as an integer. Unlike Spark's Murmur3 `hash()`, any
    * SQL engine with md5 computes the identical value, so sample
    * membership is reproducible OUTSIDE Spark too (the DuckDB oracles
    * of q57/q58 run this exact expression). Cost is one md5 per row —
    * fine next to the I/O that feeds it; use `hash()` where
    * cross-engine reproducibility doesn't matter. */
  def portableHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast(LongType)

  /** Uniform bucket in [0, buckets) from an id column plus a salt tag.
    * Distinct salts give independent assignments over the same ids —
    * the split and the mixture sample below stay uncorrelated. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    pmod(portableHash(
      if (salt.isEmpty) id.cast("string")
      else concat(id.cast("string"), lit(":" + salt))), lit(buckets))

  /** Deterministic train/valid/test assignment by id hash. Membership
    * is a pure function of the id — adding or removing OTHER rows never
    * reassigns a document (contrast `randomSplit`, which depends on
    * partition layout and seed), which is what keeps eval sets stable
    * as a 100 TB corpus is incrementally re-ingested. */
  def splitColumn(id: Column, trainPct: Int = 80, validPct: Int = 10): Column = {
    require(trainPct > 0 && validPct >= 0 && trainPct + validPct <= 100)
    val b = hashBucket(id, "", 100)
    when(b < trainPct, "train")
      .when(b < trainPct + validPct, "valid")
      .otherwise("test")
  }

  /** Weighted mixture sampling: keep each row with its group's target
    * rate, expressed in integer basis points of 1e4 (so thresholds are
    * exact — no float-to-int truncation ambiguity across engines).
    * `weights`: (groupCol, w_bp) with w_bp in [0, 10000]; groups absent
    * from the table sample at `defaultBp`.
    *
    * Scale shape: `weights` is a dimension table — broadcast join, no
    * shuffle of the corpus; the kept fraction streams straight into
    * whatever follows. This is the "re-weight web vs code vs books"
    * stage of a data mixture, run at full corpus width. */
  def mixtureSample(df: DataFrame, weights: DataFrame, groupCol: String,
      id: Column, defaultBp: Int = 1000): DataFrame =
    df.join(broadcast(weights), Seq(groupCol), "left")
      .filter(hashBucket(id, "mix", 10000) <
        coalesce(col("w_bp"), lit(defaultBp)).cast(LongType))
      .drop("w_bp")

  /** Per-group quota: the top `k` rows of each group by `score` (desc,
    * id asc tiebreak). Runs on the bounded [[GraftExpressions.topKByScore]]
    * heap aggregate — map-side partial aggregation ships at most k rows
    * per group per task, so a group with a billion rows still moves only
    * k of them per upstream partition (a `row_number` window would
    * shuffle every row of the group to one task to rank it). */
  def quotaPerGroup(df: DataFrame, groupCols: Seq[String], score: Column,
      id: Column, k: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(GraftExpressions.topKByScore(score, id, k).as("tk"))
      .select(groupCols.map(col) :+ posexplode(col("tk")).as(Seq("pos", "p")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("p.id").as("id"),
        col("p.score").as("score"),
        (col("pos") + 1).cast(LongType).as("rn")): _*)

  /** Deterministic uniform k-per-group sample: rank each group by the
    * salted portable hash of the id, ascending — the fixed-size
    * "reservoir" sample of a stratified subsampling stage, with
    * membership a pure function of (id, salt): stable under corpus
    * growth within a group's survivors, reproducible outside Spark,
    * immune to partition layout. Same bounded-heap execution as
    * [[quotaPerGroup]] — at most k rows per group per task cross the
    * shuffle regardless of group size. */
  def uniformPerGroup(df: DataFrame, groupCols: Seq[String], id: Column,
      k: Int, salt: String = "samp"): DataFrame =
    quotaPerGroup(df, groupCols,
      -portableHash(concat(id.cast("string"), lit(":" + salt))).cast("double"),
      id, k)

  /** Weighted fixed-size per-group sample WITHOUT replacement — the
    * Efraimidis–Spirakis A-ES scheme (IPL 2006: keep the k rows with
    * the best priority u^(1/w)) with the deterministic portable hash
    * standing in for the uniform draw, in the monotone-equivalent
    * integer form: skey = floor(h(id,salt) · 2^20 / max(w, 1)),
    * keep the k SMALLEST skeys per group. Heavier rows draw
    * systematically smaller keys, so inclusion probability scales
    * with weight while membership stays a pure function of
    * (id, salt, w) — reproducible on any layout, any engine, and
    * stable under corpus growth elsewhere in the group. The integer
    * floor keeps the key exact everywhere: h < 2^32 so h·2^20 < 2^52,
    * below both BIGINT and the 53-bit double mantissa of the heap's
    * score slot (an FP division here could flip an order at the
    * quantization boundary between engines).
    *
    * Same bounded-heap execution as [[quotaPerGroup]]: at most k rows
    * per group per task cross the shuffle, so "sample 1000 docs per
    * source weighted by token count" over a billion-row source moves
    * k·tasks rows, never the source. Returns (groupCols…, id, skey,
    * rn) with rn 1..k by (skey asc, id asc). */
  def weightedPerGroup(df: DataFrame, groupCols: Seq[String], id: Column,
      weight: Column, k: Int, salt: String = "wsamp"): DataFrame =
    quotaPerGroup(
      df.withColumn("__h",
          portableHash(concat(id.cast("string"), lit(":" + salt))))
        .withColumn("__w", greatest(weight.cast(LongType), lit(1L)))
        .withColumn("__skey", expr("(__h * 1048576) div __w")),
      groupCols, -col("__skey").cast("double"), id, k)
      .withColumn("skey", -col("score").cast(LongType))
      .drop("score")
}
