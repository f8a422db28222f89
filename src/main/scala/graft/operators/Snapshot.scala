package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot bookkeeping: classify every document across two
  * corpus versions (crawls, ingest batches, cleaning reruns) as
  * added / removed / changed / unchanged. The incremental-ingest
  * primitive of a production pipeline — downstream stages (dedup
  * stores, ANN indexes, shard packs) re-process only the
  * added+changed slice instead of the full 100 TB, and the per-class
  * counts are the drift monitor that catches a broken extractor
  * (sudden `changed` spike) or a collapsed crawl (`removed` spike)
  * before a bad snapshot trains.
  *
  * Reference analogue: none — the reference reprocesses every Kafka
  * record unconditionally; snapshot-level diffing is the batch-world
  * capability its topic-compaction approximates per key.
  */
object SnapshotDiff {

  /** Per-document diff of two snapshots on content digest.
    * Returns (doc_id, status) for every id present in either side;
    * status ∈ {added, removed, changed, unchanged} (relative to
    * `oldDf` → `newDf`).
    *
    * Scale shape: each side projects to (id, md5 digest) AT THE SCAN
    * — 8-byte id + 16-byte digest per row is all that ever crosses
    * the exchange, never document text (the same digest-keyed rule as
    * [[Dedup.chunkDedup]]; 128 bits so a digest collision that would
    * mis-class a changed doc as unchanged has P ≈ 10⁻¹⁴ at 10¹²
    * docs). One full-outer hash join co-partitioned on id; both
    * inputs aggregate/scan-prune independently upstream. With both
    * snapshots stored bucketed by id (`sources/Bucketing`), the join
    * plans shuffle-free. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("doc_id"), md5(col(textCol)).as("oh"))
    val n = newDf.select(col(idCol).as("doc_id"), md5(col(textCol)).as("nh"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("oh").isNull, lit("added"))
          .when(col("nh").isNull, lit("removed"))
          .when(col("oh") =!= col("nh"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** [[diff]] rolled up to per-class counts joined with a carried
    * dimension (e.g. source) — the drift-monitor report form. The
    * dimension rides the NEW side (falls back to the old side for
    * removed docs). */
  def diffReport(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String, dimCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("doc_id"), md5(col(textCol)).as("oh"),
      col(dimCol).as("od"))
    val n = newDf.select(col(idCol).as("doc_id"), md5(col(textCol)).as("nh"),
      col(dimCol).as("nd"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("nd"), col("od")).as(dimCol),
        when(col("oh").isNull, lit("added"))
          .when(col("nh").isNull, lit("removed"))
          .when(col("oh") =!= col("nh"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy(dimCol, "status")
      .agg(count(lit(1)).as("n_docs"))
  }
}
