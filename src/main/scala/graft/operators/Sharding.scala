package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign documents, in a deterministic
  * global order, to consecutive shards of ~`budget` tokens each — the
  * step that turns a filtered/mixed corpus into fixed-size training
  * shards. A document whose tokens start before the boundary stays in
  * the current shard (shards overflow by at most one document; none is
  * split).
  *
  * Packing is inherently sequential (each shard boundary depends on
  * every preceding document), which is exactly what
  * [[Ranks.globalRunningSum]] distributes: one lightweight
  * per-partition-subtotal job instead of the single-task global window
  * `sum() OVER (ORDER BY …)` plans as. Shard ids are monotone in the
  * sort order, so a downstream `.write.partitionBy(shard)` lands each
  * shard's documents contiguously from the partitions that already
  * hold them.
  */
object Sharding {

  /** Adds `cumOut` (inclusive running token total in `order`) and `out`
    * (the 0-based shard id `(cumOut - tokens) div budget`). `tokensCol`
    * must be non-negative; `order` must be a total order. */
  def packByBudget(df: DataFrame, order: Seq[Column], tokensCol: String,
      budget: Long, cumOut: String = "cum_tok", out: String = "shard"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    Ranks.globalRunningSum(df, order, col(tokensCol), cumOut)
      .withColumn(out,
        expr(s"($cumOut - cast($tokensCol as bigint)) div $budget"))
  }

  /** Token-granularity sequence packing — the pretraining layout step:
    * lay the corpus out as one contiguous token stream in `order` and
    * cut it into fixed `seqLen`-token training sequences, SPLITTING
    * documents across boundaries (contrast [[packByBudget]], which
    * overflows at document granularity). Emits one row per
    * (sequence, document) overlap: `seq_id`, the document's `offset`
    * inside the sequence, and `n_tok_in_seq` tokens contributed —
    * exactly what a sequence writer joins against the token arrays.
    *
    * All boundary math is exact integer arithmetic off the same
    * distributed prefix sum as shard packing; a document spanning k
    * sequences explodes into k rows (k ≤ n_tok/seqLen + 1 — bounded by
    * the document's own length, never by corpus size). Zero-token
    * documents occupy no stream positions and are dropped. */
  def packSequences(df: DataFrame, order: Seq[Column], tokensCol: String,
      seqLen: Long, cumOut: String = "cum_tok"): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    Ranks.globalRunningSum(df, order, col(tokensCol), cumOut)
      .filter(col(tokensCol) > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"($cumOut - cast($tokensCol as bigint)) div $seqLen"),
        expr(s"($cumOut - 1) div $seqLen"))))
      .withColumn("offset",
        greatest(col(cumOut) - col(tokensCol), col("seq_id") * seqLen)
          - col("seq_id") * seqLen)
      .withColumn("n_tok_in_seq",
        least(col(cumOut), (col("seq_id") + 1) * seqLen)
          - greatest(col(cumOut) - col(tokensCol), col("seq_id") * seqLen))
  }
}
