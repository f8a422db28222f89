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
}
