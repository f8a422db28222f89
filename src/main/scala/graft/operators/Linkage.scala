package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-table record linkage: match rows of TWO tables by fuzzy text
  * similarity — the entity-resolution generalization of
  * [[Dedup.editDistancePairs]] (which links a table to itself). The
  * classic blocked-linkage shape: a cheap deterministic BLOCK key
  * (phonetic code, numeric suffix, sorted-token prefix) turns the
  * |L|×|R| cross product into an equi-join, then an exact
  * edit-distance verify keeps true matches.
  *
  * Reference analogue: none — the reference joins only on exact keys;
  * linkage is part of the LLM-pipeline extension surface (joining
  * crawl metadata to registry tables, license records to domains).
  */
object Linkage {

  /** Blocked fuzzy link of `left` × `right`.
    *
    * Inputs are pre-projected three-column frames
    * (id, txt, blk) — build them with any block expression
    * (`substring`, `right`, soundex, …); the block is the recall
    * contract: only pairs agreeing on it are ever considered.
    *
    * Scale shape: the only join is the equi-join on `blk`, and
    * `maxDf` df-caps the block key ON EACH SIDE INDEPENDENTLY before
    * the join (a block shared by l left-rows and r right-rows costs
    * l·r pairs, so the cap bounds per-block cost at maxDf² exactly
    * like [[Dedup.editDistancePairs]]'s self-join guard; the hot sets
    * broadcast into left-anti joins). The verify is the THRESHOLD
    * levenshtein — O(len·maxEd) per candidate, guarded behind the
    * free length-delta predicate (edit distance ≥ length difference),
    * and it runs inside the join's output, never on the cross
    * product. */
  def blockedLink(left: DataFrame, right: DataFrame,
      maxEd: Int, maxDf: Int = 0): DataFrame = {
    require(maxEd >= 0, s"maxEd must be non-negative, got $maxEd")
    val l = Dedup.dropHotKeys(
      left.select(col("id").as("lid"), col("txt").as("ltxt"),
        col("blk")), Seq("blk"), maxDf)
    val r = Dedup.dropHotKeys(
      right.select(col("id").as("rid"), col("txt").as("rtxt"),
        col("blk")), Seq("blk"), maxDf)
    // the threshold DP returns -1 past the bound; the length-delta
    // guard never changes results (edit distance >= |len(a)-len(b)|)
    val guarded = when(
      abs(length(col("ltxt")) - length(col("rtxt"))) <= maxEd,
      levenshtein(col("ltxt"), col("rtxt"), maxEd).cast("long"))
    l.join(r, Seq("blk"))
      .select(col("lid"), col("rid"), guarded.as("edit_dist"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxEd)
  }

  /** Convenience projection for [[blockedLink]] inputs. */
  def side(df: DataFrame, idCol: String, txtCol: String,
      blk: Column): DataFrame =
    df.select(col(idCol).as("id"), col(txtCol).as("txt"), blk.as("blk"))
}
