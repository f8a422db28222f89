package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable frequency sketching — the COUNT-MIN companion of the
  * membership/cardinality sketches already in the engine (the bloom
  * gates in `streaming/Incremental*`, HLL in q175): point-frequency
  * estimates over a stream or corpus WITHOUT the full-shuffle groupBy
  * the exact answer costs. At 100 TB the exact token histogram is a
  * terabyte-scale shuffle on the token column; the sketch is one
  * map-side pass whose per-partition state is a fixed depth×width
  * counter grid, merged counter-wise (exact, commutative) into a
  * single KB-scale object — the canonical "heavy hitters without a
  * shuffle" trade (Cormode & Muthukrishnan, J.Alg 2005).
  *
  * Reference analogue: none — part of the LLM-pipeline extension
  * surface (the reference's nearest shape is its KTable count stores,
  * which are exact per-key).
  */
object Sketches {

  /** Build a count-min sketch over a string column in one distributed
    * pass (`DataFrameStatFunctions.countMinSketch`, which runs a
    * treeAggregate of per-partition grids). Deterministic for a fixed
    * seed on ANY partitioning: every counter is a sum of per-item
    * increments, and sums commute — the same argument that makes the
    * engine's integer aggregates layout-stable. */
  def stringCms(items: DataFrame, column: String, eps: Double,
      confidence: Double, seed: Int): CountMinSketch =
    items.stat.countMinSketch(column, eps, confidence, seed)

  /** All terms with frequency STRICTLY above N/(k+1), found without
    * ever shuffling the full token table — the Misra-Gries
    * candidate-then-recount pipeline (Misra & Gries '82; mergeability
    * per Agarwal et al. PODS'12):
    *
    *  1. Each partition keeps a bounded k-counter summary (admit new
    *     terms while < k counters live; otherwise decrement ALL — the
    *     classic amortized-O(1) eviction). Final estimate undercounts
    *     by at most N_p/(k+1), so any term with f_p > N_p/(k+1)
    *     SURVIVES its partition.
    *  2. Pigeonhole across partitions: f(t) > N/(k+1) = ΣN_p/(k+1)
    *     forces f_p(t) > N_p/(k+1) in at least one partition — the
    *     survivor UNION is a superset of every global heavy hitter.
    *  3. The union is ≤ k·partitions terms — broadcast it, semi-join
    *     the token stream, and recount the candidates EXACTLY; the
    *     final filter cnt·(k+1) > N keeps precisely the true
    *     above-threshold set.
    *
    * The candidate set itself is arrival-order-dependent (MG eviction
    * ties), but the OUTPUT is not: step 3's exact filter makes the
    * result the well-defined "all terms above threshold" relation —
    * which is why q225 can hash-oracle against DuckDB's full groupBy
    * even though the two plans prune completely differently. Shuffle
    * cost: only candidate-term tokens ever reach an exchange. */
  def frequentTerms(items: DataFrame, column: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    val tok = items.select(col(column).as("term"))
    val cands = tok.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        if (m.contains(t)) m(t) += 1L
        else if (m.size < k) m(t) = 1L
        else m.mapValuesInPlace((_, v) => v - 1L)
          .filterInPlace((_, v) => v > 0L)
      }
      m.keysIterator
    }.toDF("term").distinct()
    val total = tok.agg(count(lit(1)).as("n"))
    tok.join(broadcast(cands), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col("term"), col("cnt"),
        expr("(1000000 * cnt) div n").cast("long").as("share_ppm"))
  }

  /** The q224 body: estimate the exact top-`k` tokens' frequencies
    * from a CMS and report estimate vs truth. The exact top-k (the
    * oracle twin q73's shape) is computed alongside to EXPOSE the
    * sketch error in the output: (term, true_n, est_n, over_n) with
    * over_n = est−true ≥ 0 guaranteed by construction (CMS never
    * underestimates) and over_n ≤ ε·N with the sketch's confidence.
    * The k-row probe set and the sketch are both model-sized driver
    * objects (the PQ-codebook collect discipline); everything
    * corpus-sized stays distributed. */
  def cmsVsExactTopK(spark: SparkSession, docs: DataFrame, k: Int,
      eps: Double, confidence: Double, seed: Int): DataFrame = {
    import spark.implicits._
    val tok = docs.select(explode(split(col("text"), " ")).as("term"))
    val cms = stringCms(tok, "term", eps, confidence, seed)
    val top = tok.groupBy("term").agg(count(lit(1)).as("true_n"))
      .orderBy(col("true_n").desc, col("term").asc)
      .limit(k)
      .as[(String, Long)].collect()
    top.toSeq
      .map { case (term, trueN) =>
        val est = cms.estimateCount(term)
        (term, trueN, est, est - trueN)
      }
      .toDF("term", "true_n", "est_n", "over_n")
  }
}
