package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Embedding-similarity column functions.
  *
  * Determinism design: float components are quantized to integers
  * (`floor(x · 2^20)`), so dot products and squared norms are exact
  * 64-bit integer sums (every partial sum < 2^53 ⇒ exact in any
  * accumulation order, in any engine). The only floating-point steps are
  * the final `sqrt` and division — IEEE-deterministic given identical
  * integer inputs — which makes cosine values reproducible bit-for-bit
  * against external oracles and across cluster re-runs.
  */
object VectorFunctions {

  val QuantScale: Long = 1L << 20

  /** Quantize a float/double vector to exact integer components. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x * lit(QuantScale.toDouble)).cast(LongType))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Exact integer squared norm. */
  def normSqQ(a: Column): Column = dotQ(a, a)

  /** Cosine similarity from precomputed integer dot + squared norms. */
  def cosineFrom(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") / (sqrt(normSqA) * sqrt(normSqB))

  /** Sign-bit LSH bucket for approximate search: `nBits` pseudo-random
    * ±1 hyperplanes with components derived from a splittable hash of
    * (plane, dimension) — deterministic, no stored model. Returns an
    * integer bucket id in [0, 2^nBits).
    */
  def lshBucket(qvec: Column, nBits: Int, dims: Int): Column = {
    val bits = (0 until nBits).map { p =>
      // ±1 hyperplane component for (plane p, dim i): parity of a hash.
      val proj = aggregate(
        zip_with(qvec, lit((0 until dims).toArray),
          (x, i) => when(pmod(hash(lit(p) * 1000 + i), lit(2)) === 0, x)
            .otherwise(-x)),
        lit(0L), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }
}
