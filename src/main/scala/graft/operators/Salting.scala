package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join: the generic guard for a fact table whose join
  * key is pathologically hot (one state, one hot document, one null-ish
  * default key) joined against a dimension too large to broadcast.
  *
  * The fact side derives a DETERMINISTIC salt in [0, nSalts) from a
  * per-row column (not `rand()` — retries and speculative tasks must
  * re-derive identical salts), widening each hot key across nSalts
  * shuffle partitions; the dimension side replicates each row nSalts
  * times. The join then distributes a hot key's rows over nSalts tasks
  * at the cost of an nSalts× dimension inflation — the standard
  * trade when AQE's skew-split (which only helps sort-merge joins
  * after the fact) is not enough or the operator is stateful.
  *
  * Result set is IDENTICAL to the unsalted equi-join (asserted in
  * OpsSpec against the plain join).
  */
object Salting {

  /** Inner equi-join of `fact` and `dim` on `keys`, fact rows salted by
    * `saltFrom` (any column with per-row spread, e.g. the fact's
    * primary key). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltFrom: Column, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = fact.withColumn("__salt", pmod(hash(saltFrom), lit(nSalts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
