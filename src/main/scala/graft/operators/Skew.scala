package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §6): salting for joins whose key
  * distribution is too skewed for AQE's split-based skew handling (e.g. a
  * handful of hot keys holding >10% of a 100 TB fact table each).
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt in
    * [0, salts) per row; the small side is replicated `salts`× — so one
    * hot key spreads over `salts` reducers instead of one. Result is
    * row-identical to `big.join(small, keys)`.
    *
    * Replication factor applies to the WHOLE small side; for selective
    * hot-key-only salting, filter `small` to hot keys first and union
    * with an unsalted join of the rest.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    // salt from the ROW CONTENT: stable under task retries (rand() and
    // monotonically_increasing_id are both nondeterministic across
    // re-executed map tasks, which silently duplicates/loses join rows
    // when a lost executor forces recomputation mid-shuffle). Identical
    // rows share a salt — spread is by value distribution, which is what
    // breaks up a hot KEY regardless.
    val saltExpr = pmod(xxhash64(big.columns.map(col): _*), lit(salts)).cast("int")
    val bigSalted = big.withColumn("__salt", saltExpr)
    val smallExploded = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(smallExploded, keys :+ "__salt").drop("__salt")
  }
}
