package graft.plans

import org.apache.spark.sql.DataFrame

/** Lineage truncation for ITERATIVE algorithms — localCheckpoint plus a
  * statistics reset.
  *
  * `Dataset.localCheckpoint` (Spark 4) truncates the logical plan to a
  * `LogicalRDD` leaf but COPIES the origin plan's *estimated* statistics
  * into that leaf (so joins planned downstream still see a size). In an
  * iterative algorithm over frames with unknown sizes that estimate is a
  * product of join-size guesses, and it COMPOUNDS: round k's leaf carries
  * the product of round k−1's estimates, whose factors were themselves
  * products — the digit count of `sizeInBytes` roughly quadruples per
  * round. By round ~25 the driver sits in
  * `SizeInBytesOnlyStatsPlanVisitor` multiplying MILLION-digit BigInts
  * for minutes per plan (observed live in R147's Borůvka loop, whose
  * inner connected-components fixpoint multiplied the compounding by its
  * own iteration count). The data is tiny; the PLANNER is the bottleneck.
  *
  * Fix: after the checkpoint, re-wrap the materialized RDD through
  * `createDataFrame`, producing a fresh `LogicalRDD` with the engine's
  * default (constant) size estimate. Planning cost per round is then
  * O(plan) forever. The conservative default disables size-based
  * broadcast choices for the frame — exactly right for an iterative
  * frame whose true size the engine cannot know; the iterative operators
  * place `broadcast()` hints explicitly where a side is provably
  * bounded.
  */
object Lineage {

  /** Eagerly materialize `df`, truncating BOTH lineage and carried
    * statistics. Drop-in replacement for `df.localCheckpoint(true)`
    * inside loops. */
  def truncate(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    // ck.rdd reads the already-materialized checkpoint blocks; the
    // re-wrap resets the leaf's carried stats to the constant default.
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
