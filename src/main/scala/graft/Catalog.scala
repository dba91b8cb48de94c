package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark query over the sf-dir tables plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL. Column names/types
  * are aliased identically on both sides — the driver's compare hashes
  * values under sorted column names.
  *
  * Rows-only entries carry a REASON from the documented taxonomy, so
  * the artifact itself proves the oracle-less set can't silently grow
  * (VERDICT r4 item 6):
  *  - `sketch`       approximate sketches (HLL / KLL / approx_top_k)
  *                   whose estimates no exact engine reproduces
  *  - `hash-based`   candidates keyed by xxhash64/minhash buckets —
  *                   Spark's hash seeds aren't portable SQL
  *  - `fixpoint`     iterative numeric fixpoints (k-means, eigensolve,
  *                   peeling, BPE merges) with no bounded SQL unroll
  *  - `binary-codec` binary media parsing (JPEG/MP4/EXIF byte walks)
  *                   DuckDB has no functions for
  *  - `deflate`      DEFLATE compression ratios — engine-specific codec
  *  - `stateful`     arbitrary per-key state machines
  *                   (flatMapGroupsWithState) beyond SQL semantics
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    rowsOnlyReason: Option[String] = None)

object Q {
  /** The documented rows-only reasons; rowsOnly refuses anything else. */
  val RowsOnlyReasons: Set[String] =
    Set("sketch", "hash-based", "fixpoint", "binary-codec", "deflate", "stateful")

  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def rowsOnly(name: String, reason: String)(run: (SparkSession, String) => DataFrame): Q = {
    require(RowsOnlyReasons.contains(reason),
      s"rowsOnly($name): reason '$reason' not in $RowsOnlyReasons")
    Q(name, run, None, Some(reason))
  }
}
