package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — temporal operators the reference's relational
  * surface (and any feed-style source it queries) needs but Spark lacks
  * as built-ins.
  *
  * Both are built by composition (SURVEY.md design rule (a)): the as-of
  * join is the union–sort–last-carry-forward formulation (one shuffle on
  * the key, one per-key sort — the same cost as a single sort-merge join,
  * linear at 100 TB, never a per-row probe), and the range join buckets
  * intervals so the join is an equi-join on (key, bucket) instead of a
  * broadcast-nested-loop over the non-equi predicate.
  */
object AsOfJoin {

  /** For each left row, attach the latest right row with
    * `right.tsCol <= left.tsCol` sharing `keys` (pandas merge_asof /
    * QuestDB ASOF JOIN semantics, backward direction).
    *
    * Plan shape: union both sides → single hash shuffle on `keys` →
    * per-key sort by (ts, side) → `last(_, ignoreNulls)` running window
    * carries the most recent right values forward onto left rows.
    * When several right rows share one timestamp the latest by
    * `rightTiebreak` wins.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           rightCols: Seq[String], rightTiebreak: Column): DataFrame = {
    val leftCols = left.columns.toSeq
    // side=1 for left so that at equal ts the right row sorts first and is
    // visible to the left row (inclusive <= semantics).
    val l = left.withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)))
    // the right row rides as ONE struct: the carry then attaches a
    // coherent row, never a column-wise mix of different right rows
    // (per-column last(ignoreNulls) would skip a null field back to an
    // older row's value)
    val rBase = right.select((keys :+ tsCol).map(col) ++ rightCols.map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__tb", rightTiebreak.cast("long"))
      .withColumn("__r", struct(rightCols.map(col): _*))
      .drop(rightCols: _*)
    // null-pad the left-only columns in ONE select (a withColumn per
    // column would re-run the analyzer once per column on a wide frame)
    val r = rBase.select(rBase.columns.map(col) ++
      leftCols.filter(c => !keys.contains(c) && c != tsCol)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = l.select(r.columns.map(col): _*).union(r)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** [[asof]] through the native physical operator
    * ([[graft.plans.AsOfJoinExec]]) instead of the union–window
    * composition: each side shuffles and sorts independently on
    * (key, time) and a single forward merge pass attaches the latest
    * at-or-before right row — already-bucketed inputs skip the exchange
    * entirely, which the composition cannot. Requires
    * [[graft.GraftExtensions]] on the session (every graft session has
    * it). Contract: `right`'s non-key columns must not collide with
    * `left`'s (the key is renamed internally and dropped); right rows
    * unique per (key, time) — DuckDB ASOF's own contract.
    */
  def asofNative(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String): DataFrame = {
    val r = right.withColumnRenamed(key, "__rk")
    left.join(r,
        call_function("asof_match",
          left(key), r("__rk"), left(leftTs), r(rightTs)), "left")
      .drop("__rk")
  }

  /** Numeric range join: rows of `fact` matched to intervals of `ranges`
    * satisfying `lo <= v < hi`, as an equi-join on bucketed values.
    *
    * Each interval is exploded into the `bucketWidth`-aligned buckets it
    * overlaps; the fact side computes its single bucket — so the join is
    * a plain shuffle/broadcast equi-join plus a residual filter, never a
    * nested loop. Pick `bucketWidth` near the median interval width so
    * interval replication stays O(1).
    */
  def rangeJoin(fact: DataFrame, valueCol: String,
                ranges: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Long): DataFrame = {
    // inverted/empty intervals would make sequence() run DESCENDING and
    // explode spurious buckets — they can match nothing, drop them first.
    // Last bucket for the EXCLUSIVE hi bound is ceil(hi/w)-1 — equal to
    // floor(hi/w) off-boundary and floor(hi/w)-1 exactly on a boundary —
    // rather than floor((hi-eps)/w), whose epsilon dropped fact values
    // landing within eps below hi into a bucket the interval never joined.
    val expanded = ranges.filter(col(hiCol) > col(loCol)).withColumn("__bucket",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        ceil(col(hiCol) / bucketWidth).cast("long") - 1)))
    fact.withColumn("__bucket", floor(col(valueCol) / bucketWidth).cast("long"))
      .join(expanded, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
