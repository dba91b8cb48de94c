package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Blocked global-order windows — the scale-safe replacement for
  * `Window.orderBy(...)` with no partition spec (which funnels the whole
  * frame through ONE reducer; see PlanLint's `global-window` rule).
  *
  * Generalizes q119_seq_gaps' two-level design (DataChecks.scala): range-
  * repartition the frame on the sort key so block ids are MONOTONE in the
  * total order, run the window per block (parallel, partitioned), then
  * add per-block offsets computed on the block-summary frame. The summary
  * frame has at most `blocks` rows (default: spark.sql.shuffle.partitions,
  * i.e. 32 here / the cluster's reducer count at scale), and the offsets
  * are a triangular self-join on that tiny frame — NOT another
  * unpartitioned window — so the whole construction emits zero
  * single-partition WindowExec stages.
  *
  * Correctness does not depend on where the range sampler puts the block
  * boundaries: cumulative sums and row_number decompose exactly as
  * local + preceding-block totals for ANY order-monotone blocking. The
  * blocked frame is persisted (MEMORY_AND_DISK, shared InMemoryRelation)
  * because the range partitioner's sample (and hence the block
  * assignment) must agree between the local window pass and the summary
  * pass. Persist keeps the LINEAGE — an evicted or executor-lost block
  * recomputes through the same deterministic sampler (RangePartitioner
  * seeds by partition index) over the deterministic input this helper
  * already requires, so both reads still agree; a localCheckpoint here
  * would instead truncate lineage into non-replicated executor-local
  * storage and make executor loss unrecoverable at cluster scale.
  *
  * Reference behavior matched: global rank / cumulative-share operators
  * (ABC classes, Lorenz curves, Pareto coverage) — re-expressed so the
  * sort that backs them stays distributed at 100 TB.
  */
object Blocked {

  /** Adds, for each `sumCols` entry `c`, a column `cum_<c>` holding the
    * inclusive running sum of `c` under the total order `sort`, and (when
    * `rn` is set) a global 1-based row number column named `rn.get`.
    * `sort` must be a total order (include a tiebreaker) or row_number
    * and frame boundaries become nondeterministic — same contract as the
    * plain window form this replaces.
    */
  def cumulative(df: DataFrame, sort: Seq[Column], sumCols: Seq[String],
                 rn: Option[String] = None, blocks: Int = 0): DataFrame = {
    val nb =
      if (blocks > 0) blocks
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val blocked = df.repartitionByRange(nb, sort: _*)
      .withColumn("__blk", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK) // block ids agree across both reads
    // level 1: per-block local windows (partitioned — parallel)
    val wOrd = Window.partitionBy("__blk").orderBy(sort: _*)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var local = blocked
    sumCols.foreach { c =>
      local = local.withColumn(s"__loc_$c", sum(c).over(wCum))
    }
    rn.foreach { _ =>
      local = local.withColumn("__loc_rn", row_number().over(wOrd).cast("long"))
    }
    // level 2: block totals (≤ nb rows) + strictly-preceding offsets via a
    // triangular self-join on the tiny summary frame (no global window)
    val aggs = sumCols.map(c => sum(c).as(s"__t_$c")) :+
      count(lit(1)).cast("long").as("__t_n")
    val summ = blocked.groupBy("__blk").agg(aggs.head, aggs.tail: _*)
    val prev = summ.select(
      (col("__blk") +: sumCols.map(c => col(s"__t_$c")) :+ col("__t_n"))
        .zipWithIndex.map { case (c, i) => c.as(s"__p_$i") }: _*)
    val offAggs = sumCols.zipWithIndex.map { case (c, i) =>
      coalesce(sum(col(s"__p_${i + 1}")), lit(0L)).as(s"__off_$c")
    } :+ coalesce(sum(col(s"__p_${sumCols.size + 1}")), lit(0L)).as("__off_n")
    val offs = summ.select("__blk")
      .join(broadcast(prev), col("__p_0") < col("__blk"), "left")
      .groupBy("__blk").agg(offAggs.head, offAggs.tail: _*)
    var out = local.join(broadcast(offs), Seq("__blk"))
    sumCols.foreach { c =>
      out = out.withColumn(s"cum_$c", col(s"__loc_$c") + col(s"__off_$c"))
        .drop(s"__loc_$c", s"__off_$c")
    }
    rn.foreach { name =>
      out = out.withColumn(name, col("__loc_rn") + col("__off_n"))
        .drop("__loc_rn")
    }
    out.drop("__blk", "__off_n")
  }

  /** Partitioned [[cumulative]]: running sums / row numbers under `sort`
    * WITHIN each `part` group — the scale-safe replacement for
    * `Window.partitionBy(k).orderBy(...)` when `k` has constant
    * cardinality (market segments, nations, brands), so each window
    * partition still scales with the data. Range-repartitioning on
    * `part ++ sort` makes block ids monotone within every group (the
    * combined order sorts by group first), the local windows run per
    * (group, block), and the offset frame — one row per (group, block),
    * ≤ |groups|·blocks rows — joins back on group equality with a
    * strictly-preceding-block filter. No unpartitioned window, no frame
    * through one reducer at any step.
    */
  def cumulativeBy(df: DataFrame, part: Seq[String], sort: Seq[Column],
                   sumCols: Seq[String], rn: Option[String] = None,
                   blocks: Int = 0): DataFrame = {
    val nb =
      if (blocks > 0) blocks
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val fullSort = part.map(col) ++ sort
    val blocked = df.repartitionByRange(nb, fullSort: _*)
      .withColumn("__blk", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK) // block ids agree across both reads
    val wOrd = Window.partitionBy((part :+ "__blk").map(col): _*).orderBy(sort: _*)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var local = blocked
    sumCols.foreach { c =>
      local = local.withColumn(s"__loc_$c", sum(c).over(wCum))
    }
    rn.foreach { _ =>
      local = local.withColumn("__loc_rn", row_number().over(wOrd).cast("long"))
    }
    val aggs = sumCols.map(c => sum(c).as(s"__t_$c")) :+
      count(lit(1)).cast("long").as("__t_n")
    val summ = blocked.groupBy((part :+ "__blk").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val prev = summ.select(
      (part.map(col) ++ (col("__blk") +: sumCols.map(c => col(s"__t_$c"))
        :+ col("__t_n"))).zipWithIndex
        .map { case (c, i) => c.as(s"__p_$i") }: _*)
    val np = part.size
    val partEq = part.zipWithIndex
      .map { case (p, i) => col(p) === col(s"__p_$i") }
      .reduce(_ && _)
    val offAggs = sumCols.zipWithIndex.map { case (c, i) =>
      coalesce(sum(col(s"__p_${np + 1 + i}")), lit(0L)).as(s"__off_$c")
    } :+ coalesce(sum(col(s"__p_${np + 1 + sumCols.size}")), lit(0L)).as("__off_n")
    val offs = summ.select((part :+ "__blk").map(col): _*)
      .join(broadcast(prev), partEq && col(s"__p_$np") < col("__blk"), "left")
      .groupBy((part :+ "__blk").map(col): _*)
      .agg(offAggs.head, offAggs.tail: _*)
    var out = local.join(broadcast(offs), part :+ "__blk")
    sumCols.foreach { c =>
      out = out.withColumn(s"cum_$c", col(s"__loc_$c") + col(s"__off_$c"))
        .drop(s"__loc_$c", s"__off_$c")
    }
    rn.foreach { name =>
      out = out.withColumn(name, col("__loc_rn") + col("__off_n"))
        .drop("__loc_rn")
    }
    out.drop("__blk", "__off_n")
  }

  /** Adds `out` = running max of `value` under the total order `sort`,
    * blocked exactly like [[cumulative]]. With `inclusive = false` the
    * frame is the STRICT prefix (rows before the current one): the first
    * row gets NULL — "nothing precedes", which is the semantics
    * prefix-dominance operators (skyline) want. `greatest` skips nulls,
    * so block-0 rows (no preceding-block offset) fall back to the local
    * prefix alone. */
  def prefixMax(df: DataFrame, sort: Seq[Column], value: String, out: String,
                inclusive: Boolean = true, blocks: Int = 0): DataFrame = {
    val nb =
      if (blocks > 0) blocks
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val blocked = df.repartitionByRange(nb, sort: _*)
      .withColumn("__blk", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK) // block ids agree across both reads
    val wOrd = Window.partitionBy("__blk").orderBy(sort: _*)
    val frame =
      if (inclusive) wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val local = blocked.withColumn("__loc", max(value).over(frame))
    val summ = blocked.groupBy("__blk").agg(max(value).as("__t"))
    val prev = summ.select(col("__blk").as("__p_blk"), col("__t").as("__p_t"))
    val offs = summ.select("__blk")
      .join(broadcast(prev), col("__p_blk") < col("__blk"), "left")
      .groupBy("__blk").agg(max("__p_t").as("__off"))
    local.join(broadcast(offs), Seq("__blk"))
      .withColumn(out, greatest(col("__loc"), col("__off")))
      .drop("__blk", "__loc", "__off")
  }
}
