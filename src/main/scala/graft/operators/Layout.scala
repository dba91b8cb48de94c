package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators (SURVEY.md §2 L22/L23): how 100 TB actually
  * stays scannable. Parquet pruning works off per-file/row-group min-max
  * stats, so the WRITE-side row order decides whether a later filter
  * reads 1% or 100% of the lake.
  *
  *  - [[zorderWrite]]: multi-column clustering via a Z-value (Morton
  *    code) sort — equal-frequency bucket per dimension (quantile
  *    boundaries, so skew can't collapse the curve), bit-interleaved
  *    into one integer, then `repartitionByRange` + in-partition sort on
  *    it. Files end up covering small hyper-rectangles, so min-max
  *    pruning is selective on EVERY clustered column, not just a lead
  *    sort key. (Same layout idea Delta/Iceberg OPTIMIZE ZORDER uses;
  *    built here from plain Spark expressions.)
  *  - [[compact]]: bin-pack a directory of small files into
  *    ~`targetBytes` outputs with a staged, atomic, crash-safe publish —
  *    streaming sinks and incremental ingests produce file counts that
  *    otherwise dominate scan planning time at scale.
  *
  * Both are write-side: they change bytes-on-disk layout, never query
  * results — specs prove content identity plus the layout property
  * (per-file min-max selectivity / file count + size).
  */
object Layout {

  /** Equal-frequency bucket id (0..2^bits-1) for one column from
    * approx-quantile boundaries: a codegen'd `when`-chain over at most
    * 2^bits-1 literal thresholds (bits ≤ 6 keeps the chain small). The
    * boundary fetch is one tiny driver-side quantile sketch pass. */
  private def bucketExpr(boundaries: Array[Double], c: Column): Column = {
    val base: Column = lit(boundaries.length) // above every boundary
    boundaries.zipWithIndex.reverse.foldLeft(base) { case (acc, (b, i)) =>
      when(c <= lit(b), lit(i)).otherwise(acc)
    }
  }

  /** Interleave the low `bits` of each bucket id into a Morton code —
    * pure integer shift/or arithmetic, whole-stage codegen'd. Bucket ids
    * are widened to long first: int shift counts wrap mod 32, so past 31
    * interleaved bits the dims would silently collide and corrupt the
    * Z-order (invisible — layout quality only). Beyond 63 bits even a
    * long can't hold the code, so that is a hard error. */
  private def mortonExpr(buckets: Seq[Column], bits: Int): Column = {
    (0 until bits).flatMap { b =>
      buckets.zipWithIndex.map { case (col0, d) =>
        // bit b of dim d lands at position b*nDims + d
        shiftleft(shiftright(col0.cast("long"), b).bitwiseAND(lit(1L)),
          b * buckets.size + d)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-value column for `df` over numeric `cols` (cast to double for the
    * quantile boundaries; ordering is all that matters). Exposed for
    * specs; [[zorderWrite]] is the user entry point. */
  /** Equal-frequency bucket ids (0..2^bits−1) for each of `cols` — ONE
    * multi-column quantile pass (the per-column overload would re-scan
    * the input once per clustered dimension), shared by the Morton and
    * Hilbert curves so their bucketing can never drift apart. */
  private def bucketCols(df: DataFrame, cols: Seq[String], bits: Int): Seq[Column] = {
    val nBuckets = 1 << bits
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val doubled = cols.foldLeft(df)((d, c) =>
      d.withColumn(s"__bq_$c", col(c).cast("double")))
    val bounds = doubled.stat.approxQuantile(
      cols.map(c => s"__bq_$c").toArray, probs, 0.01)
    cols.zip(bounds).map { case (name, bs) =>
      bucketExpr(bs, col(name).cast("double"))
    }
  }

  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 6): Column = {
    require(bits * cols.size <= 63,
      s"zorder: $bits bits x ${cols.size} dims = ${bits * cols.size} " +
        "interleaved bits > 63 — lower bits or cluster fewer columns")
    mortonExpr(bucketCols(df, cols, bits), bits)
  }

  /** Write `df` to `outDir` clustered on `cols` into `nFiles` files.
    * One range shuffle on the Z-value (sampled range boundaries keep
    * files equal-sized), one in-partition sort — the same cost class as
    * any global sort write, independent of dimension count. */
  def zorderWrite(df: DataFrame, cols: Seq[String], outDir: String,
                  nFiles: Int, bits: Int = 6): Unit =
    df.withColumn("__z", zvalue(df, cols, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  /** Hilbert curve position for 2-D bucket ids `(x, y)` in a
    * 2^bits × 2^bits grid: the classic per-level xy2d walk (examine one
    * bit of each coordinate, add the quadrant's offset, reflect+swap
    * into the next level's frame) UNROLLED at expression-build time into
    * `bits` levels of pure when/bitwise Column arithmetic — no UDF, the
    * whole tree whole-stage codegens like [[mortonExpr]].
    *
    * Why offer it next to Morton: consecutive Hilbert cells are always
    * grid-ADJACENT (unit Manhattan steps — LayoutSpec proves it over the
    * full grid), while the Z-curve teleports at every power-of-two seam;
    * range-partitioned files therefore cover tighter rectangles and
    * range predicates touch fewer files.
    *
    * NOTE: the single-Column form re-nests both coordinate subtrees per
    * level — tree size is exponential in `bits`. Fine for spec-scale
    * grids over plain columns (≤ 6 bits, enforced); the write path
    * ([[withHvalue]]) builds the same walk as a linear projection chain
    * instead. */
  def hilbertIndex(xCol: Column, yCol: Column, bits: Int): Column = {
    require(bits <= 6,
      s"hilbertIndex: expression form is exponential in bits ($bits > 6) — " +
        "use withHvalue's projection chain")
    var x = xCol.cast("long")
    var y = yCol.cast("long")
    var d: Column = lit(0L)
    ((bits - 1) to 0 by -1).foreach { level =>
      val s = 1L << level
      val rx = when(x.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      d = d + lit(s * s) * (rx * 3L).bitwiseXOR(ry)
      // frame rotation for the next level: reflect when rx=1∧ry=0, then
      // swap axes when ry=0 (faithful port of the sequential algorithm)
      val xr = when(ry === 0L && rx === 1L, lit(s - 1) - x).otherwise(x)
      val yr = when(ry === 0L && rx === 1L, lit(s - 1) - y).otherwise(y)
      val nx = when(ry === 0L, yr).otherwise(xr)
      val ny = when(ry === 0L, xr).otherwise(yr)
      x = nx
      y = ny
    }
    d
  }

  /** `df` plus a Hilbert position column `out` over exactly two numeric
    * columns — same equal-frequency quantile bucketing as [[zvalue]]
    * (skew cannot collapse the curve), then the per-level walk built as
    * a PROJECTION CHAIN: one `withColumn` layer per curve level, each
    * referencing the previous level's named columns. The single-Column
    * form ([[hilbertIndex]]) re-nests both coordinate subtrees at every
    * level — exponential tree growth that OOMs expression conversion
    * once quantile when-chains sit at the leaves — while the chained
    * projections stay linear (Catalyst keeps multi-referenced non-cheap
    * aliases as projection boundaries instead of inlining them). */
  def withHvalue(df: DataFrame, cols: Seq[String], bits: Int = 6,
                 out: String = "__h"): DataFrame = {
    require(cols.size == 2,
      s"hilbert: exactly 2 clustered columns supported, got ${cols.size} " +
        "(use zorderWrite for higher dimensions)")
    require(2 * bits <= 62, s"hilbert: $bits bits per dim overflows the long code")
    val Seq(bx, by) = bucketCols(df, cols, bits).map(_.cast("long"))
    hilbertWalk(df.withColumn("__hx", bx).withColumn("__hy", by), bits, out)
      .drop("__hx", "__hy")
  }

  /** The projection-chain xy2d walk over existing integer cell columns
    * `__hx`/`__hy` (each in 0..2^bits−1) — one `withColumn` layer per
    * level, linear plan growth. Shared by [[withHvalue]] and pinned
    * against the sequential reference (and [[hilbertIndex]]) in
    * LayoutSpec, so the write path and the spec'd curve cannot drift. */
  private[graft] def hilbertWalk(df0: DataFrame, bits: Int, out: String): DataFrame = {
    var acc = df0.withColumn(out, lit(0L))
    // `out` must be excluded too: an input that already carries a column
    // of that name is REPLACED by the withColumn above, and keeping it in
    // the pass-through list would emit a duplicate name whose reference
    // turns ambiguous at the next level
    val keep = df0.columns.filterNot(c => c == "__hx" || c == "__hy" || c == out).toSeq
    ((bits - 1) to 0 by -1).foreach { level =>
      val s = 1L << level
      // ONE projection per level: rx/ry are cheap bit tests inlined into
      // the three outputs, and hx'/hy'/d reference the PREVIOUS level's
      // attributes — constant-size expressions per level, `bits` Project
      // nodes total (the 7-withColumn form compiled 7·bits layers, which
      // overflowed whole-stage codegen into interpreted evaluation)
      val rx = when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val cols = keep.map(col) ++ Seq(
        (col(out) + lit(s * s) * (rx * 3L).bitwiseXOR(ry)).as(out),
        when(ry === 0L, when(rx === 1L, lit(s - 1) - col("__hy")).otherwise(col("__hy")))
          .otherwise(col("__hx")).as("__hx"),
        when(ry === 0L, when(rx === 1L, lit(s - 1) - col("__hx")).otherwise(col("__hx")))
          .otherwise(col("__hy")).as("__hy"))
      acc = acc.select(cols: _*)
    }
    acc
  }

  /** [[zorderWrite]]'s Hilbert twin: cluster `df` on two columns by
    * Hilbert curve position. Identical cost shape — one range shuffle,
    * one in-partition sort. */
  def hilbertWrite(df: DataFrame, cols: Seq[String], outDir: String,
                   nFiles: Int, bits: Int = 6): Unit =
    withHvalue(df, cols, bits, "__h")
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(outDir)

  /** Per-file min/max of `cols` for a parquet directory — the exact
    * stats a reader's pruning consults, reconstructed relationally so
    * specs (and operators) can measure a layout's selectivity: for a
    * point predicate `c = v`, the files with `min <= v <= max` are the
    * ones a scan must read. */
  def fileStats(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(c).as(s"min_$c"), max(c).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fraction of files of `dir` a point-lookup `c = v` must read under
    * min-max pruning (1.0 = layout useless for that column). */
  def pruneFraction(spark: SparkSession, dir: String, c: String, v: Double): Double = {
    val st = fileStats(spark, dir, Seq(c))
    val total = st.count()
    val hit = st.filter(col(s"min_$c") <= v && col(s"max_$c") >= v).count()
    if (total == 0) 1.0 else hit.toDouble / total
  }

  /** Compact a FLAT parquet directory in place to ~`targetBytes` files:
    * read once, coalesce (no shuffle) to `ceil(totalBytes/targetBytes)`
    * outputs, write to a staging dir, then swap via the shared
    * backup-rename protocol ([[graft.streaming.EventStream
    * .publishWithBackup]]). Crash-safe end to end: a run that died
    * after moving the live dir aside left the backup as the only copy —
    * recovery-first restores it before anything else, so a re-run (or a
    * reader that calls compact) always sees either the old or the new
    * state. Hive-partitioned tables (`col=value` subdirs) are REFUSED
    * loudly rather than silently flattened — collapsing them to one
    * unpartitioned file would both destroy partition pruning and, for
    * marker-pinned layouts like the bucketed upsert state, corrupt the
    * table's contract; compact each partition directory instead.
    * Returns the new file count. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(hadoopConf)
    val staging = new org.apache.hadoop.fs.Path(dir + ".__compact_staging")
    val backup = new org.apache.hadoop.fs.Path(dir + ".__compact_backup")
    // recovery first: crash between the two publish renames leaves the
    // backup as the ONLY copy — restore it; a backup next to a live dir
    // is a completed publish's debris — drop it
    graft.streaming.EventStream.recoverFirst(fs, path, backup)
    fs.delete(staging, true)
    val entries = fs.listStatus(path)
    val dataFiles = entries.filter(f => f.getPath.getName.endsWith(".parquet"))
    if (dataFiles.isEmpty && entries.exists(e => e.isDirectory && e.getPath.getName.contains("=")))
      throw new IllegalArgumentException(
        s"compact: $dir is hive-partitioned — compact each partition directory instead")
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode("overwrite").parquet(staging.toString)
    // unlike the streaming sinks (whose recovery runs every micro-batch),
    // nothing re-runs compact on a one-shot failure — roll back in
    // process when the promote rename fails, so readers never see a
    // missing table on a transient FS error
    try graft.streaming.EventStream.publishWithBackup(fs, staging, path, backup)
    catch { case e: java.io.IOException =>
      if (!fs.exists(path) && fs.exists(backup)) fs.rename(backup, path)
      throw e
    }
    nOut
  }

  /** Compact a HIVE-PARTITIONED table partition by partition — the path
    * [[compact]] deliberately refuses (flattening would destroy the
    * layout). Each `col=value` leaf directory is compacted independently
    * through the same staged-write + backup-rename protocol, so a crash
    * leaves every partition either old or new — and because partitions
    * publish one at a time, a half-finished RUN is also safe: done
    * partitions are live, untouched ones unchanged, and re-running
    * converges (compaction is idempotent). Nested partitioning recurses
    * to the leaves. Returns (partitions compacted, total output files).
    * At 100 TB this loop is the nightly small-file janitor: partition
    * count bounds driver iterations, data never leaves its partition,
    * and readers are never blocked (each swap is two renames).
    */
  def compactPartitioned(spark: SparkSession, dir: String,
                         targetBytes: Long): (Int, Int) = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(hadoopConf)
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val kids = fs.listStatus(p).filter(_.isDirectory)
        .filter(_.getPath.getName.contains("="))
      if (kids.isEmpty) Seq(p)
      else kids.toSeq.flatMap(k => leaves(k.getPath))
    }
    require(fs.exists(root), s"compactPartitioned: $dir does not exist")
    val parts = leaves(root).filter(_ != root)
    require(parts.nonEmpty,
      s"compactPartitioned: $dir has no col=value partition directories — use compact")
    var files = 0
    parts.foreach { p => files += compact(spark, p.toString, targetBytes) }
    (parts.size, files)
  }
}
