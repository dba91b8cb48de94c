package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable + incremental sketch state (the sketch-family member of the
  * L2b/L7c/L50c incremental-index pattern): Count-Min counters and a
  * KMV distinct sketch maintained across ingest batches, so frequency
  * and distinct-count questions over a 100 TB corpus are answered from
  * O(d·w + k) stored rows and each ingest costs O(batch) — the corpus
  * is never re-scanned.
  *
  * Both sketches are EXACTLY mergeable — CMS by counter addition, KMV
  * by k-min of the union — so the stored state after any batch split
  * equals the one-shot sketch BIT FOR BIT (the spec asserts equality,
  * not tolerance; estimator guarantees like never-underestimate then
  * carry over unchanged from the one-shot analysis in [[Sketches]]).
  *
  * State layout mirrors [[PcaIndex]]: `<dir>/cms` (i, b, c), `<dir>/kmv`
  * (h), `<dir>/batches` (applied ids), staged + published atomically by
  * the shared backup-rename protocol — an additive merge is not
  * idempotent, so counters and the replay marker commit together.
  * Replayed batch ids are no-ops. SINGLE WRITER by contract.
  */
object SketchIndex {

  val Depth = 4
  val Width = 8192
  val K = 256

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def recover(spark: SparkSession, stateDir: String): Unit =
    graft.streaming.EventStream.recoverFirst(fs(spark, stateDir),
      new org.apache.hadoop.fs.Path(stateDir),
      new org.apache.hadoop.fs.Path(stateDir + ".__backup"))

  /** CMS counters (i ∈ [1,Depth], b, c) of a batch's `key` column.
    * The Depth row hashes are disjoint 8-hex-char slices of ONE md5
    * (same rationale as sk2: per-row-salted digests cost Depth× the
    * hashing for no independence gain). */
  def cmsOf(batch: DataFrame, key: String): DataFrame =
    batch.select(md5(col(key).cast("string")).as("dg"))
      .withColumn("i", explode(expr(s"sequence(1, $Depth)")))
      .groupBy(col("i"), expr(
        s"CAST(conv(substr(dg, 1+(i-1)*8, 8),16,10) AS BIGINT) % $Width")
        .as("b"))
      .agg(count(lit(1)).as("c"))

  /** KMV sketch (K smallest distinct portable hashes) of `key`. */
  def kmvOf(batch: DataFrame, key: String): DataFrame =
    batch.select(expr(
        s"CAST(conv(substr(md5(CAST($key AS STRING)),1,15),16,10) AS BIGINT)")
        .as("h"))
      .distinct().orderBy("h").limit(K)

  /** Merge a batch into the sketch state at `stateDir`, creating it if
    * absent. Replayed batch ids are no-ops. Returns true iff applied. */
  def update(spark: SparkSession, stateDir: String, batch: DataFrame,
             key: String, batchId: Long): Boolean = {
    import spark.implicits._
    val hfs = fs(spark, stateDir)
    val main = new org.apache.hadoop.fs.Path(stateDir)
    val backup = new org.apache.hadoop.fs.Path(stateDir + ".__backup")
    val staging = new org.apache.hadoop.fs.Path(stateDir + ".__staging")
    recover(spark, stateDir)
    hfs.delete(staging, true)

    val exists = hfs.exists(main)
    val appliedIds: Seq[Long] =
      if (!exists) Seq.empty
      else spark.read.parquet(s"$stateDir/batches").as[Long].collect().toSeq
    if (appliedIds.contains(batchId)) return false // replay — already committed

    val bc = cmsOf(batch, key)
    val bk = kmvOf(batch, key)
    val (cms, kmv) =
      if (!exists) (bc, bk)
      else (
        spark.read.parquet(s"$stateDir/cms").unionByName(bc)
          .groupBy("i", "b").agg(sum("c").as("c")),
        spark.read.parquet(s"$stateDir/kmv").unionByName(bk)
          .distinct().orderBy("h").limit(K))
    cms.write.parquet(s"$staging/cms")
    kmv.write.parquet(s"$staging/kmv")
    (appliedIds :+ batchId).toDF("batch_id").write.parquet(s"$staging/batches")
    try graft.streaming.EventStream.publishWithBackup(hfs, staging, main, backup)
    catch { case e: java.io.IOException =>
      if (!hfs.exists(main) && hfs.exists(backup)) hfs.rename(backup, main)
      throw e
    }
    true
  }

  /** Frequency estimates for `probes` (a `k` string-able column) from
    * the STORED counters: min over the Depth rows, 0 for never-seen
    * buckets. Never underestimates the true count. */
  def cmsEstimate(spark: SparkSession, stateDir: String,
                  probes: DataFrame): DataFrame = {
    recover(spark, stateDir)
    val cnt = spark.read.parquet(s"$stateDir/cms")
    probes.select(col("k").cast("string").as("k"))
      .withColumn("dg", md5(col("k")))
      .withColumn("i", explode(expr(s"sequence(1, $Depth)")))
      .withColumn("b", expr(
        s"CAST(conv(substr(dg, 1+(i-1)*8, 8),16,10) AS BIGINT) % $Width"))
      .join(cnt, Seq("i", "b"), "left")
      .groupBy("k").agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Distinct-count estimate from the STORED KMV sketch: exact while
    * the sketch is not full, (K−1)·M/θ once it is. */
  def distinctEstimate(spark: SparkSession, stateDir: String): DataFrame = {
    recover(spark, stateDir)
    spark.read.parquet(s"$stateDir/kmv")
      .agg(max("h").as("theta"), count(lit(1)).as("kk"))
      .select(expr(
        s"""CAST(CASE WHEN kk < $K THEN CAST(kk AS DECIMAL(38,0))
           |ELSE CAST(kk-1 AS DECIMAL(38,0)) * 1152921504606846976 DIV theta
           |END AS BIGINT)""".stripMargin).as("est_distinct"))
  }
}
