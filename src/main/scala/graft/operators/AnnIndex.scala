package graft.operators

import graft.functions.Vectors._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable, incrementally-appendable ANN indexes (SURVEY.md §2 L7c) —
  * the similarity-search twin of the incremental MinHash dedup path
  * (L2b, [[Dedup.minhashLshIncremental]]): at 100 TB the index is built
  * ONCE, persisted, and each ingest batch assigns/appends ONLY its own
  * vectors — never re-fitting the quantizer or re-hashing the corpus.
  *
  * Two index families, same lifecycle (`build` → `append`* → `query`):
  *
  *  - '''IVF''': k-means coarse quantizer trained on a deterministic
  *    content-hash sample at build time and FROZEN; inverted lists stored
  *    as parquet partitioned by centroid id, so a query's `nProbe` list
  *    probe becomes dynamic partition pruning — a 1000-executor scan
  *    touches `nProbe/nCentroids` of the files, not the corpus. Appends
  *    re-enter the stored centroids as literal expressions
  *    ([[Similarity.nearestCid]]), so batch and incremental assignment
  *    are the SAME codegen'd expression — provably identical.
  *  - '''LSH''': multi-table sign-bucket index `(tab, bk, vec_id)`
  *    partitioned by table. The hash family is stateless (no trained
  *    state), so incremental build is exactly equivalent to a full
  *    rebuild by construction; the spec pins it anyway.
  *
  * Replay safety matches L2b: every append anti-joins the batch against
  * the stored ids first (a column-pruned id scan), so a retried/replayed
  * batch appends nothing and the index never holds duplicate rows.
  */
object AnnIndex {

  private def listsDir(indexDir: String) = s"$indexDir/lists"
  private def centroidsDir(indexDir: String) = s"$indexDir/centroids"
  private def tablesDir(indexDir: String) = s"$indexDir/tables"
  private def lshParamsPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(s"$indexDir/_graft_lsh_params")

  /** Pin the LSH layout constants in the index (same pattern as the
    * bucketed sink's `_graft_num_buckets` marker): an append or query
    * with a different hash family than the build would silently mix
    * incompatible bucketings — recall collapses with no error. The
    * marker makes the mismatch loud. */
  private def writeLshParams(spark: SparkSession, indexDir: String,
                             nTables: Int, bits: Int): Unit = {
    val p = lshParamsPath(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$nTables,$bits".getBytes("UTF-8")) finally out.close()
  }

  private def requireLshParams(spark: SparkSession, indexDir: String,
                               nTables: Int, bits: Int): Unit = {
    val p = lshParamsPath(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val stored = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
      require(stored == s"$nTables,$bits",
        s"LSH index at $indexDir was built with (nTables,bits)=($stored); " +
          s"got ($nTables,$bits) — layout constants are fixed at build time")
    }
  }

  // ---------------------------------------------------------------- IVF

  /** Build the IVF index at `indexDir` from `vectors` (vec_id, v, nrm):
    * trains the quantizer on a content-hash sample ([[Similarity
    * .trainCentroids]]) then delegates to [[buildIvfWith]]. */
  def buildIvf(spark: SparkSession, vectors: DataFrame, indexDir: String,
               nCentroids: Int = 16, sampleDivisor: Int = 10): Unit = {
    // three actions consume the frame (sample-count guard, k-means fit,
    // partitioned write) — persist so the upstream lineage runs once
    val v = vectors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try buildIvfWith(spark, v, indexDir,
      Similarity.trainCentroids(v, nCentroids, sampleDivisor))
    finally v.unpersist()
  }

  /** Build with an explicit (frozen) quantizer — the one-shot reference
    * the incremental spec compares against, and the seam that makes the
    * centroid lifecycle explicit: centroids are index STATE, fixed at
    * build time. */
  def buildIvfWith(spark: SparkSession, vectors: DataFrame, indexDir: String,
                   centroids: Array[(Int, Array[Double])]): Unit = {
    import spark.implicits._
    centroids.map { case (i, c) => (i, c.toSeq) }.toSeq.toDF("cid", "center")
      .coalesce(1)
      .write.mode("overwrite").parquet(centroidsDir(indexDir))
    vectors
      .withColumn("cid", Similarity.nearestCid(col("v"), centroids))
      .write.mode("overwrite").partitionBy("cid").parquet(listsDir(indexDir))
  }

  /** Stored quantizer, re-materialized for literal-expression assignment
    * (k centroids ≪ memory — this is model state, not data). */
  def readCentroids(spark: SparkSession, indexDir: String): Array[(Int, Array[Double])] =
    spark.read.parquet(centroidsDir(indexDir))
      .select("cid", "center").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Assign + append ONLY `newVectors` to the stored lists: O(batch)
    * compute + one column-pruned id scan for the replay guard. The
    * stored centroids enter as literals, so this is bit-identical to
    * what the original build would have assigned. */
  def appendIvf(spark: SparkSession, newVectors: DataFrame, indexDir: String): Unit = {
    val centroids = readCentroids(spark, indexDir)
    val existingIds = spark.read.parquet(listsDir(indexDir)).select("vec_id")
    newVectors
      .join(existingIds, Seq("vec_id"), "left_anti")
      .withColumn("cid", Similarity.nearestCid(col("v"), centroids))
      .write.mode("append").partitionBy("cid").parquet(listsDir(indexDir))
  }

  /** Probe the stored index: per query the `nProbe` nearest lists, exact
    * cosine rerank. The broadcast equi-join on the partition column `cid`
    * is what turns the probe into dynamic partition pruning at scale —
    * unprobed lists are never read. */
  def queryIvf(spark: SparkSession, indexDir: String, queries: DataFrame,
               nProbe: Int = 12, topK: Int = 3): DataFrame = {
    val centroids = readCentroids(spark, indexDir)
    val probes = Similarity.probeLists(queries, centroids, nProbe)
    val lists = spark.read.parquet(listsDir(indexDir))
      .select(col("cid"), col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    Similarity.topkRerank(
      lists.join(broadcast(probes), Seq("cid"))
        .withColumn("cos", cosineNative(col("qv"), col("cv"), col("qn"), col("cn")))
        .select("q_id", "c_id", "cos"),
      k = topK)
  }

  // ----------------------------------------------------------------- PQ

  private def codesDir(indexDir: String) = s"$indexDir/codes"
  private def booksDir(indexDir: String) = s"$indexDir/codebooks"

  /** Build the PQ index at `indexDir` from `vectors` (vec_id, v, nrm):
    * trains the per-subspace codebooks on a content-hash sample
    * ([[Similarity.trainPqCodebooks]]) then delegates to
    * [[buildPqWith]]. */
  def buildPq(spark: SparkSession, vectors: DataFrame, indexDir: String,
              m: Int = 16, ks: Int = 32, sampleDivisor: Int = 10): Unit = {
    val v = vectors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try buildPqWith(spark, v, indexDir,
      Similarity.trainPqCodebooks(v, m, ks, 64 / m, sampleDivisor))
    finally v.unpersist()
  }

  /** Build with explicit (frozen) codebooks — like the IVF quantizer,
    * codebooks are index STATE fixed at build time; appends re-enter
    * them as literals so incremental encoding is bit-identical to the
    * build's. Stored layout: `codebooks/` (sub, code, center) and
    * `codes/` (vec_id, nrm, codes array<int>) — the compressed corpus
    * representation ADC queries scan instead of raw vectors. */
  def buildPqWith(spark: SparkSession, vectors: DataFrame, indexDir: String,
                  books: Array[Array[(Int, Array[Double])]]): Unit = {
    import spark.implicits._
    val subDim = 64 / books.length
    books.zipWithIndex.flatMap { case (book, sub) =>
      book.map { case (code, c) => (sub, code, c.toSeq) }
    }.toSeq.toDF("sub", "code", "center")
      .coalesce(1)
      .write.mode("overwrite").parquet(booksDir(indexDir))
    vectors
      .select(col("vec_id"), col("nrm"),
        Similarity.pqCodes(col("v"), books, subDim).as("codes"))
      .write.mode("overwrite").parquet(codesDir(indexDir))
  }

  /** Stored codebooks, re-materialized for literal-expression encoding
    * (m·ks centroids ≪ memory — model state, not data). */
  def readCodebooks(spark: SparkSession, indexDir: String): Array[Array[(Int, Array[Double])]] =
    spark.read.parquet(booksDir(indexDir))
      .select("sub", "code", "center").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.map(t => (t._2, t._3)).sortBy(_._1))

  /** Encode + append ONLY `newVectors`: O(batch) compute + one
    * column-pruned id scan for the replay guard; the stored codebooks
    * enter as literals, so a replayed or late batch is encoded exactly
    * as the build would have encoded it. */
  def appendPq(spark: SparkSession, newVectors: DataFrame, indexDir: String): Unit = {
    val books = readCodebooks(spark, indexDir)
    val subDim = 64 / books.length
    val existingIds = spark.read.parquet(codesDir(indexDir)).select("vec_id")
    newVectors
      .join(existingIds, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("nrm"),
        Similarity.pqCodes(col("v"), books, subDim).as("codes"))
      .write.mode("append").parquet(codesDir(indexDir))
  }

  /** ADC query over the stored code frame: the scan reads 16 ints +
    * a norm per corpus vector (the compressed representation — at scale
    * this is the whole point: the probe never touches raw vectors until
    * the `overfetch` rerank, which joins `corpus` for candidates only). */
  def queryPq(spark: SparkSession, indexDir: String, corpus: DataFrame,
              queries: DataFrame, overfetch: Int = 48, topK: Int = 3): DataFrame = {
    val books = readCodebooks(spark, indexDir)
    val subDim = 64 / books.length
    val codes = spark.read.parquet(codesDir(indexDir))
      .select(col("vec_id").as("c_id"), col("nrm").as("cn"),
        posexplode(col("codes")).as(Seq("sub", "code")))
    val candidates = Similarity.adcCandidates(
      codes, Similarity.pqLut(queries, books, subDim), overfetch)
    val c = corpus.select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    Similarity.topkRerank(
      candidates
        .join(c, Seq("c_id"))
        .join(broadcast(queries), Seq("q_id"))
        .withColumn("cos", cosineNative(col("qv"), col("cv"), col("qn"), col("cn")))
        .select("q_id", "c_id", "cos"),
      k = topK)
  }

  // ---------------------------------------------------------------- LSH

  /** Multi-table sign-LSH bucket rows for a vector frame — the same
    * family sim3 uses (table t probes dims {t, t+nTables, ...}). */
  private def bucketRows(vectors: DataFrame, nTables: Int, bits: Int): DataFrame =
    vectors.select(col("vec_id"),
      posexplode(array((0 until nTables).map(t =>
        signBucket(col("v"), bits, nTables, t)): _*)).as(Seq("tab", "bk")))
      .select("tab", "bk", "vec_id")

  /** Build the LSH table index at `indexDir` from (vec_id, v, ...).
    *
    * Crash ordering: on a FRESH dir the marker goes first (a crash
    * leaves marker-without-data, which fails loudly on read). On a
    * REBUILD the OLD marker and tables are deleted first, then data,
    * then the new marker — marker-first there would let a crash before
    * the data overwrite pair OLD-layout tables with a NEW marker, the
    * silent bucket-mixing the marker exists to prevent; a crash now
    * leaves data-without-marker, caught by the append backfill's
    * layout validation below. */
  def buildLsh(spark: SparkSession, vectors: DataFrame, indexDir: String,
               nTables: Int = 16, bits: Int = 3): Unit = {
    val fs = lshParamsPath(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tdir = new org.apache.hadoop.fs.Path(tablesDir(indexDir))
    val fresh = !fs.exists(tdir) && !fs.exists(lshParamsPath(indexDir))
    if (fresh) writeLshParams(spark, indexDir, nTables, bits)
    else { fs.delete(lshParamsPath(indexDir), false); fs.delete(tdir, true) }
    bucketRows(vectors, nTables, bits)
      .write.mode("overwrite").partitionBy("tab").parquet(tablesDir(indexDir))
    if (!fresh) writeLshParams(spark, indexDir, nTables, bits)
  }

  /** Append a batch: replay-guarded (anti-join on stored ids), then the
    * stateless hash family bucketizes scan-locally — incremental ≡ full
    * rebuild by construction. `nTables`/`bits` must match the build
    * (they are layout constants of the index, like `k` in L2b). */
  def appendLsh(spark: SparkSession, newVectors: DataFrame, indexDir: String,
                nTables: Int = 16, bits: Int = 3): Unit = {
    requireLshParams(spark, indexDir, nTables, bits)
    // backfill the marker for pre-marker indexes so the guard protects
    // every subsequent append/query — but VALIDATE the claimed layout
    // against the stored tables first (max table id must be nTables-1
    // and every bucket must fit in `bits`), so the first appender can't
    // pin params the data contradicts
    val p = lshParamsPath(indexDir)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)) {
      val shape = spark.read.parquet(tablesDir(indexDir))
        .agg(max("tab").as("maxTab"), max("bk").as("maxBk")).head()
      require(shape.getInt(0) == nTables - 1 && shape.getInt(1) < (1 << bits),
        s"LSH index at $indexDir has max(tab)=${shape.getInt(0)}, " +
          s"max(bk)=${shape.getInt(1)} — inconsistent with claimed " +
          s"(nTables,bits)=($nTables,$bits); rebuild the index")
      writeLshParams(spark, indexDir, nTables, bits)
    }
    // every vec_id appears in EVERY tab partition — reading one
    // partition yields the full id set at 1/nTables the scan
    val existingIds = spark.read.parquet(tablesDir(indexDir))
      .filter(col("tab") === 0).select("vec_id")
    bucketRows(newVectors.join(existingIds, Seq("vec_id"), "left_anti"), nTables, bits)
      .write.mode("append").partitionBy("tab").parquet(tablesDir(indexDir))
  }

  /** Query the stored tables: bucketize the (small, broadcast) query set
    * with the same family, candidates = union over tables of bucket
    * matches (id-only shuffle), then exact-cosine rerank joining vectors
    * from `corpus` for candidates alone — payload vectors never ride the
    * candidate join, exactly like dd2's verify stage. */
  def queryLsh(spark: SparkSession, indexDir: String, corpus: DataFrame,
               queries: DataFrame, nTables: Int = 16, bits: Int = 3,
               topK: Int = 3): DataFrame = {
    requireLshParams(spark, indexDir, nTables, bits)
    val qBuckets = bucketRows(
      queries.select(col("q_id").as("vec_id"), col("qv").as("v")), nTables, bits)
      .withColumnRenamed("vec_id", "q_id")
    val candidates = spark.read.parquet(tablesDir(indexDir))
      .join(broadcast(qBuckets), Seq("tab", "bk"))
      .select("q_id", "vec_id")
      .dropDuplicates("q_id", "vec_id")
    val c = corpus.select(col("vec_id"), col("v").as("cv"), col("nrm").as("cn"))
    Similarity.topkRerank(
      candidates
        .join(c, Seq("vec_id"))
        .join(broadcast(queries), Seq("q_id"))
        .withColumn("cos", cosineNative(col("qv"), col("cv"), col("qn"), col("cn")))
        .select(col("q_id"), col("vec_id").as("c_id"), col("cos")),
      k = topK)
  }

  // ------------------------------------------- semantic dedup index

  private def semListsDir(indexDir: String) = s"$indexDir/semlists"
  private def semCentroidsDir(indexDir: String) = s"$indexDir/semcentroids"
  private def semParamsPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(s"$indexDir/_graft_sem_params")

  /** Durable form of [[Similarity.semanticDedup]] (SemDeDup at ingest
    * time): the multi-assigned cluster lists persist, and each new batch
    * is deduplicated against the STORED corpus — assign only the batch,
    * join only the shared clusters, never re-cluster or re-scan history.
    * Layout state fixed at build time: the frozen centroids AND
    * `nAssign` (a batch assigned to a different number of clusters than
    * the stored rows would silently miss pairs — same failure the LSH
    * params marker guards, so it gets the same marker).
    *
    * Rows are (cid, vec_id, v, nrm), partitioned by cid: each vector
    * appears in its `nAssign` nearest clusters, so batch-vs-stored
    * candidate search is an equi-join on the partition column — at
    * scale, dynamic partition pruning reads only the batch's clusters.
    */
  def buildSemantic(spark: SparkSession, vectors: DataFrame, indexDir: String,
                    nCentroids: Int = 16, nAssign: Int = 3,
                    sampleDivisor: Int = 10): Unit = {
    val v = vectors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try buildSemanticWith(spark, v, indexDir,
      Similarity.trainCentroids(v, nCentroids, sampleDivisor), nAssign)
    finally v.unpersist()
  }

  /** Build with an explicit (frozen) quantizer — the one-shot reference
    * the incremental spec compares against. Marker ordering follows
    * [[buildLsh]]: fresh dir marker-first; rebuild deletes old marker +
    * data first so a crash can't pair old data with a new marker. */
  def buildSemanticWith(spark: SparkSession, vectors: DataFrame, indexDir: String,
                        centroids: Array[(Int, Array[Double])], nAssign: Int): Unit = {
    import spark.implicits._
    val fs = semParamsPath(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ldir = new org.apache.hadoop.fs.Path(semListsDir(indexDir))
    val fresh = !fs.exists(ldir) && !fs.exists(semParamsPath(indexDir))
    if (fresh) writeSemParams(spark, indexDir, nAssign)
    else { fs.delete(semParamsPath(indexDir), false); fs.delete(ldir, true) }
    centroids.map { case (i, c) => (i, c.toSeq) }.toSeq.toDF("cid", "center")
      .coalesce(1)
      .write.mode("overwrite").parquet(semCentroidsDir(indexDir))
    vectors
      .withColumn("cid",
        explode(Similarity.nearestCids(col("v"), centroids,
          math.min(nAssign, centroids.length))))
      .select("cid", "vec_id", "v", "nrm")
      .write.mode("overwrite").partitionBy("cid").parquet(semListsDir(indexDir))
    if (!fresh) writeSemParams(spark, indexDir, nAssign)
  }

  private def writeSemParams(spark: SparkSession, indexDir: String,
                             nAssign: Int): Unit = {
    val p = semParamsPath(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(nAssign.toString.getBytes("UTF-8")) finally out.close()
  }

  private def readSemParams(spark: SparkSession, indexDir: String): Int = {
    val p = semParamsPath(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"semantic index at $indexDir has no params marker")
    val in = fs.open(p)
    (try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()).toInt
  }

  private def readSemCentroids(spark: SparkSession, indexDir: String): Array[(Int, Array[Double])] =
    spark.read.parquet(semCentroidsDir(indexDir))
      .select("cid", "center").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Dedup `newVectors` against the stored corpus AND each other, then
    * append them to the lists. Returns the new near-duplicate pairs
    * `(kept_cand, removed_id, cos)` — every pair touches the batch
    * (stored-vs-stored pairs were reported when THEIR batch arrived;
    * the running union over appends equals the one-shot run, spec'd).
    * Replayed batches are anti-joined away → empty result, no growth.
    * Cost per batch: O(batch assignment) + a join against the batch's
    * clusters only — never history × history.
    */
  def appendSemantic(spark: SparkSession, newVectors: DataFrame, indexDir: String,
                     tau: Double = 0.4): DataFrame = {
    val centroids = readSemCentroids(spark, indexDir)
    val nAssign = readSemParams(spark, indexDir)
    val effAssign = math.min(nAssign, centroids.length)
    // replay guard counts FULL presence as effAssign DISTINCT cluster
    // ids: a crash inside a previous append's job commit can leave a
    // vector with a subset of its rows, and a distinct-id guard would
    // skip it forever — while a raw ROW count could be satisfied by
    // duplicate rows from an earlier crashed re-append with a cluster
    // still missing. Partially-present vectors re-append whole; the
    // duplicate (cid, vec_id) rows that creates are deduped on every
    // read path, so the index converges under replay like the other
    // append families.
    val existingIds = spark.read.parquet(semListsDir(indexDir))
      .groupBy("vec_id").agg(countDistinct(col("cid")).as("__cids"))
      .filter(col("__cids") >= effAssign)
      .select("vec_id")
    val batch = newVectors
      .join(existingIds, Seq("vec_id"), "left_anti")
      .withColumn("cid",
        explode(Similarity.nearestCids(col("v"), centroids, effAssign)))
      .select("cid", "vec_id", "v", "nrm")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stored = spark.read.parquet(semListsDir(indexDir))
      .select("cid", "vec_id", "v", "nrm")
      .dropDuplicates("cid", "vec_id")
    val all = stored.unionByName(batch)
    val pairs = batch
      .select(col("cid"), col("vec_id").as("ib"), col("v").as("vb"), col("nrm").as("nb"))
      .join(all.select(col("cid"), col("vec_id").as("ia"),
        col("v").as("va"), col("nrm").as("na")), Seq("cid"))
      .filter(col("ia") =!= col("ib"))
      .select(least(col("ia"), col("ib")).as("kept_cand"),
        greatest(col("ia"), col("ib")).as("removed_id"),
        cosineNative(col("va"), col("vb"), col("na"), col("nb")).as("cos"))
      .filter(col("cos") > tau)
      .dropDuplicates("kept_cand", "removed_id")
      .orderBy("kept_cand", "removed_id")
      // materialize BEFORE the append mutates the lists the plan reads
      .localCheckpoint(true)
    batch.write.mode("append").partitionBy("cid").parquet(semListsDir(indexDir))
    batch.unpersist()
    pairs
  }

  /** All near-duplicate pairs in the stored index (the one-shot truth
    * the incremental spec accumulates toward; also the "dedup the whole
    * stored corpus" entry point). */
  def semanticDuplicates(spark: SparkSession, indexDir: String,
                         tau: Double = 0.4): DataFrame = {
    val lists = spark.read.parquet(semListsDir(indexDir))
      .select("cid", "vec_id", "v", "nrm")
      .dropDuplicates("cid", "vec_id") // tolerate replayed-append rows
    lists.select(col("cid"), col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na"))
      .join(lists.select(col("cid"), col("vec_id").as("ib"),
        col("v").as("vb"), col("nrm").as("nb")), Seq("cid"))
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("kept_cand"), col("ib").as("removed_id"),
        cosineNative(col("va"), col("vb"), col("na"), col("nb")).as("cos"))
      .filter(col("cos") > tau)
      .dropDuplicates("kept_cand", "removed_id")
      .orderBy("kept_cand", "removed_id")
  }
}
