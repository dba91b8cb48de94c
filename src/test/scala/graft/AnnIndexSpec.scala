package graft

import graft.operators.{AnnIndex, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L7c: durable + incrementally-appendable ANN indexes. Mirrors
  * DedupSpec's incremental-MinHash test shape: build on an interleaved-id
  * half, append the other half, prove equality with the one-shot build
  * under the same (frozen) quantizer, replay idempotence, and identical
  * query answers from both indexes.
  */
class AnnIndexSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private lazy val e: DataFrame =
    Similarity.prepared(spark, sf0001).select("vec_id", "v", "nrm")
      .persist()

  // interleaved split: ids alternate between batches, so neither batch is
  // an id-prefix (catches any hidden id-ordering assumption)
  private lazy val batchA = e.filter(col("vec_id") % 2 === 0)
  private lazy val batchB = e.filter(col("vec_id") % 2 === 1)

  private def queries: DataFrame =
    e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))

  test("IVF: incremental append ≡ one-shot build under the frozen quantizer; replay is a no-op") {
    val cents = Similarity.trainCentroids(e, nCentroids = 8)
    val incrDir = tmp("ivf_incr"); val fullDir = tmp("ivf_full")
    AnnIndex.buildIvfWith(spark, batchA, incrDir, cents)
    AnnIndex.appendIvf(spark, batchB, incrDir)
    AnnIndex.buildIvfWith(spark, e, fullDir, cents)

    def assignments(dir: String) =
      spark.read.parquet(s"$dir/lists").select("vec_id", "cid")
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(assignments(incrDir).sameElements(assignments(fullDir)),
      "append must assign exactly what the one-shot build assigns")
    assert(AnnIndex.readCentroids(spark, incrDir).map(_._2.toSeq).toSeq ===
      cents.map(_._2.toSeq).toSeq)

    // replayed batch: anti-join guard → nothing appended
    val before = spark.read.parquet(s"$incrDir/lists").count()
    AnnIndex.appendIvf(spark, batchB, incrDir)
    assert(spark.read.parquet(s"$incrDir/lists").count() === before)

    // identical answers from both indexes
    val qi = AnnIndex.queryIvf(spark, incrDir, queries, nProbe = 3, topK = 3).collect()
    val qf = AnnIndex.queryIvf(spark, fullDir, queries, nProbe = 3, topK = 3).collect()
    assert(qi.nonEmpty && qi.sameElements(qf))
  }

  test("IVF: lists are laid out partitioned by centroid id (probe = partition pruning)") {
    val dir = tmp("ivf_layout")
    AnnIndex.buildIvf(spark, e, dir, nCentroids = 4)
    val parts = new java.io.File(s"$dir/lists").listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).sorted
    assert(parts.nonEmpty && parts.forall(_.matches("cid=\\d+")),
      s"expected cid=N partition dirs, got ${parts.mkString(",")}")
  }

  test("IVF: full-probe query over the stored index equals brute-force top-1") {
    import spark.implicits._
    val dir = tmp("ivf_exact")
    // corpus side only, as sim1/sim5 define it
    AnnIndex.buildIvf(spark, e.filter(col("vec_id") >= 10), dir, nCentroids = 8)
    val top1 = AnnIndex.queryIvf(spark, dir, queries, nProbe = 8, topK = 1)
      .select("q_id", "cos_sim").as[(Long, Double)].collect().toMap
    val exact = SparkEntry.queries("sim1_bruteforce_topk")(spark, sf0001)
      .filter(col("rk") === 1L).select("q_id", "cos_sim")
      .as[(Long, Double)].collect().toMap
    top1.foreach { case (q, c) =>
      assert(math.abs(c - exact(q)) < 1e-9, s"query $q: $c vs ${exact(q)}")
    }
    assert(top1.keySet === exact.keySet)
  }

  test("PQ: incremental append ≡ one-shot build under frozen codebooks; replay no-op; full-overfetch ≡ brute force") {
    import spark.implicits._
    val corpus = e.filter(col("vec_id") >= 10)
    val books = Similarity.trainPqCodebooks(e, m = 16, ks = 16, subDim = 4)
    val incrDir = tmp("pq_incr"); val fullDir = tmp("pq_full")
    AnnIndex.buildPqWith(spark, corpus.filter(col("vec_id") % 2 === 0), incrDir, books)
    AnnIndex.appendPq(spark, corpus.filter(col("vec_id") % 2 === 1), incrDir)
    AnnIndex.buildPqWith(spark, corpus, fullDir, books)

    def stored(dir: String) =
      spark.read.parquet(s"$dir/codes").select("vec_id", "codes")
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList)).sortBy(_._1)
    assert(stored(incrDir).sameElements(stored(fullDir)),
      "appendPq must encode exactly what the one-shot build encodes")
    assert(AnnIndex.readCodebooks(spark, incrDir).map(_.map(_._2.toSeq).toSeq).toSeq ===
      books.map(_.map(_._2.toSeq).toSeq).toSeq)

    // replayed batch: anti-join guard → nothing appended
    val before = spark.read.parquet(s"$incrDir/codes").count()
    AnnIndex.appendPq(spark, corpus.filter(col("vec_id") % 2 === 1), incrDir)
    assert(spark.read.parquet(s"$incrDir/codes").count() === before)

    // identical answers from incremental and one-shot indexes
    val qi = AnnIndex.queryPq(spark, incrDir, corpus, queries).collect()
    val qf = AnnIndex.queryPq(spark, fullDir, corpus, queries).collect()
    assert(qi.nonEmpty && qi.sameElements(qf))

    // reranking every stored code (overfetch ≥ corpus) ≡ brute force
    val n = corpus.count().toInt
    val full = AnnIndex.queryPq(spark, fullDir, corpus, queries, overfetch = n)
      .collect().map(_.toSeq)
    val brute = SparkEntry.queries("sim1_bruteforce_topk")(spark, sf0001)
      .filter(col("rk") <= 3).collect().map(_.toSeq)
    assert(full.toSeq === brute.toSeq)
  }

  test("LSH: incremental append ≡ full rebuild; replay no-op; answers match the in-memory sim3 path") {
    val incrDir = tmp("lsh_incr"); val fullDir = tmp("lsh_full")
    val corpus = e.filter(col("vec_id") >= 10)
    AnnIndex.buildLsh(spark, corpus.filter(col("vec_id") % 2 === 0), incrDir)
    AnnIndex.appendLsh(spark, corpus.filter(col("vec_id") % 2 === 1), incrDir)
    AnnIndex.buildLsh(spark, corpus, fullDir)

    def rows(dir: String) =
      spark.read.parquet(s"$dir/tables").select("tab", "bk", "vec_id")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted
    assert(rows(incrDir).sameElements(rows(fullDir)),
      "stateless hash family: incremental must equal the full rebuild exactly")

    val before = spark.read.parquet(s"$incrDir/tables").count()
    AnnIndex.appendLsh(spark, corpus.filter(col("vec_id") % 2 === 1), incrDir)
    assert(spark.read.parquet(s"$incrDir/tables").count() === before)

    // stored-index query ≡ the catalog's in-memory sim3 (same family/knobs)
    val stored = AnnIndex.queryLsh(spark, incrDir, corpus, queries).collect()
    val inMem = SparkEntry.queries("sim3_lsh_ann")(spark, sf0001).collect()
    assert(stored.nonEmpty && stored.sameElements(inMem))

    // layout constants are pinned at build: a mismatched append or query
    // must refuse loudly (a silent mix of hash families collapses recall)
    val exA = intercept[IllegalArgumentException] {
      AnnIndex.appendLsh(spark, corpus, incrDir, nTables = 8, bits = 4)
    }
    assert(exA.getMessage.contains("built with"))
    val exQ = intercept[IllegalArgumentException] {
      AnnIndex.queryLsh(spark, incrDir, corpus, queries, nTables = 8, bits = 4)
    }
    assert(exQ.getMessage.contains("built with"))
  }

  test("LSH: rebuilding an existing index with different params replaces layout and marker together") {
    val dir = tmp("lsh_rebuild")
    val corpus = e.filter(col("vec_id") >= 10)
    AnnIndex.buildLsh(spark, corpus, dir, nTables = 16, bits = 3)
    // rebuild with a different hash family over the same dir: the old
    // marker must not survive to refuse the new (correct) params
    AnnIndex.buildLsh(spark, corpus, dir, nTables = 4, bits = 2)
    val tabs = spark.read.parquet(s"$dir/tables")
      .agg(max("tab"), max("bk")).head()
    assert(tabs.getInt(0) === 3 && tabs.getInt(1) < 4)
    // marker now pins the NEW layout: old params refused, new accepted
    intercept[IllegalArgumentException] {
      AnnIndex.queryLsh(spark, dir, corpus, queries, nTables = 16, bits = 3)
    }
    assert(AnnIndex.queryLsh(spark, dir, corpus, queries, nTables = 4, bits = 2)
      .collect().nonEmpty)
  }

  test("LSH: marker backfill validates the claimed layout against the stored tables") {
    val dir = tmp("lsh_backfill")
    val corpus = e.filter(col("vec_id") >= 10)
    AnnIndex.buildLsh(spark, corpus, dir, nTables = 16, bits = 3)
    // simulate a pre-marker index (or a rebuild crash that died between
    // the data write and the marker write)
    val p = new org.apache.hadoop.fs.Path(s"$dir/_graft_lsh_params")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
    // an appender claiming a CONTRADICTED layout must be refused...
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.appendLsh(spark, corpus.limit(0), dir, nTables = 8, bits = 2)
    }
    assert(ex.getMessage.contains("inconsistent"))
    // ...while the true layout backfills the marker and proceeds
    AnnIndex.appendLsh(spark, corpus.limit(0), dir, nTables = 16, bits = 3)
    assert(p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
  }

  test("semantic index: per-ingest dedup accumulates to the one-shot pair set; replay is empty") {
    val cents = Similarity.trainCentroids(e, nCentroids = 8)
    val incrDir = tmp("sem_incr"); val fullDir = tmp("sem_full")
    // build on the even half, dedup-ingest the odd half
    AnnIndex.buildSemanticWith(spark, batchA, incrDir, cents, nAssign = 3)
    val incPairs = AnnIndex.appendSemantic(spark, batchB, incrDir, tau = 0.4)
      .select("kept_cand", "removed_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    AnnIndex.buildSemanticWith(spark, e, fullDir, cents, nAssign = 3)
    val bIds = batchB.select("vec_id").collect().map(_.getLong(0)).toSet
    val fullPairs = AnnIndex.semanticDuplicates(spark, fullDir, tau = 0.4)
      .select("kept_cand", "removed_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullTouchingB = fullPairs.filter(p => bIds(p._1) || bIds(p._2))
    assert(incPairs === fullTouchingB,
      "batch ingest must report exactly the one-shot pairs that touch the batch")
    assert(incPairs.nonEmpty, "tau=0.4 should find cross-batch near-dups")

    // the within-build-half pairs are the rest: build-half pairs
    // (reported when THAT data arrived) ∪ batch pairs = one-shot total
    val buildPairs = AnnIndex.semanticDuplicates(spark, incrDir, tau = 0.4)
      .select("kept_cand", "removed_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(buildPairs === fullPairs,
      "after the append, the stored index must contain the one-shot pair set")

    // replay: anti-join guard → no pairs, no list growth
    val before = spark.read.parquet(s"$incrDir/semlists").count()
    assert(AnnIndex.appendSemantic(spark, batchB, incrDir, tau = 0.4).count() === 0)
    assert(spark.read.parquet(s"$incrDir/semlists").count() === before)
  }

  test("semantic index: a crashed partial append converges on replay") {
    val cents = Similarity.trainCentroids(e, nCentroids = 8)
    val crashDir = tmp("sem_crash"); val cleanDir = tmp("sem_clean")
    AnnIndex.buildSemanticWith(spark, batchA, crashDir, cents, nAssign = 3)
    AnnIndex.buildSemanticWith(spark, batchA, cleanDir, cents, nAssign = 3)
    // simulate a crash inside a previous append's commit: exactly ONE of
    // a batchB vector's three list rows made it to disk
    val partial = batchB.limit(1)
      .withColumn("cid", explode(Similarity.nearestCids(col("v"), cents, 3)))
      .select("cid", "vec_id", "v", "nrm").limit(1)
    partial.write.mode("append").partitionBy("cid").parquet(s"$crashDir/semlists")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("kept_cand", "removed_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val replayed = pairSet(AnnIndex.appendSemantic(spark, batchB, crashDir, tau = 0.4))
    val clean = pairSet(AnnIndex.appendSemantic(spark, batchB, cleanDir, tau = 0.4))
    assert(replayed === clean,
      "the full-presence guard must re-append the partially-written vector")
    assert(pairSet(AnnIndex.semanticDuplicates(spark, crashDir, tau = 0.4)) ===
      pairSet(AnnIndex.semanticDuplicates(spark, cleanDir, tau = 0.4)),
      "recovered index must answer identically to the never-crashed one")
  }

  test("semantic index: nAssign is pinned at build time and every vector sits in 3 lists") {
    val dir = tmp("sem_layout")
    AnnIndex.buildSemantic(spark, e, dir, nCentroids = 8, nAssign = 3)
    val perVec = spark.read.parquet(s"$dir/semlists")
      .groupBy("vec_id").count().select("count").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(perVec === Set(3L), s"every vector must appear in exactly nAssign lists: $perVec")
  }
}
