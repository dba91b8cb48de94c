package graft

import graft.sources.TableLog
import org.apache.spark.sql.functions._

/** T35 — streaming SOURCE over the TableLog: commits are micro-batches,
  * offsets are manifest versions, checkpoint restart is exactly-once,
  * rewrite/delete commits refuse loudly (append-only stream contract).
  */
class TableLogStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def rows(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"r$i")).toDF("id", "s")

  test("catches up the full history then follows new commits") {
    val dir = freshDir("tlsrc")
    TableLog.create(spark, rows(0 until 3), dir)
    TableLog.append(spark, rows(3 until 5), dir)

    val q = TableLog.readStream(spark, dir)
      .writeStream.format("memory").queryName("tl_follow")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("tl_follow").as[(Long, String)].collect().sorted.toSeq
      === (0 until 5).map(i => (i.toLong, s"r$i")))

    TableLog.append(spark, rows(5 until 9), dir)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("tl_follow").count() === 9)
    // stream contents ≡ snapshot read: no dup, no loss
    assert(spark.table("tl_follow").as[(Long, String)].collect().sorted.toSeq
      === TableLog.read(spark, dir).as[(Long, String)].collect().sorted.toSeq)
  }

  test("startingVersion=latest emits only post-start commits") {
    val dir = freshDir("tllatest")
    TableLog.create(spark, rows(0 until 4), dir)
    TableLog.append(spark, rows(4 until 6), dir)
    val q = TableLog.readStream(spark, dir, startingVersion = "latest")
      .writeStream.format("memory").queryName("tl_latest")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("tl_latest").count() === 0)
    TableLog.append(spark, rows(6 until 8), dir)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("tl_latest").as[(Long, String)].collect().sorted.toSeq
      === Seq((6L, "r6"), (7L, "r7")))
  }

  test("checkpoint restart resumes at the committed version — no dup, no loss") {
    val dir = freshDir("tlckpt")
    val ckpt = java.nio.file.Files.createTempDirectory("tlckptdir").toString
    val out = freshDir("tlout")
    TableLog.create(spark, rows(0 until 3), dir)

    def run(): Unit = {
      val q = TableLog.readStream(spark, dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(TableLog.streamSink(out))
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    TableLog.append(spark, rows(3 until 7), dir)
    TableLog.append(spark, rows(7 until 8), dir)
    run() // restart: only versions past the checkpointed offset replay
    assert(TableLog.read(spark, out).as[(Long, String)].collect().sorted.toSeq
      === (0 until 8).map(i => (i.toLong, s"r$i")))
    // sink-side manifests: one batch before restart, ≥1 after — and the
    // source-side replay guard means re-running AGAIN moves nothing
    val vBefore = TableLog.latestVersion(spark, out)
    run()
    assert(TableLog.latestVersion(spark, out) === vBefore,
      "an idle restart must commit nothing (exactly-once)")
  }

  test("a rewrite commit in the stream range refuses loudly") {
    val dir = freshDir("tlrewrite")
    TableLog.create(spark, rows(0 until 3), dir)
    val q = TableLog.readStream(spark, dir)
      .writeStream.format("memory").queryName("tl_rw")
      .outputMode("append").start()
    q.processAllAvailable()
    TableLog.append(spark, rows(3 until 5), dir)
    TableLog.compact(spark, dir, parts = 1) // rewrites history
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(e.getMessage.contains("rewrite existing data")
      || Option(e.getCause).exists(_.getMessage.contains("rewrite existing data")))
  }

  test("a deletion vector committed BEFORE stream start applies to the initial snapshot") {
    val dir = freshDir("tldvpre")
    TableLog.create(spark, rows(0 until 5), dir)
    TableLog.deleteByKey(spark, Seq(2L).toDF("id"), dir, Seq("id"))
    val q = TableLog.readStream(spark, dir)
      .writeStream.format("memory").queryName("tl_dv_pre")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    // the stream's catch-up batch is the CURRENT snapshot — the deleted
    // key must be hidden exactly as TableLog.read hides it
    assert(spark.table("tl_dv_pre").as[(Long, String)].collect().sorted.toSeq
      === TableLog.read(spark, dir).as[(Long, String)].collect().sorted.toSeq)
    assert(spark.table("tl_dv_pre").where(col("id") === 2L).count() === 0L)
  }

  test("deletion-vector commits refuse by default, stream on with ignoreDeletes") {
    val dir = freshDir("tldv")
    TableLog.create(spark, rows(0 until 4), dir)

    val strict = TableLog.readStream(spark, dir)
      .writeStream.format("memory").queryName("tl_dv_strict")
      .outputMode("append").start()
    strict.processAllAvailable()
    TableLog.deleteByKey(spark, Seq(1L).toDF("id"), dir, Seq("id"))
    TableLog.append(spark, rows(4 until 6), dir)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      strict.processAllAvailable()
    }
    strict.stop()
    assert(e.getMessage.contains("deletion-vector")
      || Option(e.getCause).exists(_.getMessage.contains("deletion-vector")))

    // ignoreDeletes: the INITIAL snapshot still applies DVs (it is a
    // batch read of the current state), and mid-stream deletes are then
    // simply not retracted — appends keep flowing
    val loose = TableLog.readStream(spark, dir, ignoreDeletes = true)
      .writeStream.format("memory").queryName("tl_dv_loose")
      .outputMode("append").start()
    loose.processAllAvailable()
    assert(spark.table("tl_dv_loose").count() === 5, // 6 appended − 1 deleted
      "initial snapshot must hide the pre-start deletion")
    TableLog.deleteByKey(spark, Seq(2L).toDF("id"), dir, Seq("id"))
    TableLog.append(spark, rows(6 until 8), dir)
    loose.processAllAvailable(); loose.stop()
    // the mid-stream delete of id=2 is NOT retracted from the sink; the
    // append after it flows through
    assert(spark.table("tl_dv_loose").count() === 7)
    assert(spark.table("tl_dv_loose").where(col("id") === 2L).count() === 1L)
  }

  // T35 × L39: an incrementally-maintained aggregate DRIVEN BY the log
  // stream — the three pieces (versioned source, exactly-once batch ids,
  // algebraic partial merge) compose into a continuously-fresh summary
  // that equals the full recompute after every catch-up, including
  // across a checkpoint restart (both layers dedup independently).
  test("stream-maintained incremental aggregate equals the full recompute") {
    val dir = freshDir("tlagg")
    val state = java.nio.file.Files.createTempDirectory("tlaggstate").toString + "/s"
    val ckpt = java.nio.file.Files.createTempDirectory("tlaggck").toString
    def vals(ids: Range) = ids.map(i => (i.toLong % 3, i.toLong * 10))
      .toDF("grp", "v")
    TableLog.create(spark, vals(0 until 20), dir)

    def run(): Unit = {
      val q = TableLog.readStream(spark, dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch((df: org.apache.spark.sql.DataFrame, bid: Long) => {
          graft.operators.IncrementalAgg.update(
            df.sparkSession, state, df, bid, "grp", "v"); ()
        })
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    TableLog.append(spark, vals(20 until 50), dir)
    run() // restart from checkpoint; only the new commit merges
    val got = graft.operators.IncrementalAgg.snapshot(spark, state)
      .select("k", "cnt", "sm").as[(Long, Long, Long)].collect().sorted.toSeq
    val want = TableLog.read(spark, dir)
      .groupBy(col("grp").as("k"))
      .agg(count(lit(1)).as("cnt"), sum("v").as("sm"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got === want)
    // an idle restart replays nothing through either dedup layer
    run()
    assert(graft.operators.IncrementalAgg.snapshot(spark, state)
      .select("k", "cnt", "sm").as[(Long, Long, Long)].collect().sorted.toSeq
      === want)
  }

  // the batch-job-with-streaming-semantics trigger: process exactly the
  // commits present at start, then terminate on its own — the nightly
  // catch-up shape (incremental, checkpointed, no long-running query)
  test("Trigger.AvailableNow drains the present commits and stops") {
    val dir = freshDir("tlavnow")
    val out = freshDir("tlavnowout")
    val ckpt = java.nio.file.Files.createTempDirectory("tlavnowck").toString
    TableLog.create(spark, rows(0 until 4), dir)
    TableLog.append(spark, rows(4 until 6), dir)
    def drain(): Unit = {
      val q = TableLog.readStream(spark, dir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch(TableLog.streamSink(out))
        .start()
      assert(q.awaitTermination(60000), "AvailableNow query should self-terminate")
    }
    drain()
    assert(TableLog.read(spark, out).count() === 6)
    // a later append is NOT picked up by the terminated query; the next
    // AvailableNow run resumes from the checkpoint and drains just it
    TableLog.append(spark, rows(6 until 9), dir)
    assert(TableLog.read(spark, out).count() === 6)
    val vBefore = TableLog.latestVersion(spark, out)
    drain()
    assert(TableLog.read(spark, out).as[(Long, String)].collect().sorted.toSeq
      === (0 until 9).map(i => (i.toLong, s"r$i")))
    // exactly one sink commit for the one pending source commit
    assert(TableLog.latestVersion(spark, out) === vBefore.map(_ + 1))
  }

  test("schema is frozen at start: evolve-append mid-stream keeps flowing") {
    val dir = freshDir("tlevolve")
    TableLog.create(spark, rows(0 until 2), dir)
    val q = TableLog.readStream(spark, dir)
      .writeStream.format("memory").queryName("tl_evo")
      .outputMode("append").start()
    q.processAllAvailable()
    TableLog.evolveAppend(spark,
      Seq((2L, "r2", 99L)).toDF("id", "s", "extra"), dir)
    q.processAllAvailable()
    q.stop()
    // new commit arrives through the frozen 2-column schema
    assert(spark.table("tl_evo").columns.toSeq === Seq("id", "s"))
    assert(spark.table("tl_evo").as[(Long, String)].collect().sorted.toSeq
      === Seq((0L, "r0"), (1L, "r1"), (2L, "r2")))
  }

  // the PCA twin of the stream-maintained aggregate above: embedding
  // ingests flow through the log stream into the exact moment index, so
  // the fit refreshes per-commit at O(batch + d²) — and because the
  // moments are exact integers, the streamed state equals the one-shot
  // fit BIT FOR BIT after catch-up AND across a checkpoint restart
  // (source offsets + batch-id guard, both exactly-once layers active).
  test("stream-maintained PCA moment index equals the one-shot fit") {
    val dir = freshDir("tlpca")
    val state = java.nio.file.Files.createTempDirectory("tlpcastate").toString + "/s"
    val ckpt = java.nio.file.Files.createTempDirectory("tlpcack").toString
    val emb = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding")
    TableLog.create(spark, emb.filter(col("vec_id") % 2 === 0), dir)

    def run(): Unit = {
      val q = TableLog.readStream(spark, dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch((df: org.apache.spark.sql.DataFrame, bid: Long) => {
          graft.operators.PcaIndex.update(df.sparkSession, state, df, bid); ()
        })
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    TableLog.append(spark, emb.filter(col("vec_id") % 2 === 1), dir)
    run() // restart from checkpoint; only the new commit merges
    val got = graft.operators.PcaIndex.covariance(spark, state)
      .collect().map(_.toString).sorted
    val want = graft.operators.Similarity
      .covarianceMatrixOf(TableLog.read(spark, dir))
      .collect().map(_.toString).sorted
    assert(got.sameElements(want))
    // an idle restart replays nothing through either dedup layer
    run()
    assert(graft.operators.PcaIndex.covariance(spark, state)
      .collect().map(_.toString).sorted.sameElements(want))
  }

  // document ingests flow through the log stream into the
  // log-structured gram-count index; after catch-up + restart the
  // merged counts equal a one-shot count over the whole corpus (the
  // delta commits are batch partials; sums are order-independent)
  test("stream-maintained dup-span gram index equals one-shot counts") {
    val dir = freshDir("tldsp")
    val idx = java.nio.file.Files.createTempDirectory("tldspidx").toString + "/i"
    val ckpt = java.nio.file.Files.createTempDirectory("tldspck").toString
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    TableLog.create(spark, docs.filter(col("doc_id") % 2 === 0), dir)

    def run(): Unit = {
      val q = TableLog.readStream(spark, dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch((df: org.apache.spark.sql.DataFrame, bid: Long) => {
          graft.operators.DupSpanIndex.append(df.sparkSession, idx, df, bid); ()
        })
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    TableLog.append(spark, docs.filter(col("doc_id") % 2 === 1), dir)
    run()
    val got = graft.operators.DupSpanIndex.occCounts(spark, idx)
      .collect().map(_.toString).sorted
    val base = graft.operators.Corpus.gramBase(TableLog.read(spark, dir), 8)
    val want = graft.operators.Corpus.gramFrame(base, 8)
      .groupBy("ph").agg(count(lit(1)).cast("long").as("occ"))
      .collect().map(_.toString).sorted
    assert(got.sameElements(want))
    run() // idle restart: no new commit, no new delta
    assert(graft.operators.DupSpanIndex.occCounts(spark, idx)
      .collect().map(_.toString).sorted.sameElements(want))
  }

  // near-dup PAIRS flow through the log stream into the incremental
  // component index; labels equal the one-shot CC over the full pair
  // log after catch-up and a checkpoint restart
  test("stream-maintained component labels equal the one-shot components") {
    val dir = freshDir("tlcc")
    val idx = java.nio.file.Files.createTempDirectory("tlccidx").toString + "/i"
    val ckpt = java.nio.file.Files.createTempDirectory("tlccck").toString
    val p0 = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val p1 = Seq((3L, 10L), (20L, 21L)).toDF("id_a", "id_b") // late bridge
    TableLog.create(spark, p0, dir)

    def run(): Unit = {
      val q = TableLog.readStream(spark, dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch((df: org.apache.spark.sql.DataFrame, bid: Long) => {
          graft.operators.CcIndex.update(df.sparkSession, idx, df, bid,
            numBuckets = 8); ()
        })
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    TableLog.append(spark, p1, dir)
    run()
    val got = graft.operators.CcIndex.snapshot(spark, idx)
      .as[(Long, Long)].collect().toMap
    val want = graft.operators.Dedup.connectedComponents(TableLog.read(spark, dir))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(got(11L) === 1L, "late bridge must fold both chains to root 1")
  }

  // the sketch twin: key ingests flow through the log stream into the
  // CMS+KMV sketch state; both sketches merge EXACTLY (addition /
  // k-min-of-union), so after catch-up, a checkpoint restart over a
  // late commit, and an idle replay, the streamed state equals the
  // one-shot sketch of the whole table bit for bit.
  test("stream-maintained sketch index equals the one-shot sketch") {
    val dir = freshDir("tlsk")
    val state = java.nio.file.Files.createTempDirectory("tlskstate").toString + "/s"
    val ckpt = java.nio.file.Files.createTempDirectory("tlskck").toString
    val li = Tables.lineitem(spark, sf0001).select("l_partkey")
    TableLog.create(spark, li.filter(col("l_partkey") % 2 === 0), dir)

    def run(): Unit = {
      val q = TableLog.readStream(spark, dir)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch((df: org.apache.spark.sql.DataFrame, bid: Long) => {
          graft.operators.SketchIndex.update(
            df.sparkSession, state, df, "l_partkey", bid); ()
        })
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    TableLog.append(spark, li.filter(col("l_partkey") % 2 === 1), dir)
    run() // restart from checkpoint; only the new commit merges
    def cms() = spark.read.parquet(s"$state/cms").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    def kmv() = spark.read.parquet(s"$state/kmv").collect()
      .map(_.getLong(0)).toSet
    val full = TableLog.read(spark, dir)
    val wantCms = graft.operators.SketchIndex.cmsOf(full, "l_partkey")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wantKmv = graft.operators.SketchIndex.kmvOf(full, "l_partkey")
      .collect().map(_.getLong(0)).toSet
    assert(cms() == wantCms)
    assert(kmv() == wantKmv)
    // an idle restart replays nothing through either dedup layer
    run()
    assert(cms() == wantCms && kmv() == wantKmv)
  }
}
