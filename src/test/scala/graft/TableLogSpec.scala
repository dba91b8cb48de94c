package graft

import graft.sources.TableLog
import org.apache.spark.sql.functions._

/** S22: the versioned table format. Each test builds its own table in a
  * fresh temp dir; the properties proven are the ACID-on-a-lake core:
  * snapshot isolation, atomic publication, optimistic concurrency,
  * crash invisibility, history retention and its bounded destruction.
  */
class TableLogSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("tablelog").toString + "/t"

  private def batch(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"row$i")).toDF("id", "s")

  test("create + append round-trip; versions accumulate; latest read is the union") {
    val dir = freshDir()
    assert(TableLog.versions(spark, dir).isEmpty)
    TableLog.create(spark, batch(0 until 10), dir)
    TableLog.append(spark, batch(10 until 15), dir)
    TableLog.append(spark, batch(15 until 18), dir)
    assert(TableLog.versions(spark, dir) === Seq(0L, 1L, 2L))
    val got = TableLog.read(spark, dir).select("id").as[Long].collect().sorted
    assert(got === (0L until 18L).toArray)
  }

  test("time travel: every historical snapshot reads exactly its commits") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 4), dir)
    TableLog.append(spark, batch(4 until 9), dir)
    TableLog.append(spark, batch(9 until 11), dir)
    assert(TableLog.readVersion(spark, dir, 0).count() === 4)
    assert(TableLog.readVersion(spark, dir, 1).select("id").as[Long]
      .collect().sorted === (0L until 9L).toArray)
    assert(TableLog.readVersion(spark, dir, 2).count() === 11)
  }

  test("overwrite replaces the snapshot but old versions stay readable") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 6), dir)
    TableLog.overwrite(spark, batch(100 until 103), dir)
    assert(TableLog.read(spark, dir).select("id").as[Long].collect().sorted
      === Array(100L, 101L, 102L))
    assert(TableLog.readVersion(spark, dir, 0).count() === 6)
  }

  test("concurrent commit to the same version slot: exactly one wins, loser is loud") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 3), dir)
    // another writer claims version 1 between our read and our publish:
    // simulate by publishing 1 out-of-band first
    TableLog.append(spark, batch(3 until 5), dir)
    val racing = intercept[Exception] {
      // force the slot collision: write manifest 1's file again
      val m = TableLog.readManifest(spark, dir, 1L)
      val method = TableLog.getClass.getDeclaredMethods
        .find(_.getName == "publish").get
      method.setAccessible(true)
      try method.invoke(TableLog, spark, dir, m)
      catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
    }
    assert(racing.isInstanceOf[TableLog.ConcurrentCommitException])
    // the committed table is untouched
    assert(TableLog.read(spark, dir).count() === 5)
  }

  test("crash mid-commit: orphan data without a manifest is invisible, then vacuumed") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 5), dir)
    // a crashed writer: data landed, manifest never published
    batch(500 until 600).write.parquet(s"$dir/data/v9-orphan")
    assert(TableLog.read(spark, dir).count() === 5, "orphan must be invisible")
    TableLog.append(spark, batch(5 until 8), dir)
    assert(TableLog.read(spark, dir).count() === 8)
    val deleted = TableLog.vacuum(spark, dir, retainLast = 2)
    assert(deleted.exists(_.contains("v9-orphan")), s"orphan not vacuumed: $deleted")
    assert(TableLog.read(spark, dir).count() === 8, "vacuum must not touch live data")
  }

  test("changesBetween returns exactly the appended rows, O(manifest) planning") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 7), dir)
    TableLog.append(spark, batch(7 until 12), dir)
    TableLog.append(spark, batch(12 until 14), dir)
    val delta = TableLog.changesBetween(spark, dir, 0L, 2L)
      .select("id").as[Long].collect().sorted
    assert(delta === (7L until 14L).toArray)
    assert(TableLog.changesBetween(spark, dir, 2L, 2L).count() === 0)
  }

  test("changesBetween refuses a range containing a rewrite (overwrite is not an append)") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 4), dir)
    TableLog.overwrite(spark, batch(50 until 55), dir)
    val e = intercept[IllegalArgumentException] {
      TableLog.changesBetween(spark, dir, 0L, 1L)
    }
    assert(e.getMessage.contains("not a pure append"))
  }

  test("compact folds many dirs into one, preserving content and history") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 5), dir)
    (1 to 4).foreach(i => TableLog.append(spark, batch(i * 5 until i * 5 + 5), dir))
    val before = TableLog.read(spark, dir).select("id").as[Long].collect().sorted
    val v = TableLog.compact(spark, dir, parts = 2)
    assert(TableLog.readManifest(spark, dir, v).dirs.length === 1)
    val after = TableLog.read(spark, dir).select("id").as[Long].collect().sorted
    assert(after === before)
    assert(TableLog.readVersion(spark, dir, 2).count() === 15, "history intact")
  }

  test("vacuum ages out history but retained time travel keeps working") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 3), dir)
    TableLog.append(spark, batch(3 until 6), dir)
    TableLog.overwrite(spark, batch(10 until 12), dir)
    TableLog.append(spark, batch(12 until 16), dir)
    TableLog.vacuum(spark, dir, retainLast = 2)
    assert(TableLog.versions(spark, dir) === Seq(2L, 3L))
    assert(TableLog.readVersion(spark, dir, 2).count() === 2)
    assert(TableLog.read(spark, dir).select("id").as[Long].collect().sorted
      === (10L until 16L).toArray)
    intercept[IllegalArgumentException] {
      TableLog.readVersion(spark, dir, 0)
    }
  }

  test("append with a different schema fails loudly") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 3), dir)
    val drifted = Seq((1L, "x", 3.0)).toDF("id", "s", "extra")
    val e = intercept[IllegalArgumentException] {
      TableLog.append(spark, drifted, dir)
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("evolveAppend adds a nullable column without rewriting history") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 5), dir)
    val dirsBefore = TableLog.readManifest(spark, dir, 0L).dirs
    val evolved = Seq((5L, "row5", 50.0), (6L, "row6", 60.0))
      .toDF("id", "s", "score")
    TableLog.evolveAppend(spark, evolved, dir)
    // history untouched: version 1 references version 0's dirs verbatim
    assert(TableLog.readManifest(spark, dir, 1L).dirs.take(1) === dirsBefore)
    val latest = TableLog.read(spark, dir)
    assert(latest.columns.toSeq === Seq("id", "s", "score"))
    // pre-evolution rows surface the new column as NULL; new rows carry it
    val byId = latest.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(byId(0L).isEmpty && byId(4L).isEmpty)
    assert(byId(5L).contains(50.0) && byId(6L).contains(60.0))
    // time travel to the pre-evolution version reads the NARROW schema
    assert(TableLog.readVersion(spark, dir, 0L).columns.toSeq === Seq("id", "s"))
  }

  test("evolveAppend refuses dropped or retyped columns (additive only)") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 3), dir)
    val dropped = Seq(1L).toDF("id") // loses "s"
    val e1 = intercept[IllegalArgumentException] {
      TableLog.evolveAppend(spark, dropped, dir)
    }
    assert(e1.getMessage.contains("not additive"))
    val retyped = Seq((1L, 2L)).toDF("id", "s") // s: string -> long
    val e2 = intercept[IllegalArgumentException] {
      TableLog.evolveAppend(spark, retyped, dir)
    }
    assert(e2.getMessage.contains("not additive"))
    // nothing landed: still exactly version 0
    assert(TableLog.versions(spark, dir) === Seq(0L))
  }

  test("changesBetween across an evolution reads the EVOLVED schema") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 3), dir)
    TableLog.evolveAppend(spark,
      Seq((3L, "row3", 7.0)).toDF("id", "s", "score"), dir)
    val delta = TableLog.changesBetween(spark, dir, 0L, 1L)
    assert(delta.columns.toSeq === Seq("id", "s", "score"))
    assert(delta.select("id", "score").as[(Long, Option[Double])]
      .collect().toSeq === Seq((3L, Some(7.0))))
    // an ordinary same-schema batch still appends through evolveAppend
    TableLog.evolveAppend(spark,
      Seq((4L, "row4", 8.0)).toDF("id", "s", "score"), dir)
    assert(TableLog.read(spark, dir).count() === 5)
  }

  test("compactZorder rewrites layout only: content identical, every clustered column turns selective") {
    val dir = freshDir()
    // interleaved random-ish (x, y): insertion order correlates with
    // NEITHER column, so pre-zorder every file spans the full domain
    val rows = (0 until 20000).map(i =>
      (i.toLong, (i * 2654435761L) % 997L, (i * 40503L) % 997L))
    val df = rows.toDF("id", "x", "y")
    TableLog.create(spark, df.filter($"id" < 10000), dir)
    TableLog.append(spark, df.filter($"id" >= 10000), dir)
    val before = TableLog.read(spark, dir).collect().map(_.toSeq).toSet
    val preDirs = TableLog.readManifest(spark, dir, 1L).dirs
    val preFrac = preDirs.map(d =>
      graft.operators.Layout.pruneFraction(spark, d, "x", 500.0)).max
    val v = TableLog.compactZorder(spark, dir, Seq("x", "y"), parts = 8)
    val m = TableLog.readManifest(spark, dir, v)
    assert(m.op === "zorder" && m.dirs.size === 1)
    // rows untouched — only bytes-on-disk order changed
    assert(TableLog.read(spark, dir).collect().map(_.toSeq).toSet === before)
    // min-max pruning now selective on BOTH clustered columns
    val fx = graft.operators.Layout.pruneFraction(spark, m.dirs.head, "x", 500.0)
    val fy = graft.operators.Layout.pruneFraction(spark, m.dirs.head, "y", 500.0)
    assert(preFrac === 1.0, s"unclustered layout should be unprunable, got $preFrac")
    assert(fx <= 0.75 && fy <= 0.75, s"zorder not selective: x=$fx y=$fy")
    // commit zone maps recorded for the clustered LONG columns
    assert(m.stats.map(_._2).toSet === Set("x", "y"))
    // a rewrite: CDC ranges across it are refused, history stays readable
    intercept[IllegalArgumentException] {
      TableLog.changesBetween(spark, dir, 0L, v)
    }
    assert(TableLog.readVersion(spark, dir, 1L).count() === 20000)
  }

  test("deleteByKey: O(keys) commit hides rows; time travel shows them; compact materializes") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 10), dir)
    val preDirs = TableLog.readManifest(spark, dir, 0L).dirs
    val v = TableLog.deleteByKey(spark,
      Seq(2L, 5L, 7L).toDF("id"), dir, Seq("id"))
    val m = TableLog.readManifest(spark, dir, v)
    // merge-on-read: the data dirs are UNTOUCHED — only a key frame landed
    assert(m.dirs === preDirs && m.op === "delete-dv" && m.dvs.size === 1)
    assert(TableLog.read(spark, dir).select("id").as[Long].collect().sorted
      === Array(0L, 1L, 3L, 4L, 6L, 8L, 9L))
    // pre-delete snapshot still shows the rows
    assert(TableLog.readVersion(spark, dir, 0L).count() === 10)
    // zone-map range read subtracts DVs too
    assert(TableLog.readRange(spark, dir, "id", 0L, 9L)
      .select("id").as[Long].collect().sorted === Array(0L, 1L, 3L, 4L, 6L, 8L, 9L))
    // compact materializes: DVs drop, content is the post-delete snapshot
    val cv = TableLog.compact(spark, dir)
    assert(TableLog.readManifest(spark, dir, cv).dvs.isEmpty)
    assert(TableLog.read(spark, dir).count() === 7)
  }

  test("a DV covers only its delete-time prefix: later appends of the same key survive") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 5), dir)
    TableLog.deleteByKey(spark, Seq(1L, 3L).toDF("id"), dir, Seq("id"))
    // the key comes BACK in a later append — positional semantics says
    // the old DV must not swallow it
    TableLog.append(spark, batch(3 until 4), dir)
    assert(TableLog.read(spark, dir).select("id").as[Long].collect().sorted
      === Array(0L, 2L, 3L, 4L))
    // a second delete takes out the reborn row (covers the longer prefix)
    TableLog.deleteByKey(spark, Seq(3L).toDF("id"), dir, Seq("id"))
    assert(TableLog.read(spark, dir).select("id").as[Long].collect().sorted
      === Array(0L, 2L, 4L))
  }

  test("changesBetween refuses a range containing a DV commit; vacuum keeps live DV dirs") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 4), dir)
    TableLog.append(spark, batch(4 until 6), dir)
    val dv = TableLog.deleteByKey(spark, Seq(0L).toDF("id"), dir, Seq("id"))
    TableLog.append(spark, batch(6 until 8), dir)
    // pure-append range after the DV commit is fine
    assert(TableLog.changesBetween(spark, dir, dv, dv + 1)
      .select("id").as[Long].collect().sorted === Array(6L, 7L))
    // a range STRADDLING the DV commit is refused (visibility changed)
    val e = intercept[IllegalArgumentException] {
      TableLog.changesBetween(spark, dir, 1L, dv)
    }
    assert(e.getMessage.contains("deletion-vector"))
    // vacuum to the last 2 versions: the DV dir is still referenced
    TableLog.vacuum(spark, dir, retainLast = 2)
    assert(TableLog.read(spark, dir).select("id").as[Long].collect().sorted
      === Array(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("bloom commit skipping: point lookup plans only commits that might hold the key") {
    val dir = freshDir()
    // disjoint string keyspaces per commit so the blooms can separate them
    def b(tag: String, ids: Range) =
      ids.map(i => (i.toLong, s"$tag$i")).toDF("id", "s")
    TableLog.create(spark, b("alpha", 0 until 400), dir, bloomCols = Seq("s"))
    TableLog.append(spark, b("beta", 0 until 400), dir, bloomCols = Seq("s"))
    TableLog.append(spark, b("gamma", 0 until 400), dir, bloomCols = Seq("s"))
    val m = TableLog.readManifest(spark, dir, 2L)
    assert(m.blooms.size === 3 && m.blooms.forall(_._2 == "s"))
    val hit = TableLog.readPoint(spark, dir, "s", "beta7")
    assert(hit.collect().map(_.getLong(0)).toSeq === Seq(7L))
    // planning-time skipping: only the beta commit's dir is in the scan
    // inputFiles are file: URIs; manifest dirs are plain paths
    val scanned = hit.inputFiles.map(f => m.dirs.indexWhere(f.contains)).toSet
    assert(scanned === Set(1), s"expected only commit 1 scanned, got $scanned")
    // absent key: every bloom says no -> empty plan, zero dirs
    val miss = TableLog.readPoint(spark, dir, "s", "delta1")
    assert(miss.count() === 0 && miss.inputFiles.isEmpty)
    // bloom-less column: all dirs read, answers still right
    assert(TableLog.readPoint(spark, dir, "id", 3L).count() === 3)
    // DV interplay: delete the key, the lookup honors it
    TableLog.deleteByKey(spark, Seq("beta7").toDF("s"), dir, Seq("s"))
    assert(TableLog.readPoint(spark, dir, "s", "beta7").count() === 0)
  }

  test("merge upserts: matched keys replaced, unmatched inserted, history intact") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 6), dir)
    val updates = Seq((4L, "UPDATED4"), (5L, "UPDATED5"), (20L, "NEW20"))
      .toDF("id", "s")
    TableLog.merge(spark, updates, dir, Seq("id"))
    val got = TableLog.read(spark, dir).as[(Long, String)].collect().sortBy(_._1)
    assert(got === Array((0L, "row0"), (1L, "row1"), (2L, "row2"), (3L, "row3"),
      (4L, "UPDATED4"), (5L, "UPDATED5"), (20L, "NEW20")))
    assert(TableLog.readVersion(spark, dir, 0).count() === 6, "pre-merge intact")
    assert(TableLog.readManifest(spark, dir, 1L).op === "merge")
  }

  test("delete drops only matching rows; erasure completes at vacuum") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 10), dir)
    TableLog.delete(spark, dir, col("id") >= 7L)
    assert(TableLog.read(spark, dir).select("id").as[Long].collect().sorted
      === (0L until 7L).toArray)
    assert(TableLog.readVersion(spark, dir, 0).count() === 10,
      "deleted rows remain in history until vacuum — the compliance boundary")
    TableLog.vacuum(spark, dir, retainLast = 1)
    assert(TableLog.versions(spark, dir) === Seq(1L))
    assert(TableLog.read(spark, dir).count() === 7)
  }

  test("appendBatch is exactly-once: a replayed epoch commits nothing") {
    val dir = freshDir()
    assert(TableLog.appendBatch(spark, batch(0 until 5), dir, batchId = 0L)
      === Some(0L))
    assert(TableLog.appendBatch(spark, batch(5 until 8), dir, batchId = 1L)
      === Some(1L))
    // at-least-once redelivery of epoch 1 (possibly different partitioning)
    assert(TableLog.appendBatch(spark, batch(5 until 8).repartition(3), dir,
      batchId = 1L) === None)
    assert(TableLog.appendBatch(spark, batch(8 until 9), dir, batchId = 2L)
      === Some(2L))
    assert(TableLog.committedBatchIds(spark, dir) === Set(0L, 1L, 2L))
    assert(TableLog.read(spark, dir).select("id").as[Long].collect().sorted
      === (0L until 9L).toArray)
  }

  test("a real streaming query lands micro-batches through the sink exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = freshDir()
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "s").writeStream
      .foreachBatch(TableLog.streamSink(dir))
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tlsink").toString)
      .start()
    in.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    in.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(TableLog.read(spark, dir).select("id").as[Long].collect().sorted
      === Array(1L, 2L, 3L))
    assert(TableLog.committedBatchIds(spark, dir).nonEmpty)
  }

  test("zone-map skipping: a range read plans only the commits whose stats intersect") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 100), dir, statsCols = Seq("id"))
    TableLog.append(spark, batch(100 until 200), dir, statsCols = Seq("id"))
    TableLog.append(spark, batch(200 until 300), dir, statsCols = Seq("id"))
    val m = TableLog.readManifest(spark, dir, 2L)
    assert(m.stats.map(s => (s._3, s._4)).sorted
      === Seq((0L, 99L), (100L, 199L), (200L, 299L)))
    val hit = TableLog.readRange(spark, dir, "id", 120L, 150L)
    // planning-time skip: only the middle commit's files enter the scan
    val hitDir = m.stats.find(_._3 == 100L).get._1
    assert(hit.inputFiles.nonEmpty &&
      hit.inputFiles.forall(_.contains(new org.apache.hadoop.fs.Path(hitDir).getName)),
      s"scan not pruned to the matching commit: ${hit.inputFiles.toSeq}")
    // and the residual filter keeps answers exact
    assert(hit.select("id").as[Long].collect().sorted === (120L to 150L).toArray)
    // dirs WITHOUT stats are always read: a stats-less append must show up
    TableLog.append(spark, batch(130 until 132), dir) // no statsCols
    val again = TableLog.readRange(spark, dir, "id", 120L, 150L)
      .select("id").as[Long].collect().sorted
    assert(again === ((120L to 150L) ++ Seq(130L, 131L)).toArray.sorted)
    // disjoint range: planned empty, correct empty
    assert(TableLog.readRange(spark, dir, "id", 5000L, 6000L).count() === 0)
  }

  test("snapshot reads keep parquet pushdown (filter reaches the multi-dir scan)") {
    val dir = freshDir()
    TableLog.create(spark, batch(0 until 100), dir)
    TableLog.append(spark, batch(100 until 200), dir)
    val plan = TableLog.read(spark, dir).filter(col("id") === 150L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,150)"),
      s"pushdown lost through the log:\n$plan")
  }

  // OCC write loop: eight writers race on version slots concurrently;
  // every loser must rebase and re-land — the final table holds every
  // writer's batch exactly once and the log is a contiguous version
  // chain. (The publish rename makes the race loud; commitWithRetry
  // makes it survivable.)
  test("concurrent appenders all land exactly once under commitWithRetry") {
    val dir = java.nio.file.Files.createTempDirectory("txrace").toString + "/t"
    TableLog.create(spark, Seq((-1L, -1L)).toDF("w", "i"), dir)
    val writers = 8
    val perWriter = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val tasks = (0 until writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val batch = (0 until perWriter).map(i => (w.toLong, i.toLong))
              .toDF("w", "i")
            TableLog.commitWithRetry(
              () => TableLog.append(spark, batch, dir), maxRetries = 50)
            ()
          }
        })
      }
      tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val rows = TableLog.read(spark, dir).as[(Long, Long)].collect().toSeq
    val want = ((-1L, -1L) +:
      (for (w <- 0 until writers; i <- 0 until perWriter)
        yield (w.toLong, i.toLong))).sorted
    assert(rows.sorted === want, "every writer's batch exactly once")
    // contiguous version chain: create + one commit per writer
    assert(TableLog.versions(spark, dir) === (0L to writers.toLong))
  }

  test("commitWithRetry surfaces the conflict once the budget is exhausted") {
    val dir = java.nio.file.Files.createTempDirectory("txretry").toString + "/t"
    TableLog.create(spark, Seq((0L, 0L)).toDF("w", "i"), dir)
    // an attempt that ALWAYS loses: commit the next version out from
    // under itself before publishing
    val e = intercept[TableLog.ConcurrentCommitException] {
      TableLog.commitWithRetry({ () =>
        val v = TableLog.latestVersion(spark, dir).get + 1
        TableLog.append(spark, Seq((9L, v)).toDF("w", "i"), dir) // takes the slot
        throw new TableLog.ConcurrentCommitException(v, dir)     // simulate loss
      }, maxRetries = 3)
    }
    assert(e.getMessage.contains("rebase and retry"))
  }
}
