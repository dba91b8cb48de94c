package graft


/** Bucketed co-located joins (SURVEY.md §6): both sides bucketed on the
  * join key → sort-merge join with ZERO exchanges. The pre-shuffle
  * pattern that turns a repeated 100 TB fact-fact join from
  * shuffle-dominated into scan-dominated.
  */
class BucketingSpec extends SparkSpecBase {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without a shuffle") {
    val n = 10000
    // clean both catalog entries and any stale warehouse dirs from
    // earlier (possibly crashed) runs — the metastore forgets, the
    // filesystem doesn't
    Seq("bucket_left", "bucket_right").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
    }
    (1 to n).map(i => (i.toLong, s"left_$i")).toDF("k", "lv")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucket_left")
    (1 to n).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucket_right")

    // tables this small would broadcast; force the SMJ path the pattern
    // exists for (at fact-fact scale neither side broadcasts)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucket_left").join(spark.table("bucket_right"), "k")
      assert(joined.count() === n)
      // stringify: AQE wraps the plan, so pattern-collect can miss subtrees
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should have no shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("a point filter on the bucket key prunes to a single bucket file") {
    // bucket pruning: `k = const` hashes to one bucket, so the scan
    // reads 1/8 of the files — the same effect partition pruning has on
    // date ranges, but on high-cardinality keys where one-dir-per-value
    // is impossible. At 100 TB this is the difference between a point
    // lookup scanning 12.5 TB and scanning all of it.
    spark.sql("DROP TABLE IF EXISTS bucket_prune")
    val whDir = new java.io.File("spark-warehouse/bucket_prune")
    if (whDir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(whDir)
    }
    (1 to 10000).map(i => (i.toLong, s"v_$i")).toDF("k", "v")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucket_prune")
    // a filter-only plan gains nothing from the bucketed DISTRIBUTION,
    // so the planner's auto-bucketed-scan turns bucketed reading off —
    // and bucket PRUNING with it; pin it on for the point-lookup shape
    val saved = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val df = spark.table("bucket_prune").filter($"k" === 42L)
      assert(df.count() === 1)
      val scan = df.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected single-bucket scan in:\n$scan")
    } finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", saved)
  }

  test("join strategy hints steer the physical join the way the docs promise") {
    // the three physical equi-join strategies on the same logical join:
    // hints are how a pipeline author overrides a mis-sized estimate at
    // 100 TB (e.g. a filtered dim Catalyst can't see through)
    val l = (1 to 2000).map(i => (i.toLong, i.toString)).toDF("k", "lv")
    val r = (1 to 2000).map(i => (i.toLong, i * 3.0)).toDF("k", "rv")
    def planOf(hinted: org.apache.spark.sql.DataFrame): String = {
      assert(hinted.count() === 2000)
      hinted.queryExecution.executedPlan.toString
    }
    assert(planOf(l.join(r.hint("broadcast"), "k")).contains("BroadcastHashJoin"))
    assert(planOf(l.join(r.hint("shuffle_hash"), "k")).contains("ShuffledHashJoin"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // merge hint: disable auto-broadcast so the hint (not size) decides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(planOf(l.join(r.hint("merge"), "k")).contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
