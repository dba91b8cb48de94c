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
}
