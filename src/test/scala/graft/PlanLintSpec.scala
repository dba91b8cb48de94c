package graft

import graft.plans.PlanLint
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PlanLint: every warn rule fires on a constructed offender and stays
  * silent on audited catalog shapes. */
class PlanLintSpec extends SparkSpecBase {
  import spark.implicits._

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanLint.lint(df).filter(_.severity == "warn").map(_.rule).toSet

  test("cartesian product detected") {
    val a = spark.range(1000).toDF("x")
    val b = spark.range(1000).toDF("y")
    // disable broadcast so the cross join plans as CartesianProduct
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(rules(a.crossJoin(b)).contains("cartesian-product"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("unconditioned broadcast nested loop: unbounded build side warns, " +
    "bounded scalar broadcast stays silent") {
    val docs = Tables.documents(spark, sf0001)
    // build side is a parquet scan — no static row bound -> hazard
    assert(rules(docs.crossJoin(docs.select("lang")))
      .contains("cartesian-product"))
    // the repo's scalar-attach idiom: global agg (maxRows = 1) broadcast
    val mx = docs.agg(max("n_chars").as("mx"))
    assert(!rules(docs.crossJoin(broadcast(mx))).contains("cartesian-product"))
  }

  test("global window detected; keyed window clean") {
    val df = Tables.documents(spark, sf0001)
    val global = df.withColumn("rn",
      row_number().over(Window.orderBy("doc_id")))
    assert(rules(global).contains("global-window"))
    val keyed = df.withColumn("rn",
      row_number().over(Window.partitionBy("lang").orderBy("doc_id")))
    assert(!rules(keyed).contains("global-window"))
  }

  test("global window over a statically bounded (post-limit) frame is " +
    "info, not warn — the ml27 pre-fix shape warns, the fixed shape is clean") {
    val df = Tables.documents(spark, sf0001)
    // ml27's FIXED shape: top-k via orderBy+limit, then a window on the
    // k-row frame — statically bounded, whitelisted as info
    val topk = df.orderBy(desc("n_chars"), col("doc_id")).limit(25)
      .withColumn("rn", row_number().over(Window.orderBy("doc_id")))
    assert(!rules(topk).contains("global-window"))
    assert(PlanLint.lint(topk).exists(f =>
      f.rule == "global-window" && f.severity == "info"))
    // ml27's literal PRE-fix shape (row_number + filter) is absorbed by
    // the injected RewriteWindowTopK rule — R76 fixes it in the
    // OPTIMIZER, so no global WindowExec even reaches the linter:
    val prefix = df.withColumn("rn",
      row_number().over(Window.orderBy(desc("n_chars"), col("doc_id"))))
      .filter(col("rn") <= 25)
    assert(!rules(prefix).contains("global-window"))
    // ...so the warn case is a global window NO rewrite can absorb — a
    // running sum over the whole data-scaling frame
    val running = df.withColumn("cum", sum("n_chars").over(
      Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(rules(running).contains("global-window"))
  }

  test("Blocked.cumulative emits no global window and matches the " +
    "window form exactly") {
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars").cast("long").as("v"))
    val blocked = graft.operators.Blocked.cumulative(
      df, Seq(col("v"), col("doc_id")), Seq("v"), rn = Some("rn"))
    assert(!rules(blocked).contains("global-window"))
    val w = Window.orderBy("v", "doc_id")
    val plain = df
      .withColumn("cum_v", sum("v").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(w).cast("long"))
    val got = blocked.orderBy("rn").collect().map(r =>
      (r.getAs[Long]("rn"), r.getAs[Long]("cum_v"))).toSeq
    val want = plain.orderBy("rn").collect().map(r =>
      (r.getAs[Long]("rn"), r.getAs[Long]("cum_v"))).toSeq
    assert(got === want)
  }

  test("Blocked.cumulativeBy matches the partitioned window form exactly " +
    "(running sum + row_number per group)") {
    val df = Tables.documents(spark, sf0001)
      .select(col("lang"), col("doc_id"), col("n_chars").cast("long").as("v"))
    val blocked = graft.operators.Blocked.cumulativeBy(
      df, Seq("lang"), Seq(col("v").desc, col("doc_id")), Seq("v"),
      rn = Some("rn"))
    val w = Window.partitionBy("lang").orderBy(col("v").desc, col("doc_id"))
    val plain = df
      .withColumn("cum_v", sum("v").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(w).cast("long"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("cum_v"), r.getAs[Long]("rn"))
    assert(blocked.collect().map(key).sortBy(k => (k._1, k._2)).toSeq
      === plain.collect().map(key).sortBy(k => (k._1, k._2)).toSeq)
  }

  test("Blocked.prefixMax emits no global window and matches the window " +
    "form in both inclusive and strict-prefix modes") {
    val df = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars").cast("long").as("v"))
    val w = Window.orderBy("doc_id")
    // inclusive: running max ≡ max over unbounded-preceding..current
    val inc = graft.operators.Blocked.prefixMax(
      df, Seq(col("doc_id")), "v", "pm")
    assert(!rules(inc).contains("global-window"))
    val incWant = df.withColumn("pm", max("v").over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(inc.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getAs[Long]("pm"))).toSeq
      === incWant.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getAs[Long]("pm"))).toSeq)
    // strict: max over rows BEFORE current; first row NULL (q137's frame)
    val strict = graft.operators.Blocked.prefixMax(
      df, Seq(col("doc_id")), "v", "pm", inclusive = false)
    assert(!rules(strict).contains("global-window"))
    val strictWant = df.withColumn("pm", max("v").over(
      w.rowsBetween(Window.unboundedPreceding, -1)))
    val got = strict.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.lang.Long]("pm")))).toSeq
    val want = strictWant.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.lang.Long]("pm")))).toSeq
    assert(got === want)
    assert(got.head._2.isEmpty) // first row has no strict prefix
  }

  test("missed broadcast: merge-hinted small join warns, plain join does not") {
    val docs = Tables.documents(spark, sf0001)
    val dim = Tables.documents(spark, sf0001)
      .select("lang").distinct()
    val hinted = docs.join(dim.hint("merge"), Seq("lang"))
    assert(rules(hinted).contains("missed-broadcast"))
    val plain = docs.join(dim, Seq("lang")) // optimizer broadcasts this
    assert(!rules(plain).contains("missed-broadcast"))
  }

  test("missed broadcast is join-type aware: full outer can never broadcast") {
    val docs = Tables.documents(spark, sf0001)
    // the joined side must CARRY a column, or the optimizer eliminates
    // the no-op outer join outright and there is nothing to lint
    val dimWithCol = docs.groupBy("lang").agg(count(lit(1)).as("lang_cnt"))
    // a full outer join has no legal broadcast build side — a small input
    // must NOT produce an unactionable missed-broadcast warning
    val fo = docs.join(dimWithCol, Seq("lang"), "full_outer")
    assert(PlanLint.lint(fo).nonEmpty) // the join planned (exchanges exist)
    assert(!rules(fo).contains("missed-broadcast"))
    // a left outer with a small RIGHT side is broadcastable → still warns
    // when hinted away from broadcast
    val lo = docs.join(dimWithCol.hint("merge"), Seq("lang"), "left_outer")
    assert(rules(lo).contains("missed-broadcast"))
  }

  test("unpushed scan is info, pushable filter is silent") {
    val docs = Tables.documents(spark, sf0001)
    val unpushed = docs.filter(length(col("text")) % 7 === 3)
    val info = PlanLint.lint(unpushed).filter(_.severity == "info").map(_.rule)
    assert(info.contains("unpushed-scan"))
    val pushed = docs.filter(col("n_chars") > 100)
    assert(!PlanLint.lint(pushed).map(_.rule).contains("unpushed-scan"))
  }

  test("exchange count reported as info") {
    val df = Tables.documents(spark, sf0001).groupBy("lang").count()
    val ex = PlanLint.lint(df).filter(_.rule == "exchange")
    assert(ex.nonEmpty && ex.forall(_.severity == "info"))
  }

  test("audited catalog flagships lint clean") {
    for (name <- Seq("q01_agg", "q03_join_agg", "q07_star_join", "dd1_exact")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      assert(PlanLint.clean(df), s"$name: ${PlanLint.lint(df)}")
    }
  }
}
