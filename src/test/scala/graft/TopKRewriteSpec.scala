package graft

import graft.functions.TopKPairs
import graft.plans.RewriteWindowTopK
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The injected optimizer rule (graft.plans.RewriteWindowTopK): the
  * window row_number top-k pattern must be replaced by the bounded-heap
  * topk_pairs aggregate exactly when that is answer-preserving — and
  * left alone otherwise.
  */
class TopKRewriteSpec extends SparkSpecBase {
  import spark.implicits._

  private def base: DataFrame =
    (0L until 2100L).map(i => (i % 7, (i * 37 % 101).toDouble, i))
      .toDF("g", "s", "id")

  private def windowTopK(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("g", "s", "id")
  }

  private def usesTopKPairs(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.exists(_.isInstanceOf[TopKPairs])) => a
    }.nonEmpty

  private def usesWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.nonEmpty

  test("row_number top-k over (double DESC, long ASC) is rewritten to topk_pairs") {
    val q = windowTopK(base, 5)
    assert(usesTopKPairs(q), "expected the bounded-heap aggregate in the optimized plan")
    assert(!usesWindow(q), "the Window node must be gone after the rewrite")
    assert(q.count() === 35L, "7 groups × k=5")
  }

  test("rewritten results equal the window form with the rule disabled") {
    val q = windowTopK(base, 5)
    val got = q.as[(Long, Double, Long)].collect().sorted
    spark.conf.set(RewriteWindowTopK.ConfKey, "false")
    try {
      val ref = windowTopK(base, 5)
      assert(!usesTopKPairs(ref) && usesWindow(ref),
        "conf flag must disable the rewrite")
      assert(got.sameElements(ref.as[(Long, Double, Long)].collect().sorted))
    } finally spark.conf.unset(RewriteWindowTopK.ConfKey)
  }

  test("heavy score ties: both forms project to the same (g, s, id) multiset") {
    // s has only 3 distinct values per group — row_number's choice among
    // tied rows is pinned by the id tiebreak, which topk_pairs mirrors
    val ties = (0L until 900L).map(i => (i % 3, (i % 3).toDouble, i))
      .toDF("g", "s", "id")
    val got = windowTopK(ties, 4).as[(Long, Double, Long)].collect().sorted
    spark.conf.set(RewriteWindowTopK.ConfKey, "false")
    try {
      val ref = windowTopK(ties, 4).as[(Long, Double, Long)].collect().sorted
      assert(got.sameElements(ref))
    } finally spark.conf.unset(RewriteWindowTopK.ConfKey)
    assert(got.length === 12)
  }

  test("rn < k is rewritten with the tightened limit") {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    val q = base.withColumn("rn", row_number().over(w)).filter(col("rn") < 4)
      .select("g", "s", "id")
    assert(usesTopKPairs(q))
    assert(q.count() === 21L, "7 groups × k=3")
  }

  test("not rewritten when rn survives into the output") {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    val q = base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("g", "s", "id", "rn")
    assert(!usesTopKPairs(q) && usesWindow(q))
  }

  test("q74 catalog entry actually executes through the rewrite") {
    val q = SparkEntry.queries("q74_topk_rewrite")(spark, sf0001)
    assert(usesTopKPairs(q),
      "q74 is the end-to-end certificate for the rewrite — its plan must use topk_pairs")
    assert(!usesWindow(q))
    assert(q.count() === 15L, "5 market segments × k=3")
  }

  test("NaN scores: rewritten and window forms agree (NaN ranks first in both)") {
    // 0.0/0.0 in a non-nullable double column — the case the rule must
    // survive: Spark's sort total-orders NaN above every double, and
    // TopKPairs uses the same java.lang.Double.compare order
    val withNaN = (0L until 400L)
      .map(i => (i % 4, if (i % 97 == 0) Double.NaN else (i * 31 % 89).toDouble, i))
      .toDF("g", "s", "id")
    val q = windowTopK(withNaN, 3)
    assert(usesTopKPairs(q), "rule must fire on non-nullable doubles containing NaN")
    val got = q.as[(Long, Double, Long)].collect()
      .map { case (g, s, id) => (g, if (s.isNaN) "NaN" else s.toString, id) }.sorted
    spark.conf.set(RewriteWindowTopK.ConfKey, "false")
    try {
      val ref = windowTopK(withNaN, 3).as[(Long, Double, Long)].collect()
        .map { case (g, s, id) => (g, if (s.isNaN) "NaN" else s.toString, id) }.sorted
      assert(got.sameElements(ref), "NaN handling diverged between the two forms")
      assert(got.exists(_._2 == "NaN"), "fixture must actually surface NaN rows in the top-k")
    } finally spark.conf.unset(RewriteWindowTopK.ConfKey)
  }

  test("signed zeros: rewritten and window forms agree (-0.0 ties 0.0, id breaks it)") {
    // Spark's SQL ordering treats -0.0 == 0.0 (SQLOrderingUtil), so the
    // id tiebreak decides between them; a bare Double.compare in the
    // heap would rank -0.0 below 0.0 and silently change the answer
    val zeros = Seq((0L, 0.0, 10L), (0L, -0.0, 1L), (0L, -1.0, 2L))
      .toDF("g", "s", "id")
    val got = windowTopK(zeros, 1).as[(Long, Double, Long)].collect().toSeq
    assert(usesTopKPairs(windowTopK(zeros, 1)))
    spark.conf.set(RewriteWindowTopK.ConfKey, "false")
    try {
      val ref = windowTopK(zeros, 1).as[(Long, Double, Long)].collect().toSeq
      assert(got.map(_._3) === ref.map(_._3),
        s"signed-zero tiebreak diverged: rewritten kept id ${got.map(_._3)}, window kept ${ref.map(_._3)}")
      assert(ref.map(_._3) === Seq(1L), "window form must keep the lower id among tied zeros")
    } finally spark.conf.unset(RewriteWindowTopK.ConfKey)
  }

  test("not rewritten when the score or id is itself a partition key (exprId collision)") {
    val w = Window.partitionBy("g", "s").orderBy(col("s").desc, col("id").asc)
    val q = base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("g", "s", "id")
    assert(!usesTopKPairs(q) && usesWindow(q))
    assert(q.count() > 0L)
  }

  test("not rewritten for an ascending score or a nullable score") {
    val wAsc = Window.partitionBy("g").orderBy(col("s").asc, col("id").asc)
    val qAsc = base.withColumn("rn", row_number().over(wAsc)).filter(col("rn") <= 5)
      .select("g", "s", "id")
    assert(!usesTopKPairs(qAsc) && usesWindow(qAsc))
    // Option-typed score → nullable attribute: the window ranks NULLS
    // LAST but the heap skips them, so the rule must not fire
    val nullable = (0L until 100L).map(i => (i % 5, Option((i * 13 % 17).toDouble), i))
      .toDF("g", "s", "id")
    val qNul = windowTopK(nullable, 3)
    assert(!usesTopKPairs(qNul) && usesWindow(qNul))
  }
}
