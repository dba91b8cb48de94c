package graft

import graft.operators.MaterializedView
import graft.plans.MvCatalog
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

/** R95: the MV rewrite must (a) answer conforming aggregates from the
  * summary scan with bit-identical results, (b) leave every
  * non-conforming plan untouched, (c) honor the kill switch. Scan
  * provenance is asserted via inputFiles — the observable that cannot
  * lie about which table served the query.
  */
class MvRewriteSpec extends SparkSpecBase with BeforeAndAfterEach {
  import spark.implicits._

  override def afterEach(): Unit = MvCatalog.clear()

  /** Base table: (d1 string, d2 long, v long, extra long). */
  private def freshBase(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("mvspec").toString
    val base = s"$root/base"
    (0 until 1000).map { i =>
      (s"g${i % 5}", (i % 3).toLong, i.toLong, (i * 7).toLong)
    }.toDF("d1", "d2", "v", "extra").write.parquet(base)
    (base, s"$root/mv")
  }

  private def scansMv(df: org.apache.spark.sql.DataFrame): Boolean = {
    val files = df.inputFiles
    files.nonEmpty && files.forall(_.contains("/mv/"))
  }

  test("conforming aggregate is served by the MV, bit-identical to the base answer") {
    val (base, mv) = freshBase()
    val truth = spark.read.parquet(base).groupBy("d1")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    MaterializedView.build(spark, base, mv, dims = Seq("d1", "d2"), sums = Seq("v"))
    val q = spark.read.parquet(base).groupBy("d1")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    assert(scansMv(q), s"expected MV scan, got ${q.inputFiles.take(2).toSeq}")
    assert(q.as[(String, Long, Long)].collect().toSet === truth)
  }

  test("dim-only predicates ride the rewrite; exact grouping on all dims too") {
    val (base, mv) = freshBase()
    MaterializedView.build(spark, base, mv, dims = Seq("d1", "d2"), sums = Seq("v"))
    val q = spark.read.parquet(base)
      .filter(col("d2") =!= 1L && col("d1") =!= "g4")
      .groupBy("d1", "d2").agg(sum("v").as("sv"))
    assert(scansMv(q))
    MvCatalog.clear()
    val truth = spark.read.parquet(base)
      .filter(col("d2") =!= 1L && col("d1") =!= "g4")
      .groupBy("d1", "d2").agg(sum("v").as("sv"))
      .as[(String, Long, Long)].collect().toSet
    assert(q.as[(String, Long, Long)].collect().toSet === truth)
  }

  test("non-conforming shapes stay on the base table") {
    val (base, mv) = freshBase()
    MaterializedView.build(spark, base, mv, dims = Seq("d1", "d2"), sums = Seq("v"))
    // max is not decomposable from this MV
    assert(!scansMv(spark.read.parquet(base).groupBy("d1").agg(max("v"))))
    // sum over a non-registered column
    assert(!scansMv(spark.read.parquet(base).groupBy("d1").agg(sum("extra"))))
    // grouping by a non-dim column
    assert(!scansMv(spark.read.parquet(base).groupBy("extra").agg(sum("v"))))
    // predicate over a non-dim column keeps or drops PARTS of cells
    assert(!scansMv(spark.read.parquet(base).filter(col("extra") > 100)
      .groupBy("d1").agg(sum("v"))))
    // FILTER (WHERE ...) on the aggregate itself filters BASE rows —
    // rewriting would silently drop the clause
    assert(!scansMv(spark.read.parquet(base).groupBy("d1")
      .agg(sum_distinct(col("v")))), "distinct sums are not decomposable")
    assert(!scansMv(spark.sql(
      s"SELECT d1, sum(v) FILTER (WHERE d2 = 1) AS s " +
        s"FROM parquet.`$base` GROUP BY d1")))
    // a GLOBAL aggregate must stay on the base: on an empty base
    // count(*) emits one 0-row, the MV's sum would emit NULL
    assert(!scansMv(spark.read.parquet(base)
      .agg(sum("v").as("s"), count(lit(1)).as("n"))))
  }

  test("kill switch and deregistration both restore the base scan") {
    val (base, mv) = freshBase()
    MaterializedView.build(spark, base, mv, dims = Seq("d1"), sums = Seq("v"))
    val q = () => spark.read.parquet(base).groupBy("d1").agg(sum("v"))
    assert(scansMv(q()))
    spark.conf.set(graft.plans.RewriteToMv.ConfKey, "false")
    try assert(!scansMv(q())) finally
      spark.conf.set(graft.plans.RewriteToMv.ConfKey, "true")
    MvCatalog.clear()
    assert(!scansMv(q()))
  }

  test("build refuses non-integral sum columns (float reassociation guard)") {
    val root = java.nio.file.Files.createTempDirectory("mvspec").toString
    Seq(("a", 1.5)).toDF("d", "x").write.parquet(s"$root/fbase")
    val e = intercept[IllegalArgumentException] {
      MaterializedView.build(spark, s"$root/fbase", s"$root/fmv",
        dims = Seq("d"), sums = Seq("x"))
    }
    assert(e.getMessage.contains("integral required"))
  }

  test("mv1 catalog entry: rewrite fires and the answer matches the base recomputation") {
    val out = SparkEntry.queries("mv1_rewrite")(spark, sf0001)
      .as[(String, String, Long, Long)].collect().toSet
    val truth = Tables.documents(spark, sf0001)
      .filter(col("lang") =!= "xx")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(out === truth)
  }

  test("MV stays serveable across INCREMENTAL refreshes: a growing base, " +
    "an IncrementalAgg-maintained summary, the rewrite serving each epoch") {
    import graft.operators.IncrementalAgg
    val root = java.nio.file.Files.createTempDirectory("mvinc").toString
    val (base, mv, state) = (s"$root/base", s"$root/mv", s"$root/state")
    val docs = Tables.documents(spark, sf0001).select("doc_id", "lang", "n_chars")

    def epoch(batch: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      // the base table grows by the batch...
      batch.write.mode("append").parquet(base)
      // ...and the summary FOLLOWS it incrementally: merge cost is
      // O(batch + |langs|), never a base re-scan
      IncrementalAgg.update(spark, state, batch, id, key = "lang",
        value = "n_chars")
      IncrementalAgg.snapshot(spark, state)
        .select(col("k").as("lang"), col("cnt").as("__cnt"),
          col("sm").as("__sum_n_chars"))
        .write.mode("overwrite").parquet(mv)
      MvCatalog.register(MvCatalog.MvDef(base, mv, Seq("lang"), Seq("n_chars")))
    }

    def check(): Unit = {
      MvCatalog.clear() // truth must come from the base, not a stale MV
      val truth = spark.read.parquet(base).groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
        .as[(String, Long, Long)].collect().toSet
      MvCatalog.register(MvCatalog.MvDef(base, mv, Seq("lang"), Seq("n_chars")))
      val q = spark.read.parquet(base).groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
      assert(scansMv(q), s"rewrite did not fire: ${q.inputFiles.take(2).toSeq}")
      assert(q.as[(String, Long, Long)].collect().toSet === truth)
    }

    epoch(docs.filter($"doc_id" % 2 === 0), 0L); check()
    epoch(docs.filter($"doc_id" % 2 === 1), 1L); check()
    // replayed batch: the summary must not double-count, the MV answer
    // must stay equal to the (unchanged) base
    IncrementalAgg.update(spark, state, docs.filter($"doc_id" % 2 === 1), 1L,
      key = "lang", value = "n_chars")
    check()
  }
}
