package graft

import graft.plans.{MvAdvisor, MvCatalog}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

/** The advisor closes the MV lifecycle: it must extract exactly the
  * rewrite-serveable shapes from a workload, union them per table,
  * score by measured reduction, and its built recommendation must then
  * actually serve every contributing query. */
class MvAdvisorSpec extends SparkSpecBase with BeforeAndAfterEach {
  import spark.implicits._

  override def afterEach(): Unit = MvCatalog.clear()

  private def docs = Tables.documents(spark, sf0001)

  private def workload = Seq(
    docs.groupBy("lang").agg(count(lit(1)).as("n")),                   // serveable
    docs.groupBy("lang", "source").agg(sum("n_chars").as("chars")),    // serveable
    docs.filter(col("lang") =!= "xx").groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars")),         // serveable
    docs.groupBy("lang").agg(avg("n_chars").as("a")),                  // avg: not
    Tables.events(spark, sf0001).groupBy("event_type")
      .agg(sum("value").as("v")))                                      // float sum: not

  test("conforming shapes are extracted, non-conforming rejected") {
    val shapes = workload.flatMap(MvAdvisor.conformingShape)
    assert(shapes.size === 3, s"expected 3 serveable shapes, got $shapes")
    assert(shapes.forall(_._1.contains("documents")))
  }

  test("a global aggregate (no GROUP BY, no filter) is rejected, not crashed on") {
    val global = docs.agg(count(lit(1)).as("n"))
    assert(MvAdvisor.conformingShape(global).isEmpty)
    // and a workload containing one doesn't take down the whole advisor call
    val recs = MvAdvisor.analyze(spark, workload :+ global, minHits = 2)
    assert(recs.size === 1)
  }

  test("the advisor unions per-table shapes, counts hits, measures reduction") {
    val recs = MvAdvisor.analyze(spark, workload, minHits = 2)
    assert(recs.size === 1)
    val r = recs.head
    assert(r.basePath.contains("documents"))
    assert(r.dims === Seq("lang", "source"))
    assert(r.sums === Seq("n_chars"))
    assert(r.hits === 3)
    assert(r.mvRows > 0 && r.mvRows < r.baseRows,
      s"summary must shrink the table: $r")
  }

  test("acting on the advice serves every contributing query from the MV") {
    val truths = workload.take(3).map(_.collect().map(_.toString).sorted.toSeq)
    val mvRoot = java.nio.file.Files.createTempDirectory("mvadv").toString
    MvAdvisor.buildRecommended(spark,
      MvAdvisor.analyze(spark, workload, minHits = 2), mvRoot)
    workload.take(3).zip(truths).foreach { case (q, truth) =>
      val files = q.inputFiles
      assert(files.nonEmpty && files.forall(_.contains("mvadv")),
        s"query not served by the advised MV: ${files.take(2).toSeq}")
      assert(q.collect().map(_.toString).sorted.toSeq === truth)
    }
    // the non-conforming queries still run against their base tables
    workload.drop(3).foreach { q =>
      assert(!q.inputFiles.forall(_.contains("mvadv")))
      assert(q.count() > 0)
    }
  }
}
