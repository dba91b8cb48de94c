package graft

import graft.plans.{MvAutoPilot, MvCatalog}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

/** The closed MV lifecycle: the advisor recommends from a live
  * workload, the autopilot builds the summary as incremental state and
  * maintains it per ingest batch, and after EVERY refresh the rewrite
  * serves each contributing query with answers hash-equal to a
  * rewrite-off base recompute. */
class MvAutoPilotSpec extends SparkSpecBase with BeforeAndAfterEach {
  import spark.implicits._

  override def afterEach(): Unit = MvCatalog.clear()

  test("advice → build → maintain → serve: every epoch hash-matches the base") {
    val root = java.nio.file.Files.createTempDirectory("mvpilot").toString
    val base = s"$root/base"
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "source", "n_chars")
    docs.filter($"doc_id" % 3 === 0).write.mode("append").parquet(base)

    // the workload, authored against the BASE path (defs: re-planned
    // per call, so each epoch sees the current file listing)
    def q1 = spark.read.parquet(base).groupBy("lang")
      .agg(count(lit(1)).as("n"))
    def q2 = spark.read.parquet(base).groupBy("lang", "source")
      .agg(sum("n_chars").as("chars"))
    def workload = Seq(q1, q2)

    val pilots = MvAutoPilot.adopt(spark, workload, s"$root/mvs")
    assert(pilots.size === 1)
    val p = pilots.head
    assert(p.dims === Seq("lang", "source") && p.sums === Seq("n_chars"))

    def check(): Unit = {
      MvCatalog.clear() // truth comes from the base, rewrite off
      val truths = workload.map(_.collect().map(_.toString).sorted.toSeq)
      MvCatalog.register(MvCatalog.MvDef(p.basePath, p.mvPath, p.dims, p.sums))
      workload.zip(truths).foreach { case (q, truth) =>
        val files = q.inputFiles
        assert(files.nonEmpty && files.forall(_.contains("/mvs/")),
          s"not served by the maintained MV: ${files.take(2).toSeq}")
        assert(q.collect().map(_.toString).sorted.toSeq === truth)
      }
    }

    check() // epoch 0: the initial build serves

    // two ingest epochs: the base grows, the summary FOLLOWS it
    // incrementally (merge cost O(batch + |dim tuples|), no re-scan)
    for (epoch <- Seq(1, 2)) {
      val batch = docs.filter($"doc_id" % 3 === epoch)
      batch.write.mode("append").parquet(base)
      assert(p.ingest(spark, batch, epoch.toLong))
      check()
    }

    // replayed batch: committed-marker no-op, answers unchanged
    assert(!p.ingest(spark, docs.filter($"doc_id" % 3 === 2), 2L))
    check()
  }
}
