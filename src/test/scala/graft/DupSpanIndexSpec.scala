package graft

import graft.operators.{Corpus, DupSpanIndex}
import org.apache.spark.sql.functions._

/** The ingest-path contract for the log-structured duplicated-gram
  * index: the latest batch's at-ingest report equals the one-shot dd14
  * answer restricted to that batch's docs (everything earlier is in
  * the delta counts), replays are no-ops, compaction changes neither
  * counts nor reports and keeps the replay guard.
  */
class DupSpanIndexSpec extends SparkSpecBase {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("dupidx").toString + "/idx"

  private def docs = Tables.documents(spark, sf0001)
    .select("doc_id", "text")

  private def report(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("latest batch report equals one-shot coverage restricted to the batch") {
    val dir = tmp()
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    assert(DupSpanIndex.append(spark, dir, b0, batchId = 0))
    assert(DupSpanIndex.append(spark, dir, b1, batchId = 1))
    val got = report(DupSpanIndex.reportBatch(spark, dir, b1))
    // one-shot over the WHOLE corpus, restricted to batch-1 docs: a
    // batch-1 gram's total count across deltas is exactly its corpus
    // count, so the restriction must agree row for row
    val want = report(Corpus.dupSpanCoverage(docs)
      .filter(col("doc_id") % 2 === 1))
    assert(got === want)
  }

  test("replayed append is a no-op; counts unchanged") {
    val dir = tmp()
    DupSpanIndex.append(spark, dir, docs.filter(col("doc_id") < 100), 0)
    val before = report(DupSpanIndex.occCounts(spark, dir))
    assert(!DupSpanIndex.append(spark, dir, docs.filter(col("doc_id") < 100), 0))
    assert(report(DupSpanIndex.occCounts(spark, dir)) === before)
  }

  test("compaction preserves counts, reports, and the replay guard") {
    val dir = tmp()
    val parts = (0 until 3).map(b => docs.filter(col("doc_id") % 3 === b))
    parts.zipWithIndex.foreach { case (p, b) =>
      DupSpanIndex.append(spark, dir, p, b.toLong)
    }
    val countsBefore = report(DupSpanIndex.occCounts(spark, dir))
    val reportBefore = report(DupSpanIndex.reportBatch(spark, dir, parts(2)))
    DupSpanIndex.compact(spark, dir)
    assert(report(DupSpanIndex.occCounts(spark, dir)) === countsBefore)
    assert(report(DupSpanIndex.reportBatch(spark, dir, parts(2))) === reportBefore)
    // replay of an already-applied batch still no-ops after compaction
    assert(!DupSpanIndex.append(spark, dir, parts(1), 1))
    assert(report(DupSpanIndex.occCounts(spark, dir)) === countsBefore)
  }

  test("staging debris from a crashed append is ignored and cleaned") {
    val dir = tmp()
    DupSpanIndex.append(spark, dir, docs.filter(col("doc_id") < 50), 0)
    // simulate a crash: a stale .tmp- dir with garbage parquet inside
    val debris = new java.io.File(s"$dir/delta/.tmp-99")
    assert(debris.mkdirs())
    val before = report(DupSpanIndex.occCounts(spark, dir))
    DupSpanIndex.append(spark, dir, docs.filter(col("doc_id") >= 450), 1)
    assert(!new java.io.File(s"$dir/delta/.tmp-99").exists(),
      "next append must clean staging debris")
    assert(report(DupSpanIndex.occCounts(spark, dir)) !== before)
  }
}
