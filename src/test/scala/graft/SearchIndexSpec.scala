package graft

import graft.operators.SearchIndex
import org.apache.spark.sql.functions._

/** L47's durable half: the persisted inverted index must answer exactly
  * like a direct text scan, stay exact under incremental appends and
  * replays, and never read document text at query time.
  */
class SearchIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private val terms = Seq("scan", "merge", "window")

  private def scanTruth: Set[Long] =
    Tables.documents(spark, sf0001)
      .filter(terms.map(t => array_contains(split(col("text"), " "), t)).reduce(_ && _))
      .select("doc_id").as[Long].collect().toSet

  test("built index answers conjunctive search exactly like a text scan") {
    val dir = java.nio.file.Files.createTempDirectory("sidx").toString
    SearchIndex.build(Tables.documents(spark, sf0001).select("doc_id", "text"), dir)
    val hits = SearchIndex.search(spark, dir, terms).as[Long].collect().toSet
    assert(hits === scanTruth)
    assert(hits.nonEmpty, "degenerate fixture: no doc contains all three terms")
  }

  test("incremental append equals the one-shot build; replay adds nothing") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sidx_inc").toString
    // interleaved split so appended ids fall on both sides of existing ids
    SearchIndex.build(docs.filter(col("doc_id") % 2 === 0), dir)
    SearchIndex.append(spark, docs.filter(col("doc_id") % 2 === 1), dir)
    val incHits = SearchIndex.search(spark, dir, terms).as[Long].collect().toSet
    assert(incHits === scanTruth, "incremental index diverges from the text scan")
    val before = spark.read.parquet(s"$dir/postings").count()
    // replay the same batch (at-least-once ingest): postings unchanged
    SearchIndex.append(spark, docs.filter(col("doc_id") % 2 === 1), dir)
    assert(spark.read.parquet(s"$dir/postings").count() === before,
      "replayed append must be a no-op")
  }

  test("append to a fresh directory bootstraps the index (streaming's first batch)") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sidx_boot").toString
    SearchIndex.append(spark, docs.filter(col("doc_id") % 2 === 0), dir)
    SearchIndex.append(spark, docs.filter(col("doc_id") % 2 === 1), dir)
    val hits = SearchIndex.search(spark, dir, terms).as[Long].collect().toSet
    assert(hits === scanTruth, "append-bootstrapped index diverges from the text scan")
  }

  test("duplicate query terms do not change the intersection") {
    val dir = java.nio.file.Files.createTempDirectory("sidx_dup").toString
    SearchIndex.build(Tables.documents(spark, sf0001).select("doc_id", "text"), dir)
    val a = SearchIndex.search(spark, dir, terms).as[Long].collect().toSet
    val b = SearchIndex.search(spark, dir, terms ++ terms).as[Long].collect().toSet
    assert(a === b)
    intercept[IllegalArgumentException](SearchIndex.search(spark, dir, Nil))
  }
}
