package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.plans.ResultCache
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The semantic result cache: digest stability across independently
  * built plans, input-change invalidation, zero-row round trip, and
  * crash-leftover hygiene. */
class ResultCacheSpec extends SparkSpecBase {

  private def newRoot(): String =
    Files.createTempDirectory("rc-spec").toString

  private def agg(dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("n_chars") >= 100)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
      .orderBy("lang")

  test("miss then hit, hit scans the cache, values identical") {
    val root = newRoot()
    val (r1, hit1) = ResultCache.through(agg(sf0001), root)
    val (r2, hit2) = ResultCache.through(agg(sf0001), root)
    assert(!hit1 && hit2)
    assert(r2.inputFiles.nonEmpty && r2.inputFiles.forall(_.contains("rc-spec")))
    assert(r1.collect().toSeq === r2.collect().toSeq)
    assert(r2.collect().toSeq === agg(sf0001).collect().toSeq)
  }

  test("two independently built but identical plans share one digest; " +
    "a different filter does not") {
    assert(ResultCache.digestOf(agg(sf0001)) === ResultCache.digestOf(agg(sf0001)))
    val other = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("n_chars") >= 101)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
      .orderBy("lang")
    assert(ResultCache.digestOf(agg(sf0001)) !== ResultCache.digestOf(other))
  }

  test("changing an input file invalidates the entry") {
    val data = Files.createTempDirectory("rc-data")
    val doc = data.resolve("documents.parquet")
    Files.copy(Paths.get(s"$sf0001/documents.parquet"), doc,
      StandardCopyOption.REPLACE_EXISTING)
    val root = newRoot()
    val (_, h1) = ResultCache.through(agg(data.toString), root)
    assert(!h1)
    // same content re-copied: length equal, but mtime moves — the
    // fingerprint treats that as a change (correct-conservative)
    Thread.sleep(1100) // mtime granularity can be a full second
    Files.copy(Paths.get(s"$sf0001/documents.parquet"), doc,
      StandardCopyOption.REPLACE_EXISTING)
    val (_, h2) = ResultCache.through(agg(data.toString), root)
    assert(!h2, "entry survived an input rewrite")
  }

  test("zero-row result round-trips through the cache with its schema") {
    val root = newRoot()
    def empty = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("n_chars") < -1)
      .select(col("doc_id"), col("lang"))
    val (r1, h1) = ResultCache.through(empty, root)
    assert(!h1 && r1.count() === 0)
    val (r2, h2) = ResultCache.through(empty, root)
    assert(h2 && r2.count() === 0)
    assert(r2.schema.fieldNames.toSeq === Seq("doc_id", "lang"))
  }

  test("crashed-writer staging leftovers are inert and sweepable") {
    val root = newRoot()
    Files.createDirectory(Paths.get(root, ".staging-deadbeef"))
    Files.write(Paths.get(root, ".staging-deadbeef", "part-junk.parquet"),
      Array[Byte](1, 2, 3))
    val (_, h1) = ResultCache.through(agg(sf0001), root)
    assert(!h1, "a staging dir must never satisfy a lookup")
    ResultCache.sweepStaging(spark, root)
    assert(!Files.exists(Paths.get(root, ".staging-deadbeef")))
    val (_, h2) = ResultCache.through(agg(sf0001), root)
    assert(h2, "published entry must survive the sweep")
  }
}
