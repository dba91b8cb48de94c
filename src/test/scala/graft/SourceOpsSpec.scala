package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Operational source/sink behaviors at 100 TB (SURVEY.md §2 S14–S15):
  * per-row file lineage via the hidden `_metadata` column, and dynamic
  * partition overwrite (replace only the partitions a job produced —
  * the standard idempotent-backfill write mode).
  */
class SourceOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def listFiles(dir: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("S14: _metadata exposes per-row file lineage on parquet scans") {
    val dir = Files.createTempDirectory("lineage").toString + "/t"
    // two writers → at least two files; repartition by a constant count
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "s").repartition(2).write.parquet(dir)
    val df = spark.read.parquet(dir)
      .select(col("id"), col("_metadata.file_name").as("f"),
        col("_metadata.row_index").as("ri"), col("_metadata.file_size").as("sz"))
    val rows = df.as[(Long, String, Long, Long)].collect()
    assert(rows.length === 4)
    val byFile = rows.groupBy(_._2)
    assert(byFile.size >= 2, s"expected ≥2 files, got ${byFile.keySet}")
    // row_index is dense per file starting at 0 — the property that lets
    // a 100 TB pipeline address any row as (file, index) for audits and
    // incremental re-reads without materializing a global id
    byFile.values.foreach { rs =>
      assert(rs.map(_._3).sorted.sameElements(0L until rs.length))
    }
    // file_size matches the filesystem truth
    val sizes = listFiles(dir).map { case (p, _) => Paths.get(p).getFileName.toString ->
      Files.size(Paths.get(p)) }
    rows.foreach { case (_, f, _, sz) => assert(sizes(f) === sz) }
  }

  test("S14: lineage survives joins and aggregation (dup-audit shape)") {
    val dir = Files.createTempDirectory("lineage2").toString + "/t"
    Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("k", "s")
      .repartition(2).write.parquet(dir)
    // "which files contributed duplicates of each key" — the provenance
    // question a dedup run answers before deleting anything
    val audit = spark.read.parquet(dir)
      .select(col("k"), col("_metadata.file_name").as("f"))
      .groupBy("k").agg(countDistinct("f").as("nf"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
      .map { case (k, nf, n) => k -> ((nf, n)) }.toMap
    assert(audit(1L)._2 === 2L && audit(2L)._2 === 1L)
    assert(audit(1L)._1 >= 1L && audit.keySet === Set(1L, 2L))
  }

  test("S15: dynamic partition overwrite rewrites only the touched partitions") {
    val dir = Files.createTempDirectory("dynpart").toString + "/t"
    Seq((1L, "p1"), (2L, "p1"), (3L, "p2"), (4L, "p3"))
      .toDF("id", "p").write.partitionBy("p").parquet(dir)
    val before = listFiles(dir)
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // the backfill: new data for p1 only — p2/p3 must be untouched
      Seq((10L, "p1"), (11L, "p1")).toDF("id", "p")
        .write.mode("overwrite").partitionBy("p").parquet(dir)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = listFiles(dir)
    // p2/p3 files byte-identical (same paths, same mtimes — never rewritten)
    val untouchedBefore = before.filter { case (p, _) => !p.contains("p=p1") }
    val untouchedAfter = after.filter { case (p, _) => !p.contains("p=p1") }
    assert(untouchedBefore === untouchedAfter,
      s"non-targeted partitions were rewritten:\n$untouchedBefore\nvs\n$untouchedAfter")
    // p1 fully replaced, not appended
    val back = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(back === Set((10L, "p1"), (11L, "p1"), (3L, "p2"), (4L, "p3")))
  }

  test("S15: static overwrite (the default) would drop the untouched partitions") {
    // the failure mode dynamic mode exists to prevent — pinned so the
    // distinction stays visible
    val dir = Files.createTempDirectory("statpart").toString + "/t"
    Seq((1L, "p1"), (3L, "p2")).toDF("id", "p").write.partitionBy("p").parquet(dir)
    Seq((10L, "p1")).toDF("id", "p").write.mode("overwrite").partitionBy("p").parquet(dir)
    val back = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(back === Set((10L, "p1")), s"static overwrite must replace the whole table, got $back")
  }

  test("S25: landing-zone ingestion options — recursiveFileLookup walks nested " +
    "dirs, pathGlobFilter selects by name, modifiedAfter by mtime") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("s25").toString
    // a landing zone: date-nested dirs, mixed file kinds
    Seq(1L).toDF("id").write.parquet(s"$root/2024/01/a.parquet")
    Seq(2L).toDF("id").write.parquet(s"$root/2024/02/b.parquet")
    Seq(3L).toDF("id").write.json(s"$root/2024/02/c.json")
    // recursive walk + glob: only the parquet part-files, all depths.
    // (nested dirs are NOT hive partitions here, hence recursive mode)
    val pq = spark.read
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(root)
    assert(pq.as[Long].collect().toSet === Set(1L, 2L))
    // mtime gate: age one file far into the past; modifiedAfter must
    // then serve only the fresh one — the "ingest what landed since the
    // last run" primitive when no transaction log exists
    val old = Files.walk(Paths.get(s"$root/2024/01")).iterator()
    old.forEachRemaining { p =>
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000L * 1000))
    }
    val fresh = spark.read
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .option("modifiedAfter", "2000-01-01T00:00:00")
      .parquet(root)
    assert(fresh.as[Long].collect().toSet === Set(2L))
  }
}
