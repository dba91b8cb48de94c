package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.PrefixIndex

/** Dev tool (guide §1 — measure first): replay the dd24 entry phase by
  * phase with `-Dgraft.prefix.profile=1` so PREFIXPROF lines attribute
  * the entry's wall seconds to build/ingest sub-phases.
  * Usage: runMain graft.ProfilePrefix [sfDir]
  */
object ProfilePrefix {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    System.setProperty("graft.prefix.profile", "1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.warmup(spark, sfDir)
    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PREFIXPROF $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"== pass $pass")
      val docs = t("entry.docs_checkpoint") {
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 2 === 0)
          .localCheckpoint(true)
      }
      val mid = t("entry.mid") {
        docs.agg(expr("CAST(max(doc_id) DIV 2 AS BIGINT)")).first().getLong(0)
      }
      val dir = java.nio.file.Files
        .createTempDirectory("prefix_index_prof").toString
      val firstPairs = t("entry.build")(
        PrefixIndex.build(docs.filter(col("doc_id") <= mid), dir))
      val fp = t("entry.build_materialize")(firstPairs.localCheckpoint(true))
      val secondPairs = t("entry.append")(
        PrefixIndex.appendBatch(docs.filter(col("doc_id") > mid), dir))
      t("entry.final_noop") {
        fp.unionByName(secondPairs).orderBy("id_a", "id_b")
          .write.format("noop").mode("overwrite").save()
      }
      if (pass == 2) {
        println(s"COUNT docs=${docs.count()} mid=$mid " +
          s"build_pairs=${fp.count()} append_pairs=${secondPairs.count()}")
        val e = docs.select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        println(s"COUNT tok_rows=${e.count()} " +
          s"distinct_tok=${e.select("tok").distinct().count()}")
      }
    }
    spark.stop()
  }
}
