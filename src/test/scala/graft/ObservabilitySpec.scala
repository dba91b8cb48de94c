package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** `observe()` audit metrics (SURVEY.md §2 L40): data-quality counters
  * that ride the SAME action as the production write — at 100 TB the
  * alternative is a second full scan just to count what the job dropped.
  */
class ObservabilitySpec extends SparkSpecBase {

  test("a quality-gate write reports kept/dropped/token counters with no second scan") {
    val docs = Tables.documents(spark, sf0001)
    val toks = size(split(trim(col("text")), "\\s+")).cast("long")
    val gated = docs.withColumn("n_tok", toks).filter(col("n_tok") >= 30)

    val obs = Observation("clean_audit")
    val out = java.nio.file.Files.createTempDirectory("observespec").toString + "/t"
    gated.observe(obs,
        count(lit(1)).as("rows_kept"),
        sum(col("n_tok")).as("tokens_kept"),
        min(col("n_tok")).as("min_tok"))
      .write.parquet(out)

    // metrics came from the write job itself
    val m = obs.get
    val expectKept = docs.filter(toks >= 30).count()
    val expectTokens = docs.select(sum(when(toks >= 30, toks))).collect().head.getLong(0)
    assert(m("rows_kept") === expectKept)
    assert(m("tokens_kept") === expectTokens)
    assert(m("min_tok").asInstanceOf[Long] >= 30L)
    // and the written table matches what the metrics describe
    assert(spark.read.parquet(out).count() === expectKept)
  }
}
