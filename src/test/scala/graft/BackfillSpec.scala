package graft

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Trigger.AvailableNow backfill semantics (SURVEY.md §2 T16): the
  * batch-over-stream pattern — drain everything currently in the source,
  * then STOP, with offsets checkpointed so the next run resumes exactly
  * where this one ended. This is how a 100 TB landing zone is replayed
  * through the SAME streaming pipeline that handles the live feed:
  * one code path, batch economics, streaming exactly-once bookkeeping.
  */
class BackfillSpec extends SparkSpecBase {
  import spark.implicits._

  test("AvailableNow drains the source, stops, and a restart reads only new files") {
    val src = Files.createTempDirectory("backfill_src").toString
    val ckpt = Files.createTempDirectory("backfill_ckpt").toString
    val out = Files.createTempDirectory("backfill_out").toString + "/t"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))

    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)

    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      // AvailableNow terminates ON ITS OWN once the source is drained —
      // the property under test (a normal trigger would run forever)
      assert(q.awaitTermination(60000), "AvailableNow query must self-terminate")
    }

    run()
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // more files land; the restart must append ONLY them — checkpointed
    // source offsets exclude the already-drained backfill, so every row
    // lands exactly once across the two runs (a re-read would give 8)
    Seq((4L, "d"), (5L, "e")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    run()
    val all = spark.read.parquet(out).as[(Long, String)].collect()
    assert(all.length === 5, s"exactly-once across restarts, got ${all.length} rows")
    assert(all.toSet === Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
  }
}
