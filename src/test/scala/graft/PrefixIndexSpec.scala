package graft

import graft.operators.{Dedup, PrefixIndex}
import org.apache.spark.sql.functions._

/** The durable incremental prefix index (dd24's engine): multi-batch
  * ingest must equal the one-shot whole-corpus join — including under
  * ADVERSARIAL df drift, where later batches invert the rarity order
  * the index froze at build time (the frozen-order exactness argument
  * on PrefixIndex's scaladoc is exactly what this pins).
  */
class PrefixIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("inter"),
      r.getAs[Long]("size_a"), r.getAs[Long]("size_b"), r.getAs[Long]("jac_pm"))

  private def oneShot(docs: org.apache.spark.sql.DataFrame) =
    Dedup.prefixJoinPairs(docs, bands = 1)
      .collect().map(key).sortBy(identity).toSeq

  test("3-batch ingest with rarity-inverting drift equals the one-shot " +
    "join (frozen-order exactness)") {
    // batch 1: token q is RARE (one doc), z common. batches 2-3 flood q
    // so live df would now rank it COMMON — the frozen order must not
    // care. Near-dup pairs planted inside and ACROSS batches.
    val b1 = Seq(
      (0L, "a b c d q"), (1L, "a b c d e"), (2L, "z z1 z2 a b"),
      (3L, "m n o p"), (4L, "m n o p r")).toDF("doc_id", "text")
    val b2 = Seq(
      (10L, "a b c d q"), // exact dup of doc 0 ACROSS batches
      (11L, "q q1 q2 q3"), (12L, "q q1 q2 q4"), // q floods + internal pair
      (13L, "m n o p")).toDF("doc_id", "text") // cross-batch dup of 3
    val b3 = Seq(
      (20L, "q q1 q2 q3"), // dup of 11 across batches 2→3
      (21L, "a b c d e f"), (22L, "w x y v")).toDF("doc_id", "text")
    val all = b1.unionByName(b2).unionByName(b3)

    val dir = java.nio.file.Files
      .createTempDirectory("prefix_index_spec").toString
    val got = (PrefixIndex.build(b1, dir).collect() ++
      PrefixIndex.appendBatch(b2, dir).collect() ++
      PrefixIndex.appendBatch(b3, dir).collect())
      .map(key).sortBy(identity).toSeq
    val want = oneShot(all)
    assert(got === want)
    assert(want.nonEmpty) // the planted dups must actually be pairs
    // cross-batch pairs specifically exist (not just intra-batch)
    assert(want.exists { case (a, b, _, _, _, _) => a < 10 && b >= 10 })
  }

  test("replayed batch is idempotent: re-ingesting batch 2 adds no rows " +
    "and re-reports no pairs") {
    val b1 = Seq((0L, "a b c d"), (1L, "a b c e")).toDF("doc_id", "text")
    val b2 = Seq((10L, "a b c d"), (11L, "f g h i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("prefix_index_replay").toString
    val p1 = PrefixIndex.build(b1, dir).collect().map(key).toSeq
    val p2 = PrefixIndex.appendBatch(b2, dir).collect().map(key).toSeq
    val replay = PrefixIndex.appendBatch(b2, dir).collect().map(key).toSeq
    assert(replay.isEmpty, s"replay must report nothing, got $replay")
    val postings = spark.read.parquet(s"$dir/postings")
    assert(postings.select("doc_id").distinct().count() === 4)
    assert((p1 ++ p2).sorted === oneShot(b1.unionByName(b2)))
  }

  test("sf0.001 documents: split-corpus ingest equals the one-shot join") {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val mid = docs.agg(max("doc_id")).first().getLong(0) / 2
    val dir = java.nio.file.Files
      .createTempDirectory("prefix_index_sf").toString
    val got = (PrefixIndex.build(docs.filter(col("doc_id") <= mid), dir).collect() ++
      PrefixIndex.appendBatch(docs.filter(col("doc_id") > mid), dir).collect())
      .map(key).sortBy(identity).toSeq
    assert(got === oneShot(docs))
    assert(got.nonEmpty)
  }
}
