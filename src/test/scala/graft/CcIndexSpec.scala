package graft

import graft.operators.{CcIndex, Dedup}
import org.apache.spark.sql.functions._

/** Incremental-≡-full contract for the durable component index: label
  * equality is EXACT under adversarial batch splits (bridges arriving
  * after both sides are already big), replays are no-ops, and merges
  * rewrite existing members to the new canonical root.
  */
class CcIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("ccidx").toString + "/idx"

  private def labelsOf(dir: String): Map[Long, Long] =
    CcIndex.snapshot(spark, dir).as[(Long, Long)].collect().toMap

  private def fullCc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("late bridge merges two grown components; equals full recompute exactly") {
    val dir = tmp()
    // batch 0: chain 1-2-3-4; batch 1: chain 10-11-12-13; batch 2: ONE
    // bridge 4-10 — the hard case: both sides already big and settled
    val b0 = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val b1 = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    val b2 = Seq((4L, 10L))
    CcIndex.update(spark, dir, b0.toDF("id_a", "id_b"), 0, numBuckets = 8)
    CcIndex.update(spark, dir, b1.toDF("id_a", "id_b"), 1, numBuckets = 8)
    assert(labelsOf(dir) === fullCc(b0 ++ b1))
    CcIndex.update(spark, dir, b2.toDF("id_a", "id_b"), 2, numBuckets = 8)
    val got = labelsOf(dir)
    assert(got === fullCc(b0 ++ b1 ++ b2))
    // every node of both chains now carries the global min root 1
    assert((Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L)).forall(got(_) == 1L))
  }

  test("random interleaved batches equal the full recompute") {
    val dir = tmp()
    // deterministic pseudo-random pair soup, split round-robin into 4
    val all = (0 until 60).map { i =>
      val a = (i * 37 + 11) % 40; val b = (i * 53 + 7) % 40
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }
    val batches = all.zipWithIndex.groupBy(_._2 % 4).toSeq.sortBy(_._1)
      .map(_._2.map(_._1))
    batches.zipWithIndex.foreach { case (b, i) =>
      CcIndex.update(spark, dir, b.toDF("id_a", "id_b"), i.toLong, numBuckets = 8)
    }
    assert(labelsOf(dir) === fullCc(all))
  }

  test("replaying an applied batch is a label no-op") {
    val dir = tmp()
    val b0 = Seq((1L, 2L), (3L, 4L))
    val b1 = Seq((2L, 3L))
    CcIndex.update(spark, dir, b0.toDF("id_a", "id_b"), 0, numBuckets = 8)
    CcIndex.update(spark, dir, b1.toDF("id_a", "id_b"), 1, numBuckets = 8)
    val before = labelsOf(dir)
    CcIndex.update(spark, dir, b1.toDF("id_a", "id_b"), 2, numBuckets = 8)
    assert(labelsOf(dir) === before)
  }

  test("snapshot before any update is empty, not an error") {
    assert(CcIndex.snapshot(spark, tmp()).count() === 0L)
  }

  // the END-TO-END incremental dedup pipeline: per ingest, L2b finds the
  // batch's near-dup pairs against the stored signature index and L4e
  // folds them into the cluster labels — after all ingests the labels
  // must equal the one-shot pipeline (full minhashLsh pairs → full CC)
  // exactly, because each pair is reported exactly once (when its later
  // member ingests) and label merging is order-independent
  test("incremental minhash pairs + incremental components equal the one-shot pipeline") {
    val dir = tmp()
    val allDocs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    var storedSigs = Dedup.signatureFrame(allDocs.limit(0), k = 16)
      .localCheckpoint(true)
    (0 until 3).foreach { b =>
      val batch = allDocs.filter(col("doc_id") % 3 === b)
      val (pairs, freshSigs) =
        Dedup.minhashLshIncremental(batch, storedSigs, allDocs)
      CcIndex.update(spark, dir, pairs.select("id_a", "id_b"), b.toLong,
        numBuckets = 8)
      storedSigs = storedSigs.unionByName(freshSigs).localCheckpoint(true)
    }
    val oneShot = Dedup.connectedComponents(
      Dedup.minhashLsh(spark, sf0001).select("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(labelsOf(dir) === oneShot)
    assert(oneShot.nonEmpty, "the synthetic corpus must contain near-dup clusters")
  }
}
