package graft

import graft.operators.{PcaIndex, Similarity}
import org.apache.spark.sql.functions._

/** The incremental-≡-one-shot contract for the durable PCA moment
  * index: exact integer moments make the merged state identical to the
  * full fit bit for bit, under any batch split, so equality assertions
  * here are EXACT (no tolerance).
  */
class PcaIndexSpec extends SparkSpecBase {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("pcaidx").toString + "/state"

  private def emb = Tables.embeddings(spark, sf0001)

  test("three interleaved batches + a replay equal the one-shot fit exactly") {
    val dir = tmp()
    (0 until 3).foreach { b =>
      assert(PcaIndex.update(spark, dir,
        emb.filter(pmod(xxhash64(col("vec_id")), lit(3)) === b), batchId = b))
    }
    // replayed batch: committed-marker no-op, not a double-count
    assert(!PcaIndex.update(spark, dir,
      emb.filter(pmod(xxhash64(col("vec_id")), lit(3)) === 1), batchId = 1))

    val inc = PcaIndex.covariance(spark, dir).collect().map(_.toString).sorted
    val full = Similarity.covarianceMatrix(spark, sf0001)
      .collect().map(_.toString).sorted
    assert(inc.sameElements(full), "stored-moment covariance must equal one-shot bit for bit")
  }

  test("projection from the stored fit equals the inline projection exactly") {
    val dir = tmp()
    (0 until 2).foreach { b =>
      PcaIndex.update(spark, dir,
        emb.filter(pmod(xxhash64(col("vec_id")), lit(2)) === b), batchId = b)
    }
    val fromIndex = PcaIndex.project(spark, dir, emb, 3)
      .collect().map(_.toString)
    val inline = Similarity.pcaProject(spark, sf0001, 3)
      .collect().map(_.toString)
    assert(fromIndex.sameElements(inline))
  }

  test("a batch landing after a fit changes the moments (state really merges)") {
    val dir = tmp()
    PcaIndex.update(spark, dir, emb.filter(col("vec_id") < 25), batchId = 0)
    val n0 = PcaIndex.covariance(spark, dir).select(max("n")).head.getLong(0)
    PcaIndex.update(spark, dir, emb.filter(col("vec_id") >= 25), batchId = 1)
    val n1 = PcaIndex.covariance(spark, dir).select(max("n")).head.getLong(0)
    assert(n1 > n0)
    assert(n1 === emb.count())
  }
}
