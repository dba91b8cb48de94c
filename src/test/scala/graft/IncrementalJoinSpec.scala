package graft

import graft.operators.IncrementalJoin
import graft.sources.TableLog
import org.apache.spark.sql.functions._

/** L53: incremental join maintenance. The contract under test is
  * incremental ≡ full — after every completed update the maintained
  * table equals the plain join of everything delivered so far — plus
  * exactly-once under replays and self-healing after a crash between
  * the three per-batch appends.
  */
class IncrementalJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("incjoinspec").toString + "/j"

  private def dims(ids: Seq[Long]) = ids.map(i => (i, s"dim$i")).toDF("k", "dv")
  private def facts(rows: Seq[(Long, Long)]) =
    rows.map { case (id, k) => (id, k, k * 10 + id) }.toDF("fid", "k", "fv")

  private def joined(root: String): Set[(Long, String, Long, Long)] =
    IncrementalJoin.read(spark, root)
      .select("k", "dv", "fid", "fv").as[(Long, String, Long, Long)]
      .collect().toSet

  private def reference(dimIds: Seq[Long],
                        factRows: Seq[(Long, Long)]): Set[(Long, String, Long, Long)] =
    (for ((fid, k) <- factRows if dimIds.contains(k))
      yield (k, s"dim$k", fid, k * 10 + fid)).toSet

  test("incremental equals the full join after every interleaved batch (all delta terms)") {
    val root = freshRoot()
    // batch 0: dims {0,1}, facts for keys {0,2} — key 2 arrives early
    // batch 1: dims {2},   facts for keys {1}   — key 1 arrives late
    // batch 2: dims {3},   facts for keys {2,3} — same-batch cross term
    val dimB = Seq(Seq(0L, 1L), Seq(2L), Seq(3L))
    val factB = Seq(Seq((100L, 0L), (101L, 2L)), Seq((102L, 1L)),
      Seq((103L, 2L), (104L, 3L)))
    (0 to 2).foreach { b =>
      assert(IncrementalJoin.update(spark, root, dims(dimB(b)), facts(factB(b)),
        batchId = b.toLong, keyCols = Seq("k")))
      val seenDims = dimB.take(b + 1).flatten
      val seenFacts = factB.take(b + 1).flatten
      assert(joined(root) === reference(seenDims, seenFacts),
        s"divergence after batch $b")
    }
  }

  test("replayed batch is a committed no-op") {
    val root = freshRoot()
    assert(IncrementalJoin.update(spark, root, dims(Seq(0L)),
      facts(Seq((1L, 0L))), 0L, Seq("k")))
    val before = joined(root)
    assert(!IncrementalJoin.update(spark, root, dims(Seq(0L)),
      facts(Seq((1L, 0L))), 0L, Seq("k")), "replay must report no advance")
    assert(joined(root) === before)
  }

  test("a crash between the side appends self-heals on rerun, bit-identical") {
    val root = freshRoot()
    IncrementalJoin.update(spark, root, dims(Seq(0L, 1L)),
      facts(Seq((10L, 0L))), 0L, Seq("k"))
    // crashed run: LEFT committed batch 1, right/out never did
    TableLog.appendBatch(spark, dims(Seq(2L)), s"$root/left", batchId = 1L)
    // rerun of the same batch heals: left no-ops, right+out apply
    assert(IncrementalJoin.update(spark, root, dims(Seq(2L)),
      facts(Seq((11L, 2L), (12L, 1L))), 1L, Seq("k")))
    assert(joined(root) ===
      reference(Seq(0L, 1L, 2L), Seq((10L, 0L), (11L, 2L), (12L, 1L))))
  }

  test("empty deltas on either side are valid batches") {
    val root = freshRoot()
    IncrementalJoin.update(spark, root, dims(Seq(0L)), facts(Seq((1L, 0L))),
      0L, Seq("k"))
    // dims-only batch, then facts-only batch
    IncrementalJoin.update(spark, root, dims(Seq(5L)), facts(Seq.empty[(Long, Long)]),
      1L, Seq("k"))
    IncrementalJoin.update(spark, root, dims(Seq.empty[Long]), facts(Seq((2L, 5L))),
      2L, Seq("k"))
    assert(joined(root) === reference(Seq(0L, 5L), Seq((1L, 0L), (2L, 5L))))
  }
}
