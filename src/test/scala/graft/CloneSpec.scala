package graft

import graft.sources.TableLog
import org.apache.spark.sql.functions._

/** S27 — zero-copy shallow clone of the versioned table: O(manifest)
  * materialization, snapshot fidelity (incl. active deletion vectors),
  * independent divergence, table-local vacuum safety, and the
  * documented loud-failure contract when the SOURCE is vacuumed away
  * from under a clone. */
class CloneSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("clone").toString

  private def rows(dir: String): Set[(Long, String)] =
    TableLog.read(spark, dir).as[(Long, String)].collect().toSet

  test("clone is zero-copy, snapshot-faithful, and diverges independently") {
    val root = freshRoot()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TableLog.create(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), src)
    TableLog.append(spark, Seq((3L, "c")).toDF("k", "v"), src)
    TableLog.shallowClone(spark, src, dst)
    // zero-copy: the clone owns no data files at all
    assert(!new java.io.File(s"$dst/data").exists(),
      "shallow clone must not copy any data")
    assert(rows(dst) === Set((1L, "a"), (2L, "b"), (3L, "c")))
    // divergence both ways
    TableLog.append(spark, Seq((4L, "d")).toDF("k", "v"), dst)
    TableLog.append(spark, Seq((9L, "z")).toDF("k", "v"), src)
    assert(rows(dst) === Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(rows(src) === Set((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z")))
    // the clone's own time travel starts at its v0 snapshot
    assert(TableLog.readVersion(spark, dst, 0L).count() === 3L)
  }

  test("active deletion vectors carry into the clone's snapshot") {
    val root = freshRoot()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TableLog.create(spark, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), src)
    TableLog.deleteByKey(spark, Seq(2L).toDF("k"), src, Seq("k"))
    TableLog.shallowClone(spark, src, dst)
    assert(rows(dst) === Set((1L, "a"), (3L, "c")),
      "the clone must apply the source's active DVs")
  }

  test("vacuum is table-local: vacuuming the clone never touches source bytes") {
    val root = freshRoot()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TableLog.create(spark, Seq((1L, "a")).toDF("k", "v"), src)
    TableLog.shallowClone(spark, src, dst)
    // the clone rewrites away from the shared dirs, then vacuums hard
    TableLog.overwrite(spark, Seq((7L, "g")).toDF("k", "v"), dst)
    TableLog.vacuum(spark, dst, retainLast = 1)
    assert(rows(src) === Set((1L, "a")),
      "source must survive any clone-side vacuum")
    assert(rows(dst) === Set((7L, "g")))
  }

  test("the documented hazard: vacuuming the source away from shared dirs " +
    "breaks the clone LOUDLY, never silently") {
    val root = freshRoot()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TableLog.create(spark, Seq((1L, "a")).toDF("k", "v"), src)
    TableLog.shallowClone(spark, src, dst)
    TableLog.overwrite(spark, Seq((5L, "e")).toDF("k", "v"), src)
    TableLog.vacuum(spark, src, retainLast = 1) // drops the shared v0 dir
    val e = intercept[Exception] { rows(dst) }
    assert(e.getMessage != null)
    // and cloning again from the rewritten source works
    TableLog.shallowClone(spark, src, s"$root/dst2")
    assert(rows(s"$root/dst2") === Set((5L, "e")))
  }

  test("clone refuses an existing target; clone-of-clone snapshots the clone") {
    val root = freshRoot()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TableLog.create(spark, Seq((1L, "a")).toDF("k", "v"), src)
    TableLog.shallowClone(spark, src, dst)
    intercept[IllegalArgumentException] {
      TableLog.shallowClone(spark, src, dst)
    }
    TableLog.append(spark, Seq((2L, "b")).toDF("k", "v"), dst)
    TableLog.shallowClone(spark, dst, s"$root/dst3")
    assert(rows(s"$root/dst3") === Set((1L, "a"), (2L, "b")))
  }
}
