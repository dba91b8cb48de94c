package graft

import graft.sources.TableLog

/** S22h: CHECK constraints on the versioned table (Delta-style
  * expectations) — registered in the manifest, validated against the
  * existing snapshot at ADD time, enforced on every subsequent batch
  * BEFORE anything lands, SQL-standard NULL semantics, loud drops.
  */
class ConstraintSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("ck").toString + "/t"

  test("add validates the snapshot; violating batches never land") {
    val dir = tmp()
    TableLog.create(spark, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), dir)
    TableLog.addConstraint(spark, dir, "v_pos", "v > 0")
    // compliant append passes and the constraint rides forward
    TableLog.append(spark, Seq((3L, 30L)).toDF("k", "v"), dir)
    val vBefore = TableLog.latestVersion(spark, dir).get
    // violating append refuses BEFORE landing: version unchanged,
    // snapshot unchanged
    val e = intercept[IllegalArgumentException](
      TableLog.append(spark, Seq((4L, -5L), (5L, 50L), (6L, 0L)).toDF("k", "v"), dir))
    assert(e.getMessage.contains("v_pos") && e.getMessage.contains("2 row(s)"))
    assert(TableLog.latestVersion(spark, dir).get === vBefore)
    assert(TableLog.read(spark, dir).count() === 3)
  }

  test("adding a constraint the existing snapshot violates refuses") {
    val dir = tmp()
    TableLog.create(spark, Seq((1L, -1L)).toDF("k", "v"), dir)
    val e = intercept[IllegalArgumentException](
      TableLog.addConstraint(spark, dir, "v_pos", "v > 0"))
    assert(e.getMessage.contains("existing snapshot"))
    assert(TableLog.readManifest(spark, dir,
      TableLog.latestVersion(spark, dir).get).constraints.isEmpty)
  }

  test("NULL passes (SQL-standard CHECK); explicit FALSE fails") {
    val dir = tmp()
    TableLog.create(spark,
      Seq((1L, Some(10L)), (2L, None)).toDF("k", "v"), dir)
    TableLog.addConstraint(spark, dir, "v_pos", "v > 0") // NULL row passes
    TableLog.append(spark, Seq((3L, None: Option[Long])).toDF("k", "v"), dir)
    intercept[IllegalArgumentException](
      TableLog.append(spark, Seq((4L, Some(-1L))).toDF("k", "v"), dir))
  }

  test("constraints gate overwrite, merge and the streaming batch sink") {
    val dir = tmp()
    TableLog.create(spark, Seq((1L, 10L)).toDF("k", "v"), dir)
    TableLog.addConstraint(spark, dir, "v_pos", "v > 0")
    intercept[IllegalArgumentException](
      TableLog.overwrite(spark, Seq((9L, -9L)).toDF("k", "v"), dir))
    intercept[IllegalArgumentException](
      TableLog.merge(spark, Seq((1L, -10L)).toDF("k", "v"), dir, Seq("k")))
    intercept[IllegalArgumentException](
      TableLog.appendBatch(spark, Seq((9L, -9L)).toDF("k", "v"), dir, 7L))
    // every refusal left the table at its registered state
    assert(TableLog.read(spark, dir).as[(Long, Long)].collect().toSeq
      === Seq((1L, 10L)))
    // a compliant overwrite carries the constraint forward
    TableLog.overwrite(spark, Seq((2L, 2L)).toDF("k", "v"), dir)
    intercept[IllegalArgumentException](
      TableLog.append(spark, Seq((3L, -3L)).toDF("k", "v"), dir))
  }

  test("an EMPTY batch violates nothing — it must pass, not NPE") {
    val dir = tmp()
    TableLog.create(spark, Seq((1L, 10L)).toDF("k", "v"), dir)
    TableLog.addConstraint(spark, dir, "v_pos", "v > 0")
    TableLog.append(spark,
      Seq.empty[(Long, Long)].toDF("k", "v"), dir) // sum() over 0 rows is NULL
    assert(TableLog.read(spark, dir).count() === 1)
    // and a table CREATED empty can take its first constraint
    val dir2 = tmp()
    TableLog.create(spark, Seq.empty[(Long, Long)].toDF("k", "v"), dir2)
    TableLog.addConstraint(spark, dir2, "v_pos", "v > 0")
  }

  test("constraint names are whitelisted — a newline would corrupt the manifest") {
    val dir = tmp()
    TableLog.create(spark, Seq((1L, 10L)).toDF("k", "v"), dir)
    for (bad <- Seq("a\nb", "a;b", "a=b", "", "a b"))
      intercept[IllegalArgumentException](
        TableLog.addConstraint(spark, dir, bad, "v > 0"))
    // the table is still readable after every refusal
    assert(TableLog.read(spark, dir).count() === 1)
  }

  test("drop is loud on absent names and actually lifts the gate") {
    val dir = tmp()
    TableLog.create(spark, Seq((1L, 10L)).toDF("k", "v"), dir)
    TableLog.addConstraint(spark, dir, "v_pos", "v > 0")
    intercept[IllegalArgumentException](
      TableLog.dropConstraint(spark, dir, "nope"))
    TableLog.dropConstraint(spark, dir, "v_pos")
    TableLog.append(spark, Seq((2L, -2L)).toDF("k", "v"), dir) // now legal
    assert(TableLog.read(spark, dir).count() === 2)
  }

  test("fastCount: footer counts equal the scan count across the commit lifecycle") {
    import spark.implicits._
    val dir = tmp()
    TableLog.create(spark, (0L until 100L).map(i => (i, i % 7)).toDF("k", "v"), dir)
    assert(TableLog.fastCount(spark, dir) === 100L)
    TableLog.append(spark, (100L until 130L).map(i => (i, i % 7)).toDF("k", "v"), dir)
    assert(TableLog.fastCount(spark, dir) === 130L)
    // merge-on-read DV: the fast path must NOT overcount — fallback
    TableLog.deleteByKey(spark, Seq(1L, 2L, 3L).toDF("k"), dir, Seq("k"))
    assert(TableLog.fastCount(spark, dir) === 127L)
    assert(TableLog.fastCount(spark, dir) === TableLog.read(spark, dir).count())
    // a rewrite commit materializes the DVs → footer path again
    TableLog.compact(spark, dir)
    assert(TableLog.readManifest(spark, dir,
      TableLog.latestVersion(spark, dir).get).dvs.isEmpty)
    assert(TableLog.fastCount(spark, dir) === 127L)
    // copy-on-write delete keeps the fast path
    TableLog.delete(spark, dir, org.apache.spark.sql.functions.col("k") < 10)
    assert(TableLog.fastCount(spark, dir) === TableLog.read(spark, dir).count())
  }

  test("multiple constraints enforce in ONE aggregate pass and all report") {
    val dir = tmp()
    TableLog.create(spark, Seq((1L, 10L, "a")).toDF("k", "v", "s"), dir)
    TableLog.addConstraint(spark, dir, "v_pos", "v > 0")
    TableLog.addConstraint(spark, dir, "s_nonempty", "length(s) > 0")
    val e = intercept[IllegalArgumentException](
      TableLog.append(spark, Seq((2L, -1L, "")).toDF("k", "v", "s"), dir))
    assert(e.getMessage.contains("v_pos") && e.getMessage.contains("s_nonempty"))
    // constraints survive compaction and time travel reads old state
    TableLog.append(spark, Seq((3L, 3L, "b")).toDF("k", "v", "s"), dir)
    TableLog.compact(spark, dir)
    val m = TableLog.readManifest(spark, dir, TableLog.latestVersion(spark, dir).get)
    assert(m.constraints.map(_._1).toSet === Set("v_pos", "s_nonempty"))
    intercept[IllegalArgumentException](
      TableLog.append(spark, Seq((4L, -4L, "c")).toDF("k", "v", "s"), dir))
  }
}
