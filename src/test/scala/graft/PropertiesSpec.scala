package graft

import graft.operators.{Graph, Olap}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks (scalacheck) for the custom primitives — the
  * invariants a hand-picked fixture can miss. Each property evaluates
  * Spark plans per trial, so trial counts stay modest; seeds are
  * scalacheck-managed and failures print the shrunk counterexample.
  */
class PropertiesSpec extends SparkSpecBase {
  import spark.implicits._

  private def check(prop: Prop, trials: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("topk_pairs equals the sort-based reference on random groups") {
    val gen = for {
      n <- Gen.choose(0, 60)
      k <- Gen.choose(1, 8)
      scores <- Gen.listOfN(n, Gen.choose(-50, 50))
    } yield (k, scores.zipWithIndex.map { case (s, i) => (s.toDouble, i.toLong) })
    check(Prop.forAll(gen) { case (k, rows) =>
      val expected = rows.sortBy { case (s, i) => (-s, i) }.take(k)
      if (rows.isEmpty) true
      else {
        val got = rows.toDF("s", "id")
          .agg(call_function("topk_pairs", col("s"), col("id"), lit(k)))
          .as[Seq[(Double, Long)]].head()
        got == expected
      }
    }, trials = 15)
  }

  test("spearman is within [-1,1] and exactly invariant under monotone affine maps") {
    val gen = for {
      n <- Gen.choose(3, 50)
      xs <- Gen.listOfN(n, Gen.choose(-20, 20))
      ys <- Gen.listOfN(n, Gen.choose(-20, 20))
    } yield xs.map(_.toDouble).zip(ys.map(_.toDouble))
    check(Prop.forAll(gen) { pairs =>
      val df = pairs.zipWithIndex.map { case ((x, y), i) => ("g", x, y, i) }
        .toDF("g", "x", "y", "i")
      def rho(xc: String, yc: String): Option[Double] = {
        val r = Olap.spearman(df.select(col("g"), col(xc).as("a"), col(yc).as("b"),
          col("i")), "g", "a", "b").select("rho").as[Double].head()
        if (r.isNaN) None else Some(r) // NaN = zero variance (all-tied column)
      }
      val base = rho("x", "y")
      // strictly increasing exact transforms: ranks (and so rho) identical
      val mapped = rho("x", "y") // recompute to pin determinism
      val affine = {
        val df2 = df.withColumn("x2", col("x") * 2 + 1).withColumn("y2", col("y") / 2)
        val r = Olap.spearman(df2.select(col("g"), col("x2").as("a"), col("y2").as("b")),
          "g", "a", "b").select("rho").as[Double].head()
        if (r.isNaN) None else Some(r)
      }
      val inRange = base.forall(r => r >= -1.0 && r <= 1.0)
      inRange && base == mapped && base == affine
    }, trials = 15)
  }

  test("bloom_agg admits every member for arbitrary key sets (no false negatives)") {
    val gen = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
    check(Prop.forAll(gen) { keys =>
      val df = keys.distinct.toDF("k")
      val bin = df.agg(call_function("bloom_agg", xxhash64(col("k")),
        lit(keys.size.toLong.max(1L)), lit(4096L))).head().getAs[Array[Byte]](0)
      df.filter(!call_function("bloom_contains", lit(bin), xxhash64(col("k"))))
        .count() == 0L
    }, trials = 12)
  }

  test("kCore is sound (all survivors have in-core degree >= k) and a fixpoint") {
    val gen = for {
      n <- Gen.choose(4, 30)
      m <- Gen.choose(0, 60)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield edges
    check(Prop.forAll(gen) { edges =>
      val df = if (edges.isEmpty) Seq((0L, 0L)).toDF("src", "dst") // self-loop → dropped
        else edges.toDF("src", "dst")
      val core = Graph.kCore(df, k = 2).as[(Long, Long)].collect().toMap
      val sound = core.values.forall(_ >= 2L)
      // fixpoint: peeling the induced subgraph again changes nothing
      val survivors = core.keySet
      val induced = edges.filter(e => survivors(e._1) && survivors(e._2))
      val again =
        if (induced.isEmpty) Map.empty[Long, Long]
        else Graph.kCore(induced.toDF("src", "dst"), k = 2).as[(Long, Long)].collect().toMap
      sound && again == core
    }, trials = 12)
  }

  test("TableLog: random op sequences track the in-memory model, including time travel") {
    import graft.sources.TableLog
    sealed trait Op
    case class App(rows: List[Long]) extends Op
    case class Over(rows: List[Long]) extends Op
    case class Merge(rows: List[Long]) extends Op
    case object Compact extends Op
    val rowsGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 30L)).map(_.distinct))
    val opGen: Gen[Op] = Gen.frequency(
      4 -> rowsGen.map(App), 2 -> rowsGen.map(Over),
      2 -> rowsGen.map(Merge), 1 -> Gen.const(Compact))
    val gen = for {
      first <- rowsGen
      ops <- Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, opGen))
    } yield (first, ops)
    check(Prop.forAll(gen) { case (first, ops) =>
      val dir = java.nio.file.Files.createTempDirectory("tlprop").toString + "/t"
      def df(rows: List[Long]) = rows.map(i => (i, s"v$i")).toDF("id", "s")
      // model: multiset of (id, payload) per version; merge dedups by id
      var model = Vector(first.map(i => (i, s"v$i")))
      TableLog.create(spark, df(first), dir)
      ops.foreach {
        case App(r) =>
          model :+= model.last ++ r.map(i => (i, s"v$i"))
          TableLog.append(spark, df(r), dir)
        case Over(r) =>
          model :+= r.map(i => (i, s"v$i")).toList
          TableLog.overwrite(spark, df(r), dir)
        case Merge(r) =>
          model :+= model.last.filterNot(t => r.contains(t._1)) ++
            r.map(i => (i, s"v$i"))
          TableLog.merge(spark, df(r), dir, Seq("id"))
        case Compact =>
          model :+= model.last
          TableLog.compact(spark, dir, parts = 2)
      }
      val latestOk = TableLog.read(spark, dir).as[(Long, String)].collect()
        .sorted.toSeq == model.last.sorted.toSeq
      // time travel at EVERY version must replay the model history
      val travelOk = model.indices.forall(v =>
        TableLog.readVersion(spark, dir, v.toLong).as[(Long, String)].collect()
          .sorted.toSeq == model(v).sorted.toSeq)
      latestOk && travelOk && TableLog.versions(spark, dir).length == model.length
    }, trials = 8)
  }

  test("AsOfJoinExec equals the sequential as-of reference on random frames") {
    // narrow key/time domains force dense per-key collisions, exact ties,
    // and empty-key edges — the merge pass's hard cases
    val gen = for {
      nl <- Gen.choose(0, 40)
      nr <- Gen.choose(0, 40)
      l <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 20L)))
      r <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 20L)))
    } yield (l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      // unique per (key, time): keep the max value, like aj1's pre-agg
      r.groupBy(identity).keys.toList.sorted
        .map { case (k, t) => (k, t, k * 100 + t) })
    check(Prop.forAll(gen) { case (lefts, rights) =>
      val expected = lefts.map { case (id, k, t) =>
        id -> rights.filter(rr => rr._1 == k && rr._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap
      val ldf = lefts.toDF("id", "k", "t")
      val rdf = rights.toDF("k", "rt", "v")
      val got = operators.AsOfJoin.asofNative(ldf, rdf, "k", "t", "rt")
        .select("id", "v").as[(Long, Option[Long])].collect().toMap
      got == expected
    }, trials = 12)
  }
}
