package graft

import graft.operators.HypoTests

/** T33/T34: the distributed rank/ECDF algebra pinned against
  * independent SEQUENTIAL references computed from the same events —
  * a brute-force O(n·m) pair count for Mann-Whitney and a literal
  * two-pointer ECDF walk for KS. The DuckDB oracle already certifies
  * cross-engine SQL equality; this spec certifies the MATH (doubled-U
  * identity, tie handling, cross-scaled ECDF gap) against definitions.
  */
class HypoTestsSpec extends SparkSpecBase {

  private lazy val byType: Map[String, Array[Long]] = {
    import spark.implicits._
    Tables.events(spark, sf0001)
      .filter($"event_type".isin("purchase", "click", "view"))
      .select($"event_type", org.apache.spark.sql.functions
        .round($"value" * 100).cast("long").as("v"))
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
  }

  private lazy val results =
    HypoTests.catalog.map(q => q.name ->
      q.run(spark, sf0001).collect()).toMap

  test("ev26: doubled U equals the brute-force pair count, per group") {
    val a = byType("purchase")
    for (row <- results("ev26_mannwhitney")) {
      val grp = row.getString(0)
      val b = byType(grp)
      // 2U = 2·#{(x,y): x>y} + #ties, straight from the definition
      var u2 = 0L
      for (x <- a; y <- b)
        u2 += (if (x > y) 2L else if (x == y) 1L else 0L)
      assert(row.getLong(1) === a.length.toLong, s"$grp n1")
      assert(row.getLong(2) === b.length.toLong, s"$grp n2")
      assert(row.getLong(3) === u2, s"$grp doubled U")
      // AUC is U/(n1·n2) — must equal the same division exactly
      assert(row.getDouble(4) ===
        u2.toDouble / (2.0 * a.length * b.length), s"$grp auc")
    }
  }

  test("ev27: integer ECDF gap equals the sequential two-sample KS walk") {
    val a = byType("purchase").sorted
    for (row <- results("ev27_ks_test")) {
      val grp = row.getString(0)
      val b = byType(grp).sorted
      val cells = (a ++ b).distinct.sorted
      var best = 0L
      for (v <- cells) {
        val ca = a.count(_ <= v).toLong
        val cb = b.count(_ <= v).toLong
        best = math.max(best, math.abs(ca * b.length - cb * a.length))
      }
      assert(row.getLong(1) === a.length.toLong, s"$grp n1")
      assert(row.getLong(2) === b.length.toLong, s"$grp n2")
      assert(row.getLong(3) === best, s"$grp d_num")
      assert(row.getDouble(4) ===
        best.toDouble / (a.length.toDouble * b.length), s"$grp d")
    }
  }

  test("ev28: Welch t and Satterthwaite df match the sequential moments") {
    val a = byType("purchase")
    for (row <- results("ev28_welch_t")) {
      val grp = row.getString(0)
      val b = byType(grp)
      def stats(xs: Array[Long]): (Double, Double) = {
        val n = xs.length.toDouble
        val s = xs.sum.toDouble
        val ss = xs.map(x => BigInt(x) * x).sum.toDouble
        val m = s / n
        (m, (ss - s * s / n) / (n - 1)) // same association order as the entry
      }
      val (ma, va) = stats(a); val (mb, vb) = stats(b)
      val s2a = va / a.length; val s2b = vb / b.length
      assert(row.getLong(1) === a.length.toLong, s"$grp n1")
      assert(row.getLong(2) === b.length.toLong, s"$grp n2")
      assert(row.getDouble(3) === ma, s"$grp mean1")
      assert(row.getDouble(4) === mb, s"$grp mean2")
      assert(row.getDouble(5) === (ma - mb) / math.sqrt(s2a + s2b), s"$grp t")
      assert(row.getDouble(6) === ((s2a + s2b) * (s2a + s2b))
        / (s2a * s2a / (a.length - 1) + s2b * s2b / (b.length - 1)), s"$grp df")
    }
  }

  test("ev29: two-proportion z matches sequential user-level conversion") {
    import spark.implicits._
    val users = Tables.events(spark, sf0001)
      .select($"user_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
      .groupBy(_._1).toSeq
      .map { case (u, es) =>
        (u % 2, es.exists(e => e._2 == "purchase" && e._3 > 150)) }
    val n1 = users.count(_._1 == 0L).toLong
    val x1 = users.count(u => u._1 == 0L && u._2).toLong
    val n2 = users.count(_._1 == 1L).toLong
    val x2 = users.count(u => u._1 == 1L && u._2).toLong
    val p1 = x1.toDouble / n1; val p2 = x2.toDouble / n2
    val p = (x1 + x2).toDouble / (n1 + n2)
    val z = (p1 - p2) / math.sqrt(p * (1 - p) * (1.0 / n1 + 1.0 / n2))
    val r = results("ev29_prop_ztest").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((n1, x1, n2, x2)))
    assert(r.getDouble(4) === p1)
    assert(r.getDouble(5) === p2)
    assert(r.getDouble(6) === z)
  }

  test("ev31/ev32: CUPED and DID match sequential references on the same split") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, round => sround}
    val ev = Tables.events(spark, sf0001)
      .select($"user_id", $"event_type", sround($"value" * 100).cast("long"),
        expr("unix_micros(ts)"))
      .as[(Long, String, Long, Long)].collect()
    val mid = (ev.map(_._4).min + ev.map(_._4).max) / 2
    // ---- CUPED
    val users = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      val x = es.filter(e => e._2 == "purchase" && e._4 < mid).map(_._3).sum
      val y = es.filter(e => e._2 == "purchase" && e._4 >= mid).map(_._3).sum
      (u % 2, x, y)
    }
    val n = users.size.toDouble
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxy = users.map(t => BigInt(t._2) * t._3).sum
    val sxx = users.map(t => BigInt(t._2) * t._2).sum
    val theta = (sxy.toDouble - sx.toDouble * sy.toDouble / n) /
      (sxx.toDouble - sx.toDouble * sx.toDouble / n)
    for (r <- results("ev31_cuped")) {
      val arm = r.getLong(0)
      val aus = users.filter(_._1 == arm)
      val nA = aus.size.toDouble
      assert(r.getLong(1) === aus.size.toLong)
      assert(r.getDouble(2) === theta, "theta")
      assert(r.getDouble(3) === aus.map(_._3).sum.toDouble / nA, "mean_y")
      assert(r.getDouble(4) === aus.map(_._3).sum.toDouble / nA
        - theta * (aus.map(_._2).sum.toDouble / nA - sx.toDouble / n), "adj")
    }
    // CUPED must not CHANGE the overall treatment story arbitrarily:
    // the adjustment shifts both arms by theta-scaled pre-period
    // imbalance — verify the invariant directly rather than assuming it
    // ---- DID
    val p = ev.filter(_._2 == "purchase")
    def cellMean(arm: Long, post: Boolean) = {
      val c = p.filter(e => e._1 % 2 == arm && (e._4 >= mid) == post)
      c.map(_._3).sum.toDouble / c.length
    }
    val r = results("ev32_diff_in_diff").head
    assert(r.getDouble(0) === cellMean(1, post = false), "t0")
    assert(r.getDouble(1) === cellMean(1, post = true), "t1")
    assert(r.getDouble(2) === cellMean(0, post = false), "c0")
    assert(r.getDouble(3) === cellMean(0, post = true), "c1")
    assert(r.getDouble(4) === (cellMean(1, post = true) - cellMean(1, post = false))
      - (cellMean(0, post = true) - cellMean(0, post = false)), "did")
  }

  test("ev33/ev34: ANOVA and chi-square independence match exact sequential algebra") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr => sexpr, round => sr}
    val ev = Tables.events(spark, sf0001)
      .select($"event_type", sr($"value" * 100).cast("long"),
        sexpr("CAST(hour(ts) DIV 6 AS INT)"))
      .as[(String, Long, Int)].collect()
    // ---- ANOVA in BigInt, mirroring the e6 integral algebra
    val byG = ev.groupBy(_._1).toSeq
    val bterm = byG.map { case (_, es) =>
      val sG = BigInt(es.map(_._2).sum)
      sG * sG * 1000000 / es.length
    }.sum
    val n = ev.length; val k = byG.size
    val sAll = BigInt(ev.map(_._2).sum)
    val ssAll = ev.map(e => BigInt(e._2) * e._2).sum
    val ssbE6 = bterm - sAll * sAll * 1000000 / n
    val sswE6 = ssAll * 1000000 - bterm
    val ra = results("ev33_anova").head
    assert(ra.getLong(0) === n.toLong && ra.getLong(1) === k.toLong)
    assert(ra.getDouble(2) === ssbE6.toDouble / 1000000, "ssb")
    assert(ra.getDouble(3) === sswE6.toDouble / 1000000, "ssw")
    assert(ra.getDouble(4) ===
      (ssbE6.toDouble / 1000000 / (k - 1)) / (sswE6.toDouble / 1000000 / (n - k)), "f")
    // ---- chi-square independence
    val cells = ev.groupBy(e => (e._1, e._3)).map { case (kk, es) => kk -> es.length.toLong }
    val rm = cells.groupBy(_._1._1).map { case (g, cs) => g -> cs.values.sum }
    val cm = cells.groupBy(_._1._2).map { case (p, cs) => p -> cs.values.sum }
    val tt = cells.values.sum
    val chi2E6 = cells.map { case ((g, p), o) =>
      val num = BigInt(o) * tt - BigInt(rm(g)) * cm(p)
      num * num * 1000000 / (BigInt(rm(g)) * cm(p) * tt)
    }.sum
    val rc = results("ev34_chisq_indep").head
    assert(rc.getLong(0) === cells.size.toLong)
    assert(rc.getLong(1) === chi2E6.toLong)
    assert(rc.getDouble(2) === chi2E6.toLong.toDouble / 1000000)
  }

  test("ev89: Kruskal-Wallis H matches the textbook tie-averaged-rank " +
    "computation on the same events, and H >= 0 (ADVICE r6 formula fix)") {
    import spark.implicits._
    // independent sequential reference over ALL five event types
    val all: Array[(String, Long)] = Tables.events(spark, sf0001)
      .select($"event_type", org.apache.spark.sql.functions
        .round($"value" * 100).cast("long").as("v"))
      .as[(String, Long)].collect()
    val n = all.length.toDouble
    // tie-averaged global ranks
    val sorted = all.map(_._2).sorted
    val rankOf: Map[Long, Double] = sorted.zipWithIndex
      .groupBy(_._1).map { case (v, idx) =>
        v -> (idx.map(_._2 + 1).sum.toDouble / idx.length)
      }
    val groups = all.groupBy(_._1)
    val sumTerm = groups.values.map { vs =>
      val r = vs.map(t => rankOf(t._2)).sum
      r * r / vs.length
    }.sum
    val hWant = 12.0 / (n * (n + 1)) * sumTerm - 3.0 * (n + 1)
    val tsum = all.groupBy(_._2).values
      .map(g => g.length.toDouble).map(t => t * t * t - t).sum
    val hTieWant = hWant / (1.0 - tsum / (n * n * n - n))
    val row = results("ev89_kruskal_wallis").head
    val h = row.getAs[Double]("h")
    val hTie = row.getAs[Double]("h_tie_corrected")
    val k = groups.size.toDouble
    // the entry floor-divides each group's u2²/n_g to an integer before
    // the cross-group sum (cross-engine determinism), shaving < 1 off
    // each of the k terms: |h − textbook| ≤ 3k/(N(N+1))
    val tol = 3.0 * k / (n * (n + 1)) + 1e-9
    assert(h >= 0.0, s"H must be nonnegative, got $h")
    assert(math.abs(h - hWant) <= tol, s"h=$h want=$hWant tol=$tol")
    assert(math.abs(hTie - hTieWant) <= tol * 2, s"h_tie=$hTie want=$hTieWant")
  }

  test("all tests emit one row per comparison group, deterministically") {
    assert(results("ev26_mannwhitney").map(_.getString(0)).toSeq
      === Seq("click", "view"))
    assert(results("ev27_ks_test").map(_.getString(0)).toSeq
      === Seq("click", "view"))
    assert(results("ev28_welch_t").map(_.getString(0)).toSeq
      === Seq("click", "view"))
  }
}
