package graft

import graft.operators.Geo
import org.apache.spark.sql.functions._

/** Pins the geospatial family: haversine against known city pairs, and
  * the grid-cell candidate plans (geo2 radius join, geo4 bbox cover
  * join) against the naive all-pairs forms on the sf0.001 tables —
  * same-answer-different-plan is the whole claim of the family.
  */
class GeoSpec extends SparkSpecBase {
  import spark.implicits._

  test("haversineMeters matches known city distances") {
    // (lat1, lon1, lat2, lon2, expected meters, tolerance)
    val cases = Seq(
      ("paris-london", 48.8566, 2.3522, 51.5074, -0.1278, 343.5e3, 1.5e3),
      ("sfo-nyc", 37.6213, -122.3790, 40.6413, -73.7781, 4152.0e3, 15e3),
      ("same-point", 10.0, 20.0, 10.0, 20.0, 0.0, 1e-6))
    val df = cases.toDF("name", "lat1", "lon1", "lat2", "lon2", "exp", "tol")
      .withColumn("d", Geo.haversineMeters(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .withColumn("rev", Geo.haversineMeters(col("lat2"), col("lon2"), col("lat1"), col("lon1")))
    df.collect().foreach { r =>
      val (d, rev, exp, tol) = (r.getDouble(7), r.getDouble(8), r.getDouble(5), r.getDouble(6))
      assert(math.abs(d - exp) <= tol, s"${r.getString(0)}: $d vs $exp")
      assert(d == rev, "haversine must be symmetric")
    }
  }

  test("geo11's pinned haversine chain matches the libm haversineMeters " +
    "builder within 1e-6 relative (r9)") {
    // geo11's engine-pinned sin/cos/atan2 form vs the libm builder over
    // the same synthetic customer grid mapping — same R, same formula,
    // different trig implementations: agreement certifies the chains'
    // accuracy on the real operating domain (GeoSpec city pins cover
    // the builder itself)
    import graft.functions.PinnedMath
    val pm = PinnedMath
    val pts = spark.range(1, 500).select(
      col("id"),
      ((col("id") * 2654435761L) % 360000001L).as("px"),
      ((((col("id") * col("id")) % 179424673L) * 48271L) % 180000001L).as("py"))
    val rad = pts.select(col("id"),
      expr("(CAST(py AS DOUBLE) / 1000000E0 - 90E0) * 0.017453292519943295").as("latr"),
      expr("(CAST(px AS DOUBLE) / 1000000E0 - 180E0) * 0.017453292519943295").as("lonr"),
      expr("CAST(py AS DOUBLE) / 1000000E0 - 90E0").as("latd"),
      expr("CAST(px AS DOUBLE) / 1000000E0 - 180E0").as("lond"))
    val s1 = pm.renamed(pm.sinSteps, "s1_", Map("x" -> "(latr / 2E0)"))
    val s2 = pm.renamed(pm.sinSteps, "s2_", Map("x" -> "(lonr / 2E0)"))
    val c1 = pm.renamed(pm.cosSteps, "c1_", Map("x" -> "latr"))
    val a1 = pm.renamed(pm.atan2Steps, "a1_", Map("yy" -> "sh", "xx" -> "so"))
    val g3 = Seq(s1, s2, c1).foldLeft(rad)(pm.withSteps)
    val hs = g3.withColumn("hc",
        expr("LEAST(GREATEST(s1_sinx * s1_sinx + c1_cosx * (s2_sinx * s2_sinx), 0E0), 1E0)"))
      .withColumn("sh", expr("sqrt(hc)"))
      .withColumn("so", expr("sqrt(1E0 - hc)"))
    val out = pm.withSteps(hs, a1)
      .withColumn("pinned", expr("2E0 * 6371008.8E0 * a1_at2"))
      .withColumn("libm", operators.Geo.haversineMeters(
        col("latd"), col("lond"), lit(0.0), lit(0.0)))
      .select("pinned", "libm").collect()
    out.foreach { r =>
      val (p, l) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(p - l) <= math.max(1e-6 * l, 1e-4),
        s"pinned $p vs libm $l")
    }
  }

  test("radiusJoin equals the naive all-pairs join on a dense fixture") {
    // 400 deterministic points in a 40e6×40e6 box → plenty of pairs
    // within r=2e6, including cross-cell ones (the recall-critical case)
    val pts = spark.range(1, 401).select(
      col("id"),
      ((col("id") * 7368787L) % 40000001L).as("px"),
      ((((col("id") * col("id")) % 104729L) * 382L) % 40000001L).as("py"))
      .cache()
    val r = 2000000L
    val grid = operators.Geo.radiusJoin(pts, r)
      .collect().map(_.toSeq).toSet
    val naive = pts.as("a").crossJoin(pts.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("d2",
        (col("a.px") - col("b.px")) * (col("a.px") - col("b.px")) +
        (col("a.py") - col("b.py")) * (col("a.py") - col("b.py")))
      .filter(col("d2") <= r * r)
      .select(col("a.id"), col("b.id"), col("d2"))
      .collect().map(_.toSeq).toSet
    assert(grid.size > 50, s"fixture too sparse: ${grid.size} pairs")
    // cross-cell pairs must exist or the 3×3 neighbourhood is untested
    val cell = pts.collect()
      .map(x => x.getLong(0) -> (x.getLong(1) / r, x.getLong(2) / r)).toMap
    val cross = grid.count { case Seq(a: Long, b: Long, _) => cell(a) != cell(b) }
    assert(cross > 0, "no cross-cell pair in fixture")
    assert(grid == naive)
  }

  test("geo4 cell-cover bbox join equals the naive containment join") {
    val cover = SparkEntry.queries("geo4_bbox_join")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val pts = Tables.customer(spark, sf0001).select(
      col("c_custkey").as("id"),
      ((col("c_custkey") * 2654435761L) % 360000001L).as("px"),
      ((((col("c_custkey") * col("c_custkey")) % 179424673L) * 48271L)
        % 180000001L).as("py"),
      round(col("c_acctbal") * 100).cast("long").as("cents"))
    val boxes = Tables.nation(spark, sf0001).select(col("n_nationkey"),
      (((col("n_nationkey") * 97) % 29) * 12000000L).as("x0"),
      (((col("n_nationkey") * 53) % 27) * 6000000L).as("y0"))
    val naive = boxes.crossJoin(pts)
      .filter(col("px") >= col("x0") && col("px") < col("x0") + 24000000L &&
              col("py") >= col("y0") && col("py") < col("y0") + 18000000L)
      .groupBy("n_nationkey")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      .collect().map(_.toSeq).toSet
    assert(cover.nonEmpty, "fixture must land customers in at least one box")
    assert(cover == naive)
  }

  test("geo5 hexagon containment: center is inside, far point is not") {
    // direct check of the HOF edge test on a hand-built frame
    val df = Seq((0L, 0L, "in"), (11999999L, 0L, "in-edgeish"),
        (12000001L, 0L, "out"), (0L, 10000001L, "out-top"),
        (9000000L, 5000000L, "in-diag"), (9000001L, 5000000L, "out-diag"))
      .toDF("px", "py", "tag")
      .withColumn("cx", lit(0L)).withColumn("cy", lit(0L))
      .withColumn("poly", expr(
        """transform(array(
          |  named_struct('ox', 12000000, 'oy', 0),
          |  named_struct('ox', 6000000, 'oy', 10000000),
          |  named_struct('ox', -6000000, 'oy', 10000000),
          |  named_struct('ox', -12000000, 'oy', 0),
          |  named_struct('ox', -6000000, 'oy', -10000000),
          |  named_struct('ox', 6000000, 'oy', -10000000)),
          | o -> named_struct('x', cx + CAST(o.ox AS BIGINT),
          |                   'y', cy + CAST(o.oy AS BIGINT)))""".stripMargin))
      .withColumn("inside", expr(
        """forall(zip_with(poly,
          |  concat(slice(poly, 2, size(poly) - 1), slice(poly, 1, 1)),
          |  (a, b) -> (b.x - a.x) * (py - a.y)
          |          - (b.y - a.y) * (px - a.x) >= 0), t -> t)""".stripMargin))
    val got = df.select("tag", "inside").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map("in" -> true, "in-edgeish" -> true, "out" -> false,
      "out-top" -> false, "in-diag" -> true, "out-diag" -> false))
  }
}
