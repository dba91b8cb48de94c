package graft

import graft.functions.PinnedMath
import org.apache.spark.sql.functions._

/** Pins the engine-pinned transcendental chains against libm at their
  * documented tolerances (the chains' PURPOSE is bit-identical
  * cross-engine doubles, certified by the consuming entries' oracle
  * hash matches every round — this spec pins that they are also CLOSE
  * to the true functions, so a quantized output is meaningful):
  *  - lnSteps:    ~1e-9 relative vs math.log over (0, 1e12]
  *  - expSteps:   ~2e-14 relative vs math.exp over [-700, 700]
  *  - atan2Steps: ~1e-12 absolute vs math.atan2 over all quadrants
  */
class PinnedMathSpec extends SparkSpecBase {
  import spark.implicits._

  private def grid(vals: Seq[Double]) = vals.toDF("x")

  test("lnSteps tracks math.log within 1e-9 relative over 12 decades") {
    val xs = (for (e <- -6 to 12; m <- Seq(1.0, 1.7, 2.5, 3.14159, 9.99))
      yield m * math.pow(10, e)) :+ 1.0 :+ 0.5 :+ 2.0
    val got = PinnedMath.withLnx(grid(xs)).select("x", "lnx")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    xs.foreach { x =>
      val want = math.log(x)
      val tol = math.max(1e-9 * math.abs(want), 1e-12)
      assert(math.abs(got(x) - want) <= tol,
        s"ln($x): got ${got(x)}, libm $want")
    }
  }

  test("expSteps tracks math.exp within 1e-13 relative over [-700, 700]") {
    val xs = (-700 to 700 by 7).map(_.toDouble) ++
      Seq(0.0, 1.0, -1.0, 0.3465735902799726, -0.3465735902799726,
        math.log(2.0) / 2, 100.123456789, -99.987654321, 709.0, -709.0)
    val got = PinnedMath.withSteps(grid(xs), PinnedMath.expSteps)
      .select("x", "expx")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    xs.foreach { x =>
      val want = math.exp(x)
      assert(math.abs(got(x) - want) <= 1e-13 * want,
        s"exp($x): got ${got(x)}, libm $want, rel ${math.abs(got(x) - want) / want}")
    }
  }

  test("expSteps saturates IEEE-identically beyond the finite range") {
    val got = PinnedMath.withSteps(grid(Seq(800.0, -800.0)), PinnedMath.expSteps)
      .select("x", "expx")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(800.0).isPosInfinity)
    assert(got(-800.0) == 0.0)
  }

  test("atan2Steps tracks math.atan2 within 1e-12 absolute across all " +
    "quadrants, axes, and the origin") {
    val vs = Seq(-3.5, -1.0, -0.25, 0.0, 0.25, 1.0, 3.5, 1e6, -1e6, 1e-9)
    val pairs = for (y <- vs; x <- vs) yield (y, x)
    val got = PinnedMath.withSteps(pairs.toDF("yy", "xx"), PinnedMath.atan2Steps)
      .select("yy", "xx", "at2")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    pairs.foreach { case (y, x) =>
      val want = math.atan2(y, x)
      assert(math.abs(got((y, x)) - want) <= 1e-12,
        s"atan2($y, $x): got ${got((y, x))}, libm $want")
    }
  }

  test("sinSteps/cosSteps track libm within 1e-13/1e-12 absolute over " +
    "[-pi/2, pi/2] (the documented geo domain)") {
    val xs = (-157 to 157 by 3).map(_ / 100.0) ++
      Seq(0.0, math.Pi / 2, -math.Pi / 2, 1e-9, -1e-9)
    val got = PinnedMath.withSteps(
      PinnedMath.withSteps(grid(xs), PinnedMath.sinSteps),
      PinnedMath.cosSteps)
      .select("x", "sinx", "cosx")
      .collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    xs.foreach { x =>
      assert(math.abs(got(x)._1 - math.sin(x)) <= 1e-13, s"sin($x)")
      assert(math.abs(got(x)._2 - math.cos(x)) <= 1e-12, s"cos($x)")
    }
  }

  test("trigSteps (full argument reduction) tracks libm within 1e-11 " +
    "absolute over multi-octave arguments and lands EXACTLY on the " +
    "Taylor pair inside |x| <= pi/4") {
    // multi-octave grid: thousands of radians both signs, fractional
    // steps, near-multiples of pi/2 (the cells where a wrong fold flips
    // the sign), plus the unreduced-consumer magnitude (~1.8e4 rad —
    // ev95's weekly phase of 2025 epoch seconds) and tiny arguments
    val xs = (-2000 to 2000 by 7).map(_ * 3.1) ++
      (-20 to 20).map(n => n * math.Pi / 2 + 1e-7) ++
      (-20 to 20).map(n => n * math.Pi / 2 - 1e-7) ++
      Seq(0.0, 1e-9, -1e-9, 17600.123, -17600.123, 1.0e6, -1.0e6)
    val got = PinnedMath.withSteps(grid(xs), PinnedMath.trigSteps)
      .select("x", "sinx", "cosx")
      .collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    xs.foreach { x =>
      assert(math.abs(got(x)._1 - math.sin(x)) <= 1e-11, s"sin($x)")
      assert(math.abs(got(x)._2 - math.cos(x)) <= 1e-11, s"cos($x)")
    }
    // inside |x| <= pi/4 the fold picks n = 0, so the full chain must
    // reproduce the domain-bounded Taylor chains BIT FOR BIT
    val small = (-78 to 78 by 3).map(_ / 100.0)
    val tay = PinnedMath.withSteps(
      PinnedMath.withSteps(grid(small), PinnedMath.sinSteps),
      PinnedMath.cosSteps)
      .select("x", "sinx", "cosx")
      .collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val full = PinnedMath.withSteps(grid(small), PinnedMath.trigSteps)
      .select("x", "sinx", "cosx")
      .collect().map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    small.foreach { x =>
      assert(java.lang.Double.doubleToLongBits(tay(x)._1)
        == java.lang.Double.doubleToLongBits(full(x)._1), s"sin bits at $x")
      assert(java.lang.Double.doubleToLongBits(tay(x)._2)
        == java.lang.Double.doubleToLongBits(full(x)._2), s"cos bits at $x")
    }
  }

  test("pow composition exp(y*ln x) tracks math.pow within the composed " +
    "error envelope |y*ln x|*2e-9 relative") {
    import org.apache.spark.sql.functions.col
    val xs = for { e <- -6 to 6; m <- Seq(1.0, 3.7) } yield m * math.pow(10.0, e)
    val ys = Seq(-2.5, -1.0, -0.5, 0.5, 1.0, 2.5)
    val df = xs.flatMap(x => ys.map(y => (x, y))).toDF("x", "yv")
    val m = PinnedMath.withSteps(df, PinnedMath.lnSteps)
      .select(col("x").as("x0"), col("yv"), (col("yv") * col("lnx")).as("x"))
    val got = PinnedMath.withSteps(m, PinnedMath.expSteps)
      .select("x0", "yv", "expx").collect()
    assert(got.length == xs.size * ys.size)
    got.foreach { r =>
      val x = r.getDouble(0); val y = r.getDouble(1); val p = r.getDouble(2)
      val want = math.pow(x, y)
      val tol = math.abs(y * math.log(x)) * 2e-9 + 1e-12
      assert(math.abs(p - want) <= tol * want,
        s"pow($x,$y): got $p want $want relTol $tol")
    }
  }

  test("renamed() prefixes aliases and renames inputs without corrupting " +
    "expressions: prefixed chain equals the plain chain") {
    val xs = Seq(0.3, -1.2, 1.5)
    val plain = PinnedMath.withSteps(grid(xs), PinnedMath.sinSteps)
      .select("x", "sinx").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val pref = PinnedMath.withSteps(
      grid(xs).withColumnRenamed("x", "theta"),
      PinnedMath.renamed(PinnedMath.sinSteps, "p9_", Map("x" -> "theta")))
      .select("theta", "p9_sinx")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    xs.foreach(x => assert(plain(x) == pref(x), s"renamed chain diverged at $x"))
    // atan2's alias set includes substring pairs (t2 inside at2) — the
    // word-boundary rewrite must leave composite aliases intact
    val a = PinnedMath.renamed(PinnedMath.atan2Steps, "z_", Map.empty)
    val names = a.flatMap(_.map(_._1))
    assert(names.contains("z_at2") && names.contains("z_t2"))
    assert(!a.flatMap(_.map(_._2)).exists(_.contains("z_az_t2")),
      "prefixing corrupted the at2 alias")
  }

  test("trigStepsGuarded: bit-identical to trigSteps through the 1.6e6 " +
    "rad boundary, loud raise_error past it (r11, verdict item 4)") {
    // inside + exactly AT the boundary: outputs must be the unguarded
    // chain's bits (the guard substitutes x unchanged)
    val xs = Seq(0.0, 1.0, -123.456, 17600.123, 1.0e6, 1600000.0, -1600000.0)
    def bits(steps: Seq[Seq[(String, String)]]) =
      PinnedMath.withSteps(grid(xs), steps).select("x", "sinx", "cosx")
        .collect().map(r => r.getDouble(0) ->
          (java.lang.Double.doubleToLongBits(r.getDouble(1)),
            java.lang.Double.doubleToLongBits(r.getDouble(2)))).toMap
    val plain = bits(PinnedMath.trigSteps)
    val guarded = bits(PinnedMath.trigStepsGuarded)
    xs.foreach(x => assert(plain(x) == guarded(x), s"guard changed bits at $x"))
    // past the boundary: the documented loud refusal, naming the domain
    val ex = intercept[Exception] {
      PinnedMath.withSteps(grid(Seq(1600000.5)), PinnedMath.trigStepsGuarded)
        .select("sinx").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("libm-accuracy")),
      s"expected the domain-guard message, got: ${msgs(ex).mkString(" | ")}")
  }

  test("the chains are pure column algebra: no UDF, no shuffle") {
    val df = PinnedMath.withSteps(
      PinnedMath.withLnx(grid(Seq(2.0))).select(col("lnx").as("x")),
      PinnedMath.expSteps)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"))
  }
}
