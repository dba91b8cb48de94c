package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Engine-pinned transcendental evaluation shared by every catalog entry
  * that must quantize a log AFTER computing it (ml36_psi, tx50 entropy,
  * tx51 JSD, q155 odds ratio): libm `ln` differs between the JVM and
  * DuckDB in the last ulp, which can flip an e6 floor at a boundary —
  * so BOTH engines evaluate the SAME expression text instead, built
  * only from IEEE-754 correctly-rounded ops (+, −, ×, ÷, compare),
  * which makes the resulting doubles BIT-IDENTICAL by construction.
  *
  * ln(x) for x > 0, reading column `x`, producing column `lnx`:
  *  1. sign fold: y0 = x or 1/x so y0 ≥ 1 (sg carries the sign);
  *  2. six exact power-of-two divides (2^32 … 2) reduce y0 < 2^64 to
  *     m ∈ [1,2), accumulating the exponent k (exact: dividing a
  *     double by a power of two is lossless in the normal range);
  *  3. atanh series ln m = 2t(1 + t²/3 + … + t¹⁵/15), t = (m−1)/(m+1)
  *     ≤ 1/3 — truncation ≤ ~1e-9 relative;
  *  4. lnx = sg·(k·ln2 + series), ln2 as the correctly-rounded literal.
  *
  * Accuracy is ~1e-9 relative vs true ln — irrelevant at the e6
  * quantization every consumer applies; what matters is that the two
  * engines can NEVER disagree on the floor.
  */
object PinnedMath {

  /** Levels of (alias, expression): each level references only
    * prior-level aliases plus the input column `x`. The text is valid
    * in BOTH Spark SQL and DuckDB. */
  val lnSteps: Seq[Seq[(String, String)]] = Seq(
    Seq("sg" -> "CASE WHEN x < 1.0 THEN -1.0 ELSE 1.0 END",
      "y0" -> "CASE WHEN x < 1.0 THEN 1.0 / x ELSE x END"),
    Seq("y1" -> "CASE WHEN y0 >= 4294967296.0 THEN y0 / 4294967296.0 ELSE y0 END",
      "k1" -> "CASE WHEN y0 >= 4294967296.0 THEN 32.0 ELSE 0.0 END"),
    Seq("y2" -> "CASE WHEN y1 >= 65536.0 THEN y1 / 65536.0 ELSE y1 END",
      "k2" -> "CASE WHEN y1 >= 65536.0 THEN 16.0 ELSE 0.0 END"),
    Seq("y3" -> "CASE WHEN y2 >= 256.0 THEN y2 / 256.0 ELSE y2 END",
      "k3" -> "CASE WHEN y2 >= 256.0 THEN 8.0 ELSE 0.0 END"),
    Seq("y4" -> "CASE WHEN y3 >= 16.0 THEN y3 / 16.0 ELSE y3 END",
      "k4" -> "CASE WHEN y3 >= 16.0 THEN 4.0 ELSE 0.0 END"),
    Seq("y5" -> "CASE WHEN y4 >= 4.0 THEN y4 / 4.0 ELSE y4 END",
      "k5" -> "CASE WHEN y4 >= 4.0 THEN 2.0 ELSE 0.0 END"),
    Seq("y6" -> "CASE WHEN y5 >= 2.0 THEN y5 / 2.0 ELSE y5 END",
      "k6" -> "CASE WHEN y5 >= 2.0 THEN 1.0 ELSE 0.0 END"),
    Seq("tt" -> "(y6 - 1.0) / (y6 + 1.0)"),
    Seq("uu" -> "tt * tt"),
    Seq("lnx" -> ("sg * ((k1 + k2 + k3 + k4 + k5 + k6) * 0.6931471805599453"
      + " + 2.0 * tt * (1.0 + uu * (1.0/3.0 + uu * (1.0/5.0 + uu * (1.0/7.0"
      + " + uu * (1.0/9.0 + uu * (1.0/11.0 + uu * (1.0/13.0"
      + " + uu * (1.0/15.0)))))))))")))

  /** The intermediate aliases [[withLnx]] adds besides `lnx` — callers
    * project them away before emitting oracle-checked columns. */
  val lnScratch: Seq[String] =
    lnSteps.flatMap(_.map(_._1)).filterNot(_ == "lnx")

  /** [[lnSteps]] rendered as a DuckDB CTE chain reading column `x` from
    * CTE `from`; the final CTE is named `plF` (override with `out`) and
    * carries every input column plus `lnx`. The returned text ends with
    * ",\n" so the caller appends its own next CTE. */
  def lnCtes(from: String, out: String = "plF"): String = {
    val sb = new StringBuilder
    var prev = from
    lnSteps.zipWithIndex.foreach { case (lvl, i) =>
      val name = if (i == lnSteps.size - 1) out else s"${out}_$i"
      val cols = lvl.map { case (n, e) => s"$e AS $n" }.mkString(", ")
      sb.append(s"$name AS (SELECT *, $cols FROM $prev),\n")
      prev = name
    }
    sb.toString
  }

  /** Spark twin of [[lnCtes]]: adds `lnx` (plus scratch columns — see
    * [[lnScratch]]) to a frame carrying a double column `x`. */
  def withLnx(df: DataFrame): DataFrame =
    lnSteps.foldLeft(df) { (d, lvl) =>
      lvl.foldLeft(d) { case (d2, (nm, ex)) => d2.withColumn(nm, expr(ex)) }
    }
}
