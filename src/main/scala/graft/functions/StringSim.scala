package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen'd expression
  * (SURVEY §2 L69) — the record-linkage scorer that runs INSIDE the
  * blocked candidate join (dd15/dd17), so the hot loop is a static
  * method call in generated code, not a UDF round trip.
  *
  * Standard definition (matches DuckDB's `jaro_winkler_similarity`,
  * which the dd17 oracle certifies at 6 dp): match window
  * ⌊max(|a|,|b|)/2⌋−1, transpositions = half the out-of-order matched
  * chars, Winkler boost `j + ℓ·0.1·(1−j)` applied only when j > 0.7
  * with common-prefix ℓ capped at 4.
  */
object StringSim {

  /** O(|a|·window) two-pass Jaro + Winkler boost over code points of
    * the UTF-16 representation (test data is ASCII; for linkage
    * scoring, consistent treatment matters more than grapheme purity).
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val sl = s.length
    val tl = t.length
    if (sl == 0 && tl == 0) return 1.0
    if (sl == 0 || tl == 0) return 0.0
    val window = math.max(0, math.max(sl, tl) / 2 - 1)
    val sMatch = new Array[Boolean](sl)
    val tMatch = new Array[Boolean](tl)
    var m = 0
    var i = 0
    while (i < sl) {
      val lo = math.max(0, i - window)
      val hi = math.min(tl - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched sequences in order
    var tr = 0
    var k = 0
    i = 0
    while (i < sl) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) tr += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / sl + md / tl + (md - tr / 2) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val maxL = math.min(4, math.min(sl, tl))
      while (l < maxL && s.charAt(l) == t.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}

/** `jaro_winkler(a, b)` — registered via [[graft.GraftExtensions]]. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSim.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
