package graft

import org.apache.spark.sql.functions._

/** Pins the native jaro_winkler expression to the standard published
  * values (Winkler's own test pairs) and its edge contract. The dd17
  * oracle additionally certifies agreement with DuckDB's independent
  * implementation at 6 dp over the whole blocked candidate set.
  */
class StringSimSpec extends SparkSpecBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(call_function("jaro_winkler", col("a"), col("b")))
      .head().getDouble(0)

  test("standard reference pairs") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.961111) < 1e-6)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.813333) < 1e-6)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.896296) < 1e-6)
  }

  test("edges: identity, emptiness, disjoint alphabets, symmetry") {
    assert(jw("widget", "widget") === 1.0)
    assert(jw("", "") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("abc", "xyz") === 0.0)
    assert(jw("small ring", "smooth ring") === jw("smooth ring", "small ring"))
  }

  test("winkler boost only above the 0.7 jaro threshold, prefix capped at 4") {
    // prefix of 5+ identical chars must contribute only 4 to the boost:
    // compare against the hand-computed value for these strings
    val v = jw("prefixes", "prefixed")
    // jaro = (7/8 + 7/8 + 7/7)/3 = 0.9166667; boost l=4 (cap, not 7):
    // 0.9166667 + 4*0.1*(1-0.9166667) = 0.95
    assert(math.abs(v - 0.95) < 1e-6)
  }

  test("null propagates, non-string input is rejected at analysis") {
    val r = Seq(("a", Option.empty[String])).toDF("a", "b")
      .select(call_function("jaro_winkler", col("a"), col("b")))
      .head()
    assert(r.isNullAt(0))
    intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(call_function("jaro_winkler", col("a"), col("b")))
        .head()
    }
  }
}
