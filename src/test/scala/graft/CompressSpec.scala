package graft

import org.apache.spark.sql.functions._

/** Pins the deflate_len compressibility signal: repetitive text must
  * compress far below varied text of the same length, the function is
  * a pure deterministic map of the bytes, and nulls propagate. */
class CompressSpec extends SparkSpecBase {
  import spark.implicits._

  private def dl(s: String): Long =
    Seq(s).toDF("t").select(call_function("deflate_len", col("t")))
      .head().getLong(0)

  test("repetition compresses, variety does not") {
    val rep = "spam " * 400                       // 2000 bytes, one token
    val varied = (0 until 400)
      .map(i => s"w${i * 7919 % 9973}").mkString(" ") // same scale, high variety
    val r = dl(rep)
    val v = dl(varied)
    assert(r < varied.length / 5, s"repetitive text barely compressed: $r")
    assert(v > r * 4, s"varied ($v) should deflate much larger than repetitive ($r)")
  }

  test("deterministic and consistent with the helper") {
    val s = "the quick brown fox jumps over the lazy dog " * 10
    assert(dl(s) === dl(s))
    assert(dl(s) ===
      graft.functions.Compress.deflatedLen(s.getBytes("UTF-8")))
  }

  test("empty input and null") {
    assert(dl("") >= 0)
    val r = Seq(Option.empty[String]).toDF("t")
      .select(call_function("deflate_len", col("t"))).head()
    assert(r.isNullAt(0))
  }

  test("non-string input rejected at analysis") {
    intercept[Exception] {
      Seq(1L).toDF("t").select(call_function("deflate_len", col("t"))).head()
    }
  }
}
