package graft

import graft.operators.Corpus

/** Pins dd14's sliding-window span semantics on a constructed corpus
  * where the right answers are countable by hand: cross-doc duplicated
  * runs merge to their true word coverage at any alignment, within-doc
  * repeats count, unique docs report zero, short docs are excluded.
  */
class DupSpanSpec extends SparkSpecBase {
  import spark.implicits._

  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("cross-doc shared run, internal repeat, unique doc, short doc") {
    val shared = words("s", 10) // 10-word run shared by docs 2 and 3
    val p = words("p", 8)       // 8-word phrase repeated inside doc 4
    val docs = Seq(
      (1L, words("a", 20).mkString(" ")),                              // unique
      (2L, (shared ++ words("b", 10)).mkString(" ")),                  // shared prefix
      (3L, (shared ++ words("c", 12)).mkString(" ")),                  // same shared prefix
      (4L, (p ++ words("x", 5) ++ p ++ words("y", 3)).mkString(" ")),  // internal repeat
      (5L, words("z", 5).mkString(" "))                                // too short: excluded
    ).toDF("doc_id", "text")
    val out = Corpus.dupSpanCoverage(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    assert(!out.contains(5L), "docs under 8 words must be excluded")
    assert(out(1L) === ((20L, 0L, 0L, 0L)), "unique doc reports zero")
    // shared 10-word run → 8-grams at offsets 0,1,2 duplicated; merged
    // interval [0,10) → 10 covered words in each doc
    assert(out(2L) === ((20L, 3L, 10L, 500L)))
    assert(out(3L) === ((22L, 3L, 10L, 454L)))
    // p1..p8 at offsets 0 and 13 → 2 duplicated grams, two disjoint
    // islands [0,8) and [13,21) → 16 of 24 words covered
    assert(out(4L) === ((24L, 2L, 16L, 666L)))
  }

  test("overlapping islands never double-count coverage") {
    // doc 2 repeats a 9-word run of doc 1: grams at offsets 0 and 1 —
    // overlapping spans [0,8) and [1,9) must merge to 9, not 16
    val run = words("r", 9)
    val docs = Seq(
      (1L, (run ++ words("m", 6)).mkString(" ")),
      (2L, (words("n", 7) ++ run).mkString(" "))
    ).toDF("doc_id", "text")
    val out = Corpus.dupSpanCoverage(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((2L, 9L)))
    assert(out(2L) === ((2L, 9L)))
  }
}
