package graft

import graft.operators.Corpus

/** [[Corpus.trainBpeBatched]] must be rule-for-rule EQUAL to the
  * sequential [[Corpus.trainBpe]] — batching is a driver-round-count
  * optimization, never a semantics change. The exactness rule under
  * test: accept the maximal pairwise-disjoint prefix of the ranked pair
  * list, truncated to frequencies strictly above the first non-accepted
  * candidate. The adversarial corpus below is the tie case where plain
  * disjoint-prefix batching (no truncation) provably diverges.
  */
class BpeBatchSpec extends SparkSpecBase {
  import spark.implicits._

  private def rulesOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rank").collect().map(r =>
      (r.getAs[Int]("rank"), r.getAs[String]("left"), r.getAs[String]("right"),
        r.getAs[String]("merged"), r.getAs[Long]("freq"))).toSeq

  private def corpus(texts: Seq[String]) = texts.toDF("text")

  test("toy corpus: batched == sequential for every batch size") {
    val docs = corpus(Seq.fill(6)("low lower lowest") ++ Seq.fill(3)("new newer"))
    val seq = rulesOf(Corpus.trainBpe(docs, 10))
    for (b <- Seq(2, 4, 8, 16)) {
      assert(rulesOf(Corpus.trainBpeBatched(docs, 10, b)) === seq,
        s"batch=$b diverged")
    }
  }

  test("adversarial tie corpus (new-pair lex-beats a disjoint equal-freq " +
    "pair): truncation keeps batched == sequential") {
    // merging (a,z) births ("az", w) at freq N, which lexicographically
    // beats the disjoint (b,c) at the same freq — a batch that accepted
    // (b,c) alongside (a,z) would order the rules wrongly
    val docs = corpus(Seq.fill(5)("azw bc"))
    val seq = rulesOf(Corpus.trainBpe(docs, 6))
    for (b <- Seq(2, 4, 8)) {
      assert(rulesOf(Corpus.trainBpeBatched(docs, 6, b)) === seq,
        s"batch=$b diverged on the tie corpus")
    }
  }

  test("fully-disjoint pair table (no stopper): whole batch accepted in " +
    "one round, still equal") {
    val docs = corpus(Seq.fill(4)("ab") ++ Seq.fill(3)("cd") ++ Seq.fill(2)("ef"))
    val seq = rulesOf(Corpus.trainBpe(docs, 3))
    assert(rulesOf(Corpus.trainBpeBatched(docs, 3, 8)) === seq)
    assert(seq.map(_._2) === Seq("a", "c", "e")) // freq order 4, 3, 2
  }

  test("sf0.001 documents: batched(12) == sequential(12) at batch 4 and 8") {
    val docs = Tables.documents(spark, sf0001)
    val seq = rulesOf(Corpus.trainBpe(docs, 12))
    for (b <- Seq(4, 8)) {
      assert(rulesOf(Corpus.trainBpeBatched(docs, 12, b)) === seq,
        s"batch=$b diverged on the real corpus")
    }
  }

  test("early stop: single-char vocabulary yields no rules") {
    val docs = corpus(Seq("a b c", "a b"))
    assert(rulesOf(Corpus.trainBpeBatched(docs, 5, 4)).isEmpty)
  }

  test("merged-string collision corpus (two decompositions of the same " +
    "string): batched == sequential") {
    // r7 advice: two different merges can concatenate to the SAME string
    // (e.g. (a,bc) and (ab,c) both -> "abc"), and a created pair keyed by
    // that string would ADD to the existing symbol's counts instead of
    // starting at 0, voiding the batch's stopper bound. This corpus
    // plants both decomposition routes at once: "bc"-first words, plain
    // "ab" words, "abc" words, and longer carriers whose pair tables mix
    // all of {ab, bc, abc, a+bc, ab+c} across rounds with near-tie
    // frequencies — the shape the collision guard (doc rule 2) exists
    // for. Batched must stay rule-for-rule sequential.
    val docs = corpus(
      Seq.fill(9)("bc xbc bcd") ++ // (b,c) wins round 1 in these words
        Seq.fill(8)("ab ab dab") ++ // raw (a,b) elsewhere
        Seq.fill(7)("abc abc") ++ // contested: a+bc vs ab+c
        Seq.fill(6)("aabc zabc abcc") ++ // carriers exposing (z,abc)/(abc,c)
        Seq.fill(5)("abab bab"))
    val seq = rulesOf(Corpus.trainBpe(docs, 12))
    for (b <- Seq(2, 4, 8)) {
      assert(rulesOf(Corpus.trainBpeBatched(docs, 12, b)) === seq,
        s"batch=$b diverged on the collision corpus")
    }
  }

  test("randomized tiny-alphabet corpora: batched == sequential (seeded)") {
    // property-style sweep over {a,b,c} word soup: dense repeated
    // substrings maximize same-string re-derivations and tie plateaus;
    // any collision- or tie-induced divergence shows up as a rule
    // mismatch. Seeded for determinism.
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 2) {
      val words = Seq.fill(40)(
        (1 to (2 + rnd.nextInt(5))).map(_ => "abc" (rnd.nextInt(3))).mkString)
      val docs = corpus(Seq.fill(3)(words.mkString(" ")))
      val seq = rulesOf(Corpus.trainBpe(docs, 10))
      for (b <- Seq(3, 8)) {
        assert(rulesOf(Corpus.trainBpeBatched(docs, 10, b)) === seq,
          s"trial=$trial batch=$b diverged")
      }
    }
  }
}
