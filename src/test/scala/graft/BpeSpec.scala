package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** [[Corpus.trainBpe]] against an independent SEQUENTIAL reference:
  * plain-Scala BPE over a word-frequency map — same contract (pair
  * counts weight every adjacent occurrence by word frequency, argmax
  * tie-break freq DESC then left ASC then right ASC, greedy
  * left-to-right merge application), implemented with none of the
  * operator's machinery (no arrays-fold expression, no Spark at all).
  * Agreement on both a hand-checkable toy corpus and the real sf0.001
  * documents table pins the distributed loop end to end.
  */
class BpeSpec extends SparkSpecBase {

  /** Sequential reference: train n merges over (word -> count). */
  private def referenceBpe(words: Map[String, Long], n: Int): Seq[(Int, String, String, String, Long)] = {
    var segs: Map[Vector[String], Long] = words.toSeq
      .groupBy { case (w, _) => w.map(_.toString).toVector }
      .map { case (syms, ws) => syms -> ws.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var continue = true
    while (rank <= n && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + cnt
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), f) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        val m = l + r
        out += ((rank, l, r, m, f))
        segs = segs.toSeq.map { case (syms, cnt) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          for (s <- syms) {
            if (acc.nonEmpty && acc.last == l && s == r) { acc.remove(acc.length - 1); acc += m }
            else acc += s
          }
          (acc.toVector, cnt)
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        rank += 1
      }
    }
    out.toSeq
  }

  private def trained(df: org.apache.spark.sql.DataFrame, n: Int) =
    Corpus.trainBpe(df, n).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

  test("toy corpus: rules match the sequential reference exactly") {
    import spark.implicits._
    // classic BPE example shape: 'lo' dominates, then 'low', etc.
    val docs = Seq(
      "low low low lower lower newest newest newest newest widest",
      "widest widest low newest").toDF("text")
    val words = Seq("low" -> 4L, "lower" -> 2L, "newest" -> 5L, "widest" -> 3L).toMap
    val got = trained(docs, 8)
    val want = referenceBpe(words, 8)
    assert(got == want)
    // sanity on the first rule independently of the reference: 'es'
    // occurs in newest(5) + widest(3) = 8, the most frequent pair
    assert(got.head._5 == 8L && got.head._4 == (got.head._2 + got.head._3))
  }

  test("early stop: corpus of single-char words yields no rules") {
    import spark.implicits._
    val docs = Seq("a b a c", "b a").toDF("text")
    assert(trained(docs, 5).isEmpty)
  }

  test("merged symbols keep merging: repeated-char word chains correctly") {
    import spark.implicits._
    // "aaaa" x3: round 1 merges (a,a) greedily left-to-right -> [aa,aa],
    // round 2 merges (aa,aa) -> [aaaa]; the reference agrees by
    // construction, pin the exact chain explicitly too
    val docs = Seq("aaaa aaaa aaaa").toDF("text")
    val got = trained(docs, 3)
    val want = referenceBpe(Map("aaaa" -> 3L), 3)
    assert(got == want)
    assert(got.map(t => (t._2, t._3, t._5)) ==
      Seq(("a", "a", 9L), ("aa", "aa", 3L)))
  }

  test("sf0.001 documents: 10 rules match the sequential reference") {
    val docs = Tables.documents(spark, sf0001)
    val words = docs
      .select(explode(split(col("text"), " ")).as("wd"))
      .filter(length(col("wd")) >= 1)
      .groupBy("wd").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(trained(docs.select("text"), 10) == referenceBpe(words, 10))
  }

  test("encodeWord: greedy rank-ordered merges on a hand-checked case") {
    // rules: (a,b)->ab then (ab,c)->abc; "ababc" -> [ab, abc]... walk:
    // chars a b a b c; rule1 L-to-R: [ab, ab, c]; rule2: first ab+c? the
    // SECOND ab pairs with c -> [ab, abc]
    val rules = Seq(("a", "b", "ab"), ("ab", "c", "abc"))
    assert(Corpus.encodeWord("ababc", rules).toSeq === Seq("ab", "abc"))
    // a rule never re-fires across a merge it just produced
    assert(Corpus.encodeWord("aab", Seq(("a", "b", "ab"))).toSeq
      === Seq("a", "ab"))
    assert(Corpus.encodeWord("x", rules).toSeq === Seq("x"))
  }

  test("encoding the training corpus reproduces the training fold's segmentation") {
    val docs = Tables.documents(spark, sf0001)
    val rules = trained(docs.select("text"), 12)
      .map { case (_, l, r, m, _) => (l, r, m) }.toSeq
    // independent check: per word type, the imperative encoder's token
    // count equals the sequential reference fold applied rule by rule
    val words = docs.select(explode(split(col("text"), " ")).as("wd"))
      .filter(length(col("wd")) >= 1).distinct()
      .collect().map(_.getString(0))
    for (w <- words) {
      val ref = rules.foldLeft(w.map(_.toString).toVector) { case (syms, (l, r, m)) =>
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        for (s <- syms) {
          if (acc.nonEmpty && acc.last == l && s == r) { acc.remove(acc.length - 1); acc += m }
          else acc += s
        }
        acc.toVector
      }
      assert(Corpus.encodeWord(w, rules).toSeq === ref.toSeq, s"word $w")
    }
    // and the distributed per-doc counts agree with a direct recompute
    val got = Corpus.bpeTokenCounts(docs, rules).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val enc = words.map(w => w -> Corpus.encodeWord(w, rules).length.toLong).toMap
    import spark.implicits._
    val expect = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("wd"))
      .filter(length(col("wd")) >= 1)
      .as[(Long, String)].collect()
      .groupBy(_._1).map { case (id, ws) =>
        (id, ws.length.toLong, ws.map(t => enc(t._2)).sum)
      }.toSeq.sortBy(_._1)
    assert(got.toSeq === expect)
  }
}
