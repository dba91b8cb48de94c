package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators (round 4): passage-level duplication,
  * corpus-frequency token rarity, and source-mixture reweighting —
  * the three "shape the training distribution" steps that sit between
  * dedup (Dedup.scala) and packing (TextOps.scala) in a real pipeline.
  *
  * All three are integer-exact end to end (counts, `DIV` rationals) so
  * the DuckDB hash compare is a true equality — same discipline as
  * tx13/ev9 (SURVEY §5).
  *
  * Scale notes: every explode is scan-local; the only shuffles are (a)
  * fixed-width passage-hash / term keys and (b) per-doc reduction. No
  * corpus×corpus joins, no driver collects (the two `count()`s are
  * single-scalar actions, the same pattern tx13 uses for N).
  */
object Corpus {

  private val chunk = 5 // words per passage (docs are 10–99 words)

  /** Train `nMerges` BPE merge rules on the corpus — the ITERATIVE
    * outer loop whose inner aggregate is `tx26_bpe_pairs`. Works on
    * word TYPES weighted by frequency (the standard trick: the corpus
    * collapses to its vocabulary once, so every round's cost is
    * vocabulary-sized, not corpus-sized — at 100 TB the one type-count
    * aggregate is the only corpus pass). Per round: one pair-count
    * shuffle over the segmented vocab, a 1-ROW driver argmax (total
    * order: freq DESC, left ASC, right ASC — retry/partitioning
    * stable), then a greedy left-to-right merge applied scan-locally
    * via a codegen'd array fold; `localCheckpoint` keeps plan depth
    * constant like BFS/CC. Rounds are a driver concern (merge count,
    * typically 10k-100k, bounds iterations — never data volume).
    *
    * Returns (rank, left, right, merged, freq) — rank 1-based in merge
    * order. Stops early when no adjacent pair remains.
    */
  def trainBpe(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var segs = docs
      .select(explode(split(col("text"), " ")).as("wd"))
      .filter(length(col("wd")) >= 1)
      .groupBy("wd").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), expr(
        "transform(sequence(1, length(wd)), i -> substring(wd, i, 1))").as("syms"))
      .localCheckpoint(true)
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var done = false
    var rank = 1
    while (rank <= nMerges && !done) {
      val best = segs
        .filter(size(col("syms")) >= 2) // sequence(1, 0) counts DOWN
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
          .as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum("cnt").as("freq"))
        .orderBy(desc("freq"), col("l"), col("r"))
        .limit(1).collect() // ONE row — the argmax, like a BFS frontier count
      if (best.isEmpty) done = true
      else {
        val (l, r, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        val m = l + r
        rules += ((rank, l, r, m, f))
        // greedy left-to-right: a pair consumed by a merge can't also
        // pair with the preceding symbol — exactly the fold below
        // (the freshly-pushed merged symbol no longer equals `l`
        // unless the text really contains it again)
        val mergeFold = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, s) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
            .otherwise(concat(acc, array(s))))
        segs = segs.select(col("cnt"), mergeFold.as("syms")).localCheckpoint(true)
        rank += 1
      }
    }
    rules.toSeq.toDF("rank", "left", "right", "merged", "freq")
  }

  /** Batched [[trainBpe]]: up to `batch` merges per DRIVER ROUND-TRIP,
    * provably EQUAL to the sequential train (BpeBatchSpec pins it on
    * toy + adversarial + real corpora). Per round the top `batch`+1
    * pairs are collected once and the accepted set is chosen by an
    * exactness rule derived here, not the usual lossy heuristic:
    *
    *  1. accept the maximal PREFIX of the ranked list (freq DESC, l, r)
    *     whose members are pairwise symbol-disjoint — stop at the FIRST
    *     candidate sharing a symbol with an earlier acceptance;
    *  2. also stop at the FIRST candidate whose merged string l+r
    *     COLLIDES with an already-existing merged symbol (any prior
    *     round's rule, or an earlier acceptance this round);
    *  3. truncate acceptances to freq STRICTLY GREATER than the
    *     stopper's freq (the first non-accepted candidate, or the last
    *     collected row when the table is longer than the batch).
    *
    * Why that is exact: a merge p=(l,r)→m only (a) zeroes p, (b)
    * decreases pairs sharing a symbol with p, and (c) creates pairs
    * containing m whose frequency is bounded by some OLD pair of form
    * (z,l) or (r,z) — a conflicting pair. Under rule 1 every pair
    * ranked above the stopper is accepted-and-disjoint, so every
    * conflicting pair ranks at/below the stopper; rule 3 then makes
    * each later acceptance STRICTLY out-frequency every pair a prior
    * in-round merge can create or leave behind — no lexicographic tie
    * against a freshly-created multi-char symbol can flip the argmax
    * (ties are why prefix-disjointness ALONE is not exact: e.g.
    * N×"azw" + N×"bc" — merging (a,z) births ("az",w) at freq N, which
    * lex-beats the disjoint (b,c)). Rule 2 closes the one hole in (c):
    * pairs are keyed by SYMBOL STRING, so if m's string already names
    * an existing symbol (two decompositions of the same string, e.g.
    * (a,bc) in an earlier round and (ab,c) now), the created pairs ADD
    * to that symbol's existing pair counts instead of starting at 0
    * and the stopper bound no longer caps them. Initial symbols are
    * single characters and m is always ≥2 chars, so the risk set is
    * exactly the merged strings produced so far — a driver-side set,
    * no extra query. (We could not construct such a collision under
    * this greedy-global-fold semantics — the two decompositions
    * compete for the same characters at rule-application time — but
    * the guard costs one hash probe and makes the proof independent
    * of that conjecture.) If truncation or a first-candidate collision
    * empties the batch, the round falls back to the plain argmax,
    * which is sequential by definition. Worst case (flat tie plateaus)
    * degrades to 1 merge/round — never to a wrong rule; on Zipfian
    * corpora the round count drops ~`batch`-fold: a 32k-merge
    * production train at batch=16 is ~2k driver round-trips instead
    * of 32k.
    */
  def trainBpeBatched(docs: DataFrame, nMerges: Int, batch: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var segs = docs
      .select(explode(split(col("text"), " ")).as("wd"))
      .filter(length(col("wd")) >= 1)
      .groupBy("wd").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), expr(
        "transform(sequence(1, length(wd)), i -> substring(wd, i, 1))").as("syms"))
      .localCheckpoint(true)
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    // every merged string materialized so far — the collision-guard risk
    // set of doc rule 2 (initial symbols are single chars, m is ≥2 chars)
    val mergedStrings = scala.collection.mutable.Set.empty[String]
    var done = false
    var rank = 1
    while (rank <= nMerges && !done) {
      val want = math.min(batch, nMerges - rank + 1)
      val top = segs
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
          .as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum("cnt").as("freq"))
        .orderBy(desc("freq"), col("l"), col("r"))
        .limit(want + 1).collect() // batch candidates + the stopper probe
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val roundMerged = scala.collection.mutable.Set.empty[String]
        val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var stopper: Option[Long] = None
        var i = 0
        while (i < math.min(want, top.length) && stopper.isEmpty) {
          val (l, r, f) =
            (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          // doc rule 2: a merged string naming an existing symbol (prior
          // round or earlier this round) voids the created-pair bound —
          // stop the batch here, same as a shared-symbol conflict
          if (used(l) || used(r) || mergedStrings(l + r) || roundMerged(l + r))
            stopper = Some(f)
          else { acc += ((l, r, f)); used += l; used += r; roundMerged += (l + r) }
          i += 1
        }
        // table longer than the batch: the unseen tail bounds at row want
        if (stopper.isEmpty && top.length > want)
          stopper = Some(top(want).getLong(2))
        val truncated = stopper match {
          case Some(sf) => acc.takeWhile(_._3 > sf).toSeq
          case None => acc.toSeq // whole pair table is disjoint — no new
                                 // pair can form (its (z,l)/(r,z) source
                                 // would be a conflicting table row)
        }
        val accepted =
          if (truncated.nonEmpty) truncated
          else
            // single-merge fallback — the plain argmax is sequential by
            // definition. Taken from top(0), not acc, because a FIRST-
            // candidate collision (doc rule 2) leaves acc empty; the
            // colliding argmax is safe to merge alone (nothing later in
            // the round depends on the stopper bound it voids).
            Seq((top(0).getString(0), top(0).getString(1), top(0).getLong(2)))
        accepted.foreach { case (l, r, f) =>
          rules += ((rank, l, r, l + r, f)); mergedStrings += (l + r); rank += 1
        }
        val folded = accepted.foldLeft(col("syms")) { case (c, (l, r, _)) =>
          aggregate(c,
            array().cast("array<string>"),
            (a, s) => when(
              size(a) > 0 && element_at(a, -1) === lit(l) && s === lit(r),
              concat(slice(a, lit(1), size(a) - 1), array(lit(l + r))))
              .otherwise(concat(a, array(s))))
        }
        segs = segs.select(col("cnt"), folded.as("syms")).localCheckpoint(true)
      }
    }
    rules.toSeq.toDF("rank", "left", "right", "merged", "freq")
  }

  /** Greedy left-to-right application of ONE merge rule to a symbol
    * array — the SAME semantics as [[trainBpe]]'s in-loop fold (a pair
    * consumed by a merge can't also pair with the preceding symbol), in
    * plain Scala for the encoder path. */
  private[graft] def applyRule(syms: Array[String], l: String, r: String,
                                   m: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out.last == l && syms(i) == r) {
        out(out.length - 1) = m
      } else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** Encode one word under the trained rules (rank order, one greedy
    * pass per rule — bit-for-bit the training semantics, so encoding
    * the training corpus reproduces training's final segmentation). */
  private[graft] def encodeWord(wd: String,
                                    rules: Seq[(String, String, String)]): Array[String] =
    rules.foldLeft(wd.map(_.toString).toArray) { case (syms, (l, r, m)) =>
      applyRule(syms, l, r, m)
    }

  /** Tokenize the corpus under trained BPE rules: (doc_id, n_words,
    * n_bpe_tokens). The imperative encoder runs on DISTINCT WORD TYPES
    * (the same vocabulary-collapse trick training uses — at 100 TB the
    * corpus is touched once for type counts and once for the final
    * per-doc reduction; the rule loop, the only non-declarative part,
    * runs over |vocab| rows and rides mapPartitions because Catalyst
    * has no rank-ordered-merge equivalent). The per-type token counts
    * re-enter as a broadcast join. Rule lists are bounded model state
    * (10k-100k in production) — task-closure size, not data. */
  def bpeTokenCounts(docs: DataFrame, rules: Seq[(String, String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dtc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("wd"))
      .filter(length(col("wd")) >= 1)
      .groupBy("doc_id", "wd").agg(count(lit(1)).as("cdw"))
      .localCheckpoint(true) // type frame + per-doc reduction both consume it
    val types = dtc.select("wd").distinct().as[String]
      .mapPartitions(_.map(wd => (wd, encodeWord(wd, rules).length.toLong)))
      .toDF("wd", "n_tok")
    dtc.join(broadcast(types), Seq("wd"))
      .groupBy("doc_id")
      .agg(sum("cdw").as("n_words"),
        sum(col("cdw") * col("n_tok")).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** dd14's engine — sliding duplicated-`n`-gram span coverage over a
    * `(doc_id, text)` frame (see the catalog entry's Scaladoc for the
    * algorithm and scale shape). Factored out so specs can drive it
    * with constructed corpora. */
  /** `(doc_id, n_words, l)` for docs long enough to carry an n-gram.
    * Checkpoint only when BOTH the gram explode and the final report
    * will consume it — [[DupSpanIndex.append]] reads it exactly once,
    * and eagerly caching a whole tokenized ingest batch for a single
    * pass is pure memory pressure. */
  private[graft] def gramBase(docs: DataFrame, n: Int,
                              checkpoint: Boolean = true): DataFrame = {
    val base = docs
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      .filter(size(col("l")) >= n)
      .select(col("doc_id"), size(col("l")).cast("long").as("n_words"),
        col("l"))
    if (checkpoint) base.localCheckpoint(true) else base
  }

  /** Scan-local sliding-gram explode of a [[gramBase]] frame:
    * `(doc_id, i, ph)` — word offset + 16-byte gram hash; text never
    * leaves the scan. */
  private[graft] def gramFrame(base: DataFrame, n: Int): DataFrame =
    base.select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(l) - $n), " +
          s"i -> struct(i, md5(array_join(slice(l, i+1, $n), ' ')) AS ph))"))
        .as("gp"))
      .select(col("doc_id"), col("gp.i").as("i"), col("gp.ph").as("ph"))

  /** The island/coverage half of dd14: given duplicated positions
    * `(doc_id, i)` and the [[gramBase]] frame, interval-merge the spans
    * and report per-doc coverage. Shared by the one-shot operator and
    * [[DupSpanIndex]]'s per-ingest report. */
  private[graft] def coverageFromDup(dup0: DataFrame, base: DataFrame,
                                     n: Int): DataFrame = {
    val dup = dup0.localCheckpoint(true) // island window + dup count both consume it
    val wDoc = Window.partitionBy("doc_id").orderBy("i")
    val isl = dup
      .withColumn("pm", max(col("i") + n)
        .over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("isle", sum(
        when(col("pm").isNull || col("i") > col("pm"), 1L).otherwise(0L))
        .over(wDoc))
    val cov = isl.groupBy("doc_id", "isle")
      .agg((max(col("i") + n) - min(col("i"))).as("ce"))
      .groupBy("doc_id")
      .agg(sum("ce").cast("long").as("covered_words"))
    val dupN = dup.groupBy("doc_id").agg(count(lit(1)).as("dup_ngrams"))
    base.select(col("doc_id"), col("n_words"))
      .join(dupN, Seq("doc_id"), "left")
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("dup_ngrams"), lit(0L)).as("dup_ngrams"),
        coalesce(col("covered_words"), lit(0L)).as("covered_words"),
        expr("(coalesce(covered_words, 0L) * 1000) DIV n_words")
          .as("covered_permille"))
      .orderBy("doc_id")
  }

  private[graft] def dupSpanCoverage(docs: DataFrame, n: Int = 8): DataFrame = {
    val base = gramBase(docs, n)
    val g = gramFrame(base, n)
      .localCheckpoint(true) // occurrence count + dup join both consume it
    val pc = g.groupBy("ph").agg(count(lit(1)).as("occ"))
    val dup = g.join(pc, Seq("ph")).filter(col("occ") >= 2)
      .select(col("doc_id"), col("i"))
    coverageFromDup(dup, base, n)
  }

  val catalog: Seq[Q] = Seq(
    // L28 — passage-level duplication (sub-document dedup): split each
    // doc into consecutive 5-word passages, count how many of a doc's
    // passages also appear in ≥1 OTHER doc, report the all-integer
    // duplication permille. The passage join shuffles md5 HASHES, not
    // passage text (at 100 TB the text never leaves the scan; xxhash64
    // would be the production key — md5 here because DuckDB ships it).
    Q(
      "dd8_passage_dup",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |           WHERE len(string_split(text, ' ')) >= $chunk),
        |  ch AS (SELECT doc_id,
        |           md5(array_to_string(l[i*$chunk+1 : i*$chunk+$chunk], ' ')) AS ph
        |         FROM t, LATERAL (SELECT unnest(range(0, len(l) // $chunk)) AS i) s),
        |  pc AS (SELECT ph, count(DISTINCT doc_id) AS nd FROM ch GROUP BY 1),
        |  agg AS (SELECT doc_id, count(*) AS n_chunks,
        |            sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS dup_chunks
        |          FROM ch JOIN pc USING (ph) GROUP BY 1)
        |SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
        |  CAST(dup_chunks AS BIGINT) AS dup_chunks,
        |  (CAST(dup_chunks AS BIGINT) * 1000) // CAST(n_chunks AS BIGINT)
        |    AS dup_permille
        |FROM agg ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val ch = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= chunk)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(0, size(l) DIV $chunk - 1), " +
            s"i -> md5(array_join(slice(l, i*$chunk+1, $chunk), ' ')))")).as("ph"))
        .localCheckpoint(true) // passage-count agg + join both consume it
      val pc = ch.groupBy("ph").agg(countDistinct(col("doc_id")).as("nd"))
      ch.join(pc, Seq("ph"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("dup_chunks"))
        .select(col("doc_id"), col("n_chunks"), col("dup_chunks"),
          expr("(dup_chunks * 1000) DIV n_chunks").as("dup_permille"))
        .orderBy("doc_id")
    },

    // L29 — corpus-frequency token rarity (the integer-exact surrogate
    // for unigram-LM perplexity): rarity6(term) = (T·10^6) DIV ctf —
    // a monotone transform of 1/p(term), same trick as tx13's idf —
    // and a doc's score is the integer mean over its token OCCURRENCES.
    // High avg_rarity6 = surprising/rare vocabulary, the perplexity
    // quality-filter signal without a single float.
    Q(
      "tx16_token_rarity",
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |            FROM documents),
        |  t2 AS (SELECT doc_id, term FROM tk WHERE term <> ''),
        |  ctf AS (SELECT term, count(*) AS ctf FROM t2 GROUP BY 1),
        |  tot AS (SELECT count(*) AS t FROM t2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum((tot.t * 1000000) // ctf.ctf) AS BIGINT)
        |    // CAST(count(*) AS BIGINT) AS avg_rarity6
        |FROM t2 JOIN ctf USING (term) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .localCheckpoint(true) // total count + ctf agg + score join
      val t = tk.count()
      // vocabulary-sized frame; shuffle-joined on term (linear — at real
      // scale the vocab outgrows a broadcast)
      val ctf = tk.groupBy("term").agg(count(lit(1)).as("ctf"))
      tk.join(ctf, Seq("term"))
        .withColumn("r6", expr(s"(${t}L * 1000000L) DIV ctf"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("r6")).as("sr"))
        .select(col("doc_id"), col("n_tokens"),
          expr("sr DIV n_tokens").as("avg_rarity6"))
        .orderBy("doc_id")
    },

    // L30 — source-mixture reweighting: the per-source sampling weight
    // that rebalances the corpus to a uniform target mix. weight6 =
    // (target·10^6) DIV actual with target = total DIV n_sources — all
    // integer, so downstream samplers (tx12's salted hash-range test)
    // can consume the weights deterministically. One tiny agg + a 1-row
    // broadcast; the corpus is touched once.
    Q(
      "tx17_source_mixture",
      """WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |  t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
        |          CAST(count(*) AS BIGINT) AS k FROM s)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |  ((total // k) * 1000000) // CAST(n_docs AS BIGINT) AS weight6
        |FROM s CROSS JOIN t ORDER BY source""".stripMargin
    ) { (s, d) =>
      val bySrc = Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
        .localCheckpoint(true) // totals agg + weight projection
      val tot = bySrc.agg(sum(col("n_docs")).as("total"),
        count(lit(1)).cast("long").as("k"))
      bySrc.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"),
          expr("((total DIV k) * 1000000) DIV n_docs").as("weight6"))
        .orderBy("source")
    },

    // L44 — mixture-divergence diagnostics: per source, the Shannon
    // entropy (bits) of its language distribution and its KL divergence
    // from the corpus-wide language mix — the "is this source skewing
    // the blend" dashboard numbers behind tx17's reweighting. All
    // aggregation is exact integer counts on a |sources|×|langs| frame
    // (the corpus is touched ONCE); the transcendental terms are then
    // computed per cell and MICRO-QUANTIZED (round(1e6·term) as BIGINT)
    // so the per-source sum is order-invariant — partition layout cannot
    // change the answer. Cross-engine parity rests on both libms
    // rounding log2 to the same double (term counts are small integers;
    // a disagreement needs an exact .5 boundary hit after a ≤1-ulp log
    // difference — q47's documented probabilistic-parity license).
    Q(
      "tx19_source_entropy",
      """WITH c AS (SELECT source, lang, count(*) AS cnt FROM documents GROUP BY 1,2),
        |s AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS ns FROM c GROUP BY 1),
        |l AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS cl FROM c GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |term AS (
        |  SELECT source, ns,
        |    CAST(round(1000000 * (CAST(cnt AS DOUBLE)/ns)
        |        * log2(CAST(ns AS DOUBLE)/cnt)) AS BIGINT) AS hq,
        |    CAST(round(1000000 * (CAST(cnt AS DOUBLE)/ns)
        |        * log2((CAST(cnt AS DOUBLE)*n)/(CAST(ns AS DOUBLE)*cl))) AS BIGINT) AS kq
        |  FROM c JOIN s USING (source) JOIN l USING (lang) CROSS JOIN t)
        |SELECT source, ns AS n_docs,
        |  CAST(sum(hq) AS DOUBLE)/1000000 AS entropy_bits,
        |  CAST(sum(kq) AS DOUBLE)/1000000 AS kl_bits
        |FROM term GROUP BY source, ns ORDER BY source""".stripMargin
    ) { (s, d) =>
      val cts = Tables.documents(s, d)
        .groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // cells frame feeds three tiny aggregates
      val bySrc = cts.groupBy("source").agg(sum("cnt").as("ns"))
      val byLang = cts.groupBy("lang").agg(sum("cnt").as("cl"))
      val tot = cts.agg(sum("cnt").as("n"))
      val p = col("cnt").cast("double") / col("ns")
      cts.join(broadcast(bySrc), Seq("source"))
        .join(broadcast(byLang), Seq("lang"))
        .crossJoin(broadcast(tot))
        .select(col("source"), col("ns"),
          round(lit(1000000) * p * log2(col("ns").cast("double") / col("cnt")))
            .cast("long").as("hq"),
          round(lit(1000000) * p
              * log2((col("cnt").cast("double") * col("n"))
                / (col("ns").cast("double") * col("cl"))))
            .cast("long").as("kq"))
        .groupBy(col("source"), col("ns").as("n_docs"))
        .agg((sum("hq").cast("double") / 1000000).as("entropy_bits"),
          (sum("kq").cast("double") / 1000000).as("kl_bits"))
        .orderBy("source")
    },

    // L46 — vocabulary build + out-of-vocabulary rate: the top-V corpus
    // terms (deterministic tie-break: count DESC, term ASC) become the
    // vocab; per language, the permille of token occurrences falling
    // outside it — the coverage number that decides V before tokenizer
    // training. Shuffle shape: one term-count aggregate; the V-row vocab
    // comes back as a BROADCAST left join (never a shuffle of the token
    // frame against it); top-V is TakeOrderedAndProject (k rows per map
    // task, no global sort). All-integer output (permille via DIV).
    Q(
      "tx20_vocab_oov",
      """WITH tk AS (
        |  SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |    AS term
        |  FROM documents),
        |vocab AS (
        |  SELECT term FROM (SELECT term, count(*) AS cnt FROM tk GROUP BY 1)
        |  QUALIFY row_number() OVER (ORDER BY cnt DESC, term) <= 256),
        |mk AS (
        |  SELECT lang, CASE WHEN term IN (SELECT term FROM vocab) THEN 0 ELSE 1 END AS oov
        |  FROM tk)
        |SELECT lang, count(*) AS n_tokens,
        |  CAST(sum(oov) AS BIGINT) AS n_oov,
        |  (CAST(sum(oov) AS BIGINT) * 1000) // count(*) AS oov_permille
        |FROM mk GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        // consumed by BOTH the vocab aggregate and the OOV join — without
        // the pin the corpus tokenizes twice
        .localCheckpoint(true)
      val vocab = tk.groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term")).limit(256)
        .select(col("term"), lit(1).as("in_v"))
      tk.join(broadcast(vocab), Seq("term"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("lang"), col("n_tokens"), col("n_oov"),
          expr("(n_oov * 1000) DIV n_tokens").as("oov_permille"))
        .orderBy("lang")
    },

    // L42 — the full corpus-preparation pipeline as ONE declarative
    // plan: quality gate (length + type-token ratio) → exact dedup
    // (min-id per normalized hash) → overlapping chunking (tx18's
    // windows) → deterministic global order (content-hash, tx7's
    // retry-stable trick) → per-language token packing into 64-token
    // bins (tx8's running-sum window). Every stage is individually
    // oracle-checked elsewhere; this entry proves they COMPOSE — no
    // materialization barriers, Catalyst owns the whole tree. Scale
    // shape: gate + hash scan-local; dedup one hash-key window; chunk
    // explode scan-local; packing one lang-key window; output is
    // bin-aggregated (bounded), not chunk-sized.
    Q(
      "pp3_corpus_pipeline",
      """WITH gated AS (
        |  SELECT doc_id, lang, trim(text) AS t FROM documents
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 30
        |    AND 10 * len(list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')))
        |        >= 3 * len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        |),
        |ded AS (
        |  SELECT doc_id, lang, t FROM gated
        |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(lower(t)))
        |),
        |toks AS (SELECT doc_id, lang, string_split_regex(t, '\s+') AS ws FROM ded),
        |n AS (SELECT doc_id, lang, ws,
        |        greatest(1, CAST(ceil((len(ws) - 5) / 15.0) AS BIGINT)) AS nc FROM toks),
        |chunks AS (
        |  SELECT doc_id, lang, i AS chunk_idx,
        |    array_to_string(ws[i*15+1 : i*15+20], ' ') AS chunk
        |  FROM n, LATERAL (SELECT unnest(range(0, nc)) AS i) s),
        |counted AS (
        |  SELECT lang, doc_id, chunk_idx,
        |    CAST(len(string_split_regex(chunk, '\s+')) AS BIGINT) AS n_tok,
        |    md5(concat(CAST(doc_id AS VARCHAR), ':', CAST(chunk_idx AS VARCHAR))) AS ok
        |  FROM chunks),
        |packed AS (
        |  SELECT lang, n_tok,
        |    (sum(n_tok) OVER (PARTITION BY lang ORDER BY ok, doc_id, chunk_idx
        |                      ROWS UNBOUNDED PRECEDING) - n_tok) // 64 AS bin
        |  FROM counted)
        |SELECT lang, CAST(bin AS BIGINT) AS bin, count(*) AS n_chunks,
        |  CAST(sum(n_tok) AS BIGINT) AS bin_tokens
        |FROM packed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val spaceToks = filter(split(lower(col("text")), " "), t => t =!= "")
      val gated = Tables.documents(s, d)
        .filter(size(split(trim(col("text")), "\\s+")) >= 30)
        .filter(lit(10) * size(array_distinct(spaceToks)) >= lit(3) * size(spaceToks))
        .select(col("doc_id"), col("lang"), trim(col("text")).as("t"))
      val wDup = Window.partitionBy(md5(lower(col("t"))))
      val ded = gated
        .withColumn("keep", min(col("doc_id")).over(wDup))
        .filter(col("doc_id") === col("keep"))
      // SHARED chunker (TextOps.chunked) — one copy of the 20/15 recipe
      // for tx18 and this composition, so the stages cannot drift
      val counted = TextOps.chunked(
          ded.select(col("doc_id"), col("lang"), col("t")), col("t"))
        .select(col("lang"), col("doc_id"), col("chunk_idx"),
          size(split(col("chunk"), "\\s+")).cast("long").as("n_tok"),
          md5(concat(col("doc_id").cast("string"), lit(":"),
            col("chunk_idx").cast("string"))).as("ok"))
      val wPack = Window.partitionBy(col("lang"))
        .orderBy(col("ok"), col("doc_id"), col("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      counted
        .withColumn("cum", sum(col("n_tok")).over(wPack))
        .withColumn("bin", expr("(cum - n_tok) DIV 64"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_chunks"), sum(col("n_tok")).as("bin_tokens"))
        .orderBy("lang", "bin")
    },

    // L49 — vocabulary growth curve (Heaps-law readout): how fast the
    // corpus keeps meeting NEW terms as it is consumed in doc_id order —
    // the "is more data still adding vocabulary" saturation signal that
    // sizes tokenizer training (tx20's vocab) and data-collection
    // stopping rules. Each term contributes only its FIRST document
    // (min(doc_id) — one vocabulary-sized aggregate), docs are split
    // into 10 integer id-range slices via a broadcast 1-row max, and the
    // cumulative vocabulary is a window over the 10-row slice frame.
    // All integers end to end.
    Q(
      "tx22_vocab_growth",
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |            FROM documents),
        |t2 AS (SELECT doc_id, term FROM tk WHERE term <> ''),
        |ft AS (SELECT term, min(doc_id) AS first_doc FROM t2 GROUP BY 1),
        |mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        |sl AS (SELECT (first_doc * 10) // m AS slice, count(*) AS new_terms
        |       FROM ft CROSS JOIN mx GROUP BY 1)
        |SELECT slice, CAST(new_terms AS BIGINT) AS new_terms,
        |  CAST(sum(new_terms) OVER (ORDER BY slice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_vocab
        |FROM sl ORDER BY slice""".stripMargin
    ) { (s, d) =>
      val t2 = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
      val ft = t2.groupBy("term").agg(min("doc_id").as("first_doc"))
      val mx = Tables.documents(s, d).agg((max("doc_id") + 1).as("m"))
      val sl = ft.crossJoin(broadcast(mx))
        .groupBy(expr("(first_doc * 10) DIV m").as("slice"))
        .agg(count(lit(1)).as("new_terms"))
      // 10-row frame: the global window is bounded by construction
      sl.withColumn("cum_vocab",
          sum("new_terms").over(Window.orderBy("slice")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("slice")
    },

    // L50 — Zipf rank-frequency slope: OLS fit of log2(freq) on
    // log2(rank) over the top-V terms. Natural text sits near −1;
    // a flat slope flags templated/synthetic corpora, a cliff flags
    // boilerplate domination — the one-number distribution-shape
    // diagnostic next to tx22's growth curve. The term-count aggregate
    // is the only corpus-sized shuffle; top-V is TakeOrderedAndProject
    // (k rows per map task) and the regression runs on the V-row frame
    // (rank window on ≤V rows, documented bounded). Per tx19's
    // discipline, each per-term transcendental TERM is micro-quantized
    // (round(1e6·v) AS BIGINT) so the sums are order-invariant longs,
    // and the final slope/intercept is ONE double tree over them.
    Q(
      "tx23_zipf_slope",
      """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |tc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM tk
        |       WHERE term <> '' GROUP BY 1),
        |top AS (SELECT term, cnt FROM tc
        |        QUALIFY row_number() OVER (ORDER BY cnt DESC, term) <= 200),
        |rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rnk
        |       FROM top),
        |q AS (SELECT
        |    CAST(round(1000000 * log2(CAST(rnk AS DOUBLE))) AS BIGINT) AS qx,
        |    CAST(round(1000000 * log2(CAST(cnt AS DOUBLE))) AS BIGINT) AS qy,
        |    CAST(round(1000000 * log2(CAST(rnk AS DOUBLE))
        |         * log2(CAST(cnt AS DOUBLE))) AS BIGINT) AS qxy,
        |    CAST(round(1000000 * log2(CAST(rnk AS DOUBLE))
        |         * log2(CAST(rnk AS DOUBLE))) AS BIGINT) AS qx2
        |  FROM rk)
        |SELECT count(*) AS n_terms,
        |  (CAST(count(*) AS DOUBLE) * (CAST(sum(qxy) AS DOUBLE) * 0.000001)
        |   - (CAST(sum(qx) AS DOUBLE) * 0.000001) * (CAST(sum(qy) AS DOUBLE) * 0.000001))
        |  / (CAST(count(*) AS DOUBLE) * (CAST(sum(qx2) AS DOUBLE) * 0.000001)
        |   - (CAST(sum(qx) AS DOUBLE) * 0.000001) * (CAST(sum(qx) AS DOUBLE) * 0.000001))
        |  AS zipf_slope
        |FROM q""".stripMargin
    ) { (s, d) =>
      val tc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      val top = tc.orderBy(desc("cnt"), col("term")).limit(200)
      val rk = top.withColumn("rnk",
        row_number().over(Window.orderBy(desc("cnt"), col("term"))))
      val lx = log2(col("rnk").cast("double"))
      val ly = log2(col("cnt").cast("double"))
      val q = rk.select(
        round(lit(1000000) * lx).cast("long").as("qx"),
        round(lit(1000000) * ly).cast("long").as("qy"),
        round(lit(1000000) * lx * ly).cast("long").as("qxy"),
        round(lit(1000000) * lx * lx).cast("long").as("qx2"))
      q.agg(count(lit(1)).as("n_terms"),
          sum("qx").as("sqx"), sum("qy").as("sqy"),
          sum("qxy").as("sqxy"), sum("qx2").as("sqx2"))
        .select(col("n_terms"),
          ((col("n_terms").cast("double") * (col("sqxy").cast("double") * lit(0.000001))
            - (col("sqx").cast("double") * lit(0.000001))
              * (col("sqy").cast("double") * lit(0.000001)))
          / (col("n_terms").cast("double") * (col("sqx2").cast("double") * lit(0.000001))
            - (col("sqx").cast("double") * lit(0.000001))
              * (col("sqx").cast("double") * lit(0.000001)))).as("zipf_slope"))
    },

    // L51 — lexical-complexity profile per language: mean word length,
    // vowel-group rate (the classic syllables-per-word proxy), and the
    // long-word share — the reading-level features a quality classifier
    // consumes when real punctuation (tx3's signal) is absent. Every
    // numerator/denominator is an exact integer sum — vowel groups are
    // counted by pure LENGTH ARITHMETIC on two regexp_replace forms
    // (never an explode per character) — and the two ratios are single
    // double divisions over the aggregated bigints; the long-word share
    // stays all-integer (permille via DIV). One token explode feeds the
    // long-word count; everything else is scan-local per document.
    Q(
      "tx24_lexical_complexity",
      """WITH perdoc AS (
        |  SELECT lang,
        |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS words,
        |    length(replace(text, ' ', '')) AS chars,
        |    length(regexp_replace(lower(text), '[aeiou]+', '#', 'g'))
        |      - length(regexp_replace(lower(text), '[aeiou]+', '', 'g')) AS vgroups
        |  FROM documents),
        |agg AS (
        |  SELECT lang, CAST(sum(words) AS BIGINT) AS w,
        |    CAST(sum(chars) AS BIGINT) AS c, CAST(sum(vgroups) AS BIGINT) AS v
        |  FROM perdoc GROUP BY 1),
        |lw AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS nlong FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE length(term) > 5 GROUP BY 1)
        |SELECT lang, w AS n_words,
        |  CAST(c AS DOUBLE) / CAST(w AS DOUBLE) AS avg_word_len,
        |  CAST(v AS DOUBLE) / CAST(w AS DOUBLE) AS syllables_per_word,
        |  nlong * 1000 // w AS long_permille
        |FROM agg JOIN lw USING (lang) ORDER BY lang""".stripMargin
    ) { (s, d) =>
      val lo = lower(col("text"))
      val perdoc = Tables.documents(s, d).select(col("lang"),
        size(filter(split(col("text"), " "), x => x =!= "")).as("words"),
        length(regexp_replace(col("text"), " ", "")).as("chars"),
        (length(regexp_replace(lo, "[aeiou]+", "#"))
          - length(regexp_replace(lo, "[aeiou]+", ""))).as("vgroups"))
      val agg = perdoc.groupBy("lang")
        .agg(sum("words").as("w"), sum("chars").as("c"), sum("vgroups").as("v"))
      val lw = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 5)
        .groupBy("lang").agg(count(lit(1)).as("nlong"))
      agg.join(lw, Seq("lang"))
        .select(col("lang"), col("w").as("n_words"),
          (col("c").cast("double") / col("w").cast("double")).as("avg_word_len"),
          (col("v").cast("double") / col("w").cast("double")).as("syllables_per_word"),
          expr("nlong * 1000 DIV w").as("long_permille"))
        .orderBy("lang")
    },

    // L54 — population stability index between corpus snapshots (the
    // ML-ops drift gate: "did the mix shift since the last training
    // cut"). Snapshots = doc_id halves (the deterministic stand-in for
    // two ingest cuts); per (source, lang) cell, PSI term =
    // (pA−pB)·ln(pA/pB) over the two snapshots' cell shares. Counts are
    // exact integers on a |sources×langs| frame (corpus touched once);
    // each transcendental term is micro-quantized to a 1e6-unit BIGINT
    // (tx19's order-invariance discipline), summed exactly, ONE double
    // at the end. PSI < 0.1 = stable, > 0.25 = drifted — the report
    // carries the raw value, the thresholds are the consumer's.
    Q(
      "tx25_psi_drift",
      """WITH mx AS (SELECT (max(doc_id) + 1) // 2 AS half FROM documents),
        |c AS (
        |  SELECT source, lang,
        |    CAST(sum(CASE WHEN doc_id < half THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN doc_id >= half THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM documents CROSS JOIN mx GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cb) AS BIGINT) AS tb
        |      FROM c),
        |q AS (
        |  SELECT CAST(round(1000000 *
        |      (CAST(ca AS DOUBLE)/ta - CAST(cb AS DOUBLE)/tb)
        |      * ln((CAST(ca AS DOUBLE)*tb) / (CAST(cb AS DOUBLE)*ta))) AS BIGINT)
        |    AS term
        |  FROM c CROSS JOIN t WHERE ca > 0 AND cb > 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(CAST(sum(term) AS BIGINT) AS DOUBLE) / 1000000 AS psi
        |FROM q""".stripMargin
    ) { (s, d) =>
      val mx = Tables.documents(s, d)
        .agg(expr("(max(doc_id) + 1) DIV 2").as("half"))
      val c = Tables.documents(s, d).crossJoin(broadcast(mx))
        .groupBy("source", "lang")
        .agg(sum(when(col("doc_id") < col("half"), 1L).otherwise(0L)).as("ca"),
          sum(when(col("doc_id") >= col("half"), 1L).otherwise(0L)).as("cb"))
        .localCheckpoint(true) // totals + term projection
      val t = c.agg(sum("ca").as("ta"), sum("cb").as("tb"))
      c.crossJoin(broadcast(t))
        .filter(col("ca") > 0 && col("cb") > 0)
        .select(round(lit(1000000) *
            (col("ca").cast("double") / col("ta") - col("cb").cast("double") / col("tb"))
            * log((col("ca").cast("double") * col("tb"))
              / (col("cb").cast("double") * col("ta"))))
          .cast("long").as("term"))
        .agg(count(lit(1)).as("n_cells"),
          (sum("term").cast("double") / lit(1000000)).as("psi"))
    },

    // L56 — BPE merge-pair statistics: the inner aggregate of byte-pair
    // tokenizer training — the most frequent ADJACENT symbol pairs
    // within words decide the next merge rule, and at 100 TB this count
    // IS the training job (the merge loop re-runs it on re-segmented
    // text; one iteration shown, the loop is a driver concern like
    // BFS/CC rounds). Scan-local double explode (words, then in-word
    // adjacent pairs via transform over an index sequence — no
    // per-character shuffle), ONE pair-count aggregate, top-30 under a
    // total order. Words shorter than 2 chars are excluded EXPLICITLY
    // on both engines (Spark's sequence(1, 0) counts DOWN rather than
    // emitting empty — the guard is semantic, not just tidy).
    Q(
      "tx26_bpe_pairs",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS wd FROM documents),
        |p AS (SELECT substring(wd, i, 2) AS pair
        |      FROM w, LATERAL (SELECT unnest(range(1, length(wd))) AS i) s
        |      WHERE length(wd) >= 2)
        |SELECT pair, CAST(count(*) AS BIGINT) AS cnt
        |FROM p GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 30""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("wd"))
        .filter(length(col("wd")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(wd) - 1), i -> substring(wd, i, 2))"))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("pair")).limit(30)
    },

    // L57 — per-document unigram cross-entropy (the perplexity-style
    // quality filter): score each document by its mean token surprisal
    // under the corpus's own unigram model — the CCNet-family signal
    // that separates fluent text from boilerplate/noise without any
    // external model. Shuffle shape: ONE (doc, term) aggregate, ONE
    // vocabulary-sized term aggregate re-entering as a broadcast join;
    // the corpus total is a broadcast 1-row scalar. Per-term log terms
    // are micro-quantized to 1e6-unit BIGINTs (tx19 discipline) and
    // scaled by the EXACT integer in-doc count, so per-doc sums are
    // order-invariant across partitionings; bits_per_token is the one
    // double division at the end.
    Q(
      "tx27_doc_surprisal",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |dtc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cdw
        |        FROM tok WHERE length(w) >= 1 GROUP BY 1, 2),
        |cw AS (SELECT w, CAST(sum(cdw) AS BIGINT) AS cw FROM dtc GROUP BY 1),
        |n AS (SELECT CAST(sum(cw) AS BIGINT) AS n FROM cw),
        |term AS (
        |  SELECT doc_id, cdw,
        |    cdw * CAST(round(1000000 * log2(CAST(n AS DOUBLE) / cw)) AS BIGINT) AS sq
        |  FROM dtc JOIN cw USING (w) CROSS JOIN n)
        |SELECT doc_id, CAST(sum(cdw) AS BIGINT) AS n_tokens,
        |  CAST(sum(sq) AS DOUBLE) / (1000000 * CAST(sum(cdw) AS DOUBLE))
        |    AS bits_per_token
        |FROM term GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val dtc = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 1)
        .groupBy("doc_id", "w").agg(count(lit(1)).as("cdw"))
        .localCheckpoint(true) // term model + per-doc join both consume it
      val cw = dtc.groupBy("w").agg(sum("cdw").as("cw"))
      val n = cw.agg(sum("cw").as("n"))
      dtc.join(broadcast(cw), Seq("w"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("cdw"),
          (col("cdw") * round(lit(1000000)
              * log2(col("n").cast("double") / col("cw"))).cast("long")).as("sq"))
        .groupBy("doc_id")
        .agg(sum("cdw").as("n_tokens"),
          (sum("sq").cast("double")
            / (lit(1000000) * sum("cdw").cast("double"))).as("bits_per_token"))
        .orderBy("doc_id")
    },

    // L58 — PMI collocation mining (phrase discovery): adjacent word
    // pairs whose co-occurrence beats the independence baseline —
    // log2(P(xy)/(P(x)P(y))) — are the multi-word expressions a
    // tokenizer/vocab builder should treat as units. Bigrams come from
    // a scan-local transform over each doc's token array (no
    // self-join: adjacency is positional, the classic pair-with-next
    // trap of joining the token frame to itself on position would
    // shuffle the corpus twice); unigram and bigram count aggregates
    // are the only shuffles, totals are broadcast 1-row scalars, and
    // the vocabulary-sized count frames re-enter as broadcast joins.
    // PMI is micro-quantized (round(1e6·log2) BIGINT) for an exact
    // cross-engine compare and a total output order; the cxy >= 3
    // support floor is applied AFTER the totals so the probability
    // denominators are the true corpus mass.
    Q(
      "tx28_pmi_bigrams",
      """WITH t AS (SELECT string_split(text, ' ') AS a FROM documents),
        |u AS (SELECT unnest(a) AS w FROM t),
        |uc AS (SELECT w, CAST(count(*) AS BIGINT) AS cw
        |       FROM u WHERE length(w) >= 1 GROUP BY 1),
        |n AS (SELECT CAST(sum(cw) AS BIGINT) AS n FROM uc),
        |b AS (SELECT a[i] AS w1, a[i + 1] AS w2
        |      FROM t, LATERAL (SELECT unnest(range(1, len(a))) AS i) s
        |      WHERE len(a) >= 2),
        |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cxy
        |       FROM b WHERE length(w1) >= 1 AND length(w2) >= 1 GROUP BY 1, 2),
        |p AS (SELECT CAST(sum(cxy) AS BIGINT) AS p FROM bc),
        |term AS (
        |  SELECT w1, w2, cxy,
        |    CAST(round(1000000 * log2(
        |      (CAST(cxy AS DOUBLE) * n * n) / (CAST(p AS DOUBLE) * x.cw * y.cw)))
        |      AS BIGINT) AS pmi_micro
        |  FROM bc JOIN uc x ON bc.w1 = x.w JOIN uc y ON bc.w2 = y.w CROSS JOIN n CROSS JOIN p
        |  WHERE cxy >= 3)
        |SELECT w1, w2, cxy, pmi_micro FROM term
        |ORDER BY pmi_micro DESC, w1, w2 LIMIT 30""".stripMargin
    ) { (s, d) =>
      val arr = Tables.documents(s, d)
        .select(split(col("text"), " ").as("a"))
        .localCheckpoint(true) // unigram + bigram branches both consume it
      val uc = arr.select(explode(col("a")).as("w"))
        .filter(length(col("w")) >= 1)
        .groupBy("w").agg(count(lit(1)).as("cw"))
        .localCheckpoint(true) // total + two broadcast joins consume it
      val n = uc.agg(sum("cw").as("n"))
      val bc = arr.filter(size(col("a")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(a) - 1), " +
            "i -> struct(element_at(a, i) AS w1, element_at(a, i + 1) AS w2))"))
          .as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .filter(length(col("w1")) >= 1 && length(col("w2")) >= 1)
        .groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
        .localCheckpoint(true) // total-bigrams scalar + term frame
      val p = bc.agg(sum("cxy").as("p"))
      bc.filter(col("cxy") >= 3)
        .join(broadcast(uc.select(col("w").as("w1"), col("cw").as("cx"))), Seq("w1"))
        .join(broadcast(uc.select(col("w").as("w2"), col("cw").as("cy"))), Seq("w2"))
        .crossJoin(broadcast(n)).crossJoin(broadcast(p))
        .select(col("w1"), col("w2"), col("cxy"),
          round(lit(1000000) * log2(
            (col("cxy").cast("double") * col("n") * col("n"))
              / (col("p").cast("double") * col("cx") * col("cy"))))
            .cast("long").as("pmi_micro"))
        .orderBy(desc("pmi_micro"), col("w1"), col("w2")).limit(30)
    },

    // L59 — BPE tokenizer training (the full merge loop): 12 merge
    // rules trained on the corpus via [[trainBpeBatched]] —
    // vocabulary-sized rounds, corpus touched once, and up to 8 merges
    // per driver round-trip under the exactness rule documented on the
    // method (disjoint prefix + strict-frequency truncation), so a
    // production 32k-merge train is O(merges/batch) driver rounds, not
    // O(merges), while staying rule-for-rule equal to the sequential
    // fold (BpeBatchSpec). Not SQL-expressible (iterative with a
    // data-dependent argmax per round) → rows-only here; BpeSpec pins
    // the rules against an independent sequential reference.
    Q.rowsOnly("tx29_bpe_train", "fixpoint") { (s, d) =>
      trainBpeBatched(Tables.documents(s, d), 12).orderBy("rank")
    },

    // L61 — BPE corpus encoding (the tokenizer's APPLY half): token
    // counts per document under the 12 rules tx29 trains, via
    // [[bpeTokenCounts]] (type-collapsed imperative encode, broadcast
    // re-join). Train + encode in one entry keeps the pair
    // deterministic; not SQL-expressible (rank-ordered greedy merges)
    // → rows-only; BpeSpec pins the encoder against the training
    // fold's own final segmentation and a hand-computed case.
    Q.rowsOnly("tx31_bpe_encode", "fixpoint") { (s, d) =>
      val docs = Tables.documents(s, d)
      val rules = trainBpe(docs, 12).orderBy("rank")
        .select("left", "right", "merged").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      bpeTokenCounts(docs, rules)
    },

    // L61b — BPE encoder INVARIANT CERTIFICATE (r8, the bound-
    // certificate recipe applied to the fixpoint family): the merge
    // RULES have no SQL oracle (tx29 stays rows-only), but the
    // encoder's structural contract does — over EVERY distinct word
    // type in the corpus, (a) concat(tokens) == word (lossless
    // segmentation), (b) every token is a single char or a trained
    // merge string (closed vocabulary), (c) token count ≤ char count
    // (merges only shrink). The entry trains, encodes every type, and
    // emits the violation counts; the oracle computes the type count
    // and literal zeros — a hash match certifies the encoder's
    // invariants corpus-wide each round, next to BpeSpec's pointwise
    // fixtures.
    Q(
      "tx59_bpe_roundtrip",
      """SELECT CAST(count(DISTINCT w) AS BIGINT) AS n_types,
        |  CAST(0 AS BIGINT) AS roundtrip_bad,
        |  CAST(0 AS BIGINT) AS vocab_bad,
        |  CAST(0 AS BIGINT) AS inflate_bad
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |WHERE len(w) >= 1""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val rules = trainBpe(docs, 12).orderBy("rank")
        .select("left", "right", "merged").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      val merged = rules.map(_._3).toSet
      docs.select(explode(split(col("text"), " ")).as("wd"))
        .filter(length(col("wd")) >= 1)
        .distinct().as[String]
        .mapPartitions(_.map { wd =>
          val toks = encodeWord(wd, rules)
          (1L,
            if (toks.mkString == wd) 0L else 1L,
            if (toks.forall(t => t.length == 1 || merged(t))) 0L else 1L,
            if (toks.length <= wd.length) 0L else 1L)
        }).toDF("one", "rb", "vb", "ib")
        .agg(sum("one").as("n_types"), sum("rb").as("roundtrip_bad"),
          sum("vb").as("vocab_bad"), sum("ib").as("inflate_bad"))
    },

    // L62 — n-gram novelty per document (memorization/duplication risk
    // in ingestion order): the share of a doc's distinct sliding word
    // 4-grams whose FIRST corpus occurrence (min doc_id) is this doc.
    // Low novelty = the doc mostly restates earlier text — the signal a
    // dedup-aware sampler downweights and a memorization audit flags.
    // Grams are md5-hashed in the scan projection (dd8 discipline: text
    // never shuffles — fixed-width hashes do); one (gram → min doc)
    // aggregate + one gram-key join + one per-doc reduction; the
    // permille is exact-integer DIV.
    Q(
      "tx32_ngram_novelty",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |           WHERE len(string_split(text, ' ')) >= 4),
        |g AS (SELECT DISTINCT doc_id,
        |        md5(array_to_string(l[i : i+3], ' ')) AS gh
        |      FROM t, LATERAL (SELECT unnest(range(1, len(l) - 2)) AS i) s),
        |fo AS (SELECT gh, min(doc_id) AS first_doc FROM g GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS novel_grams,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000 // CAST(count(*) AS BIGINT) AS novelty_permille
        |FROM g JOIN fo USING (gh)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val g = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 4)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(l) - 3), " +
            "i -> md5(array_join(slice(l, i, 4), ' ')))")).as("gh"))
        .distinct()
        .localCheckpoint(true) // first-occurrence agg + join both consume it
      val fo = g.groupBy("gh").agg(min("doc_id").as("first_doc"))
      g.join(fo, Seq("gh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("novel_grams"))
        .select(col("doc_id"), col("n_grams"), col("novel_grams"),
          expr("novel_grams * 1000 DIV n_grams").as("novelty_permille"))
        .orderBy("doc_id")
    },

    // L60 — DSIR-style importance weights (data selection for language
    // models, Xie et al. 2023): score every document by how much more
    // likely its tokens are under the TARGET domain's unigram model
    // than under the model of the rest of the corpus — the reweighting
    // signal behind "make the 100 TB crawl look like the curated set".
    // Both models are add-one smoothed over the SHARED corpus
    // vocabulary so every word has mass on both sides; each word's
    // log-likelihood ratio is micro-quantized ONCE (round(1e6·log2)
    // BIGINT, the tx19/tx27 discipline) and scaled by the exact in-doc
    // count, so the per-doc score is an order-invariant integer sum and
    // the per-token normalization is the single final double.
    // Shuffle shape: ONE (doc, word) aggregate; the vocabulary-sized
    // model frame re-enters as a broadcast join; corpus totals are
    // broadcast 1-row scalars. The target set here is a source slice —
    // at scale it would be the curated reference corpus.
    Q(
      "tx30_dsir_weights",
      """WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        |            FROM documents),
        |dtc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cdw
        |        FROM tok WHERE length(w) >= 1 GROUP BY 1, 2),
        |cnt AS (SELECT w,
        |    CAST(sum(CASE WHEN source IN ('src1', 'src2', 'src3') THEN 1
        |             ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(sum(CASE WHEN source IN ('src1', 'src2', 'src3') THEN 0
        |             ELSE 1 END) AS BIGINT) AS cr
        |  FROM tok WHERE length(w) >= 1 GROUP BY 1),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr,
        |          CAST(count(*) AS BIGINT) AS v
        |        FROM cnt),
        |model AS (SELECT w,
        |    CAST(round(1000000 * log2(
        |      ((CAST(ct AS DOUBLE) + 1) / (nt + v))
        |      / ((CAST(cr AS DOUBLE) + 1) / (nr + v)))) AS BIGINT) AS llr_micro
        |  FROM cnt CROSS JOIN tot)
        |SELECT doc_id, CAST(sum(cdw) AS BIGINT) AS n_tokens,
        |  CAST(sum(cdw * llr_micro) AS BIGINT) AS llr_sum_micro,
        |  CAST(sum(cdw * llr_micro) AS DOUBLE)
        |    / (1000000 * CAST(sum(cdw) AS DOUBLE)) AS llr_per_token
        |FROM dtc JOIN model USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val targetSrcs = Seq("src1", "src2", "src3")
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 1)
        .localCheckpoint(true) // model counts + per-doc counts both consume it
      val dtc = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("cdw"))
      val isT = col("source").isin(targetSrcs: _*)
      val cnt = tok.groupBy("w")
        .agg(sum(when(isT, 1L).otherwise(0L)).as("ct"),
          sum(when(isT, 0L).otherwise(1L)).as("cr"))
      val tot = cnt.agg(sum("ct").as("nt"), sum("cr").as("nr"),
        count(lit(1)).as("v"))
      val model = cnt.crossJoin(broadcast(tot))
        .select(col("w"), round(lit(1000000) * log2(
          ((col("ct").cast("double") + 1) / (col("nt") + col("v")))
            / ((col("cr").cast("double") + 1) / (col("nr") + col("v")))))
          .cast("long").as("llr_micro"))
      dtc.join(broadcast(model), Seq("w"))
        .groupBy("doc_id")
        .agg(sum("cdw").as("n_tokens"),
          sum(col("cdw") * col("llr_micro")).as("llr_sum_micro"),
          (sum(col("cdw") * col("llr_micro")).cast("double")
            / (lit(1000000) * sum("cdw").cast("double"))).as("llr_per_token"))
        .orderBy("doc_id")
    },

    // L48 — duplicated-span coverage (sliding-window exact substring
    // dedup, the "Deduplicating Training Data Makes Language Models
    // Better" shape): every word 8-gram of every doc, hashed; an 8-gram
    // occurring ≥2 times ANYWHERE in the corpus (other docs or a repeat
    // within the same doc) is a duplicated span [i, i+8); a doc's
    // duplication is the INTERVAL-MERGED word coverage of its duplicated
    // spans (overlapping spans never double-count — ev11's
    // gaps-and-islands algebra on word offsets). Differs from dd8
    // (disjoint 5-word chunks, cross-doc only): sliding windows catch
    // duplicated passages at ANY alignment, which is why the paper uses
    // them. All integer: positions, island sums, permille by DIV.
    // Scale shape: the gram explode is scan-local and only 16-byte
    // hashes + integer offsets shuffle (text never leaves the scan);
    // the occurrence count is one map-side-combined aggregate; the
    // island window partitions by doc_id (per-doc rows bounded by doc
    // length). Docs with zero duplicated spans stay in the report via
    // the final left join (coverage 0).
    Q(
      "dd14_dup_span_coverage",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |           WHERE len(string_split(text, ' ')) >= 8),
        |g AS (SELECT doc_id, i,
        |        md5(array_to_string(l[i+1 : i+8], ' ')) AS ph
        |      FROM t, LATERAL (SELECT unnest(range(0, len(l) - 7)) AS i) s),
        |pc AS (SELECT ph, count(*) AS occ FROM g GROUP BY 1),
        |dup AS (SELECT doc_id, i FROM g JOIN pc USING (ph) WHERE occ >= 2),
        |m AS (SELECT doc_id, i,
        |        max(i + 8) OVER (PARTITION BY doc_id ORDER BY i
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |      FROM dup),
        |isl AS (SELECT doc_id, i,
        |          sum(CASE WHEN pm IS NULL OR i > pm THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY doc_id ORDER BY i) AS isle
        |        FROM m),
        |cov AS (SELECT doc_id, CAST(sum(ng) AS BIGINT) AS dup_ngrams,
        |          CAST(sum(ce) AS BIGINT) AS covered_words
        |        FROM (SELECT doc_id, isle, max(i + 8) - min(i) AS ce,
        |                count(*) AS ng
        |              FROM isl GROUP BY 1, 2) GROUP BY 1)
        |SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_words,
        |  coalesce(dup_ngrams, 0) AS dup_ngrams,
        |  coalesce(covered_words, 0) AS covered_words,
        |  (coalesce(covered_words, 0) * 1000) // CAST(len(t.l) AS BIGINT)
        |    AS covered_permille
        |FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id
        |ORDER BY t.doc_id""".stripMargin
    ) { (s, d) => dupSpanCoverage(Tables.documents(s, d)) },

    // L49 — importance-weighted corpus SELECTION: the sampling step that
    // consumes tx30's per-doc DSIR log-likelihood-ratio — each doc's
    // per-token LLR (micro-bits, an exact integer) maps through a
    // saturating integer ramp to an inclusion probability
    // weight6 = clamp[0,10^6](500000 + llr_sum_micro DIV (2·n_tokens)),
    // so target-like docs (positive LLR) keep more mass and
    // anti-target docs thin out — the "make the crawl look like the
    // curated set" resample, DSIR's second half. The coin is the doc's
    // salted md5 16-bit prefix tested against an INTEGER threshold
    // (weight6·65536 DIV 10^6) — deterministic, retry-stable,
    // replayable; the salt keeps the decision independent of tx9's
    // split and tx12's stratified sample, which hash the same ids. The
    // only floats are tx30's per-WORD micro-quantized log terms (the
    // tx19 discipline — order-invariant by construction); every per-doc
    // and per-threshold step is integer. Scale shape: identical to tx30
    // (one (doc,word) aggregate + vocabulary broadcast) plus a
    // scan-local filter and the per-source audit aggregate.
    Q(
      "tx34_weighted_sample",
      """WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        |            FROM documents),
        |dtc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cdw
        |        FROM tok WHERE length(w) >= 1 GROUP BY 1, 2),
        |cnt AS (SELECT w,
        |    CAST(sum(CASE WHEN source IN ('src1', 'src2', 'src3') THEN 1
        |             ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(sum(CASE WHEN source IN ('src1', 'src2', 'src3') THEN 0
        |             ELSE 1 END) AS BIGINT) AS cr
        |  FROM tok WHERE length(w) >= 1 GROUP BY 1),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr,
        |          CAST(count(*) AS BIGINT) AS v FROM cnt),
        |model AS (SELECT w,
        |    CAST(round(1000000 * log2(
        |      ((CAST(ct AS DOUBLE) + 1) / (nt + v))
        |      / ((CAST(cr AS DOUBLE) + 1) / (nr + v)))) AS BIGINT) AS llr_micro
        |  FROM cnt CROSS JOIN tot),
        |score AS (SELECT doc_id, CAST(sum(cdw) AS BIGINT) AS n_tokens,
        |    CAST(sum(cdw * llr_micro) AS BIGINT) AS llr_sum_micro
        |  FROM dtc JOIN model USING (w) GROUP BY 1),
        |wgt AS (SELECT doc_id,
        |    least(1000000, greatest(0,
        |      500000 + llr_sum_micro // (2 * n_tokens))) AS weight6
        |  FROM score),
        |sel AS (SELECT d.doc_id, d.source, d.n_chars
        |        FROM documents d JOIN wgt USING (doc_id)
        |        WHERE CAST(('0x' || substring(
        |            md5(CAST(d.doc_id AS VARCHAR) || '#wsample'), 1, 4)) AS INTEGER)
        |          < (wgt.weight6 * 65536) // 1000000)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_sampled,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sampled
        |FROM sel GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val targetSrcs = Seq("src1", "src2", "src3")
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 1)
        .localCheckpoint(true) // model counts + per-doc counts both consume it
      val dtc = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("cdw"))
      val isT = col("source").isin(targetSrcs: _*)
      val cnt = tok.groupBy("w")
        .agg(sum(when(isT, 1L).otherwise(0L)).as("ct"),
          sum(when(isT, 0L).otherwise(1L)).as("cr"))
      val tot = cnt.agg(sum("ct").as("nt"), sum("cr").as("nr"),
        count(lit(1)).as("v"))
      val model = cnt.crossJoin(broadcast(tot))
        .select(col("w"), round(lit(1000000) * log2(
          ((col("ct").cast("double") + 1) / (col("nt") + col("v")))
            / ((col("cr").cast("double") + 1) / (col("nr") + col("v")))))
          .cast("long").as("llr_micro"))
      val wgt = dtc.join(broadcast(model), Seq("w"))
        .groupBy("doc_id")
        .agg(sum("cdw").as("n_tokens"),
          sum(col("cdw") * col("llr_micro")).as("llr_sum_micro"))
        .select(col("doc_id"),
          expr("least(1000000L, greatest(0L, " +
            "500000L + llr_sum_micro DIV (2 * n_tokens)))").as("weight6"))
      Tables.documents(s, d).join(wgt, Seq("doc_id"))
        .filter(
          conv(substring(md5(concat(col("doc_id").cast("string"),
            lit("#wsample")).cast("binary")), 1, 4), 16, 10).cast("long")
            < expr("(weight6 * 65536) DIV 1000000"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_sampled"),
          sum("n_chars").as("chars_sampled"))
        .orderBy("source")
    },

    // L51 — blocked sorted-neighborhood record linkage: the classic
    // entity-resolution BLOCKING strategy the LSH family doesn't cover —
    // sort records on a domain key inside each block, compare each
    // record only to its next `w`=2 neighbors in that order, score the
    // bounded candidate pairs (token-set Jaccard, integer permille).
    // Candidates are O(n·w) — never block², never corpus² — and every
    // window is PARTITIONED by the block key (lang, first word), so no
    // global sort and no single-partition window; block granularity is
    // the documented scale knob (finer key → smaller blocks → same
    // O(n·w) with shorter sorts). Deterministic: total order inside a
    // block is (second word, doc_id). Pairs only look FORWARD (lead), so
    // (a,b) appears once and never as (b,a). All-integer scoring.
    Q(
      "dd15_sorted_neighborhood",
      """WITH t AS (SELECT doc_id, lang,
        |    list_distinct(string_split(text, ' ')) AS ts,
        |    string_split(text, ' ')[1] AS w1,
        |    string_split(text, ' ')[2] AS w2
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |n AS (SELECT doc_id, ts,
        |    lead(doc_id, 1) OVER wd AS id1, lead(ts, 1) OVER wd AS ts1,
        |    lead(doc_id, 2) OVER wd AS id2, lead(ts, 2) OVER wd AS ts2
        |  FROM t WINDOW wd AS (PARTITION BY lang, w1 ORDER BY w2, doc_id)),
        |pairs AS (
        |  SELECT doc_id AS id_a, id1 AS id_b, ts, ts1 AS tsb
        |  FROM n WHERE id1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, id2, ts, ts2 FROM n WHERE id2 IS NOT NULL)
        |SELECT id_a, id_b,
        |  (CAST(len(list_intersect(ts, tsb)) AS BIGINT) * 1000) //
        |    CAST(len(ts) + len(tsb) - len(list_intersect(ts, tsb)) AS BIGINT)
        |    AS jac_permille
        |FROM pairs
        |WHERE (CAST(len(list_intersect(ts, tsb)) AS BIGINT) * 1000) //
        |    CAST(len(ts) + len(tsb) - len(list_intersect(ts, tsb)) AS BIGINT)
        |    >= 400
        |ORDER BY id_a, id_b""".stripMargin
    ) { (s, d) =>
      sortedNeighborhoodPairs(Tables.documents(s, d))
        .orderBy("id_a", "id_b")
    },

    // L52 — pairwise source-vocabulary overlap: the mixture-design
    // readout BESIDE tx19's entropy/KL (those compare source SIZES,
    // this compares source CONTENT) — "which corpus components say the
    // same words". Distinct (source, term) frame, self-joined on term
    // with s1 < s2: fan-out per term is (#sources containing it)² ≤
    // |sources|² — bounded by the source-catalog size, LINEAR in
    // vocabulary, never corpus². Jaccard in exact integer permille
    // (inter · 1000 DIV union). |sources|²/2 output rows.
    Q(
      "tx35_source_overlap",
      """WITH tk AS (
        |  SELECT DISTINCT source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |  FROM documents),
        |sz AS (SELECT source, count(*) AS v FROM tk GROUP BY 1),
        |pr AS (
        |  SELECT a.source AS s1, b.source AS s2, count(*) AS inter
        |  FROM tk a JOIN tk b ON a.term = b.term AND a.source < b.source
        |  GROUP BY 1, 2),
        |-- every s1<s2 pair appears, DISJOINT ones included (inter 0) —
        |-- "these components share no words" is the most extreme readout
        |-- and must not vanish from the report
        |allp AS (
        |  SELECT z1.source AS s1, z1.v AS v1, z2.source AS s2, z2.v AS v2
        |  FROM sz z1 JOIN sz z2 ON z1.source < z2.source)
        |SELECT s1, s2, coalesce(inter, 0) AS inter,
        |  (coalesce(inter, 0) * 1000) // (v1 + v2 - coalesce(inter, 0))
        |    AS jac_permille
        |FROM allp LEFT JOIN pr USING (s1, s2)
        |ORDER BY s1, s2""".stripMargin
    ) { (s, d) =>
      val tk = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .distinct()
        // consumed by the size aggregate and both self-join sides
        .localCheckpoint(true)
      val sz = tk.groupBy("source").agg(count(lit(1)).as("v"))
      val pr = tk.as("a")
        .join(tk.as("b"),
          col("a.term") === col("b.term") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("inter"))
      // all s1<s2 pairs (|sources|² tiny frame) so DISJOINT pairs report
      // inter = 0 instead of silently vanishing from the matrix
      val allp = sz.select(col("source").as("s1"), col("v").as("v1"))
        .join(sz.select(col("source").as("s2"), col("v").as("v2")),
          col("s1") < col("s2"))
      allp.join(broadcast(pr), Seq("s1", "s2"), "left")
        .select(col("s1"), col("s2"),
          coalesce(col("inter"), lit(0L)).as("inter"),
          expr("(coalesce(inter, 0) * 1000) DIV (v1 + v2 - coalesce(inter, 0))")
            .as("jac_permille"))
        .orderBy("s1", "s2")
    },

    // L85 — bigram cross-entropy per document: tx27's unigram surprisal
    // upgraded to a conditional model — bits per bigram under add-one-
    // smoothed P(w2|w1) = (c(w1,w2)+1)/(c(w1·)+V), the next-rung
    // perplexity surrogate (catches wrong-ORDER text a unigram model
    // scores as fluent). Denominator base is the LEFT-CONTEXT total
    // (Σ over bigrams starting at w1), V = distinct continuations.
    // tx19/tx27 discipline: per-bigram log term micro-quantized ONCE
    // (1e6 BIGINT) × exact in-doc counts ⇒ order-invariant integer doc
    // scores; one (doc,w1,w2) aggregate, bigram-vocabulary model frames
    // re-enter as broadcast joins, the corpus is touched once.
    Q(
      "tx39_bigram_surprisal",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
        |b AS (SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
        |      FROM t, LATERAL (SELECT unnest(range(1, len(a))) AS i) s
        |      WHERE len(a) >= 2),
        |db AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS cdb
        |       FROM b WHERE length(w1) >= 1 AND length(w2) >= 1 GROUP BY 1, 2, 3),
        |bc AS (SELECT w1, w2, CAST(sum(cdb) AS BIGINT) AS cxy FROM db GROUP BY 1, 2),
        |uc AS (SELECT w1 AS w, CAST(sum(cxy) AS BIGINT) AS cw FROM bc GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM bc),
        |term AS (
        |  SELECT db.doc_id, db.cdb,
        |    db.cdb * CAST(round(1000000 * log2(
        |      (CAST(cw AS DOUBLE) + v) / (cxy + 1))) AS BIGINT) AS sq
        |  FROM db JOIN bc USING (w1, w2) JOIN uc ON uc.w = db.w1 CROSS JOIN v)
        |SELECT doc_id, CAST(sum(cdb) AS BIGINT) AS n_bigrams,
        |  CAST(sum(sq) AS DOUBLE) / (1000000 * CAST(sum(cdb) AS DOUBLE))
        |    AS bits_per_bigram
        |FROM term GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val db = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("a"))
        .filter(size(col("a")) >= 2)
        // Spark [] subscripts are 0-based (DuckDB's are 1-based) — the
        // sequence runs 0..size-2 so ANSI mode can never see an
        // out-of-bounds index
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, a[i + 1] AS w2))"))
          .as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .filter(length(col("w1")) >= 1 && length(col("w2")) >= 1)
        .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("cdb"))
        .localCheckpoint(true) // model build + per-doc scoring both consume it
      val bc = db.groupBy("w1", "w2").agg(sum("cdb").as("cxy"))
        .localCheckpoint(true) // left-context totals + vocab + join consume it
      val uc = bc.groupBy(col("w1").as("w")).agg(sum("cxy").as("cw"))
      val v = bc.agg(countDistinct("w2").as("v"))
      db.join(bc, Seq("w1", "w2"))
        .join(broadcast(uc), col("w") === col("w1"))
        .crossJoin(broadcast(v))
        .select(col("doc_id"), col("cdb"),
          (col("cdb") * round(lit(1000000) * log2(
            (col("cw").cast("double") + col("v")) / (col("cxy") + 1)))
            .cast("long")).as("sq"))
        .groupBy("doc_id")
        .agg(sum("cdb").as("n_bigrams"),
          (sum("sq").cast("double")
            / (lit(1000000) * sum("cdb").cast("double"))).as("bits_per_bigram"))
        .orderBy("doc_id")
    },

    // L89 — pairwise Jensen-Shannon divergence between source token
    // DISTRIBUTIONS: tx35 asks "do the sources share words", this asks
    // "do they USE them at the same rates" — the symmetric, bounded
    // [0,1]-bits mixture divergence (tx19's KL is vs the corpus and
    // asymmetric). Per-term contribution ½(p·log2(2p/(p+q)) +
    // q·log2(2q/(p+q))) is micro-quantized ONCE to a 1e6-unit BIGINT
    // (the 500000 factor bakes the ½ in), zero-count sides contribute
    // their side as 0 — absent terms are exactly the signal: a word one
    // source never uses adds q·log2(2) to the divergence. Shuffle
    // shape: one (source, term) count aggregate over the corpus; the
    // |sources|²-row pair frame (with totals) re-enters BROADCAST, the
    // fan-out is |vocab rows| × (S−1), bounded by the source count.
    Q(
      "tx40_jsd",
      """WITH tk AS (
        |  SELECT source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        |  FROM documents),
        |tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
        |       FROM tk GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS s1, a.n AS n1, b.source AS s2, b.n AS n2
        |  FROM ns a JOIN ns b ON a.source < b.source),
        |cells AS (
        |  SELECT p.s1, p.s2, p.n1, p.n2, t.term,
        |    CAST(sum(CASE WHEN t.source = p.s1 THEN c ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN t.source = p.s2 THEN c ELSE 0 END) AS BIGINT) AS c2
        |  FROM pairs p JOIN tc t ON t.source = p.s1 OR t.source = p.s2
        |  GROUP BY 1, 2, 3, 4, 5),
        |terms AS (
        |  SELECT s1, s2,
        |    CAST(round(500000 * (
        |      (CASE WHEN c1 > 0 THEN (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |         * log2(2 * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |             / ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |                + (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))))
        |         ELSE 0 END)
        |      + (CASE WHEN c2 > 0 THEN (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |         * log2(2 * (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |             / ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |                + (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))))
        |         ELSE 0 END))) AS BIGINT) AS t_e6
        |  FROM cells)
        |SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(t_e6) AS BIGINT) AS jsd_e6,
        |  CAST(sum(t_e6) AS DOUBLE) / 1000000 AS jsd_bits
        |FROM terms GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val tc = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy("source", "term").agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // totals + the pair fan-out consume it
      val ns = tc.groupBy("source").agg(sum("c").as("n"))
      val pairs = ns.select(col("source").as("s1"), col("n").as("n1"))
        .join(ns.select(col("source").as("s2"), col("n").as("n2")),
          col("s1") < col("s2"))
      val cells = tc
        .join(broadcast(pairs),
          col("source") === col("s1") || col("source") === col("s2"))
        .groupBy("s1", "s2", "n1", "n2", "term")
        .agg(sum(when(col("source") === col("s1"), col("c")).otherwise(0L)).as("c1"),
          sum(when(col("source") === col("s2"), col("c")).otherwise(0L)).as("c2"))
      cells
        .select(col("s1"), col("s2"), expr(
          """CAST(round(500000 * (
            |  (CASE WHEN c1 > 0 THEN (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
            |     * log2(2 * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
            |         / ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
            |            + (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))))
            |     ELSE 0 END)
            |  + (CASE WHEN c2 > 0 THEN (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
            |     * log2(2 * (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
            |         / ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
            |            + (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))))
            |     ELSE 0 END))) AS BIGINT)""".stripMargin).as("t_e6"))
        .groupBy("s1", "s2")
        .agg(count(lit(1)).as("n_terms"), sum("t_e6").as("jsd_e6"))
        .select(col("s1"), col("s2"), col("n_terms"), col("jsd_e6"),
          (col("jsd_e6").cast("double") / 1000000).as("jsd_bits"))
        .orderBy("s1", "s2")
    },

    // L94 — BLEU-2 over lag-paired documents (see bleuLagPairs).
    Q(
      "tx41_bleu",
      """WITH tk AS (
        |  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, toks, len(toks) AS ln,
        |    CASE WHEN len(toks) < 2 THEN []
        |         ELSE list_transform(range(1, len(toks)),
        |                i -> toks[i] || ' ' || toks[i+1])
        |    END AS bgs
        |  FROM tk),
        |u1 AS (SELECT doc_id, unnest(toks) AS g FROM bg),
        |c1 AS (SELECT doc_id, g, count(*) AS c FROM u1 GROUP BY 1, 2),
        |u2 AS (SELECT doc_id, unnest(bgs) AS g FROM bg),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM u2 GROUP BY 1, 2),
        |m1 AS (SELECT h.doc_id, CAST(sum(least(h.c, r.c)) AS BIGINT) AS m
        |       FROM c1 h JOIN c1 r ON r.doc_id = h.doc_id + 1 AND r.g = h.g
        |       GROUP BY 1),
        |m2 AS (SELECT h.doc_id, CAST(sum(least(h.c, r.c)) AS BIGINT) AS m
        |       FROM c2 h JOIN c2 r ON r.doc_id = h.doc_id + 1 AND r.g = h.g
        |       GROUP BY 1),
        |pair AS (
        |  SELECT h.doc_id, h.ln AS len_h, r.ln AS len_r,
        |    coalesce(m1.m, 0) AS m1, coalesce(m2.m, 0) AS m2
        |  FROM bg h JOIN bg r ON r.doc_id = h.doc_id + 1
        |  LEFT JOIN m1 ON m1.doc_id = h.doc_id
        |  LEFT JOIN m2 ON m2.doc_id = h.doc_id),
        |q AS (
        |  SELECT doc_id, len_h, len_r, m1, m2,
        |    CASE WHEN len_h < 2 OR m1 = 0 OR m2 = 0 THEN CAST(0 AS BIGINT)
        |      ELSE CAST(round(1000000 * sqrt(
        |        (CAST(m1 AS DOUBLE) / len_h)
        |          * (CAST(m2 AS DOUBLE) / (len_h - 1)))) AS BIGINT) END AS gm_e6,
        |    CASE WHEN len_h >= len_r THEN CAST(1000000 AS BIGINT)
        |      ELSE CAST(round(1000000 * exp(CAST(1 AS DOUBLE)
        |        - CAST(len_r AS DOUBLE) / len_h)) AS BIGINT) END AS bp_e6
        |  FROM pair)
        |SELECT doc_id, CAST(len_h AS BIGINT) AS len_h,
        |  CAST(len_r AS BIGINT) AS len_r, m1, m2, gm_e6, bp_e6,
        |  (gm_e6 * bp_e6) // 1000000 AS bleu_e6
        |FROM q ORDER BY doc_id""".stripMargin
    ) { (s, d) => bleuLagPairs(s, d) },

    // L110 — cross-source language-model transfer matrix: tx27 scores a
    // doc against the GLOBAL unigram model; the mixture question a
    // corpus designer actually asks is "how well does source A's model
    // predict source B" — the domain-shift / transfer readout (high
    // off-diagonal = interchangeable sources, spiky diagonal = siloed
    // vocabulary; tx40's JSD compares distributions symmetrically, this
    // is the asymmetric predictive version). Add-1-smoothed per-source
    // unigram models over the GLOBAL vocab (OOV w.r.t. a model gets
    // count 0 → log2(Ns+V)); bits are tx27's per-term e6-quantized
    // log2 of an exact integer ratio — identical doubles both engines —
    // and everything else is integer sums. Scale: models are
    // vocabulary-sized frames; the (eval-term × 10 models) join is the
    // only fan-out and its width is the SOURCE count, a constant.
    Q(
      "tx56_cross_surprisal",
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |             FROM documents),
        |sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |       FROM tok GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM sw GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM sw),
        |pairs AS (
        |  SELECT ev.source AS eval_src, m.source AS train_src, ev.w,
        |    ev.c AS c_eval, coalesce(tm.c, 0) AS c_train
        |  FROM sw ev
        |  CROSS JOIN (SELECT source FROM ns) m
        |  LEFT JOIN sw tm ON tm.source = m.source AND tm.w = ev.w),
        |term AS (
        |  SELECT p.eval_src, p.train_src,
        |    p.c_eval AS c_eval,
        |    p.c_eval * CAST(round(1000000 * log2(
        |      CAST(ns.n + v.v AS DOUBLE) / (p.c_train + 1))) AS BIGINT) AS sq
        |  FROM pairs p JOIN ns ON ns.source = p.train_src CROSS JOIN v)
        |SELECT train_src, eval_src, CAST(sum(c_eval) AS BIGINT) AS n_tokens,
        |  CAST(sum(sq) AS DOUBLE) / (1000000 * CAST(sum(c_eval) AS DOUBLE))
        |    AS bits_per_token
        |FROM term GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val sw = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // eval side, model side, N, V all read it
      val ns = sw.groupBy("source").agg(sum("c").as("n"))
      val v = sw.agg(countDistinct("w").as("v"))
      val pairs = sw
        .select(col("source").as("eval_src"), col("w"), col("c").as("c_eval"))
        .crossJoin(broadcast(ns.select(col("source").as("train_src"))))
        .join(sw.select(col("source").as("train_src"), col("w"),
          col("c").as("c_train")), Seq("train_src", "w"), "left")
        .select(col("eval_src"), col("train_src"), col("c_eval"),
          coalesce(col("c_train"), lit(0L)).as("c_train"))
      pairs
        .join(broadcast(ns.withColumnRenamed("source", "train_src")),
          Seq("train_src"))
        .crossJoin(broadcast(v))
        .select(col("eval_src"), col("train_src"), col("c_eval"),
          (col("c_eval") * round(lit(1000000) * log2(
            (col("n") + col("v")).cast("double") / (col("c_train") + 1)))
            .cast("long")).as("sq"))
        .groupBy("train_src", "eval_src")
        .agg(sum("c_eval").as("n_tokens"),
          (sum("sq").cast("double")
            / (lit(1000000) * sum("c_eval").cast("double")))
            .as("bits_per_token"))
        .orderBy("train_src", "eval_src")
    }
  )

  /** dd15's engine — blocked sorted-neighborhood candidate pairs with
    * integer Jaccard scores (see the catalog entry's Scaladoc). Kept
    * reusable: gr17's seed expansion consumes these pairs as its
    * similarity edges. */
  private[graft] def sortedNeighborhoodPairs(docs: DataFrame,
                                             minPermille: Long = 400L): DataFrame = {
    // docs under 2 words are excluded BEFORE element_at: under ANSI mode
    // (Spark 4 default) a too-short array would throw, and a null w2
    // would also sort NULLS FIRST here vs DuckDB's NULLS LAST — the
    // guard removes both divergences (a 1-word doc has no block key)
    val t = docs
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"), col("lang"),
        array_distinct(split(col("text"), " ")).as("ts"),
        element_at(split(col("text"), " "), 1).as("w1"),
        element_at(split(col("text"), " "), 2).as("w2"))
    val wd = Window.partitionBy("lang", "w1").orderBy("w2", "doc_id")
    val n = t.select(col("doc_id"), col("ts"),
      lead(col("doc_id"), 1).over(wd).as("id1"),
      lead(col("ts"), 1).over(wd).as("ts1"),
      lead(col("doc_id"), 2).over(wd).as("id2"),
      lead(col("ts"), 2).over(wd).as("ts2"))
      .localCheckpoint(true) // both pair-offset branches consume it
    val pairs = n.filter(col("id1").isNotNull)
      .select(col("doc_id").as("id_a"), col("id1").as("id_b"),
        col("ts"), col("ts1").as("tsb"))
      .unionByName(n.filter(col("id2").isNotNull)
        .select(col("doc_id").as("id_a"), col("id2").as("id_b"),
          col("ts"), col("ts2").as("tsb")))
    val inter = size(array_intersect(col("ts"), col("tsb"))).cast("long")
    pairs
      .select(col("id_a"), col("id_b"), inter.as("it"),
        (size(col("ts")).cast("long") + size(col("tsb")) - inter).as("un"))
      .select(col("id_a"), col("id_b"),
        expr("(it * 1000) DIV un").as("jac_permille"))
      .filter(col("jac_permille") >= minPermille)
  }

  /** L94 — BLEU-2 between lag-paired documents (the n-gram-overlap
    * metric every generation eval reports, run as a corpus SELF-
    * similarity probe: doc i scored against doc i+1 — dd14's lag-pair
    * discipline keeps it linear, never n²). Clipped modified precision
    * per n-gram order (Σ min(count_hyp, count_ref)) is EXACT integer
    * algebra from one (doc, gram) aggregate per order; the geometric
    * mean √(p₁p₂) and the brevity penalty e^(1−r/c) are each
    * micro-quantized ONCE to 1e6 BIGINTs (identical expression trees
    * of exact integers on both engines), and the final BLEU is their
    * pure-integer product DIV 1e6. Grams hash-shuffle by (doc, gram);
    * the corpus is tokenized once. */
  private[graft] def bleuLagPairs(spark: org.apache.spark.sql.SparkSession,
                                  dir: String): DataFrame = {
    val tk = Tables.documents(spark, dir).select(col("doc_id"),
      expr("regexp_extract_all(text, '[a-z0-9]+', 0)").as("toks"))
    val bg = tk.select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("ln"),
        when(size(col("toks")) < 2, expr("CAST(array() AS ARRAY<STRING>)"))
          .otherwise(expr(
            """transform(sequence(1, size(toks) - 1),
              |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""
              .stripMargin)).as("bgs"))
      .localCheckpoint(true) // hypothesis and reference sides both read it
    def clipped(col_grams: String): DataFrame = {
      val c = bg.select(col("doc_id"), explode(col(col_grams)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      c.join(c.select((col("doc_id") - 1).as("doc_id"), col("g"),
          col("c").as("cr")), Seq("doc_id", "g"))
        .groupBy("doc_id").agg(sum(least(col("c"), col("cr"))).as("m"))
    }
    val m1 = clipped("toks").withColumnRenamed("m", "m1")
    val m2 = clipped("bgs").withColumnRenamed("m", "m2")
    val pair = bg.select(col("doc_id"), col("ln").as("len_h"))
      .join(bg.select((col("doc_id") - 1).as("doc_id"), col("ln").as("len_r")),
        "doc_id")
      .join(m1, Seq("doc_id"), "left").join(m2, Seq("doc_id"), "left")
      .select(col("doc_id"), col("len_h"), col("len_r"),
        coalesce(col("m1"), lit(0L)).as("m1"),
        coalesce(col("m2"), lit(0L)).as("m2"))
    pair
      .withColumn("gm_e6",
        when(col("len_h") < 2 || col("m1") === 0 || col("m2") === 0, lit(0L))
          .otherwise(round(lit(1000000) * sqrt(
            (col("m1").cast("double") / col("len_h"))
              * (col("m2").cast("double") / (col("len_h") - 1)))).cast("long")))
      .withColumn("bp_e6",
        when(col("len_h") >= col("len_r"), lit(1000000L))
          .otherwise(round(lit(1000000) * exp(lit(1).cast("double")
            - col("len_r").cast("double") / col("len_h"))).cast("long")))
      .select(col("doc_id"), col("len_h"), col("len_r"), col("m1"), col("m2"),
        col("gm_e6"), col("bp_e6"),
        expr("(gm_e6 * bp_e6) DIV 1000000").as("bleu_e6"))
      .orderBy("doc_id")
  }
}
