package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-weighting / ranked-retrieval catalog (round 4): TF-IDF keyword
  * extraction and BM25 scoring over `documents` — the relevance-ranking
  * half of a training-data pipeline (salient-term indexing, query-driven
  * corpus slicing).
  *
  * Cross-engine float discipline: the usual `ln(N/df)` idf is NOT
  * hash-portable (libm vs JDK `Math.log` can differ in the last ulp), so
  * idf is an exact scaled-integer rational `(N·10^6) DIV df` — a
  * monotone transform of N/df, preserving every ranking property of idf
  * while keeping tf·idf in exact longs. BM25's term saturation needs
  * real division, but every operand is an exact integer (or the
  * integer-ratio avgdl), both engines evaluate the IDENTICAL expression
  * tree, and the per-term partial scores are added in a FIXED literal
  * order (conditional-agg pivot, never a float `sum()`), so the doubles
  * compare bit-equal.
  *
  * Scale notes: token explode is scan-local; `tf` shuffles (doc, term)
  * pairs once; `df` is a tiny per-term frame (vocabulary-sized) and
  * broadcasts; nothing is ever corpus×corpus.
  */
object TextRank {

  private val tok = "__term"

  /** (doc_id, term) exploded tokens — whitespace split, empties dropped;
    * identical to DuckDB `unnest(string_split(text,' '))`. */
  private def tokens(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as(tok))
      .filter(col(tok) =!= "")

  val catalog: Seq[Q] = Seq(
    // L25 — TF-IDF top-3 salient terms per document. Exact long score:
    // score6 = tf · ((N·10^6) DIV df). Ranking tie-broken by term.
    Q(
      "tx13_tfidf",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |  tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |         WHERE term <> '' GROUP BY 1, 2),
        |  df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        |  nn AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, rk, term, score6 FROM (
        |  SELECT tf.doc_id, tf.term,
        |    tf.tf * ((nn.n * 1000000) // df.df) AS score6,
        |    CAST(row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * ((nn.n * 1000000) // df.df) DESC, tf.term)
        |      AS BIGINT) AS rk
        |  FROM tf JOIN df USING (term) CROSS JOIN nn)
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val tf = tokens(docs).groupBy(col("doc_id"), col(tok).as("term"))
        .agg(count(lit(1)).as("tf"))
        .localCheckpoint(true) // feeds df AND the scored join — one pass
      val df = tf.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val scored = tf.join(broadcast(df), Seq("term"))
        .withColumn("score6", col("tf") * expr(s"(${n}L * 1000000L) DIV df"))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(desc("score6"), col("term")))
          .cast("long"))
        .filter(col("rk") <= 3)
        .select("doc_id", "rk", "term", "score6")
        .orderBy("doc_id", "rk")
    },

    // L26 — BM25 (k1=1.2, b=0.75) ranked retrieval for a fixed 3-term
    // query. idf6 integer as tx13; saturation term evaluated as the
    // identical double expression tree both engines; per-term partials
    // combined in FIXED order (pivot + literal additions).
    Q(
      "tx14_bm25",
      """WITH dl AS (SELECT doc_id,
        |              CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |            FROM documents),
        |  a AS (SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        |        FROM dl),
        |  tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |          FROM documents),
        |  tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |         WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2),
        |  df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        |  nn AS (SELECT count(*) AS n FROM documents),
        |  sc AS (SELECT tf.doc_id, tf.term,
        |           CAST((nn.n * 1000000) // df.df AS DOUBLE)
        |           * ((CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
        |              / (CAST(tf.tf AS DOUBLE)
        |                 + CAST(1.2 AS DOUBLE)
        |                   * (CAST(0.25 AS DOUBLE)
        |                      + CAST(0.75 AS DOUBLE)
        |                        * (CAST(dl.dl AS DOUBLE) / a.avgdl)))) AS sterm
        |         FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        |         CROSS JOIN a CROSS JOIN nn)
        |SELECT doc_id,
        |  coalesce(max(CASE WHEN term = 'spark'  THEN sterm END), CAST(0 AS DOUBLE))
        |  + coalesce(max(CASE WHEN term = 'window' THEN sterm END), CAST(0 AS DOUBLE))
        |  + coalesce(max(CASE WHEN term = 'merge'  THEN sterm END), CAST(0 AS DOUBLE))
        |    AS bm25
        |FROM sc GROUP BY 1 ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val terms = Seq("spark", "window", "merge")
      val dl = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"))
        .localCheckpoint(true) // avgdl agg + per-doc join below
      val avgdl = dl.agg((sum(col("dl")).cast("double")
        / count(lit(1)).cast("double")).as("avgdl"))
      val tf = tokens(docs).filter(col(tok).isin(terms: _*))
        .groupBy(col("doc_id"), col(tok).as("term"))
        .agg(count(lit(1)).as("tf"))
        .localCheckpoint(true) // feeds df AND the scored join
      val df = tf.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val tfd = col("tf").cast("double")
      val sterm = expr(s"CAST((${n}L * 1000000L) DIV df AS DOUBLE)")
        .*(tfd * lit(2.2) / (tfd + lit(1.2)
          * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl")))))
      val sc = tf.join(broadcast(df), Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(avgdl))
        .withColumn("sterm", sterm)
      def part(t: String) =
        coalesce(max(when(col("term") === t, col("sterm"))), lit(0.0))
      sc.groupBy("doc_id")
        .agg((part("spark") + part("window") + part("merge")).as("bm25"))
        .orderBy(desc("bm25"), col("doc_id"))
        .limit(20)
    },

    // L27 — within-document repetition analysis (Gopher-style quality
    // filter): per doc, the most-repeated word trigram, its count, and
    // the distinct/total trigram counts the repetition-ratio filters
    // use. All integers — no float score. Trigram explode is scan-local
    // (HOF transform off the hot path — this is per-doc metadata, not a
    // corpus join); argmax is a window top-1 tie-broken by trigram text.
    Q(
      "tx15_repetition",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3),
        |  g AS (SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS tri
        |        FROM t, LATERAL (SELECT unnest(range(1, len(l) - 1)) AS i) s),
        |  c AS (SELECT doc_id, tri, count(*) AS cnt FROM g GROUP BY 1, 2),
        |  s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
        |          CAST(sum(cnt) AS BIGINT) AS tot_tri
        |        FROM c GROUP BY 1),
        |  r AS (SELECT doc_id, tri, CAST(cnt AS BIGINT) AS top_cnt,
        |          row_number() OVER (PARTITION BY doc_id
        |            ORDER BY cnt DESC, tri) AS rk
        |        FROM c)
        |SELECT r.doc_id AS doc_id, tri AS top_tri, top_cnt, n_tri, tot_tri
        |FROM r JOIN s ON r.doc_id = s.doc_id
        |WHERE rk = 1 ORDER BY r.doc_id""".stripMargin
    ) { (s, d) =>
      val tris = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(l) - 3), i -> concat(l[i], ' ', l[i+1], ' ', l[i+2]))"))
          .as("tri"))
      val c = tris.groupBy("doc_id", "tri").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // stats agg + top-1 window both consume it
      val stats = c.groupBy("doc_id")
        .agg(count(lit(1)).as("n_tri"), sum(col("cnt")).as("tot_tri"))
      val top = c
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(desc("cnt"), col("tri"))))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("tri").as("top_tri"), col("cnt").as("top_cnt"))
      top.join(stats, Seq("doc_id"))
        .select("doc_id", "top_tri", "top_cnt", "n_tri", "tot_tri")
        .orderBy("doc_id")
    },

    // L98 — RAKE keyphrase extraction (Rapid Automatic Keyword
    // Extraction): candidate phrases are the maximal runs between
    // stopwords/punctuation (ONE scan-local regex split — the same
    // pattern string on both engines), word score = degree/freq as an
    // exact integer permille over the VOCABULARY-sized word frame,
    // phrase score = Σ word scores of its token instances. The corpus
    // is tokenized once; phrase re-scoring runs on DISTINCT phrase
    // strings (vocabulary-sized, not corpus-sized). Top-20 under a
    // total order (score desc, phrase asc).
    Q(
      "tx43_rake", {
        val stopRe =
          """\b(?:the|a|an|of|to|and|in|is|it|for|on|with|as|was|at|by|be|this|that|are|or|from)\b|[.!?,;:]"""
        s"""WITH seg AS (
           |  SELECT doc_id, trim(unnest(string_split_regex(text,
           |    '$stopRe'))) AS p
           |  FROM documents),
           |ph AS (
           |  SELECT doc_id, p, regexp_extract_all(p, '[a-z0-9]+') AS toks
           |  FROM seg
           |  WHERE len(regexp_extract_all(p, '[a-z0-9]+')) BETWEEN 1 AND 4),
           |ws AS (SELECT unnest(toks) AS w, len(toks) AS l FROM ph),
           |wstat AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
           |    CAST(sum(l) AS BIGINT) AS deg,
           |    (CAST(sum(l) AS BIGINT) * 1000) // count(*) AS score_pm
           |  FROM ws GROUP BY 1),
           |occ AS (SELECT p, count(*) AS n_occ FROM ph GROUP BY 1),
           |ptoks AS (
           |  SELECT p, unnest(regexp_extract_all(p, '[a-z0-9]+')) AS w
           |  FROM (SELECT DISTINCT p FROM ph)),
           |score AS (
           |  SELECT pt.p, CAST(sum(wstat.score_pm) AS BIGINT) AS score_pm
           |  FROM ptoks pt JOIN wstat ON pt.w = wstat.w GROUP BY 1)
           |SELECT s.p AS phrase, CAST(o.n_occ AS BIGINT) AS n_occ, s.score_pm
           |FROM score s JOIN occ o ON s.p = o.p
           |ORDER BY s.score_pm DESC, s.p LIMIT 20""".stripMargin
      }
    ) { (s, d) =>
      val stopRe =
        """\b(?:the|a|an|of|to|and|in|is|it|for|on|with|as|was|at|by|be|this|that|are|or|from)\b|[.!?,;:]"""
      val seg = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), stopRe)).as("p0"))
        .select(col("doc_id"), trim(col("p0")).as("p"))
      val ph = seg
        .withColumn("toks", expr("regexp_extract_all(p, '[a-z0-9]+', 0)"))
        .filter(size(col("toks")).between(1, 4))
        .localCheckpoint(true) // word stats, occurrences, and rescoring read it
      val wstat = ph.select(explode(col("toks")).as("w"),
          size(col("toks")).cast("long").as("l"))
        .groupBy("w")
        .agg(count(lit(1)).as("freq"), sum("l").as("deg"))
        .withColumn("score_pm", expr("(deg * 1000) DIV freq"))
      val occ = ph.groupBy("p").agg(count(lit(1)).as("n_occ"))
      val score = ph.select("p").distinct()
        .select(col("p"),
          explode(expr("regexp_extract_all(p, '[a-z0-9]+', 0)")).as("w"))
        .join(wstat.select("w", "score_pm"), "w")
        .groupBy("p").agg(sum("score_pm").as("score_pm"))
      score.join(occ, "p")
        .select(col("p").as("phrase"), col("n_occ"), col("score_pm"))
        .orderBy(desc("score_pm"), col("phrase")).limit(20)
    }
  )
}
