package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Character-class corpus profiling (r5): the script/charset surface a
  * training-data pipeline reads before choosing tokenizers and cleanup
  * rules. tx2 guesses the LANGUAGE, tx24 scores COMPLEXITY — this
  * measures the raw byte-class composition per source: which sources
  * carry digits, unexpected casing, or abnormal whitespace density,
  * and how long their words run.
  *
  * All ratios are exact integer permille: character-class counts come
  * from `length(x) − length(regexp_replace(x, class, ''))` (one
  * scan-local regex pass per class — no explode, no shuffle of text),
  * then ONE floor DIV against the total at the 20-row source frame.
  *
  * Reference intent: dias-hbp-sp8/Distributed-Query-Engine exposes
  * declarative SQL over raw text sources (DistributedQueryEngine.diff);
  * this is the standard profiling query over that surface.
  */
object TextProfile {

  val catalog: Seq[Q] = Seq(
    // R168 — per-source character-class profile. One documents pass;
    // per-row work is four regex strips + a split count, all inside the
    // scan; the aggregate is map-side combinable to |sources| rows.
    Q(
      "tx44_charset_profile",
      """WITH c AS (
        |  SELECT source,
        |    CAST(length(text) AS BIGINT) AS chars,
        |    CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS BIGINT) AS alpha,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS digit,
        |    CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS BIGINT) AS space,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS words
        |  FROM documents)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(chars) AS BIGINT) AS chars,
        |  (CAST(sum(alpha) AS BIGINT) * 1000) // CAST(sum(chars) AS BIGINT) AS alpha_permille,
        |  (CAST(sum(digit) AS BIGINT) * 1000) // CAST(sum(chars) AS BIGINT) AS digit_permille,
        |  (CAST(sum(space) AS BIGINT) * 1000) // CAST(sum(chars) AS BIGINT) AS space_permille,
        |  (CAST(sum(alpha) AS BIGINT) * 100) // CAST(sum(words) AS BIGINT) AS wordlen_e2
        |FROM c GROUP BY source ORDER BY source""".stripMargin
    ) { (s, d) =>
      val c = Tables.documents(s, d).select(
        col("source"),
        length(col("text")).cast("long").as("chars"),
        (length(col("text")) - length(regexp_replace(col("text"), "[a-z]", "")))
          .cast("long").as("alpha"),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("long").as("digit"),
        (length(col("text")) - length(regexp_replace(col("text"), "[ ]", "")))
          .cast("long").as("space"),
        size(split(col("text"), " ")).cast("long").as("words"))
      c.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("chars").as("chars"),
          expr("(sum(alpha) * 1000) DIV sum(chars)").as("alpha_permille"),
          expr("(sum(digit) * 1000) DIV sum(chars)").as("digit_permille"),
          expr("(sum(space) * 1000) DIV sum(chars)").as("space_permille"),
          expr("(sum(alpha) * 100) DIV sum(words)").as("wordlen_e2"))
        .orderBy("source")
    },

    // R198 — corpus-driven stopword discovery: the top-20 terms by
    // DOCUMENT frequency with their df share and token-mass share —
    // how a pipeline derives its stoplist from the data instead of
    // importing one (tx3's quality score and tx13's idf both assume
    // such a list exists). One token explode (scan-local), df from a
    // distinct-pair aggregate, top-20 a distributed TakeOrdered under
    // the (df, term) total order; corpus totals broadcast.
    Q(
      "tx48_stopword_discovery",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |             FROM documents),
        |tf AS (SELECT w, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1),
        |df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |       FROM tok GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |nt AS (SELECT CAST(sum(tf) AS BIGINT) AS nt FROM tf),
        |top AS (SELECT df.w, df.df, tf.tf FROM df JOIN tf ON df.w = tf.w
        |        ORDER BY df.df DESC, df.w LIMIT 20)
        |SELECT top.w AS term, top.df, top.tf,
        |  (top.df * 1000) // nd.nd AS df_permille,
        |  (top.tf * 1000) // nt.nt AS tf_share_pm
        |FROM top, nd, nt ORDER BY top.df DESC, term""".stripMargin
    ) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .localCheckpoint(true) // tf + df both read it
      val tf = tok.groupBy("w").agg(count(lit(1)).as("tf"))
      val df = tok.select("doc_id", "w").distinct()
        .groupBy("w").agg(count(lit(1)).as("df"))
      val nd = Tables.documents(s, d).agg(count(lit(1)).as("nd"))
      val nt = tf.agg(sum("tf").as("nt"))
      df.join(tf, "w")
        .orderBy(desc("df"), col("w")).limit(20)
        .crossJoin(broadcast(nd)).crossJoin(broadcast(nt))
        .select(col("w").as("term"), col("df"), col("tf"),
          expr("(df * 1000) DIV nd").as("df_permille"),
          expr("(tf * 1000) DIV nt").as("tf_share_pm"))
        .orderBy(desc("df"), col("term"))
    },

    // R199 — shingle document-frequency spectrum: the measurement
    // behind dd2/dd14's df-cap knob — how many 3-gram shingles live in
    // each power-of-two df band, and how much total occurrence mass
    // the hot bands carry. A corpus whose top band holds most mass
    // NEEDS the cap (bucket joins would explode); one whose spectrum
    // decays fast doesn't. Shingles via two pos+1 self-joins of the
    // positional token frame (tx45's machinery); the band is
    // length(bin(df)) — pure integer, no log2 float anywhere; the
    // spectrum lands on ≤~20 rows.
    Q(
      "dd21_shingle_spectrum",
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |sh AS (
        |  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
        |  FROM tok a
        |  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
        |df AS (SELECT shingle, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |       FROM sh GROUP BY 1),
        |bd AS (SELECT CAST(length(bin(df)) AS BIGINT) AS band, df FROM df)
        |SELECT band,
        |  CAST(1 AS BIGINT) << (CAST(band AS INT) - 1) AS df_lo,
        |  CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(df) AS BIGINT) AS sum_df
        |FROM bd GROUP BY band ORDER BY band""".stripMargin
    ) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .toDF("doc_id", "pos", "w")
        .localCheckpoint(true) // three-way positional self-join
      val sh = tok.as("a")
        .join(tok.select(col("doc_id"), (col("pos") - 1).as("pos"),
          col("w").as("wb")), Seq("doc_id", "pos"))
        .join(tok.select(col("doc_id"), (col("pos") - 2).as("pos"),
          col("w").as("wc")), Seq("doc_id", "pos"))
        .select(col("doc_id"),
          concat_ws(" ", col("w"), col("wb"), col("wc")).as("shingle"))
      val df = sh.distinct().groupBy("shingle").agg(count(lit(1)).as("df"))
      df.groupBy(length(bin(col("df"))).cast("long").as("band"))
        .agg(count(lit(1)).as("n_shingles"), sum("df").as("sum_df"))
        .withColumn("df_lo", expr("shiftleft(CAST(1 AS BIGINT), CAST(band AS INT) - 1)"))
        .select("band", "df_lo", "n_shingles", "sum_df")
        .orderBy("band")
    },

    // R218 — vocabulary coverage curve: what share of the token mass
    // the top-k most frequent terms carry (k = 10/100/1000) and the
    // smallest vocabulary covering 90% — THE number that sizes a
    // tokenizer's vocab budget (tx22 grows the vocab over docs, this
    // ranks it by mass). Term frequencies are one scan-local explode +
    // aggregate. SCALE: vocabulary grows with the corpus (Heaps' law —
    // 10⁸⁺ terms at 100 TB), so the global rank + running sum run
    // through Blocked.cumulative's two-level blocked form (per-block
    // windows + tiny offset join), NEVER an unpartitioned window; the
    // oracle keeps the plain window form. VocabCoveragePlanSpec pins
    // the physical plan free of single-partition WindowExec stages.
    Q(
      "tx49_vocab_coverage",
      """WITH tf AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1),
        |nt AS (SELECT CAST(sum(tf) AS BIGINT) AS nt FROM tf),
        |rk AS (SELECT tf,
        |         row_number() OVER (ORDER BY tf DESC, w) AS rn,
        |         sum(tf) OVER (ORDER BY tf DESC, w
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |       FROM tf),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM tf),
        |pick AS (SELECT
        |    CAST(max(CASE WHEN rn <= 10 THEN cum END) AS BIGINT) AS cum10,
        |    CAST(max(CASE WHEN rn <= 100 THEN cum END) AS BIGINT) AS cum100,
        |    CAST(max(CASE WHEN rn <= 1000 THEN cum END) AS BIGINT) AS cum1000,
        |    CAST(min(CASE WHEN cum * 10 >= (SELECT nt * 9 FROM nt) THEN rn END)
        |         AS BIGINT) AS k90
        |  FROM rk)
        |SELECT v.v AS vocab_size, nt.nt AS total_tokens,
        |  (pick.cum10 * 1000) // nt.nt AS top10_pm,
        |  (pick.cum100 * 1000) // nt.nt AS top100_pm,
        |  (pick.cum1000 * 1000) // nt.nt AS top1000_pm,
        |  pick.k90
        |FROM pick, nt, v""".stripMargin
    ) { (s, d) =>
      val tf = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nt = tf.agg(sum("tf").as("nt"))
      // blocked global order — no vocabulary-sized single-reducer window
      val rk = Blocked
        .cumulative(tf, Seq(desc("tf"), col("w")), Seq("tf"), rn = Some("rn"))
        .withColumnRenamed("cum_tf", "cum")
      val v = tf.agg(count(lit(1)).as("v"))
      val pick = rk.crossJoin(broadcast(nt)).agg(
        max(when(col("rn") <= 10, col("cum"))).as("cum10"),
        max(when(col("rn") <= 100, col("cum"))).as("cum100"),
        max(when(col("rn") <= 1000, col("cum"))).as("cum1000"),
        min(when(col("cum") * 10 >= col("nt") * 9, col("rn"))).as("k90"))
      pick.crossJoin(broadcast(nt)).crossJoin(broadcast(v))
        .select(col("v").as("vocab_size"), col("nt").as("total_tokens"),
          expr("(cum10 * 1000) DIV nt").as("top10_pm"),
          expr("(cum100 * 1000) DIV nt").as("top100_pm"),
          expr("(cum1000 * 1000) DIV nt").as("top1000_pm"),
          col("k90"))
    },

    // R224 — term burstiness (Church–Gale): terms whose occurrences
    // CLUSTER in few documents — burst = cf/df, the mean occurrences
    // per containing doc. A bursty term is topical (good retrieval
    // signal, bad stopword); a flat one is functional. tx48 ranks by
    // spread (df), this ranks by clustering — together they split the
    // vocabulary into stopword vs topic candidates. One explode pass
    // feeding cf and df aggregates; df≥5 floor keeps singleton noise
    // out; top-20 a distributed TakeOrdered.
    Q(
      "tx50_term_burstiness",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |             FROM documents),
        |cf AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM tok GROUP BY 1),
        |df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |       FROM tok GROUP BY 1)
        |SELECT cf.w AS term, cf.cf, df.df,
        |  (100 * cf.cf) // df.df AS burst_e2
        |FROM cf JOIN df ON cf.w = df.w
        |WHERE df.df >= 5
        |ORDER BY burst_e2 DESC, term LIMIT 20""".stripMargin
    ) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .localCheckpoint(true) // cf + df both read it
      val cf = tok.groupBy("w").agg(count(lit(1)).as("cf"))
      val df = tok.select("doc_id", "w").distinct()
        .groupBy("w").agg(count(lit(1)).as("df"))
      cf.join(df, "w")
        .filter(col("df") >= 5)
        .select(col("w").as("term"), col("cf"), col("df"),
          expr("(100 * cf) DIV df").as("burst_e2"))
        .orderBy(desc("burst_e2"), col("term")).limit(20)
    },

    // R232 — dictionary (lexicon) scoring: the rule-based scorer every
    // NLP pipeline starts from — per-doc polarity from an embedded
    // term lexicon (pos = {fast, big}, neg = {slow, small}: the
    // corpus's own antonym pairs), polarity = (pos−neg)·1000 DIV
    // (pos+neg), NULL when no lexicon term appears (not a neutral 0 —
    // absence of evidence). Token counting is scan-local; the source
    // rollup shows which feeds skew positive. Output: per-source
    // summary (doc rows would be fact-sized; the rollup is the
    // dashboard readout).
    Q(
      "tx51_lexicon_score",
      """WITH tok AS (SELECT doc_id, source,
        |    unnest(string_split(text, ' ')) AS w FROM documents),
        |sc AS (SELECT doc_id, source,
        |    CAST(sum(CASE WHEN w IN ('fast', 'big') THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |    CAST(sum(CASE WHEN w IN ('slow', 'small') THEN 1 ELSE 0 END) AS BIGINT) AS neg
        |  FROM tok GROUP BY 1, 2),
        |pol AS (SELECT source,
        |    CASE WHEN pos + neg = 0 THEN NULL
        |         ELSE ((pos - neg) * 1000) // (pos + neg) END AS pol_pm
        |  FROM sc)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(pol_pm) AS BIGINT) AS n_scored,
        |  CAST(sum(CASE WHEN pol_pm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive,
        |  CAST(sum(CASE WHEN pol_pm < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
        |  CAST(CASE WHEN count(pol_pm) = 0 THEN NULL
        |       ELSE sum(pol_pm) // count(pol_pm) END AS BIGINT) AS mean_pol_pm
        |FROM pol GROUP BY source ORDER BY source""".stripMargin
    ) { (s, d) =>
      val sc = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "source")
        .agg(sum(when(col("w").isin("fast", "big"), 1L).otherwise(0L)).as("pos"),
          sum(when(col("w").isin("slow", "small"), 1L).otherwise(0L)).as("neg"))
      val pol = sc.select(col("source"),
        when(col("pos") + col("neg") === 0, lit(null))
          .otherwise(expr("((pos - neg) * 1000) DIV (pos + neg)")).as("pol_pm"))
      pol.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count("pol_pm").as("n_scored"),
          sum(when(col("pol_pm") > 0, 1L).otherwise(0L)).as("n_positive"),
          sum(when(col("pol_pm") < 0, 1L).otherwise(0L)).as("n_negative"),
          expr("""CASE WHEN count(pol_pm) = 0 THEN NULL
            | ELSE sum(pol_pm) DIV count(pol_pm) END""".stripMargin)
            .cast("long").as("mean_pol_pm"))
        .orderBy("source")
    },

    // R237 — term positional-bias profile: WHERE in documents do the
    // query terms live — a term that front-loads is title/lede
    // material (a retrieval prior BM25 ignores; positional rankers
    // weight it). Relative position (10³·pos) DIV (len−1) exact per
    // occurrence off tx45's positional frame; per-term mean + the
    // first-third share; len>1 guard. Scan-local explode, 5-row
    // output.
    Q(
      "tx52_term_positions",
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w,
        |    unnest(range(0, len(string_split(text, ' ')))) AS pos,
        |    len(string_split(text, ' ')) AS len
        |  FROM documents),
        |hits AS (SELECT w, (1000 * pos) // (len - 1) AS relpos_pm
        |         FROM tok
        |         WHERE len > 1 AND w IN ('scan','merge','window','hash','join'))
        |SELECT w AS term,
        |  CAST(count(*) AS BIGINT) AS n_occ,
        |  CAST(sum(relpos_pm) // count(*) AS BIGINT) AS mean_relpos_pm,
        |  (CAST(sum(CASE WHEN relpos_pm < 333 THEN 1 ELSE 0 END) AS BIGINT) * 1000)
        |    // CAST(count(*) AS BIGINT) AS first_third_pm
        |FROM hits GROUP BY w ORDER BY w""".stripMargin
    ) { (s, d) =>
      val terms = Seq("scan", "merge", "window", "hash", "join")
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")),
          size(split(col("text"), " ")).as("len"))
        .toDF("doc_id", "pos", "w", "len")
      tok.filter(col("len") > 1 && col("w").isin(terms: _*))
        .select(col("w"), expr("(1000 * pos) DIV (len - 1)").as("relpos_pm"))
        .groupBy(col("w").as("term"))
        .agg(count(lit(1)).as("n_occ"),
          expr("sum(relpos_pm) DIV count(*)").as("mean_relpos_pm"),
          expr("""(sum(CASE WHEN relpos_pm < 333 THEN 1 ELSE 0 END) * 1000)
            | DIV count(*)""".stripMargin).as("first_third_pm"))
        .orderBy("term")
    },

    // R239 — character-level entropy per source: the ORACLE-CHECKED
    // compressibility proxy beside rows-only tx37 (DEFLATE ratios
    // have no cross-engine oracle; char-unigram entropy bounds the
    // same signal and is exact). Per-char counts come from 27
    // scan-local replace-and-measure passes (a broadcast alphabet
    // frame × length(text)−length(replace(text,ch,'')) — text never
    // shuffles, no char explode); entropy is the tx27 quantize-once
    // sum over (source, char) cells.
    Q(
      "tx53_char_entropy",
      """WITH al AS (SELECT unnest(string_split(
        |    'a b c d e f g h i j k l m n o p q r s t u v w x y z', ' ')) AS ch
        |  UNION ALL SELECT ' '),
        |cnt AS (
        |  SELECT d.source, a.ch,
        |    CAST(sum(length(d.text) - length(replace(d.text, a.ch, ''))) AS BIGINT) AS c
        |  FROM documents d CROSS JOIN al a
        |  GROUP BY 1, 2),
        |nz AS (SELECT source, ch, c FROM cnt WHERE c > 0),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM nz GROUP BY 1)
        |SELECT nz.source,
        |  CAST(count(*) AS BIGINT) AS n_chars_used,
        |  tot.t AS total_chars,
        |  CAST(sum(nz.c * CAST(round(1000000 *
        |    log2(CAST(tot.t AS DOUBLE) / nz.c)) AS BIGINT)) // tot.t AS BIGINT)
        |    AS entropy_e6
        |FROM nz JOIN tot ON nz.source = tot.source
        |GROUP BY nz.source, tot.t ORDER BY nz.source""".stripMargin
    ) { (s, d) =>
      val alphabet = ("abcdefghijklmnopqrstuvwxyz".map(_.toString) :+ " ").toSeq
      val al = alphabet.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        (acc, ch) =>
          val one = Tables.documents(s, d).sparkSession.range(1)
            .select(lit(ch).as("ch"))
          Some(acc.fold(one)(_ unionAll one))
      }.get
      val cnt = Tables.documents(s, d).select(col("source"), col("text"))
        .crossJoin(broadcast(al))
        .groupBy("source", "ch")
        .agg(sum(length(col("text"))
          - length(expr("replace(text, ch, '')"))).as("c"))
      val nz = cnt.filter(col("c") > 0).localCheckpoint(true)
      val tot = nz.groupBy("source").agg(sum("c").as("t"))
      nz.join(broadcast(tot), "source")
        .groupBy("source", "t")
        .agg(count(lit(1)).as("n_chars_used"),
          expr("""CAST(sum(c * CAST(round(1000000 *
            | log2(CAST(t AS DOUBLE) / c)) AS BIGINT)) DIV t AS BIGINT)"""
            .stripMargin).as("entropy_e6"))
        .select(col("source"), col("n_chars_used"),
          col("t").as("total_chars"), col("entropy_e6"))
        .orderBy("source")
    },

    // R245 — hapax-legomena ratio per source: the share of a source's
    // vocabulary that appears exactly once (within the source) — the
    // classic lexical-richness statistic (a high hapax share means the
    // vocabulary hasn't saturated and tx22's growth curve is still
    // climbing; near-zero means templated text). One explode pass to
    // (source, term) cells, two dimension-sized aggregates.
    Q(
      "tx54_hapax_ratio",
      """WITH tf AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS cf FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1, 2)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS vocab,
        |  CAST(sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |  (CAST(sum(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000)
        |    // CAST(count(*) AS BIGINT) AS hapax_pm
        |FROM tf GROUP BY source ORDER BY source""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("cf"))
        .groupBy("source")
        .agg(count(lit(1)).as("vocab"),
          sum(when(col("cf") === 1, 1L).otherwise(0L)).as("hapax"))
        .withColumn("hapax_pm", expr("(hapax * 1000) DIV vocab"))
        .orderBy("source")
    },

    // R257 — per-source unigram entropy (nats, e6-quantized): the
    // information density of each source's token stream — low entropy
    // = templated/repetitive text (dedup/cleanup candidate), high =
    // diverse natural text; THE summary statistic next to tx54's hapax
    // share when deciding a source's mix weight. H = Σ p·ln(1/p) with
    // p = cf/N per source; ln comes from graft.functions.PinnedMath
    // (the ml36 machinery — both engines run the SAME ladder+series
    // text, so the per-term e6 floor can never disagree), each term
    // floored to a BIGINT BEFORE the sum so the fold is
    // order-invariant. One (source, term) shuffle, dimension-sized
    // output; x = N/cf ≥ 1 keeps the ladder in its trivial-sign branch.
    Q(
      "tx57_source_entropy",
      """WITH tf AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS cf FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1, 2),
        |nt AS (SELECT source, CAST(sum(cf) AS BIGINT) AS n,
        |              CAST(count(*) AS BIGINT) AS vocab
        |       FROM tf GROUP BY 1),
        |terms0 AS (SELECT tf.source, nt.n, nt.vocab,
        |    CAST(tf.cf AS DOUBLE) / nt.n AS p,
        |    CAST(nt.n AS DOUBLE) / tf.cf AS x
        |  FROM tf JOIN nt ON tf.source = nt.source),
        |""".stripMargin + graft.functions.PinnedMath.lnCtes("terms0") +
      """t AS (SELECT source, n, vocab,
        |    CAST(floor(1000000.0 * p * lnx) AS BIGINT) AS t_micro FROM plF)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_tokens,
        |  CAST(max(vocab) AS BIGINT) AS vocab,
        |  CAST(sum(t_micro) AS BIGINT) AS entropy_micro
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val tf = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("cf"))
      val nt = tf.groupBy("source")
        .agg(sum("cf").as("n"), count(lit(1)).as("vocab"))
      val terms0 = tf.join(broadcast(nt), Seq("source"))
        .select(col("source"), col("n"), col("vocab"),
          (col("cf").cast("double") / col("n")).as("p"),
          (col("n").cast("double") / col("cf")).as("x"))
      graft.functions.PinnedMath.withLnx(terms0)
        .select(col("source"), col("n"), col("vocab"),
          floor(lit(1000000.0) * col("p") * col("lnx")).cast("long")
            .as("t_micro"))
        .groupBy("source")
        .agg(max("n").as("n_tokens"), max("vocab").as("vocab"),
          sum("t_micro").as("entropy_micro"))
        .orderBy("source")
    },

    // R258 — per-source vocabulary Jensen-Shannon divergence vs the
    // corpus-wide unigram distribution: the corpus-MIX drift readout —
    // which source's language is furthest from the blend it feeds
    // (0 = identical, ln2·10⁶ ≈ 693147 = disjoint). JSD(P‖Q) =
    // ½Σ p·ln(2p/(p+q)) + ½Σ q·ln(2q/(p+q)) over the GLOBAL vocabulary
    // (q > 0 everywhere by construction; p = 0 terms contribute only
    // the q side, so the p-branch rows are dropped exactly when p = 0
    // — 0·ln0 = 0). Both log branches ride ONE PinnedMath chain by
    // UNION-ALL-ing (coef, x) rows, each term e6-floored pre-sum with
    // the ½ folded in (5e5). Frame: |sources|·|global vocab| rows via
    // a broadcast of the source list — fixed-width at any corpus size.
    Q(
      "tx58_vocab_jsd",
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |             FROM documents),
        |sc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS cs
        |       FROM tok GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(cs) AS BIGINT) AS n_s FROM sc GROUP BY 1),
        |g AS (SELECT w, CAST(count(*) AS BIGINT) AS cg FROM tok GROUP BY 1),
        |ng AS (SELECT CAST(sum(cg) AS BIGINT) AS n_g FROM g),
        |f AS (SELECT ns.source, g.w, coalesce(sc.cs, 0) AS cs, g.cg,
        |             ns.n_s, ng.n_g
        |      FROM g CROSS JOIN ns CROSS JOIN ng
        |      LEFT JOIN sc ON sc.source = ns.source AND sc.w = g.w),
        |pq AS (SELECT source, cs,
        |    CAST(cs AS DOUBLE) / n_s AS p, CAST(cg AS DOUBLE) / n_g AS q
        |  FROM f),
        |terms0 AS (
        |  SELECT source, p AS coef, (2.0 * p) / (p + q) AS x FROM pq WHERE cs > 0
        |  UNION ALL
        |  SELECT source, q AS coef, (2.0 * q) / (p + q) AS x FROM pq),
        |""".stripMargin + graft.functions.PinnedMath.lnCtes("terms0") +
      """t AS (SELECT source,
        |    CAST(floor(500000.0 * coef * lnx) AS BIGINT) AS t_micro FROM plF)
        |SELECT source, CAST(sum(t_micro) AS BIGINT) AS jsd_micro
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .localCheckpoint(true) // source counts + global counts, one pass
      val sc = tok.groupBy("source", "w").agg(count(lit(1)).as("cs"))
      val ns = sc.groupBy("source").agg(sum("cs").as("n_s"))
      val g = tok.groupBy("w").agg(count(lit(1)).as("cg"))
      val ng = g.agg(sum("cg").as("n_g"))
      val f = g.crossJoin(broadcast(ns)).crossJoin(broadcast(ng))
        .join(sc, Seq("source", "w"), "left")
        .select(col("source"),
          coalesce(col("cs"), lit(0L)).as("cs"), col("cg"),
          col("n_s"), col("n_g"))
      val pq = f.select(col("source"), col("cs"),
        expr("CAST(cs AS DOUBLE) / n_s").as("p"),
        expr("CAST(cg AS DOUBLE) / n_g").as("q"))
      val termsP = pq.filter(col("cs") > 0)
        .select(col("source"), col("p").as("coef"),
          expr("(2.0 * p) / (p + q)").as("x"))
      val termsQ = pq
        .select(col("source"), col("q").as("coef"),
          expr("(2.0 * q) / (p + q)").as("x"))
      graft.functions.PinnedMath.withLnx(termsP.unionByName(termsQ))
        .select(col("source"),
          floor(lit(500000.0) * col("coef") * col("lnx")).cast("long")
            .as("t_micro"))
        .groupBy("source").agg(sum("t_micro").as("jsd_micro"))
        .orderBy("source")
    }
  )
}
