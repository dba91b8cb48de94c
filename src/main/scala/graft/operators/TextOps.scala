package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis catalog (SURVEY.md §2 L9–L12) over the `documents`
  * table: token counting, language-ID heuristic, quality scoring, and
  * document fingerprinting. All pure `functions._` arithmetic — scan-local,
  * no shuffle, embarrassingly parallel at 100 TB.
  */
object TextOps {
  /** regexp hit-count, identical semantics in Spark and DuckDB RE2. */
  private def hits(c: Column, re: String): Column =
    regexp_count(c, lit(re)).cast("long")

  /** Overlapping token chunking (L38) shared by `tx18_chunk_overlap`
    * and the pp3 composed pipeline — ONE copy of the window/step/slice
    * recipe so the stages can't drift apart: appends (chunk_idx, chunk)
    * rows for the whitespace tokens of `textCol`, carrying every other
    * column through. Chunk count = ceil((L − overlap) / step), min 1;
    * scan-local (tokenize once, `sequence` indices, slice the same
    * array). */
  private[graft] def chunked(df: DataFrame, textCol: Column,
                             win: Int = 20, overlap: Int = 5): DataFrame = {
    val step = win - overlap
    val nc = greatest(lit(1L),
      ceil((size(col("__toks")) - overlap).cast("double") / step).cast("long"))
    df.withColumn("__toks", split(trim(textCol), "\\s+"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), nc - 1)))
      .withColumn("chunk", array_join(slice(col("__toks"),
        (col("chunk_idx") * step + 1).cast("int"), lit(win)), " "))
      .drop("__toks")
  }

  private val enRe = "\\b(the|a|of|and)\\b"
  private val esRe = "\\b(el|la|los|una)\\b"
  private val deRe = "\\b(der|die|das|und)\\b"
  private val frRe = "\\b(le|les|une|et)\\b"

  val catalog: Seq[Q] = Seq(
    // L11 — whitespace tokens + regex (BPE-ish word-piece) tokens.
    Q(
      "tx1_tokens",
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text,'[a-z0-9]+')) AS BIGINT) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ws_tokens"),
          hits(col("text"), "[a-z0-9]+").as("re_tokens"))
        .orderBy("doc_id")
    },

    // L9 — stopword n-gram language-ID: per-language hit scores, argmax.
    Q(
      "tx2_langid",
      s"""SELECT doc_id, s_en, s_es, s_de, s_fr,
         |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de'
         |       ELSE 'fr' END AS pred_lang
         |FROM (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,'$enRe')) AS BIGINT) AS s_en,
         |  CAST(len(regexp_extract_all(text,'$esRe')) AS BIGINT) AS s_es,
         |  CAST(len(regexp_extract_all(text,'$deRe')) AS BIGINT) AS s_de,
         |  CAST(len(regexp_extract_all(text,'$frRe')) AS BIGINT) AS s_fr
         |FROM documents) ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          hits(col("text"), enRe).as("s_en"), hits(col("text"), esRe).as("s_es"),
          hits(col("text"), deRe).as("s_de"), hits(col("text"), frRe).as("s_fr"))
        .withColumn("pred_lang",
          when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
            .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
            .when(col("s_de") >= col("s_fr"), "de")
            .otherwise("fr"))
        .orderBy("doc_id")
    },

    // L10 — quality scoring from length / word-count / stopword ratios.
    // All outputs are RAW doubles from identical IEEE expression trees on
    // both engines → bit-identical without rounding (round(x,k) is not
    // portable at decimal midpoints; see SURVEY.md §5).
    Q(
      "tx3_quality",
      """SELECT doc_id, n_words, avg_word_len, stop_ratio,
        |  least(1.0, CAST(n_words AS DOUBLE)/50.0)
        |    * (1.0 - least(1.0, abs(avg_word_len - 5.0)/10.0)) AS quality
        |FROM (SELECT doc_id,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |    CAST(length(text) AS DOUBLE) / CAST(len(string_split(text,' ')) AS DOUBLE)
        |      AS avg_word_len,
        |    CAST(len(regexp_extract_all(text,'\b(the|a|of|and)\b')) AS DOUBLE)
        |      / CAST(len(string_split(text,' ')) AS DOUBLE) AS stop_ratio
        |  FROM documents) ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          (length(col("text")).cast("double") / size(split(col("text"), " ")).cast("double"))
            .as("avg_word_len"),
          (hits(col("text"), enRe).cast("double") / size(split(col("text"), " ")).cast("double"))
            .as("stop_ratio"))
        .select(col("doc_id"), col("n_words"), col("avg_word_len"), col("stop_ratio"),
          (least(lit(1.0), col("n_words").cast("double") / 50.0)
            * (lit(1.0) - least(lit(1.0), abs(col("avg_word_len") - 5.0) / 10.0)))
            .as("quality"))
        .orderBy("doc_id")
    },

    // Composed training-data cleaning pipeline: per-doc stats → quality
    // gate → fingerprint dedup (keep lowest id) → per-language corpus
    // stats. The end-to-end shape a 100 TB ingest run takes: stats are
    // scan-local, the gate prunes before the only shuffles (fingerprint
    // group + join back), and only fixed-width columns shuffle.
    Q(
      "pp1_clean_pipeline",
      """WITH stats AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
        |    md5(lower(regexp_replace(text,'\s+',' ','g'))) AS fp
        |  FROM documents),
        |filtered AS (SELECT * FROM stats WHERE n_words >= 20),
        |keep AS (SELECT fp, min(doc_id) AS keep_id FROM filtered GROUP BY 1),
        |kept AS (SELECT f.* FROM filtered f JOIN keep k ON f.doc_id = k.keep_id)
        |SELECT lang, count(*) AS docs, CAST(sum(n_words) AS BIGINT) AS tokens
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val stats = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          md5(lower(regexp_replace(col("text"), "\\s+", " ")).cast("binary")).as("fp"))
      val filtered = stats.filter(col("n_words") >= 20)
      val keep = filtered.groupBy("fp").agg(min("doc_id").as("keep_id"))
      filtered.join(keep, filtered("doc_id") === keep("keep_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"), sum("n_words").as("tokens"))
        .orderBy("lang")
    },

    // L35 — composed corpus-rebalance pipeline (the tx17 → tx12 → stats
    // composition run as ONE declarative plan): per-language mixture
    // weights (uniform target, downsample-only — weight capped at 10^6;
    // upsampling means duplication, a policy call left to the caller),
    // applied by the salted-hash deterministic sampler, then the
    // post-sample mix audited in integer permille. The keep test maps
    // weight6 → a 16-bit hex threshold compared against 4 md5 hex chars
    // — pure string/int ops, identical both engines, retry-stable, and
    // independent of tx9/tx12's decisions (different salt). The skewed
    // `lang` column (en ≈ 3.4× fr) makes the rebalance non-degenerate.
    Q(
      "pp2_rebalance_pipeline",
      """WITH s AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |  t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
        |          CAST(count(*) AS BIGINT) AS k FROM s),
        |  w AS (SELECT lang, n_docs,
        |          least(((total // k) * 1000000) // n_docs, 1000000) AS w6
        |        FROM s CROSS JOIN t),
        |  kept AS (SELECT d.lang, count(*) AS n_after
        |           FROM documents d JOIN w USING (lang)
        |           WHERE w.w6 >= 1000000
        |              OR substring(md5(CAST(doc_id AS VARCHAR) || '#rebal'), 1, 4)
        |                 < printf('%04x', CAST((w6 * 65536) // 1000000 AS INT))
        |           GROUP BY 1),
        |  t2 AS (SELECT CAST(sum(n_after) AS BIGINT) AS ta FROM kept)
        |SELECT w.lang, CAST(w.n_docs AS BIGINT) AS n_before,
        |  CAST(coalesce(kept.n_after, 0) AS BIGINT) AS n_after,
        |  CAST(coalesce(kept.n_after, 0) * 1000 AS BIGINT) // ta AS mix_permille
        |FROM w LEFT JOIN kept USING (lang) CROSS JOIN t2
        |ORDER BY w.lang""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val byLang = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .localCheckpoint(true) // weights + final report share one scan
      val tot = byLang.agg(sum(col("n_docs")).as("total"),
        count(lit(1)).cast("long").as("k"))
      val w = byLang.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          least(expr("((total DIV k) * 1000000) DIV n_docs"), lit(1000000L)).as("w6"))
      val kept = docs.join(broadcast(w.select("lang", "w6")), Seq("lang"))
        .filter(col("w6") >= 1000000L
          || substring(md5(concat(col("doc_id").cast("string"), lit("#rebal"))
            .cast("binary")), 1, 4)
            < format_string("%04x", expr("CAST((w6 * 65536) DIV 1000000 AS INT)")))
        .groupBy("lang").agg(count(lit(1)).as("n_after"))
        .localCheckpoint(true) // total agg + final join — one filter scan
      val t2 = kept.agg(sum(col("n_after")).as("ta"))
      w.join(kept, Seq("lang"), "left").crossJoin(broadcast(t2))
        .select(col("lang"), col("n_docs").as("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"),
          expr("coalesce(n_after, 0L) * 1000 DIV ta").as("mix_permille"))
        .orderBy("lang")
    },

    // Higher-order functions over collections (lambda filter/transform) —
    // RAW's collection-valued expressions, codegen'd where the lambda is
    // simple.
    Q(
      "tx6_higher_order",
      """SELECT doc_id,
        |  CAST(len(list_filter(ws, w -> length(w) > 4)) AS BIGINT) AS n_long,
        |  array_to_string(list_transform(ws[1:3], w -> upper(w)), ' ') AS head_upper
        |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          size(filter(col("ws"), w => length(w) > 4)).cast("long").as("n_long"),
          array_join(transform(slice(col("ws"), 1, 3), w => upper(w)), " ")
            .as("head_upper"))
        .orderBy("doc_id")
    },

    // Array indexing (1-based / from-end) — RAW collection element access.
    Q(
      "tx5_array_index",
      """SELECT doc_id, ws[1] AS first_word, ws[len(ws)] AS last_word,
        |  CAST(len(ws) AS BIGINT) AS n
        |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          element_at(col("ws"), 1).as("first_word"),
          element_at(col("ws"), -1).as("last_word"),
          size(col("ws")).cast("long").as("n"))
        .orderBy("doc_id")
    },

    // Map-typed columns (RAW record/collection nesting): per-source
    // lang→count map built from sorted entries, exploded back to rows.
    // The oracle checks the flattened form; the map round-trip is the
    // Spark-side capability under test.
    Q(
      "mp1_map_roundtrip",
      """SELECT source, lang, count(*) AS n FROM documents
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("source", "lang").agg(count(lit(1)).as("n"))
        .groupBy("source")
        .agg(map_from_entries(array_sort(collect_list(struct(col("lang"), col("n")))))
          .as("lang_counts"))
        .select(col("source"), explode(col("lang_counts")).as(Seq("lang", "n")))
        .orderBy("source", "lang")
    },

    // L12 — normalization fingerprint (whitespace-collapse + lower + md5).
    Q(
      "tx4_fingerprint",
      """SELECT doc_id, md5(lower(regexp_replace(text,'\s+',' ','g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(lower(regexp_replace(col("text"), "\\s+", " ")).cast("binary")).as("fp"))
        .orderBy("doc_id")
    },

    // L17 — deterministic global shuffle (pre-training data order): total
    // order by a seeded content hash. At scale this is a range-partitioned
    // total sort on a uniform key — the ONLY correct way to globally
    // shuffle a 100 TB corpus (per-partition shuffles leave shard-level
    // correlations; rand() isn't retry-stable). Changing the seed literal
    // gives a fresh epoch permutation.
    Q(
      "tx7_shuffle_order",
      """SELECT doc_id, md5(concat(CAST(doc_id AS VARCHAR), ':42')) AS shuffle_key
        |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat(col("doc_id").cast("string"), lit(":42")).cast("binary"))
            .as("shuffle_key"))
        .orderBy("shuffle_key", "doc_id")
    },

    // L18 — sequence packing: greedy fill of fixed token-budget context
    // windows (2048 here), packed independently PER LANGUAGE SHARD — the
    // running token sum is a window partitioned by lang, so no unbounded
    // single-partition window; real pipelines shard by output file the
    // same way. A doc goes to the window its FIRST token lands in
    // (floor((cum - n_tok)/budget)).
    Q(
      "tx8_pack_sequences",
      """WITH t AS (SELECT lang, doc_id,
        |             CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |c AS (SELECT lang, doc_id, n_tok,
        |        sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t)
        |SELECT lang, CAST(floor((cum - n_tok)/2048.0) AS BIGINT) AS pack_id,
        |  count(*) AS docs, CAST(sum(n_tok) AS BIGINT) AS tokens
        |FROM c GROUP BY 1,2 ORDER BY 1,2""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("cum", sum("n_tok").over(w))
        .groupBy(col("lang"),
          floor((col("cum") - col("n_tok")) / 2048.0).cast("long").as("pack_id"))
        .agg(count(lit(1)).as("docs"), sum("n_tok").as("tokens"))
        .orderBy("lang", "pack_id")
    },

    // L21 — sensitive-term scrubbing: regex redaction with an audit count,
    // the PII-removal shape (emails/phones/SSNs in production; the
    // synthetic corpus has no such patterns, so two stand-in terms play
    // the role — the operator is the regexp machinery, scan-local and
    // codegen'd, not the pattern). n_redactions > 0 keeps the check
    // non-vacuous.
    Q(
      "tx10_redact",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(spark|query)\b')) AS BIGINT)
        |    AS n_redactions,
        |  md5(regexp_replace(text, '\b(spark|query)\b', '<TERM>', 'g')) AS redacted_fp
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_count(col("text"), lit("\\b(spark|query)\\b")).cast("long")
            .as("n_redactions"),
          md5(regexp_replace(col("text"), "\\b(spark|query)\\b", "<TERM>")
            .cast("binary")).as("redacted_fp"))
        .orderBy("doc_id")
    },

    // L19 — deterministic train/val/test split: first hex digit of the
    // id hash partitions 75/12.5/12.5 (hex digits 0-b → train = 12/16,
    // c-d → val = 2/16, e-f → test = 2/16) via portable STRING-range
    // comparison (no engine-specific hex→int conversion). Content-hash
    // splits stay stable as the corpus grows — the property a training
    // pipeline needs so val examples never leak into train between runs.
    Q(
      "tx9_split",
      """SELECT split, count(*) AS docs, CAST(sum(n_tok) AS BIGINT) AS tokens
        |FROM (SELECT CASE WHEN h < 'c' THEN 'train'
        |                  WHEN h < 'e' THEN 'val'
        |                  ELSE 'test' END AS split, n_tok
        |      FROM (SELECT substring(md5(CAST(doc_id AS VARCHAR)),1,1) AS h,
        |              CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
        |            FROM documents))
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1).as("h"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .select(
          when(col("h") < "c", "train").when(col("h") < "e", "val")
            .otherwise("test").as("split"),
          col("n_tok"))
        .groupBy("split")
        .agg(count(lit(1)).as("docs"), sum("n_tok").as("tokens"))
        .orderBy("split")
    },

    // L24 — deterministic stratified sampling (corpus rebalancing): keep
    // a per-stratum fraction — here downsample the dominant language to
    // ~50% and keep the rest — selected by an id-hash range test (md5
    // hex prefix, the tx9 portability pattern), so the sample is
    // retry-stable, grows stably with the corpus, and is reproducible
    // cross-engine (no rand(), no sampleBy RNG). The hash input is
    // SALTED ('#sample') so the decision is independent of tx9's
    // train/val/test split, which hashes the same ids — unsalted, every
    // sampled dominant-language doc would land in the same splits.
    // Scan-local filter; the only shuffle is the per-language audit agg.
    Q(
      "tx12_stratified_sample",
      """SELECT lang, count(*) AS n_sampled,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sampled
        |FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR) || '#sample'), 1, 2)
        |      < CASE WHEN lang = 'en' THEN '80' ELSE 'gg' END
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .filter(substring(
          md5(concat(col("doc_id").cast("string"), lit("#sample")).cast("binary")), 1, 2)
          < when(col("lang") === "en", lit("80")).otherwise(lit("gg")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"),
          sum("n_chars").as("chars_sampled"))
        .orderBy("lang")
    },

    // L10b — lexical-diversity quality signal (type-token ratio): the
    // repetition filter a training corpus actually applies — boilerplate
    // and bot text sit at low TTR. Scan-local per doc; tokens lowered,
    // empty tokens (double spaces) filtered on BOTH engines so counts
    // match; raw double division is bit-portable (identical IEEE trees).
    Q(
      "tx11_lexical_diversity",
      """SELECT doc_id,
        |  CAST(len(list_distinct(list_filter(string_split(lower(text),' '), x -> x <> ''))) AS BIGINT)
        |    AS n_types,
        |  CAST(len(list_filter(string_split(lower(text),' '), x -> x <> '')) AS BIGINT) AS n_tokens,
        |  CASE WHEN len(list_filter(string_split(lower(text),' '), x -> x <> '')) = 0 THEN NULL
        |       ELSE CAST(len(list_distinct(list_filter(string_split(lower(text),' '), x -> x <> ''))) AS DOUBLE)
        |            / len(list_filter(string_split(lower(text),' '), x -> x <> '')) END AS ttr
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val toks = filter(split(lower(col("text")), " "), t => t =!= "")
      // explicit zero-token guard: engines disagree on 0.0/0 (NULL vs
      // NaN depending on IEEE settings) — NULL on both sides by contract
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(array_distinct(toks)).cast("long").as("n_types"),
          size(toks).cast("long").as("n_tokens"),
          when(size(toks) === 0, lit(null).cast("double"))
            .otherwise(size(array_distinct(toks)).cast("double") / size(toks))
            .as("ttr"))
        .orderBy("doc_id")
    },

    // L38 — overlapping document chunking (RAG / context-window prep):
    // each doc split into 20-token windows advancing by 15 (5-token
    // overlap carries context across boundaries — the standard retrieval
    // chunking recipe). Scan-local: tokenize once, generate chunk
    // indices with `sequence`, slice the SAME token array per index —
    // no shuffle, no self-join; output grows ~L/step per doc, linear.
    // Chunk count = ceil((L − overlap) / step), min 1, so the final
    // window is allowed to run short but every token lands in ≥ 1 chunk
    // and consecutive chunks share exactly `overlap` tokens (spec'd;
    // docs shorter than one window yield themselves). Identical
    // 1-based slice semantics both engines (Spark slice(arr, start,
    // len) ≡ DuckDB arr[start : start+len−1]).
    Q(
      "tx18_chunk_overlap",
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |           FROM documents),
        |n AS (SELECT doc_id, toks,
        |        greatest(1, CAST(ceil((len(toks) - 5) / 15.0) AS BIGINT)) AS nc
        |      FROM t),
        |c AS (SELECT doc_id, i AS chunk_idx,
        |        array_to_string(toks[i*15+1 : i*15+20], ' ') AS chunk
        |      FROM n, LATERAL (SELECT unnest(range(0, nc)) AS i) s)
        |SELECT doc_id, chunk_idx, chunk,
        |  CAST(len(string_split_regex(chunk, '\s+')) AS BIGINT) AS n_tok
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
    ) { (s, d) =>
      chunked(Tables.documents(s, d).select(col("doc_id"), col("text")), col("text"))
        .select(col("doc_id"), col("chunk_idx"), col("chunk"))
        .withColumn("n_tok", size(split(col("chunk"), "\\s+")).cast("long"))
        .orderBy("doc_id", "chunk_idx")
    },

    // L65 — C4-style cleaning-rule report (the Raffel et al. 2020 web-
    // text recipe, ADAPTED to this corpus so every rule discriminates —
    // the synthetic docs carry no punctuation/braces, so C4's literal
    // terminal-punctuation/brace/lorem rules are replaced by the
    // recipe's other members: minimum length, must-contain-a-stopword,
    // stopword-saturation, and word-shape sanity): per-rule violation
    // counts plus the kept-set size in ONE scan — word counts, stopword
    // counts (higher-order `filter`, no explode) and the DIV-integral
    // mean word length are all scan-local codegen'd arithmetic. The
    // REPORT form (violations per rule, not just a kept set) is what a
    // pipeline owner tunes against; tx3/tx15 carry the Gopher-style
    // numeric side. All-integer output.
    Q(
      "tx36_c4_filters",
      """WITH t AS (SELECT string_split(text, ' ') AS a FROM documents),
        |f AS (
        |  SELECT len(a) AS w,
        |    len(list_filter(a, x -> x = 'a' OR x = 'the')) AS stop,
        |    (10 * len(array_to_string(a, ''))) // len(a) AS ml10
        |  FROM t),
        |r AS (
        |  SELECT
        |    CASE WHEN w < 30 THEN 1 ELSE 0 END AS too_short,
        |    CASE WHEN stop = 0 THEN 1 ELSE 0 END AS no_stopword,
        |    CASE WHEN 5 * stop > w THEN 1 ELSE 0 END AS stopword_heavy,
        |    CASE WHEN ml10 BETWEEN 35 AND 45 THEN 0 ELSE 1 END AS odd_word_len
        |  FROM f)
        |SELECT count(*) AS n_docs,
        |  CAST(sum(too_short) AS BIGINT) AS too_short,
        |  CAST(sum(no_stopword) AS BIGINT) AS no_stopword,
        |  CAST(sum(stopword_heavy) AS BIGINT) AS stopword_heavy,
        |  CAST(sum(odd_word_len) AS BIGINT) AS odd_word_len,
        |  CAST(sum(CASE WHEN too_short + no_stopword + stopword_heavy
        |                     + odd_word_len = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept
        |FROM r""".stripMargin
    ) { (s, d) =>
      val f = Tables.documents(s, d).select(
        size(split(col("text"), " ")).cast("long").as("w"),
        expr("CAST(size(filter(split(text, ' '), x -> x = 'a' OR x = 'the')) AS BIGINT)")
          .as("stop"),
        expr("""(10 * length(array_join(split(text, ' '), '')))
               | DIV size(split(text, ' '))""".stripMargin).as("ml10"))
      val r = f.select(
        when(col("w") < 30, 1L).otherwise(0L).as("too_short"),
        when(col("stop") === 0, 1L).otherwise(0L).as("no_stopword"),
        when(lit(5) * col("stop") > col("w"), 1L).otherwise(0L)
          .as("stopword_heavy"),
        when(col("ml10").between(35, 45), 0L).otherwise(1L).as("odd_word_len"))
      r.agg(count(lit(1)).as("n_docs"),
        sum("too_short").as("too_short"), sum("no_stopword").as("no_stopword"),
        sum("stopword_heavy").as("stopword_heavy"),
        sum("odd_word_len").as("odd_word_len"),
        sum(when(col("too_short") + col("no_stopword") + col("stopword_heavy")
          + col("odd_word_len") === 0, 1L).otherwise(0L)).as("n_kept"))
    },

    // L70 — compression-ratio quality report (Gopher/C4 lineage): the
    // native `deflate_len` expression scores every doc scan-side; the
    // per-mille ratio is pure integer algebra, so the per-source report
    // is order-invariant and thread-deterministic. rows-only: DuckDB
    // has no DEFLATE surface (the expression itself is pinned by
    // CompressSpec fixtures instead).
    // L74 — PII scan (span-level detector battery): per source, counts
    // of email / dashed-phone / SSN-shaped / IPv4 / card-number spans,
    // card candidates validated by the FULL Luhn checksum — digit
    // folding as a higher-order aggregate over the reversed digit
    // string, exact integers end to end, so the oracle hash-matches the
    // whole report. Patterns avoid lookaround so java.util.regex and
    // RE2 agree (the \b{13,16}\b span is provably identical under
    // greedy and leftmost-longest — the boundary kills every shorter
    // backtrack). The synthetic corpus is PII-free — the report's zero
    // counts ARE the assertion; PiiSpec drives fixtures with known
    // spans and Luhn-valid/invalid PANs through the same columns.
    Q(
      "tx38_pii_scan",
      """WITH f AS (
        |  SELECT source,
        |    len(regexp_extract_all(text,
        |        '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}')) AS emails,
        |    len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS phones,
        |    len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS ssns,
        |    len(regexp_extract_all(text,
        |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ips,
        |    regexp_extract_all(text, '\b\d{13,16}\b') AS cards
        |  FROM documents),
        |lv AS (
        |  SELECT source, emails, phones, ssns, ips, len(cards) AS card_cands,
        |    coalesce(list_sum(list_transform(cards, c -> CASE WHEN
        |      list_sum(list_transform(range(1, length(c) + 1), i -> CASE
        |        WHEN i % 2 = 1 THEN ascii(substr(reverse(c), i, 1)) - 48
        |        ELSE 2*(ascii(substr(reverse(c), i, 1)) - 48)
        |             - 9*((2*(ascii(substr(reverse(c), i, 1)) - 48)) // 10)
        |        END)) % 10 = 0 THEN 1 ELSE 0 END)), 0) AS cards_valid
        |  FROM f)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(emails) AS BIGINT) AS emails,
        |  CAST(sum(phones) AS BIGINT) AS phones,
        |  CAST(sum(ssns) AS BIGINT) AS ssns,
        |  CAST(sum(ips) AS BIGINT) AS ips,
        |  CAST(sum(card_cands) AS BIGINT) AS card_cands,
        |  CAST(sum(cards_valid) AS BIGINT) AS cards_valid
        |FROM lv GROUP BY source ORDER BY source""".stripMargin
    ) { (s, d) =>
      val f = Tables.documents(s, d).select(col("source"),
        expr("""size(regexp_extract_all(text,
               |  '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}', 0))""".stripMargin)
          .as("emails"),
        expr("size(regexp_extract_all(text, '\\\\b\\\\d{3}-\\\\d{3}-\\\\d{4}\\\\b', 0))")
          .as("phones"),
        expr("size(regexp_extract_all(text, '\\\\b\\\\d{3}-\\\\d{2}-\\\\d{4}\\\\b', 0))")
          .as("ssns"),
        expr("""size(regexp_extract_all(text,
               |  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', 0))""".stripMargin)
          .as("ips"),
        expr("regexp_extract_all(text, '\\\\b\\\\d{13,16}\\\\b', 0)").as("cards"))
      val lv = f.select(col("source"), col("emails"), col("phones"),
        col("ssns"), col("ips"), size(col("cards")).as("card_cands"),
        coalesce(expr(
          """aggregate(transform(cards, c -> CASE WHEN
            |  aggregate(transform(sequence(1, length(c)), i -> CASE
            |    WHEN i % 2 = 1 THEN ascii(substr(reverse(c), i, 1)) - 48
            |    ELSE 2*(ascii(substr(reverse(c), i, 1)) - 48)
            |         - 9*((2*(ascii(substr(reverse(c), i, 1)) - 48)) DIV 10)
            |    END), CAST(0 AS BIGINT), (a, x) -> a + x) % 10 = 0
            |  THEN 1 ELSE 0 END),
            |  0, (a, x) -> a + x)""".stripMargin), lit(0)).as("cards_valid"))
      lv.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("emails").cast("long").as("emails"),
          sum("phones").cast("long").as("phones"),
          sum("ssns").cast("long").as("ssns"),
          sum("ips").cast("long").as("ips"),
          sum("card_cands").cast("long").as("card_cands"),
          sum("cards_valid").cast("long").as("cards_valid"))
        .orderBy("source")
    },

    Q.rowsOnly("tx37_compressibility", "deflate") { (s, d) =>
      val f = Tables.documents(s, d).select(col("source"),
        call_function("deflate_len", col("text")).as("dl"),
        octet_length(col("text")).cast("long").as("ol"))
      f.filter(col("ol") > 0)
        .select(col("source"), expr("(1000 * dl) DIV ol").as("rpm"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(rpm) DIV count(*)").as("avg_rpm"),
          min("rpm").as("min_rpm"), max("rpm").as("max_rpm"),
          sum(when(col("rpm") < 300, 1L).otherwise(0L)).as("n_repetitive"),
          sum(when(col("rpm") > 900, 1L).otherwise(0L)).as("n_incompressible"))
        .orderBy("source")
    },

    // L97 — sentence-level structure profile: the quality-filter
    // features C4/Gopher compute per document BEFORE any model sees it
    // (too-few sentences, run-on sentences, and fragment storms are all
    // ingestion-reject signals). Sentences split on [.!?]+ — the SAME
    // regex on both engines — empties dropped after trim; words per
    // sentence reuse tx1's token alphabet. Everything is exact integer
    // counts + one permille DIV; the split is scan-local, the corpus is
    // touched once, and the per-doc aggregate shuffles only doc keys.
    Q(
      "tx42_sentences",
      """WITH sen AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS s
        |  FROM documents),
        |ws AS (SELECT doc_id,
        |         CAST(len(regexp_extract_all(s, '[a-z0-9]+')) AS BIGINT) AS w
        |       FROM sen WHERE len(trim(s)) > 0)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sent,
        |  CAST(sum(w) AS BIGINT) AS tot_words,
        |  CAST((sum(w) * 1000) // count(*) AS BIGINT) AS words_per_sent_permille,
        |  CAST(max(w) AS BIGINT) AS max_words
        |FROM ws GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val sen = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), "[.!?]+")).as("s"))
      val ws = sen.filter(length(trim(col("s"))) > 0)
        .select(col("doc_id"),
          size(expr("regexp_extract_all(s, '[a-z0-9]+', 0)")).cast("long").as("w"))
      ws.groupBy("doc_id")
        .agg(count(lit(1)).as("n_sent"), sum("w").as("tot_words"),
          expr("(sum(w) * 1000) DIV count(*)").as("words_per_sent_permille"),
          max("w").as("max_words"))
        .orderBy("doc_id")
    },

    // R175 — language-ID confusion matrix: tx2 PREDICTS, this entry
    // EVALUATES it against the corpus's ground-truth lang label — the
    // quality readout a pipeline checks before trusting the router
    // (which languages leak into which buckets, and 'zh' with no
    // stopword evidence shows exactly where the heuristic is blind).
    // Same scan-local scoring as tx2, one (actual, pred) aggregate to
    // a ≤|langs|² frame; recall permille one floor DIV vs the
    // broadcast per-actual totals.
    Q(
      "tx46_langid_confusion",
      s"""WITH p AS (
         |  SELECT lang AS actual,
         |    CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         |         WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         |         WHEN s_de >= s_fr THEN 'de'
         |         ELSE 'fr' END AS pred
         |  FROM (SELECT lang,
         |    CAST(len(regexp_extract_all(text,'$enRe')) AS BIGINT) AS s_en,
         |    CAST(len(regexp_extract_all(text,'$esRe')) AS BIGINT) AS s_es,
         |    CAST(len(regexp_extract_all(text,'$deRe')) AS BIGINT) AS s_de,
         |    CAST(len(regexp_extract_all(text,'$frRe')) AS BIGINT) AS s_fr
         |  FROM documents)),
         |cm AS (SELECT actual, pred, CAST(count(*) AS BIGINT) AS n
         |       FROM p GROUP BY 1, 2),
         |tot AS (SELECT actual, CAST(sum(n) AS BIGINT) AS t FROM cm GROUP BY 1)
         |SELECT cm.actual, cm.pred, cm.n,
         |  (cm.n * 1000) // tot.t AS recall_permille
         |FROM cm JOIN tot ON cm.actual = tot.actual
         |ORDER BY cm.actual, cm.pred""".stripMargin
    ) { (s, d) =>
      val p = Tables.documents(s, d)
        .select(col("lang").as("actual"),
          hits(col("text"), enRe).as("s_en"), hits(col("text"), esRe).as("s_es"),
          hits(col("text"), deRe).as("s_de"), hits(col("text"), frRe).as("s_fr"))
        .withColumn("pred",
          when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
            .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
            .when(col("s_de") >= col("s_fr"), "de")
            .otherwise("fr"))
      val cm = p.groupBy("actual", "pred").agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // matrix + per-actual totals read it
      val tot = cm.groupBy("actual").agg(sum("n").as("t"))
      cm.join(broadcast(tot), "actual")
        .select(col("actual"), col("pred"), col("n"),
          expr("(n * 1000) DIV t").as("recall_permille"))
        .orderBy("actual", "pred")
    },

    // L107 — mixed-language detection: the training-data filter tx2's
    // argmax can't express — a doc whose SECOND language score carries
    // real mass is code-switched or boilerplate-contaminated, and a
    // language-pure corpus wants it flagged, not routed. Top-2 of the
    // four stopword scores via a portable array sort (both engines sort
    // ascending, 1-indexed: slot 4 = best, slot 3 = runner-up);
    // mix_permille = 1000·s2/(s1+s2) as an exact integer DIV; the flag
    // fires when the runner-up holds ≥20% of the winner with ≥2 hits.
    // Scan-local per doc — no shuffle at all before the final sort.
    Q(
      "tx55_lang_mix",
      s"""SELECT doc_id, s1, s2,
         |  CASE WHEN s1 + s2 = 0 THEN 0
         |       ELSE (1000 * s2) // (s1 + s2) END AS mix_permille,
         |  CASE WHEN 5 * s2 >= s1 AND s2 >= 2 THEN 1 ELSE 0 END AS mixed
         |FROM (SELECT doc_id,
         |    CAST(l[4] AS BIGINT) AS s1, CAST(l[3] AS BIGINT) AS s2
         |  FROM (SELECT doc_id, list_sort([
         |      len(regexp_extract_all(text,'$enRe')),
         |      len(regexp_extract_all(text,'$esRe')),
         |      len(regexp_extract_all(text,'$deRe')),
         |      len(regexp_extract_all(text,'$frRe'))]) AS l
         |    FROM documents))
         |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), array_sort(array(
          hits(col("text"), enRe), hits(col("text"), esRe),
          hits(col("text"), deRe), hits(col("text"), frRe))).as("l"))
        .select(col("doc_id"),
          element_at(col("l"), 4).as("s1"), element_at(col("l"), 3).as("s2"))
      scored.select(col("doc_id"), col("s1"), col("s2"),
          when(col("s1") + col("s2") === 0, 0L)
            .otherwise(expr("(1000 * s2) DIV (s1 + s2)")).as("mix_permille"),
          when(lit(5) * col("s2") >= col("s1") && col("s2") >= 2, 1L)
            .otherwise(0L).as("mixed"))
        .orderBy("doc_id")
    }
  )
}
