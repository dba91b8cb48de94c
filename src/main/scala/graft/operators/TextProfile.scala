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
    }
  )
}
