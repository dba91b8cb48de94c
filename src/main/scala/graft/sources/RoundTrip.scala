package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Sink→source ROUND-TRIP certification (r5): write the documents
  * table through a text format and read it back, then hash-match an
  * aggregate of the round-tripped frame against the DuckDB oracle
  * computed from the ORIGINAL parquet. A lossy writer (quoting,
  * escaping, charset, null rendering) or a lossy reader (schema
  * inference narrowing, separator confusion) breaks the md5-distinct
  * text signal — so these entries certify the CSV and JSON sources
  * end-to-end by oracle, where earlier rounds certified them by spec
  * (SourceOpsSpec / Inference). Content determinism: the staging path
  * varies per run but the DATA is the sf table, so the result is
  * byte-stable; the write is scan-parallel, the read-back aggregate is
  * one map-side-combinable pass.
  *
  * Reference intent: dias-hbp-sp8/Distributed-Query-Engine ingests
  * heterogeneous text sources through inference
  * (DistributedQueryEngine.diff, RDBMSInferrer hunk) — this is the
  * lossless-ness proof for that surface.
  */
object RoundTrip {

  private def stage(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    dir.toFile.deleteOnExit()
    dir.toString
  }

  private val oracle =
    """SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS chars,
      |  CAST(min(doc_id) AS BIGINT) AS min_id,
      |  CAST(max(doc_id) AS BIGINT) AS max_id,
      |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_text_hashes
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  private def profile(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("chars"),
        min("doc_id").as("min_id"),
        max("doc_id").as("max_id"),
        countDistinct(md5(col("text").cast("binary"))).as("n_text_hashes"))
      .orderBy("source")

  val catalog: Seq[Q] = Seq(
    // S28 — CSV sink → CSV source round trip. Header on, default
    // quote/escape; doc_id/n_chars re-cast after read (CSV carries no
    // types — inference narrowing is exactly what the cast + oracle
    // guard against).
    Q("src7_csv_roundtrip", oracle) { (s, d) =>
      val tmp = stage("graft_csv_rt")
      Tables.documents(s, d)
        .write.mode("overwrite").option("header", "true").csv(tmp)
      val back = s.read.option("header", "true").csv(tmp)
        .select(col("doc_id").cast("long"), col("text"), col("lang"),
          col("source"), col("n_chars").cast("long"))
      profile(back)
    },

    // S29 — JSON-lines sink → source round trip (the schema'd read:
    // inference on JSON lines preserves longs natively; the text
    // signal certifies the string escaping path — quotes, unicode).
    Q("src8_json_roundtrip", oracle) { (s, d) =>
      val tmp = stage("graft_json_rt")
      Tables.documents(s, d).write.mode("overwrite").json(tmp)
      val back = s.read.json(tmp)
        .select(col("doc_id").cast("long"), col("text"), col("lang"),
          col("source"), col("n_chars").cast("long"))
      profile(back)
    },

    // S30 — PARTITIONED-layout round trip: write partitionBy(source),
    // read back with a partition-key filter (only the two selected
    // directories are even opened — the pruning spec S6 proves; this
    // entry proves the VALUES), and hash-match the per-lang profile of
    // those sources against the oracle on the original parquet. The
    // subtle hazard certified here: partition values travel through
    // DIRECTORY NAMES (string round trip + column re-attachment), the
    // classic silent-corruption point of hive-style layouts.
    Q(
      "src9_partitioned_roundtrip",
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_text_hashes
        |FROM documents WHERE source IN ('src0', 'src1')
        |GROUP BY lang ORDER BY lang""".stripMargin
    ) { (s, d) =>
      val tmp = stage("graft_part_rt")
      Tables.documents(s, d)
        .write.mode("overwrite").partitionBy("source").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("source").isin("src0", "src1"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("chars"),
          countDistinct(md5(col("text").cast("binary"))).as("n_text_hashes"))
        .orderBy("lang")
    }
  )
}
