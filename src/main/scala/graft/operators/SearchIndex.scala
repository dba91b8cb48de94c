package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable inverted text index + conjunctive keyword search (L47).
  *
  * The postings layout is the fixed-width frame `(term, doc_id)` —
  * document text never enters the index, so the index shuffles and
  * stores like dd10's in-query inverted index but PERSISTS, and ingest
  * batches append O(batch) postings instead of re-tokenizing history
  * (the L2b/L37b incremental-index discipline applied to search).
  * Replays are exact no-ops via a doc-id anti-join — the guard reads
  * ONLY the pruned doc_id column of the stored postings.
  *
  * Search reads the |terms| posting lists (term-equality pushdown; at
  * warehouse scale the postings would be written bucketed/partitioned by
  * term so a lookup touches one bucket) and intersects them with one
  * fixed-width groupBy — never a scan of the corpus text.
  */
object SearchIndex {

  private def postingsDir(indexDir: String) = s"$indexDir/postings"

  /** Distinct `(doc_id, term)` postings of a `(doc_id, text)` frame —
    * scan-local tokenize + one dedup shuffle. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .distinct()

  def build(docs: DataFrame, indexDir: String): Unit =
    postings(docs).write.mode("overwrite").parquet(postingsDir(indexDir))

  /** Append a new batch: already-indexed doc ids are skipped entirely
    * (replayed/retried batches add no duplicate postings). A missing
    * index is an empty indexed set — a streaming topology's FIRST
    * micro-batch may append before any build ran. */
  def append(spark: SparkSession, newDocs: DataFrame, indexDir: String): Unit = {
    val pdir = new org.apache.hadoop.fs.Path(postingsDir(indexDir))
    val fs = pdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (!fs.exists(pdir)) newDocs
      else newDocs.join(
        spark.read.parquet(postingsDir(indexDir)).select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
    postings(fresh).write.mode("append").parquet(postingsDir(indexDir))
  }

  /** Doc ids containing ALL `terms`: |terms| posting lists intersected
    * via count-match — one fixed-width aggregate, no text touched. */
  def search(spark: SparkSession, indexDir: String, terms: Seq[String]): DataFrame = {
    val distinctTerms = terms.distinct
    require(distinctTerms.nonEmpty, "search: at least one term required")
    spark.read.parquet(postingsDir(indexDir))
      .filter(col("term").isin(distinctTerms: _*))
      .groupBy("doc_id").agg(count(lit(1)).as("nt"))
      .filter(col("nt") === distinctTerms.size)
      .select("doc_id").orderBy("doc_id")
  }

  val catalog: Seq[Q] = Seq(
    // L47 — conjunctive keyword search in its inline form (the durable
    // index path is SearchIndexSpec's subject; the QUERY shape is
    // identical): distinct postings → term-filtered → count-match
    // intersection. The oracle answers from the raw text, so the
    // inverted form must agree with a direct containment scan.
    Q(
      "tx21_keyword_search",
      """SELECT doc_id FROM documents
        |WHERE list_has_all(string_split(text, ' '), ['scan', 'merge', 'window'])
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val terms = Seq("scan", "merge", "window")
      postings(Tables.documents(s, d).select(col("doc_id"), col("text")))
        .filter(col("term").isin(terms: _*))
        .groupBy("doc_id").agg(count(lit(1)).as("nt"))
        .filter(col("nt") === terms.size)
        .select("doc_id").orderBy("doc_id")
    },

    // R167 — PHRASE search via a positional index: tx21's conjunctive
    // search finds docs containing both words anywhere; this finds the
    // exact adjacent sequence "hash join" by joining the two terms'
    // postings on (doc, pos+1). This is how every search engine and
    // RAG retriever runs quoted queries — the positional index IS the
    // operator; the occurrence count per doc falls out of the same
    // join. Scale: the token explode is scan-local; only the two
    // queried terms' postings leave the scan (term-selective filter
    // BEFORE the shuffle), and the adjacency join shuffles on doc_id —
    // posting-list-sized, never corpus-sized. The DuckDB oracle
    // replays the same positional semantics via zipped unnest.
    Q(
      "tx45_phrase_search",
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |a AS (SELECT doc_id, pos FROM toks WHERE w = 'hash'),
        |b AS (SELECT doc_id, pos FROM toks WHERE w = 'join')
        |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occ
        |FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin
    ) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .toDF("doc_id", "pos", "w")
      val a = toks.filter(col("w") === "hash").select(col("doc_id"), col("pos"))
      val b = toks.filter(col("w") === "join")
        .select(col("doc_id").as("bdoc"), col("pos").as("bpos"))
      a.join(b, col("doc_id") === col("bdoc") && col("bpos") === col("pos") + 1)
        .groupBy("doc_id").agg(count(lit(1)).as("n_occ"))
        .orderBy("doc_id")
    }
  )
}
