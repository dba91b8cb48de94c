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
    },

    // R194 — Dirichlet-smoothed query-likelihood retrieval (the
    // language-model IR family beside tx14's BM25): score(d) =
    // Σ_q log p(w|d) with p(w|d) = (tf + μ·cf/|C|)/(|d| + μ), μ=100.
    // Every doc scores (smoothing gives absent terms background
    // mass) — the log argument is ONE exact-integer rational
    // (tf·|C| + μ·cf)/(|C|·(|d|+μ)) evaluated as an identical double
    // tree on both engines, log2 micro-quantized ONCE per (doc, term)
    // cell (tx27's discipline), then summed exactly. Scale: term
    // postings are filtered to the 3-term query BEFORE any shuffle;
    // the per-doc expansion is 3 scan-local rows; cf totals broadcast;
    // top-10 is a distributed TakeOrdered under a total order.
    Q(
      "tx47_lm_retrieval",
      """WITH dl AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dlen FROM documents),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |dtf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        |        FROM tok WHERE w IN ('scan', 'merge', 'window') GROUP BY 1, 2),
        |cf AS (SELECT w, CAST(sum(tf) AS BIGINT) AS cf FROM dtf GROUP BY 1),
        |nc AS (SELECT CAST(sum(dlen) AS BIGINT) AS nc FROM dl),
        |g AS (SELECT d.doc_id, d.dlen, t.w, t.cf, coalesce(f.tf, 0) AS tf
        |      FROM dl d CROSS JOIN cf t
        |      LEFT JOIN dtf f ON f.doc_id = d.doc_id AND f.w = t.w),
        |sc AS (SELECT doc_id,
        |    CAST(sum(CAST(round(1000000 *
        |      log2((CAST(tf AS DOUBLE) * nc.nc + 100.0 * cf)
        |         / (CAST(nc.nc AS DOUBLE) * (dlen + 100)))) AS BIGINT)) AS BIGINT)
        |      AS score_e6
        |  FROM g, nc GROUP BY 1)
        |SELECT doc_id, score_e6 FROM sc
        |ORDER BY score_e6 DESC, doc_id LIMIT 10""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val dl = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dlen"))
      val terms = Seq("scan", "merge", "window")
      val dtf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w").isin(terms: _*))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true) // cf totals + the per-doc left join
      val cf = dtf.groupBy("w").agg(sum("tf").as("cf"))
      val nc = dl.agg(sum("dlen").as("nc"))
      val g = dl.crossJoin(broadcast(cf))
        .join(dtf, Seq("doc_id", "w"), "left")
        .select(col("doc_id"), col("dlen"), col("cf"),
          coalesce(col("tf"), lit(0L)).as("tf"))
      g.crossJoin(broadcast(nc))
        .select(col("doc_id"),
          round(lit(1000000) *
            log2((col("tf").cast("double") * col("nc") + lit(100.0) * col("cf"))
              / (col("nc").cast("double") * (col("dlen") + 100))))
            .cast("long").as("q6"))
        .groupBy("doc_id").agg(sum("q6").as("score_e6"))
        .orderBy(desc("score_e6"), col("doc_id")).limit(10)
    }
  )
}
