package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable INCREMENTAL prefix index for PPJoin near-dup search (r8 —
  * the SketchIndex/DupSpanIndex pattern applied to prefix postings):
  * per-ingest exact J ≥ tn/td pair search where OLD documents are
  * never re-tokenized, re-ranked, or re-joined against each other.
  *
  * THE CORRECTNESS TRICK — a FROZEN token order. The prefix-filter
  * theorem holds for ANY global total order on tokens (each doc keeps
  * its first n − ⌈tn·n/td⌉ + 1 tokens under that order; a J ≥ tn/td
  * pair must collide inside both prefixes — the standard PPJoin proof
  * never uses rarity, only a SHARED total order; rarity merely
  * minimizes candidate volume). So the index freezes (df at build
  * time, token) as the order: new batches rank their tokens against
  * the FROZEN df table (unseen tokens read df = 0 → rarest, still
  * deterministic by the token tie-break), and the prefix sets of old
  * docs never change — exactness survives arbitrary df drift, at the
  * price of gradually less-optimal (never incorrect) candidate volume;
  * production rebuilds the order on a cadence.
  *
  * Layout under `dir`: `df/` (tok, df — the frozen order), `postings/`
  * (doc_id, tok — the verify side), `prefix/` (doc_id, tok, r, n).
  * Appends are plain parquet appends — old rows are never rewritten.
  *
  * [[build]] emits the first batch's internal pairs; [[appendBatch]]
  * emits exactly the pairs with ≥ 1 new endpoint (old×old pairs were
  * already reported). Build-pairs ∪ append-pairs over a split corpus
  * equals the one-shot whole-corpus join — the catalog entry certifies
  * that against dd22's exact oracle, and PrefixIndexSpec pins a
  * 3-batch replay with adversarial df drift.
  */
object PrefixIndex {

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))

  /** Per-doc prefix rows (doc_id, tok, r, n) under the FROZEN order
    * (df asc NULLS→0, tok asc); the per-doc rank window is partitioned
    * by doc_id. */
  private def prefixOf(e: DataFrame, dfFrozen: DataFrame,
                       tn: Int, td: Int): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("dff"), col("tok"))
    val sz = e.groupBy("doc_id").agg(count(lit(1)).as("n"))
    e.join(dfFrozen, Seq("tok"), "left")
      .select(col("doc_id"), col("tok"),
        coalesce(col("df"), lit(0L)).as("dff"))
      .withColumn("r", row_number().over(byDoc))
      .join(sz, Seq("doc_id"))
      .filter(col("r") <= expr(s"n - ($tn * n + ${td - 1}) DIV $td + 1"))
      .select(col("doc_id"), col("tok"), col("r"), col("n"))
  }

  /** Candidate filter + narrow verify over explicit prefix sides —
    * prefA rows join prefB rows on tok; pairs normalize to
    * (least, greatest) AFTER the (symmetric) length/position filters. */
  private def pairsOf(prefA: DataFrame, prefB: DataFrame,
                      postings: DataFrame, tn: Int, td: Int,
                      bothSidesA: Boolean): DataFrame = {
    val raw = prefA.select(col("doc_id").as("ia"), col("tok"),
        col("r").as("ra"), col("n").as("na"))
      .join(prefB.select(col("doc_id").as("ib"), col("tok"),
        col("r").as("rb"), col("n").as("nb")), Seq("tok"))
      .filter(col("ia") =!= col("ib")
        && lit(td) * col("na") >= lit(tn) * col("nb")
        && lit(td) * col("nb") >= lit(tn) * col("na")
        && lit(1) + least(col("na") - col("ra"), col("nb") - col("rb"))
           >= expr(s"($tn * (na + nb) + ${tn + td - 1}) DIV ${tn + td}"))
    // when A == B (build-time internal join) keep ia < ib directly;
    // otherwise (append: A = new, B = all) normalize so new×new pairs
    // collapse and new×old pairs land in canonical orientation
    val cands =
      (if (bothSidesA) raw.filter(col("ia") < col("ib"))
        .select(col("ia").as("id_a"), col("ib").as("id_b"))
      else raw.select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b")))
        .distinct()
    val sz = postings.groupBy("doc_id").agg(count(lit(1)).as("n"))
    cands
      .join(postings.select(col("doc_id").as("id_a"), col("tok")), Seq("id_a"))
      .join(postings.select(col("doc_id").as("id_b"), col("tok")),
        Seq("id_b", "tok"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("id_a"), col("n").as("size_a")),
        Seq("id_a"))
      .join(sz.select(col("doc_id").as("id_b"), col("n").as("size_b")),
        Seq("id_b"))
      .filter(lit(tn + td) * col("inter")
        >= lit(tn) * (col("size_a") + col("size_b")))
      .withColumn("jac_pm",
        expr("(inter * 1000) DIV (size_a + size_b - inter)"))
      .select("id_a", "id_b", "inter", "size_a", "size_b", "jac_pm")
  }

  /** Create the index from the first corpus batch; returns the batch's
    * internal J ≥ tn/td pairs. */
  def build(docs: DataFrame, dir: String,
            tn: Int = 4, td: Int = 5): DataFrame = {
    val spark = docs.sparkSession
    val e = tokens(docs).localCheckpoint(true)
    e.groupBy("tok").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$dir/df")
    e.write.mode("overwrite").parquet(s"$dir/postings")
    val pref = prefixOf(e, spark.read.parquet(s"$dir/df"), tn, td)
    pref.write.mode("overwrite").parquet(s"$dir/prefix")
    val stored = spark.read.parquet(s"$dir/prefix")
    pairsOf(stored, stored, spark.read.parquet(s"$dir/postings"),
      tn, td, bothSidesA = true)
  }

  /** Ingest a batch against the stored index: returns exactly the
    * pairs with ≥ 1 endpoint in `newDocs` (old×old pairs were reported
    * by earlier calls), then appends the batch's postings + prefix
    * rows. Docs whose ids already exist in the index are skipped
    * (replayed batches are idempotent). Old documents are READ
    * (postings for verify, prefix rows for the candidate join) but
    * never re-ranked — work is O(batch + collisions). */
  def appendBatch(newDocs: DataFrame, dir: String,
                  tn: Int = 4, td: Int = 5): DataFrame = {
    val spark = newDocs.sparkSession
    val known = spark.read.parquet(s"$dir/postings")
      .select("doc_id").distinct()
    val fresh = newDocs.join(known, Seq("doc_id"), "left_anti")
    val eNew = tokens(fresh).localCheckpoint(true)
    val prefNew = prefixOf(eNew, spark.read.parquet(s"$dir/df"), tn, td)
      .localCheckpoint(true) // candidate side + the index append
    val prefAll = spark.read.parquet(s"$dir/prefix").unionByName(prefNew)
    val postAll = spark.read.parquet(s"$dir/postings").unionByName(eNew)
    val pairs = pairsOf(prefNew, prefAll, postAll, tn, td,
        bothSidesA = false)
      .localCheckpoint(true) // materialize BEFORE the appends below
    eNew.write.mode("append").parquet(s"$dir/postings")
    prefNew.write.mode("append").parquet(s"$dir/prefix")
    pairs
  }
}
