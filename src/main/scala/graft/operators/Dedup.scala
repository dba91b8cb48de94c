package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication catalog (SURVEY.md §2 L1–L4): exact, MinHash+LSH,
  * SimHash. All pipelines are linear in corpus size — candidate
  * generation never goes quadratic in the corpus, only within LSH
  * buckets — which is the property that survives 100 TB.
  */
object Dedup {

  /** 3-word shingles of the whitespace tokenization, as an array column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(text, " ")
    when(size(words) < n, array(array_join(words, " ")))
      .otherwise(transform(sequence(lit(0), size(words) - n),
        i => array_join(slice(words, i + 1, lit(n)), " ")))
  }

  /** k-permutation MinHash signature: element i = min over shingles of
    * xxhash64(shingle, seed=i). One array column, no explode.
    */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map(i => array_min(transform(sh, x => xxhash64(x, lit(i))))): _*)

  /** LSH band hashes: `bands` hashes, each over `rows` adjacent signature
    * elements. A pair agreeing on any band becomes a candidate.
    */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map(b => xxhash64(slice(sig, b * rows + 1, rows))): _*)

  /** Exact Jaccard of two shingle arrays (distinct-set semantics). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / size(array_union(a, b)).cast("double")
  }

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification.
    * Stages: signature (scan-local) → explode bands (k small constant) →
    * shuffle on (band, hash) → in-bucket pairs → verify.
    */
  def minhashLsh(s: SparkSession, d: String, k: Int = 16, bands: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = docs
      .select(col("doc_id"), col("sh"),
        posexplode(bandHashes(col("sig"), bands, k / bands)).as(Seq("band", "bh")))
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bh"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** 64-bit SimHash per document + near-dup pairs by hamming distance,
    * candidates via 4×16-bit chunk agreement (any chunk equal → candidate;
    * guarantees recall for hamming ≤ 3 by pigeonhole).
    */
  def simhashPairs(s: SparkSession, d: String, maxHamming: Int = 8): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("w")))
    val bits = tok
      .select(col("doc_id"), col("cnt"), col("h"),
        explode(sequence(lit(0), lit(63))).as("b"))
      .withColumn("contrib",
        when(expr("(h >> b) & 1") === 1, col("cnt")).otherwise(-col("cnt")))
    val sim = bits.groupBy("doc_id", "b").agg(sum("contrib").as("v"))
      .withColumn("bitval", when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(lit(0L)))
      .groupBy("doc_id").agg(sum("bitval").as("simhash"))
    val chunked = sim.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        expr(s"(simhash >> ${i * 16}) & 65535")): _*)).as(Seq("chunk", "cv")))
    val a = chunked.select(col("chunk"), col("cv"), col("doc_id").as("id_a"), col("simhash").as("h_a"))
    val b = chunked.select(col("chunk"), col("cv"), col("doc_id").as("id_b"), col("simhash").as("h_b"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  val catalog: Seq[Q] = Seq(
    // L1 — exact dedup: fixed-width hash shuffle, never the document text.
    Q(
      "dd1_exact",
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
        .orderBy("h")
    },

    // L2+L4 — MinHash LSH with exact-Jaccard verify (rows-only: xxhash64
    // has no DuckDB twin; spec-tested against planted dups instead).
    Q.rowsOnly("dd2_minhash_lsh")((s, d) => minhashLsh(s, d)),

    // L3 — SimHash near-dup pairs (rows-only, spec-tested).
    Q.rowsOnly("dd3_simhash")((s, d) => simhashPairs(s, d))
  )
}
