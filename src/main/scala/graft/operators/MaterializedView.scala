package graft.operators

import graft.{Q, Tables}
import graft.plans.MvCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Build + register side of the MV rewrite (see
  * [[graft.plans.RewriteToMv]] for the optimizer half and the
  * decomposability argument). The summary layout is
  * `(dims..., __cnt, __sum_<x>...)` — one row per dim tuple, so its
  * size is the dim-combination count, independent of base rows: the
  * 100 TB fact collapses into the megabytes a dashboard actually needs,
  * and the rewrite serves every conforming aggregate from it without
  * the query author knowing the MV exists.
  */
object MaterializedView {

  /** Materialize the summary for `basePath` at `mvPath` and register it
    * for rewriting. Sum columns must be integral (int/long) — the
    * contract that makes two-level summation bit-exact. */
  def build(spark: SparkSession, basePath: String, mvPath: String,
            dims: Seq[String], sums: Seq[String]): Unit = {
    require(dims.nonEmpty, "mv: at least one dimension")
    val base = spark.read.parquet(basePath)
    sums.foreach { c =>
      val f = base.schema.fields.find(_.name == c)
        .getOrElse(sys.error(s"mv: no column $c in $basePath"))
      require(f.dataType == LongType || f.dataType == IntegerType,
        s"mv: sum column $c is ${f.dataType.simpleString} — integral required " +
          "(a double sum re-aggregated through the MV would reassociate)")
    }
    base.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        sums.map(c => sum(col(c).cast("long")).as(s"__sum_$c")): _*)
      .write.mode("overwrite").parquet(mvPath)
    MvCatalog.register(MvCatalog.MvDef(basePath, mvPath, dims, sums))
  }

  /** R95 catalog proof: the query is authored against the BASE
    * documents table; the registered MV answers it via the optimizer
    * swap (asserted in-entry — a silently non-firing rule fails loudly
    * here, not just in the spec), and the DuckDB oracle recomputes from
    * the base table — the hash match certifies the rewrite changed the
    * scan, not the answer. */
  val catalog: Seq[Q] = Seq(
    Q(
      "mv1_rewrite",
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents WHERE lang <> 'xx'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val mvPath = java.nio.file.Files.createTempDirectory("mv").toString + "/docs_mv"
      try {
        build(s, s"$d/documents.parquet", mvPath,
          dims = Seq("lang", "source"), sums = Seq("n_chars"))
        val out = s.read.parquet(s"$d/documents.parquet")
          .filter(col("lang") =!= "xx")
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
          .orderBy("lang", "source")
        val files = out.inputFiles
        require(files.nonEmpty && files.forall(_.contains("docs_mv")),
          s"MV rewrite did not fire — scanning ${files.take(3).mkString(",")}")
        // EAGERLY materialize through the MV before deregistering: the
        // driver's later write action re-plans the frame, and a lazy
        // return would silently re-optimize against the base table
        out.localCheckpoint(true)
      } finally MvCatalog.clear() // never leak the MV into other entries
    },

    // R127 — semantic result cache: the SAME aggregate is pushed through
    // [[graft.plans.ResultCache]] twice; the second pass must be served
    // from the digest-addressed store (asserted in-entry via the scanned
    // files), and the DuckDB oracle recomputes from the base table — the
    // hash match certifies the cache returned the answer, not a stale or
    // corrupted copy.
    Q(
      "mv2_result_cache",
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM documents WHERE n_chars >= 200
        |GROUP BY source ORDER BY source""".stripMargin
    ) { (s, d) =>
      val cacheRoot =
        java.nio.file.Files.createTempDirectory("result-cache").toString
      def query = Tables.documents(s, d)
        .filter(col("n_chars") >= 200)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
          min("doc_id").as("first_doc"))
        .orderBy("source")
      val (_, firstHit) = graft.plans.ResultCache.through(query, cacheRoot)
      val (cached, secondHit) = graft.plans.ResultCache.through(query, cacheRoot)
      require(!firstHit && secondHit,
        s"result cache: expected miss-then-hit, got $firstHit/$secondHit")
      val files = cached.inputFiles
      require(files.nonEmpty && files.forall(_.contains("result-cache")),
        s"result-cache hit is not scanning the cache: ${files.take(3).mkString(",")}")
      // the cache stores the RESULT SET, not its presentation order — a
      // multi-file entry scans size-descending; re-apply the output order
      cached.orderBy("source")
    },

    // R273 — INCREMENTALLY MAINTAINED MV served through the rewrite
    // (r9, r10-seed-4 delivered early — mv1's optimizer swap composed
    // with iv1's delta-merge discipline): the MV is built from the
    // historical 2/3 of documents, then a delta batch merges in WITHOUT
    // re-scanning history (summary ∪ delta-summary → re-aggregate —
    // mergeable by the integral-sums contract), with iv1's
    // committed-marker guard proving a REPLAYED delta is a no-op, not a
    // double-count. The query is authored against the BASE table, the
    // rewrite must scan the MAINTAINED v2 summary (asserted in-entry),
    // and the DuckDB oracle recomputes everything from scratch — the
    // hash match certifies maintained-MV ≡ recompute end to end.
    Q(
      "mv3_incremental_rewrite",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(n_chars) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("mv3").toString
      val basePath = s"$d/documents.parquet"
      val docs = s.read.parquet(basePath)
      val isDelta = pmod(xxhash64(col("doc_id")), lit(3)) === 2
      def summarize(df: DataFrame): DataFrame = df.groupBy("lang")
        .agg(count(lit(1)).as("__cnt"),
          sum(col("n_chars").cast("long")).as("__sum_n_chars"))
      // the delta merge with iv1's committed-marker replay guard
      def maintain(batchId: Int): Boolean = {
        val marker = new java.io.File(s"$root/committed_$batchId")
        if (marker.exists()) false
        else {
          s.read.parquet(s"$root/mv_v1").unionByName(summarize(docs.filter(isDelta)))
            .groupBy("lang")
            .agg(sum("__cnt").as("__cnt"),
              sum("__sum_n_chars").as("__sum_n_chars"))
            .write.mode("overwrite").parquet(s"$root/mv_v2")
          marker.createNewFile()
          true
        }
      }
      try {
        summarize(docs.filter(!isDelta))
          .write.mode("overwrite").parquet(s"$root/mv_v1")
        val applied = maintain(2)
        val replay = maintain(2)
        require(applied && !replay,
          s"delta maintenance must apply once then no-op, got $applied/$replay")
        MvCatalog.register(MvCatalog.MvDef(basePath, s"$root/mv_v2",
          Seq("lang"), Seq("n_chars")))
        val out = s.read.parquet(basePath)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("total_chars"))
          .withColumn("mean_chars", expr("total_chars DIV n_docs"))
          .orderBy("lang")
        val files = out.inputFiles
        require(files.nonEmpty && files.forall(_.contains("mv_v2")),
          s"rewrite must serve the MAINTAINED summary, scanning ${files.take(3).mkString(",")}")
        out.localCheckpoint(true) // materialize through the MV pre-clear
      } finally MvCatalog.clear()
    },

    // R274 — MV MAINTENANCE UNDER UPSERTS AND DELETES (r11, verdict
    // item 7): mv3 certified append-only maintenance; production MVs
    // also see RETRACTIONS. The base table is a TableLog versioned
    // table (v0 = documents' (doc_id, lang, n_chars)), mutated by a
    // keyed MERGE (updates + inserts) and a deletion-vector DELETE.
    // Maintenance is counting-algebra over the DELTA ONLY: +contribution
    // of every upserted row, −contribution of the touched keys' OLD
    // rows (a keyed lookup against v0 — at 100 TB that read is
    // zonemap/bloom point lookups, never a table scan), merged into the
    // v1 summary with empty groups dropped. A replayed maintenance
    // batch is marker-guarded to a no-op; the entry asserts
    // maintained ≡ recompute-from-latest-snapshot in-process AND the
    // DuckDB oracle recomputes the post-mutation aggregate from the
    // documents table — the hash match certifies retraction-bearing
    // incremental maintenance end to end.
    Q(
      "mv4_retraction_maintenance",
      """WITH final AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 10 IN (3, 4) THEN n_chars + 101
        |         ELSE n_chars END AS n_chars
        |  FROM documents WHERE doc_id % 10 <> 7
        |  UNION ALL
        |  SELECT doc_id + 1000000000, lang, n_chars + 7
        |  FROM documents WHERE doc_id % 10 = 1
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM final GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      import graft.sources.TableLog
      val root = java.nio.file.Files.createTempDirectory("mv4").toString
      val table = s"$root/docs_log"
      val docs = s.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "lang", "n_chars")
      TableLog.create(s, docs, table)
      // the delete-containing delta: updates (+101 chars on 2 of 10 key
      // classes), inserts (shifted ids), and a keyed delete (1 of 10)
      val upserts = docs
        .filter(col("doc_id") % 10 === 3 || col("doc_id") % 10 === 4)
        .withColumn("n_chars", col("n_chars") + 101)
        .unionByName(docs.filter(col("doc_id") % 10 === 1)
          .select((col("doc_id") + 1000000000L).as("doc_id"),
            col("lang"), (col("n_chars") + 7).as("n_chars")))
        .select("doc_id", "lang", "n_chars")
      TableLog.merge(s, upserts, table, Seq("doc_id"))
      val delKeys = docs.filter(col("doc_id") % 10 === 7).select("doc_id")
      TableLog.deleteByKey(s, delKeys, table, Seq("doc_id"))
      def summarize(df: DataFrame): DataFrame = df.groupBy("lang")
        .agg(count(lit(1)).as("__cnt"),
          sum(col("n_chars").cast("long")).as("__sum_n_chars"))
      summarize(TableLog.readVersion(s, table, 0L))
        .write.mode("overwrite").parquet(s"$root/mv_v1")
      def maintain(batchId: Int): Boolean = {
        val marker = new java.io.File(s"$root/committed_$batchId")
        if (marker.exists()) false
        else {
          val touched = upserts.select("doc_id")
            .unionByName(delKeys).distinct()
          // OLD contributions of the touched keys — keyed lookup, O(Δ)
          val oldRows = TableLog.readVersion(s, table, 0L)
            .join(touched, Seq("doc_id"))
          val delta = summarize(upserts).unionByName(
            summarize(oldRows).select(col("lang"),
              (-col("__cnt")).as("__cnt"),
              (-col("__sum_n_chars")).as("__sum_n_chars")))
          s.read.parquet(s"$root/mv_v1").unionByName(delta)
            .groupBy("lang")
            .agg(sum("__cnt").as("__cnt"),
              sum("__sum_n_chars").as("__sum_n_chars"))
            .filter(col("__cnt") > 0) // retract-to-empty groups vanish
            .write.mode("overwrite").parquet(s"$root/mv_v2")
          marker.createNewFile()
          true
        }
      }
      val applied = maintain(1)
      val replay = maintain(1)
      require(applied && !replay,
        s"retraction maintenance must apply once then no-op, got $applied/$replay")
      val mv2 = s.read.parquet(s"$root/mv_v2")
      // incremental ≡ recompute certificate against the LATEST snapshot
      val recompute = summarize(TableLog.read(s, table))
      require(mv2.exceptAll(recompute).isEmpty
          && recompute.exceptAll(mv2).isEmpty,
        "maintained MV diverged from the snapshot recompute")
      val out = mv2.select(col("lang"), col("__cnt").as("n_docs"),
          col("__sum_n_chars").as("total_chars"))
        .orderBy("lang")
      val files = out.inputFiles
      require(files.nonEmpty && files.forall(_.contains("mv_v2")),
        s"result must come from the maintained summary, scanning ${files.take(3).mkString(",")}")
      out.localCheckpoint(true)
    }
  )
}
