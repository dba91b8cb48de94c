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
    }
  )
}
