package graft.operators

import graft.{Q, Tables}
import graft.sources.TableLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental JOIN maintenance (L53): a durable materialized inner
  * join that per-batch deltas MERGE into — the join sibling of
  * [[IncrementalAgg]] (which maintains aggregates). At 100 TB the
  * recompute form re-joins the full history every run; the delta form
  * runs the algebraic identity
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB
  *
  * (B_new includes ΔB, A_old excludes ΔA — the cross term ΔA⋈ΔB counted
  * exactly once), so batch cost is O(ΔA ⋈ B + A ⋈ ΔB) with history
  * touched only through the stored side tables' indexes/buckets, never
  * re-joined against itself.
  *
  * Storage is THREE [[TableLog]] tables under one root (`left/`,
  * `right/`, `out/`), all appended with the SAME batchId through the
  * log's exactly-once `appendBatch`. That composition is what makes the
  * operator crash-correct without any new protocol: the three appends
  * are not atomic together, but each is atomic alone and recorded in
  * its own log, so a crash between them leaves a half-applied batch
  * that a RERUN self-heals — sides that already committed the batch
  * no-op, and the delta terms are recomputed not from the caller's
  * frames but from the LOG ITSELF (time travel to the version the
  * batch committed as, `changesBetween` for the delta), so the healed
  * output is bit-identical to the uncrashed run. Single writer per
  * root, like every rename-published state in this repo.
  */
object IncrementalJoin {

  private def leftDir(root: String) = s"$root/left"
  private def rightDir(root: String) = s"$root/right"
  private def outDir(root: String) = s"$root/out"

  /** The version `batchId` committed as in `dir`'s log, if applied. */
  private def versionOfBatch(spark: SparkSession, dir: String,
                             batchId: Long): Option[Long] =
    TableLog.versions(spark, dir).find(v =>
      TableLog.readManifest(spark, dir, v).op == s"append:batch=$batchId")

  /** Apply `batch` to one side's log (no-op on replay) and return the
    * version it is committed as. */
  private def applySide(spark: SparkSession, dir: String, batch: DataFrame,
                        batchId: Long): Long =
    TableLog.appendBatch(spark, batch, dir, batchId)
      .orElse(versionOfBatch(spark, dir, batchId))
      .getOrElse(sys.error(s"batch $batchId missing from $dir after append"))

  /** Snapshot of `dir` BEFORE version `v` (empty with `like`'s schema
    * when v is the first commit). */
  private def before(spark: SparkSession, dir: String, v: Long,
                     like: DataFrame): DataFrame =
    if (v == 0L) like.limit(0)
    else TableLog.readVersion(spark, dir, v - 1)

  /** The rows version `v` added to `dir`. */
  private def deltaOf(spark: SparkSession, dir: String, v: Long): DataFrame =
    if (v == 0L) TableLog.readVersion(spark, dir, 0L)
    else TableLog.changesBetween(spark, dir, v - 1, v)

  /** Merge one batch of both sides into the materialized join. Replays
    * (any prefix of the three appends already committed) are healed or
    * ignored; returns true iff the OUT table advanced. */
  def update(spark: SparkSession, root: String,
             leftBatch: DataFrame, rightBatch: DataFrame,
             batchId: Long, keyCols: Seq[String]): Boolean = {
    require(keyCols.nonEmpty, "incremental join: at least one key column")
    val vA = applySide(spark, leftDir(root), leftBatch, batchId)
    val vB = applySide(spark, rightDir(root), rightBatch, batchId)
    if (versionOfBatch(spark, outDir(root), batchId).isDefined) return false
    // recompute the delta terms FROM THE LOG (not the caller's frames):
    // a healed crash and a fresh run read identical inputs
    val dA = deltaOf(spark, leftDir(root), vA)
    val dB = deltaOf(spark, rightDir(root), vB)
    val aOld = before(spark, leftDir(root), vA, dA)
    val bNew = TableLog.readVersion(spark, rightDir(root), vB)
    val dOut = dA.join(bNew, keyCols).unionByName(aOld.join(dB, keyCols))
    TableLog.appendBatch(spark, dOut, outDir(root), batchId).isDefined
  }

  /** The maintained join — always equal to
    * `read(left) ⋈ read(right)` after a completed [[update]]. */
  def read(spark: SparkSession, root: String): DataFrame =
    TableLog.read(spark, outDir(root))

  /** L53 catalog proof: customer⋈orders maintained over three
    * interleaved batches on BOTH sides (batch k carries keys ≡ k mod 3,
    * so later left rows join earlier right rows and vice versa — the
    * cross terms the identity must count exactly once), then aggregated;
    * the oracle recomputes the PLAIN join, so the hash match certifies
    * incremental ≡ full. */
  val catalog: Seq[Q] = Seq(
    Q(
      "iv2_incremental_join",
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("incjoin").toString + "/j"
      val cust = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      val ords = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
          col("o_orderpriority"), col("o_totalprice"))
      // sides batch on DIFFERENT keys (customer by custkey, orders by
      // orderkey), so every batch contains orders whose customer arrives
      // earlier, later, or in the same batch — all three identity terms
      (0 to 2).foreach { k =>
        update(s, root,
          cust.filter(col("c_custkey") % 3 === k),
          ords.filter(col("o_orderkey") % 3 === k),
          batchId = k.toLong, keyCols = Seq("c_custkey"))
      }
      read(s, root)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .orderBy("c_mktsegment", "o_orderpriority")
    }
  )
}
