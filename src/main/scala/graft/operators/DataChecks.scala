package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate (R96) — the "deequ-lite" every
  * warehouse runs before trusting a load: a check suite compiles into
  * ONE aggregate pass over the table (null rates, domain membership,
  * range bounds — each check is a conditional-count column in the same
  * codegen'd projection) plus one distinct-shaped aggregate per
  * uniqueness check (the only check that genuinely needs a shuffle).
  * The report is a tiny (|checks|)-row frame of exact integer metrics;
  * `passed` is pure integer comparison. Compose with `observe()` (L40)
  * to attach the same counters to the production write itself.
  */
object DataChecks {

  sealed trait Check { def name: String; def column: String }
  /** violations = rows where `col` is null; pass iff ≤ maxViolations. */
  final case class NotNull(column: String, maxViolations: Long = 0L) extends Check {
    val name = "not_null"
  }
  /** violations = rows beyond count(distinct cols) — duplicate key mass. */
  final case class Unique(cols: Seq[String], maxViolations: Long = 0L) extends Check {
    val name = "unique"; val column: String = cols.mkString(",")
  }
  /** violations = non-null rows outside the accepted value set. */
  final case class InSet(column: String, values: Seq[String],
                         maxViolations: Long = 0L) extends Check {
    val name = "in_set"
  }
  /** violations = non-null rows outside [lo, hi] under plain numeric
    * comparison (no integral cast: double→long casting ROUNDS in some
    * engines and truncates in others — comparing in the column's own
    * numeric type is the portable form). */
  final case class InRange(column: String, lo: Long, hi: Long,
                           maxViolations: Long = 0L) extends Check {
    val name = "in_range"
  }

  private def violationExpr(c: Check): Column = c match {
    case NotNull(col0, _) => sum(when(col(col0).isNull, 1L).otherwise(0L))
    case InSet(col0, vs, _) =>
      sum(when(col(col0).isNotNull && !col(col0).isin(vs: _*), 1L).otherwise(0L))
    case InRange(col0, lo, hi, _) =>
      sum(when(col(col0).isNotNull && (col(col0) < lo || col(col0) > hi), 1L)
        .otherwise(0L))
    case _: Unique => sys.error("unique is aggregated separately")
  }

  /** Run the suite; returns `(check, column, violations, max_allowed,
    * passed)` ordered by (check, column). Scan cost: one pass for all
    * row-local checks + one per Unique. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "data checks: empty suite")
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal = checks.filter(!_.isInstanceOf[Unique])
    val uniques = checks.collect { case u: Unique => u }
    val rowLocalReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.zipWithIndex.map { case (c, i) =>
          violationExpr(c).as(s"__v$i")
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        Some(rowLocal.zipWithIndex.map { case (c, i) =>
          (c.name, c.column, row.getLong(i), maxOf(c))
        }.toDF("check", "column", "violations", "max_allowed"))
      }
    val uniqueReports = uniques.map { u =>
      val total = df.count()
      val distinctN = df.select(u.cols.map(col): _*).distinct().count()
      Seq((u.name, u.column, total - distinctN, u.maxViolations))
        .toDF("check", "column", "violations", "max_allowed")
    }
    (rowLocalReport.toSeq ++ uniqueReports)
      .reduce(_ unionByName _)
      .withColumn("passed", col("violations") <= col("max_allowed"))
      .orderBy("check", "column")
  }

  private def maxOf(c: Check): Long = c match {
    case NotNull(_, m) => m
    case InSet(_, _, m) => m
    case InRange(_, _, _, m) => m
    case Unique(_, m) => m
  }

  /** R96 catalog proof: the gate run by a warehouse on `orders` before
    * trusting a load — key uniqueness, FK non-nullness, status domain,
    * priority domain, and a deliberately TIGHT price range so the
    * report contains both passing and failing rows (an all-pass report
    * would not prove the violation arithmetic). Oracle recomputes every
    * metric in SQL. */
  val catalog: Seq[Q] = Seq(
    Q(
      "dq1_quality_gate",
      """SELECT * FROM (
        |  SELECT 'in_range' AS "check", 'o_totalprice' AS "column",
        |    CAST((SELECT count(*) FROM orders WHERE o_totalprice IS NOT NULL
        |      AND (o_totalprice < 1000 OR o_totalprice > 200000)) AS BIGINT)
        |      AS violations, CAST(0 AS BIGINT) AS max_allowed
        |  UNION ALL
        |  SELECT 'in_set', 'o_orderpriority',
        |    (SELECT count(*) FROM orders WHERE o_orderpriority IS NOT NULL
        |      AND o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM',
        |                                  '4-NOT SPECIFIED','5-LOW')), 0
        |  UNION ALL
        |  SELECT 'not_null', 'o_custkey',
        |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL), 0
        |  UNION ALL
        |  SELECT 'unique', 'o_orderkey',
        |    (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders), 0)
        |ORDER BY "check", "column"""".stripMargin
    ) { (s, d) =>
      run(Tables.orders(s, d), Seq(
        NotNull("o_custkey"),
        Unique(Seq("o_orderkey")),
        InSet("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW")),
        InRange("o_totalprice", 1000L, 200000L)))
        .drop("passed") // booleans formatted engine-specifically; the
                        // integer metrics ARE the check (passed = v<=max)
    }
  )
}
