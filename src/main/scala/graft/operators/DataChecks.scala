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

  /** 256-bin midpoint quantile table of Laplace(0, b=1) — the shared
    * noise source for [[dq2]]'s deterministic DP release. Literal
    * doubles: decimal→binary parse is correctly rounded on BOTH engines
    * (Scala and DuckDB), so indexing this table is bit-identical
    * cross-engine. Single source of truth — the oracle SQL's list
    * literal is GENERATED from this array. */
  private[graft] val laplace256: Array[Double] = Array(
    -5.545177444479562, -4.446565155811453, -3.9357395320454622, -3.5992672954242493,
    -3.347952867143343, -3.147282171681192, -2.9802280870180256, -2.8371272433773522,
    -2.7119641004233466, -2.600738465313122, -2.5006550067561393, -2.4096832285504126,
    -2.3263016196113617, -2.2493405784752336, -2.1778816144930886, -2.111190239994416,
    -2.048669883013082, -1.9898293829901488, -1.934259531835338, -1.881615798349916,
    -1.8316053777752546, -1.7839773287860001, -1.7385149547092427, -1.6950298427695039,
    -1.6533571463689358, -1.6133518117552368, -1.5748855309274405, -1.5378442592470916,
    -1.5021261766450122, -1.467640000573843, -1.4343035803062512, -1.4020427180880297,
    -1.3707901745839253, -1.3404848250885963, -1.311070939882303, -1.282497567438247,
    -1.2547180033311713, -1.227689330943252, -1.2013720226258786, -1.175729592012541,
    -1.1507282898071236, -1.1263368366829645, -1.102526187989246, -1.0792693258249788,
    -1.0565410747474226, -1.0343179379627125, -1.0125779513263065, -0.9913005528790216,
    -0.9704664659761797, -0.9500575943449725, -0.930056927638303, -0.9104484562499267,
    -0.8912170943220391, -0.8723486100176563, -0.8538295622504187, -0.8356472431672284,
    -0.8177896257672219, -0.8002453161163124, -0.7830035096818063, -0.7660539513680331,
    -0.7493868988828214, -0.732993089107145, -0.7168637071772613, -0.7009903580209712,
    -0.6853650401178903, -0.6699801212784109, -0.6548283162578087, -0.639902666041133,
    -0.6251965186514375, -0.6107035113488707, -0.5964175541013942, -0.5823328142196552,
    -0.5684437020589881, -0.5547448577008262, -0.5412311385341033, -0.5278976076646381,
    -0.514739523087127, -0.5017523275603158, -0.4889316391312544, -0.47627324225933093,
    -0.4637730794950995, -0.4514272436728001, -0.4392319705789819, -0.42718363206280735,
    -0.415278729556489, -0.40351388797690263, -0.39188584998178355, -0.38039147055604844,
    -0.36902771190573336, -0.3577916386388075, -0.3466804132137367, -0.33569129163814154,
    -0.32482161940123766, -0.31406882762497584, -0.3034304294199201, -0.2929040164329326,
    -0.2824872555746769, -0.27217788591581565, -0.26197371574157396, -0.2518726197550701,
    -0.24187253642048673, -0.23197146543777514, -0.2221674653411543, -0.2124586512141934,
    -0.20284319251475147, -0.19331931100349597, -0.18388527877013736, -0.17453941635189968,
    -0.16528009093910292, -0.15610571466306167, -0.14701474296180966, -0.13800567301944372,
    -0.12907704227514236, -0.1202274269981598, -0.11145544092532282, -0.10275973395776894,
    -0.09413899091386191, -0.08559193033540351, -0.07711730334443129, -0.06871389254805181,
    -0.06038051098890748, -0.05211600113901402, -0.04391923393483549, -0.03578910785158528,
    -0.027724548014854862, -0.01972450534777859, -0.01178795575204224, -0.003913899321136329,
    0.003913899321136329, 0.01178795575204224, 0.01972450534777859, 0.027724548014854862,
    0.03578910785158528, 0.04391923393483549, 0.05211600113901402, 0.06038051098890748,
    0.06871389254805181, 0.07711730334443129, 0.08559193033540351, 0.09413899091386191,
    0.10275973395776894, 0.11145544092532282, 0.1202274269981598, 0.12907704227514236,
    0.13800567301944372, 0.14701474296180966, 0.15610571466306167, 0.16528009093910292,
    0.17453941635189968, 0.18388527877013736, 0.19331931100349597, 0.20284319251475147,
    0.2124586512141934, 0.2221674653411543, 0.23197146543777514, 0.24187253642048673,
    0.2518726197550701, 0.26197371574157396, 0.27217788591581565, 0.2824872555746769,
    0.2929040164329326, 0.3034304294199201, 0.31406882762497584, 0.32482161940123766,
    0.33569129163814154, 0.3466804132137367, 0.3577916386388075, 0.36902771190573336,
    0.38039147055604844, 0.39188584998178355, 0.40351388797690263, 0.415278729556489,
    0.42718363206280735, 0.4392319705789819, 0.4514272436728001, 0.4637730794950995,
    0.47627324225933093, 0.4889316391312544, 0.5017523275603158, 0.514739523087127,
    0.5278976076646381, 0.5412311385341033, 0.5547448577008262, 0.5684437020589881,
    0.5823328142196552, 0.5964175541013942, 0.6107035113488707, 0.6251965186514375,
    0.639902666041133, 0.6548283162578087, 0.6699801212784109, 0.6853650401178903,
    0.7009903580209712, 0.7168637071772613, 0.732993089107145, 0.7493868988828214,
    0.7660539513680331, 0.7830035096818063, 0.8002453161163124, 0.8177896257672219,
    0.8356472431672284, 0.8538295622504187, 0.8723486100176563, 0.8912170943220391,
    0.9104484562499267, 0.930056927638303, 0.9500575943449725, 0.9704664659761797,
    0.9913005528790216, 1.0125779513263065, 1.0343179379627125, 1.0565410747474226,
    1.0792693258249788, 1.102526187989246, 1.1263368366829645, 1.1507282898071236,
    1.175729592012541, 1.2013720226258786, 1.227689330943252, 1.2547180033311713,
    1.282497567438247, 1.311070939882303, 1.3404848250885963, 1.3707901745839253,
    1.4020427180880297, 1.4343035803062512, 1.467640000573843, 1.5021261766450122,
    1.5378442592470916, 1.5748855309274405, 1.6133518117552368, 1.6533571463689358,
    1.6950298427695039, 1.7385149547092427, 1.7839773287860001, 1.8316053777752546,
    1.881615798349916, 1.934259531835338, 1.9898293829901488, 2.048669883013082,
    2.111190239994416, 2.1778816144930886, 2.2493405784752336, 2.3263016196113617,
    2.4096832285504126, 2.5006550067561393, 2.600738465313122, 2.7119641004233466,
    2.8371272433773522, 2.9802280870180256, 3.147282171681192, 3.347952867143343,
    3.5992672954242493, 3.9357395320454622, 4.446565155811453, 5.545177444479562)

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
    },

    // R106 — deterministic differentially-private count release (the
    // governance sibling of k-anonymity R97 / pseudonymization L45):
    // per-group order counts released with Laplace(1/ε) noise,
    // sensitivity 1, ε = 1. The "randomness" is the q96 salted-md5
    // idiom: a group's noise draw indexes the SHARED 256-bin Laplace
    // quantile table ([[laplace256]] — the oracle's list literal is
    // generated from the same array), so the release is retry-stable
    // and layout-invariant, and the oracle hash-match certifies the
    // whole mechanism. Deliberately a DEMO of the release shape: a
    // production ε-budget ledger decides WHEN a release may happen;
    // per-release noise being a pure function of (group, salt) means
    // REPEATED releases reuse the same draw — i.e. re-release costs no
    // extra budget, the documented tradeoff of deterministic noise.
    // The true count never leaves this query's internals.
    Q(
      "dq2_dp_release",
      s"""WITH c AS (
        |  SELECT o_orderpriority AS grp, count(*) AS n FROM orders GROUP BY 1)
        |SELECT grp, 1000 AS epsilon_permille,
        |  CAST(n AS DOUBLE) +
        |    ([${laplace256.map(_.toString + "e0").mkString(", ")}])[
        |      CAST(concat('0x', substring(md5(grp || ':dp1'), 1, 2)) AS INT) + 1]
        |    AS noisy_count
        |FROM c ORDER BY grp""".stripMargin
    ) { (s, d) =>
      val lap = array(laplace256.map(lit).toIndexedSeq: _*)
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("grp")).agg(count(lit(1)).as("n"))
        .select(col("grp"), lit(1000).as("epsilon_permille"),
          (col("n").cast("double") +
            element_at(lap,
              expr("CAST(conv(substring(md5(CAST(concat(grp, ':dp1') AS BINARY)), 1, 2), 16, 10) AS INT)") + 1))
            .as("noisy_count"))
        .orderBy("grp")
    },

    // L73 — masked data release (column masking + generalization + row
    // policy): the governance shape between ev14's reversible-with-salt
    // pseudonymization and dq2's noisy aggregates — direct identifiers
    // become one-way tokens (md5 prefix), quantitative columns are
    // GENERALIZED to buckets (floor(x/1000) on the IEEE double — DIV
    // would disagree across engines on negative balances: DuckDB //
    // floors, Spark DIV truncates), and a row policy drops a protected
    // segment entirely. Pure projection + filter — scan-local at any
    // scale; q89's k-anonymity audit is the release gate this feeds.
    Q(
      "dq3_masked_release",
      """SELECT c_custkey,
        |  substr(md5(c_name), 1, 8) AS name_token,
        |  c_mktsegment,
        |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acctbal_bucket
        |FROM customer
        |WHERE c_mktsegment <> 'BUILDING'
        |ORDER BY c_custkey""".stripMargin
    ) { (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_mktsegment") =!= "BUILDING")
        .select(col("c_custkey"),
          substring(md5(col("c_name")), 1, 8).as("name_token"),
          col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("acctbal_bucket"))
        .orderBy("c_custkey")
    },

    // R146 — l-diversity audit (the release gate k-anonymity alone
    // can't give, q89's sibling): a group can be k-anonymous and still
    // leak if every member shares one sensitive value. Quasi-identifier
    // = (nation, segment); sensitive = account-balance decile computed
    // by EXACT shifted-integer arithmetic (cents − min ≥ 0, so DIV
    // floors identically on both engines — no float bucket boundary).
    // One aggregate to the QI-group frame (bounded by the QI domain),
    // distinct-sensitive per group is the l; at_risk flags l < 3. The
    // fact is touched once; the min/max frame broadcasts.
    Q(
      "dq4_ldiversity",
      """WITH c AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(round(c_acctbal*100) AS BIGINT) AS cents FROM customer),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM c),
        |s AS (SELECT c_nationkey, c_mktsegment,
        |        ((cents - mn) * 10) // (mx - mn + 1) AS sens
        |      FROM c CROSS JOIN b),
        |g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |        count(DISTINCT sens) AS l
        |      FROM s GROUP BY 1, 2)
        |SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
        |  CAST(n AS BIGINT) AS n, CAST(l AS BIGINT) AS l,
        |  CASE WHEN l < 3 THEN 1 ELSE 0 END AS at_risk
        |FROM g ORDER BY nation, segment""".stripMargin
    ) { (s, d) =>
      val c = Tables.customer(s, d).select(col("c_nationkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
      val b = c.agg(min("cents").as("mn"), max("cents").as("mx"))
      val sens = c.crossJoin(broadcast(b))
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("((cents - mn) * 10) DIV (mx - mn + 1)").as("sens"))
      sens.groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"), countDistinct("sens").as("l"))
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"), col("n"), col("l"),
          when(col("l") < 3, 1L).otherwise(0L).as("at_risk"))
        .orderBy("nation", "segment")
    },

    // R166 — functional-dependency audit (schema-discovery profiling):
    // for each DECLARED candidate lhs→rhs, how many lhs groups exist,
    // how many carry >1 distinct rhs (violations), the worst fan-out,
    // and the holding share in permille. The discovery loop a warehouse
    // runs before declaring constraints — dq1 enforces declared rules,
    // this measures which rules the data would even support. Scale:
    // each candidate is ONE partial-aggregated groupBy on its own
    // table (countDistinct over the lhs key — map-side combinable);
    // everything after is group-domain-sized; the 5 frames union'd are
    // dimension-bounded. Adding a candidate is adding a row, not a scan
    // of everything.
    Q(
      "dq5_fd_audit",
      """WITH cand AS (
        |  SELECT 'customer.c_nationkey->c_mktsegment' AS fd, c_nationkey::VARCHAR AS lhs, c_mktsegment AS rhs FROM customer
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->l_suppkey', l_partkey::VARCHAR, l_suppkey::VARCHAR FROM lineitem
        |  UNION ALL
        |  SELECT 'orders.o_custkey->o_orderpriority', o_custkey::VARCHAR, o_orderpriority FROM orders
        |  UNION ALL
        |  SELECT 'part.p_brand->p_type', p_brand, p_type FROM part
        |  UNION ALL
        |  SELECT 'part.p_name->p_brand', p_name, p_brand FROM part),
        |g AS (SELECT fd, lhs, CAST(count(DISTINCT rhs) AS BIGINT) AS k
        |      FROM cand GROUP BY 1, 2)
        |SELECT fd,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |  max(k) AS max_fanout,
        |  (CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000)
        |    // CAST(count(*) AS BIGINT) AS holds_permille
        |FROM g GROUP BY fd ORDER BY fd""".stripMargin
    ) { (s, d) =>
      def cand(fd: String, df: org.apache.spark.sql.DataFrame,
               lhs: org.apache.spark.sql.Column, rhs: org.apache.spark.sql.Column) =
        df.select(lit(fd).as("fd"), lhs.cast("string").as("lhs"), rhs.cast("string").as("rhs"))
      val all = Seq(
        cand("customer.c_nationkey->c_mktsegment", Tables.customer(s, d),
          col("c_nationkey"), col("c_mktsegment")),
        cand("lineitem.l_partkey->l_suppkey", Tables.lineitem(s, d),
          col("l_partkey"), col("l_suppkey")),
        cand("orders.o_custkey->o_orderpriority", Tables.orders(s, d),
          col("o_custkey"), col("o_orderpriority")),
        cand("part.p_brand->p_type", Tables.part(s, d), col("p_brand"), col("p_type")),
        cand("part.p_name->p_brand", Tables.part(s, d), col("p_name"), col("p_brand"))
      ).reduce(_ unionAll _)
      val g = all.groupBy("fd", "lhs").agg(countDistinct("rhs").as("k"))
      g.groupBy("fd").agg(
          count(lit(1)).as("n_groups"),
          sum(when(col("k") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("k").as("max_fanout"),
          expr("(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) * 1000) DIV count(*)")
            .as("holds_permille"))
        .orderBy("fd")
    },

    // R171 — candidate-key uniqueness audit (dq5's FD sibling): for
    // each declared key candidate, rows vs distinct values, an is_key
    // verdict, and the uniqueness share. Deliberately includes
    // (l_orderkey, l_linenumber) — NOT unique in this synthetic
    // lineitem (the audit is the tool that CATCHES that assumption) —
    // and the widened 4-column key that does hold. Composite keys
    // enter as ':'-joined strings with doubles pre-quantized to exact
    // integers (double→string rendering is not engine-portable; cents
    // and rounded quantities are). Scale: one count+countDistinct
    // aggregate per candidate on its own table, all map-side
    // combinable, unions of 1-row frames.
    Q(
      "dq6_key_profile",
      """WITH u AS (
        |  SELECT 'customer.c_custkey' AS candidate, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct FROM customer
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey:l_linenumber', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey:l_linenumber:qty:cents', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR || ':'
        |      || CAST(round(l_quantity) AS BIGINT)::VARCHAR || ':'
        |      || CAST(round(l_extendedprice*100) AS BIGINT)::VARCHAR) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders.o_custkey', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'orders.o_orderkey', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'part.p_partkey', CAST(count(*) AS BIGINT),
        |    CAST(count(DISTINCT p_partkey) AS BIGINT) FROM part)
        |SELECT candidate, n_rows, n_distinct,
        |  CASE WHEN n_rows = n_distinct THEN 1 ELSE 0 END AS is_key,
        |  (n_distinct * 1000) // n_rows AS unique_permille
        |FROM u ORDER BY candidate""".stripMargin
    ) { (s, d) =>
      def audit(name: String, df: org.apache.spark.sql.DataFrame,
                key: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).as("n_rows"), countDistinct(key).as("n_distinct"))
          .select(lit(name).as("candidate"), col("n_rows"), col("n_distinct"))
      val li = Tables.lineitem(s, d)
      val or = Tables.orders(s, d)
      val u = Seq(
        audit("customer.c_custkey", Tables.customer(s, d), col("c_custkey")),
        audit("lineitem.l_orderkey:l_linenumber", li,
          concat_ws(":", col("l_orderkey"), col("l_linenumber"))),
        audit("lineitem.l_orderkey:l_linenumber:qty:cents", li,
          concat_ws(":", col("l_orderkey"), col("l_linenumber"),
            round(col("l_quantity")).cast("long"),
            round(col("l_extendedprice") * 100).cast("long"))),
        audit("orders.o_custkey", or, col("o_custkey")),
        audit("orders.o_orderkey", or, col("o_orderkey")),
        audit("part.p_partkey", Tables.part(s, d), col("p_partkey"))
      ).reduce(_ unionAll _)
      u.select(col("candidate"), col("n_rows"), col("n_distinct"),
          when(col("n_rows") === col("n_distinct"), 1L).otherwise(0L).as("is_key"),
          expr("(n_distinct * 1000) DIV n_rows").as("unique_permille"))
        .orderBy("candidate")
    },

    // R174 — surrogate-key gap audit (missing-range report): which id
    // ranges are absent from the LIVE subset (status 'F') of a dense
    // key sequence — the after-archive/purge reconciliation readout.
    // Scale design is TWO-LEVEL, never a fact-sized global sort:
    // local gaps come from a lead() window PARTITIONED by 4096-key
    // block (each partition is ≤4096 rows), cross-block gaps from a
    // lead() over the block-summary frame (N/4096 rows — itself
    // re-blockable by another DIV level if the keyspace demands it;
    // one level suffices for any realistic surrogate range). Gaps
    // between adjacent present keys are exact; runs spanning empty
    // blocks collapse into the summary-level gap because absent blocks
    // simply have no summary row. Top-20 under the (len, start) total
    // order. The oracle takes the direct global-lead form (fine at
    // oracle scale) — both compute the identical gap set.
    Q(
      "q119_seq_gaps",
      """WITH k AS (SELECT DISTINCT o_orderkey AS ok FROM orders
        |           WHERE o_orderstatus = 'F'),
        |g AS (SELECT ok, lead(ok) OVER (ORDER BY ok) AS nxt FROM k)
        |SELECT ok + 1 AS gap_start, nxt - 1 AS gap_end,
        |  nxt - ok - 1 AS gap_len
        |FROM g WHERE nxt > ok + 1
        |ORDER BY gap_len DESC, gap_start LIMIT 20""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val k = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("ok")).distinct()
        .withColumn("blk", expr("ok DIV 4096"))
        .localCheckpoint(true) // local windows + block summary read it
      // level 1: gaps between neighbours INSIDE a block (partitioned)
      val wb = Window.partitionBy("blk").orderBy("ok")
      val local = k.withColumn("nxt", lead("ok", 1).over(wb))
        .filter(col("nxt") > col("ok") + 1)
        .select((col("ok") + 1).as("gap_start"), (col("nxt") - 1).as("gap_end"))
      // level 2: gaps across block boundaries via the summary frame
      // (N/4096 rows; re-blockable by another DIV level if ever needed)
      val summ = k.groupBy("blk").agg(min("ok").as("mn"), max("ok").as("mx"))
      val ws = Window.orderBy("blk")
      val cross = summ.withColumn("nxt_mn", lead("mn", 1).over(ws))
        .filter(col("nxt_mn") > col("mx") + 1)
        .select((col("mx") + 1).as("gap_start"), (col("nxt_mn") - 1).as("gap_end"))
      local.unionByName(cross)
        .select(col("gap_start"), col("gap_end"),
          (col("gap_end") - col("gap_start") + 1).as("gap_len"))
        .orderBy(desc("gap_len"), col("gap_start")).limit(20)
    },

    // R205 — TEMPORAL referential integrity: q85 audits that foreign
    // KEYS resolve, this audits that the resolved rows make causal
    // sense — a lineitem shipped before its order was placed is
    // corrupt data no key check catches. One fact⨝orders equi-join
    // (the natural shuffle), violations + lag extremes in a single
    // aggregate; per-violation-free month breakdown keeps the output
    // calendar-sized and shows WHEN corruption entered.
    Q(
      "q129_temporal_integrity",
      """WITH j AS (
        |  SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS ym,
        |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT ym,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ship_before_order,
        |  CAST(min(lag_days) AS BIGINT) AS min_lag_days,
        |  CAST(max(lag_days) AS BIGINT) AS max_lag_days,
        |  CAST(sum(lag_days) // count(*) AS BIGINT) AS mean_lag_days
        |FROM j GROUP BY ym ORDER BY ym""".stripMargin
    ) { (s, d) =>
      val j = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .cast("long").as("ym"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast("long").as("lag_days"))
      j.groupBy("ym")
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("lag_days") < 0, 1L).otherwise(0L)).as("n_ship_before_order"),
          min("lag_days").as("min_lag_days"),
          max("lag_days").as("max_lag_days"),
          expr("sum(lag_days) DIV count(*)").as("mean_lag_days"))
        .orderBy("ym")
    },

    // R209 — table freshness / watermark audit: per temporal table,
    // the high-water mark and its lag behind the lake-wide maximum —
    // the "is anything stale" panel a warehouse checks before trusting
    // cross-table joins (NO wall clock anywhere: the reference point
    // is the data's own global maximum, so the audit is deterministic
    // and replayable). Three metadata-cheap min/max aggregates union'd
    // to a 3-row frame; the global max broadcasts.
    Q(
      "dq7_freshness",
      """WITH w AS (
        |  SELECT 'events' AS tbl,
        |    CAST(min(epoch_us(ts)) AS BIGINT) AS lo_us,
        |    CAST(max(epoch_us(ts)) AS BIGINT) AS hi_us FROM events
        |  UNION ALL
        |  SELECT 'lineitem', CAST(min(epoch_us(CAST(l_shipdate AS TIMESTAMP))) AS BIGINT),
        |    CAST(max(epoch_us(CAST(l_shipdate AS TIMESTAMP))) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'orders', CAST(min(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT),
        |    CAST(max(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) FROM orders),
        |g AS (SELECT CAST(max(hi_us) AS BIGINT) AS lake_hi FROM w)
        |SELECT tbl, lo_us, hi_us,
        |  (g.lake_hi - hi_us) // 86400000000 AS staleness_days,
        |  (hi_us - lo_us) // 86400000000 AS span_days
        |FROM w, g ORDER BY tbl""".stripMargin
    ) { (s, d) =>
      def wm(tbl: String, df: org.apache.spark.sql.DataFrame,
             ts: org.apache.spark.sql.Column) =
        df.agg(min(unix_micros(ts)).as("lo_us"), max(unix_micros(ts)).as("hi_us"))
          .select(lit(tbl).as("tbl"), col("lo_us"), col("hi_us"))
      val w = Seq(
        wm("events", Tables.events(s, d), col("ts")),
        wm("lineitem", Tables.lineitem(s, d), col("l_shipdate").cast("timestamp")),
        wm("orders", Tables.orders(s, d), col("o_orderdate").cast("timestamp"))
      ).reduce(_ unionAll _)
      val g = w.agg(max("hi_us").as("lake_hi"))
      w.crossJoin(broadcast(g))
        .select(col("tbl"), col("lo_us"), col("hi_us"),
          expr("(lake_hi - hi_us) DIV 86400000000").as("staleness_days"),
          expr("(hi_us - lo_us) DIV 86400000000").as("span_days"))
        .orderBy("tbl")
    },

    // R215 — partition-level category-mix drift: which MONTHLY
    // partitions carry an anomalous returnflag mix vs the lifetime
    // distribution — the ingest-time canary that catches a bad
    // upstream batch (tx25's PSI compares two snapshots; this scans
    // every partition against the whole). χ² per month entirely in
    // integers: each term (o·N − n·C)²/(n·C·N) e6-floor-quantized in
    // decimal/HUGEINT (a double cast of (o·N−n·C)² would cross 2⁵³ —
    // the known ulp trap), summed exactly; the 95% flag compares to
    // the e6-scaled χ²₂ critical value. One fact pass to (month, flag)
    // cells; lifetime totals broadcast.
    Q(
      "dq8_partition_drift",
      """WITH c AS (
        |  SELECT CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT) AS ym,
        |    l_returnflag AS f, CAST(count(*) AS BIGINT) AS o
        |  FROM lineitem GROUP BY 1, 2),
        |mn AS (SELECT ym, CAST(sum(o) AS BIGINT) AS n FROM c GROUP BY 1),
        |gl AS (SELECT f, CAST(sum(o) AS BIGINT) AS cf FROM c GROUP BY 1),
        |nn AS (SELECT CAST(sum(cf) AS BIGINT) AS nn FROM gl),
        |term AS (
        |  SELECT c.ym,
        |    CAST((1000000 * CAST(c.o * nn.nn - mn.n * gl.cf AS HUGEINT)
        |          * (c.o * nn.nn - mn.n * gl.cf))
        |         // (CAST(mn.n AS HUGEINT) * gl.cf * nn.nn) AS BIGINT) AS t_e6
        |  FROM c JOIN mn ON c.ym = mn.ym JOIN gl ON c.f = gl.f CROSS JOIN nn)
        |SELECT term.ym, mn.n,
        |  CAST(sum(t_e6) AS BIGINT) AS chisq_e6,
        |  CASE WHEN sum(t_e6) > 5991465 THEN 1 ELSE 0 END AS drift_flag
        |FROM term JOIN mn ON term.ym = mn.ym
        |GROUP BY term.ym, mn.n ORDER BY term.ym""".stripMargin
    ) { (s, d) =>
      val c = Tables.lineitem(s, d)
        .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("long").as("ym"), col("l_returnflag").as("f"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint(true) // month totals + category totals + terms
      val mn = c.groupBy("ym").agg(sum("o").as("n"))
      val gl = c.groupBy("f").agg(sum("o").as("cf"))
      val nn = gl.agg(sum("cf").as("nn"))
      val term = c.join(broadcast(mn), "ym").join(broadcast(gl), "f")
        .crossJoin(broadcast(nn))
        .select(col("ym"), col("n"),
          expr("""CAST((1000000 * CAST(o * nn - n * cf AS DECIMAL(38,0))
            |  * (o * nn - n * cf))
            | DIV (CAST(n AS DECIMAL(38,0)) * cf * nn) AS BIGINT)""".stripMargin)
            .as("t_e6"))
      term.groupBy("ym", "n")
        .agg(sum("t_e6").as("chisq_e6"))
        .withColumn("drift_flag",
          when(col("chisq_e6") > 5991465L, 1L).otherwise(0L))
        .select("ym", "n", "chisq_e6", "drift_flag")
        .orderBy("ym")
    },

    // R225 — enum-conformance audit: every categorical column checked
    // against its DECLARED domain, out-of-domain values counted and
    // the worst offender named (min unexpected value — deterministic).
    // The contract check dq1's numeric gates don't cover: a new
    // upstream code lands here before it breaks a downstream CASE.
    // One map-side-combinable conditional aggregate per column; a
    // clean lake reports zeros, which is the point of a gate.
    Q(
      "dq9_enum_conformance",
      """WITH u AS (
        |  SELECT 'documents.lang' AS col, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN lang NOT IN ('en','es','de','fr','zh')
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        |    min(CASE WHEN lang NOT IN ('en','es','de','fr','zh')
        |        THEN lang END) AS worst
        |  FROM documents
        |  UNION ALL
        |  SELECT 'events.event_type', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN event_type NOT IN
        |      ('click','view','purchase','signup','error')
        |             THEN 1 ELSE 0 END) AS BIGINT),
        |    min(CASE WHEN event_type NOT IN
        |      ('click','view','purchase','signup','error') THEN event_type END)
        |  FROM events
        |  UNION ALL
        |  SELECT 'lineitem.l_returnflag', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R')
        |             THEN 1 ELSE 0 END) AS BIGINT),
        |    min(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN l_returnflag END)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders.o_orderstatus', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P')
        |             THEN 1 ELSE 0 END) AS BIGINT),
        |    min(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN o_orderstatus END)
        |  FROM orders)
        |SELECT col, n_rows, n_bad,
        |  coalesce(worst, '') AS worst_value,
        |  CASE WHEN n_bad = 0 THEN 1 ELSE 0 END AS conforms
        |FROM u ORDER BY col""".stripMargin
    ) { (s, d) =>
      def audit(name: String, df: org.apache.spark.sql.DataFrame,
                c: String, domain: Seq[String]) = {
        val bad = !col(c).isin(domain.map(lit): _*)
        df.agg(count(lit(1)).as("n_rows"),
            sum(when(bad, 1L).otherwise(0L)).as("n_bad"),
            min(when(bad, col(c))).as("worst"))
          .select(lit(name).as("col"), col("n_rows"), col("n_bad"), col("worst"))
      }
      val u = Seq(
        audit("documents.lang", Tables.documents(s, d), "lang",
          Seq("en", "es", "de", "fr", "zh")),
        audit("events.event_type", Tables.events(s, d), "event_type",
          Seq("click", "view", "purchase", "signup", "error")),
        audit("lineitem.l_returnflag", Tables.lineitem(s, d), "l_returnflag",
          Seq("A", "N", "R")),
        audit("orders.o_orderstatus", Tables.orders(s, d), "o_orderstatus",
          Seq("F", "O", "P"))
      ).reduce(_ unionAll _)
      u.select(col("col"), col("n_rows"), col("n_bad"),
          coalesce(col("worst"), lit("")).as("worst_value"),
          when(col("n_bad") === 0, 1L).otherwise(0L).as("conforms"))
        .orderBy("col")
    },

    // R243 — derived-column consistency: documents carries BOTH the
    // text and a precomputed n_chars — do they still agree, or has a
    // transform updated one and not the other (the classic
    // denormalization drift ETL introduces). Per source: mismatches,
    // the worst absolute deviation, and a conformance verdict — all
    // from one scan-local comparison, no shuffle of text.
    Q(
      "dq10_derived_consistency",
      """SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mismatch,
        |  CAST(max(abs(length(text) - n_chars)) AS BIGINT) AS max_abs_diff,
        |  CASE WHEN sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) = 0
        |       THEN 1 ELSE 0 END AS conforms
        |FROM documents GROUP BY source ORDER BY source""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(length(col("text")) =!= col("n_chars"), 1L).otherwise(0L))
            .as("n_mismatch"),
          max(abs(length(col("text")).cast("long") - col("n_chars")))
            .as("max_abs_diff"))
        .withColumn("conforms",
          when(col("n_mismatch") === 0, 1L).otherwise(0L))
        .orderBy("source")
    }
  )
}
