package graft

/** Structural regression guards (SURVEY.md §6): the properties that make
  * these plans scale must survive refactors — filters reaching the scan,
  * column pruning, dims broadcasting. Cheap string checks on the
  * optimized/physical plans at sf0.001.
  */
class PlanGuardSpec extends SparkSpecBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("q01 pushes the shipdate filter into the parquet scan") {
    val p = plan("q01_agg")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"))
  }

  test("q01 prunes lineitem to the referenced columns only") {
    val p = plan("q01_agg")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment") && !p.contains("l_partkey"),
      "unreferenced columns must not be read")
  }

  test("q02 pushes range predicates down") {
    val p = plan("q02_filter_project")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("PushedFilters"))
    assert(p.contains("LessThan(l_quantity,24.0)"))
  }

  test("q06/q07 broadcast the dimension side") {
    assert(plan("q06_broadcast_join").contains("BroadcastHashJoin"))
    assert(plan("q07_star_join").contains("BroadcastHashJoin"))
  }

  test("q04 semi join and q05b anti join keep their join types") {
    assert(plan("q04_semi_join").contains("LeftSemi"))
    assert(plan("q05b_anti_join").contains("LeftAnti"))
  }

  test("q15 sort+limit becomes TakeOrderedAndProject (no global sort)") {
    assert(plan("q15_sort_limit").contains("TakeOrderedAndProject"))
  }
}
