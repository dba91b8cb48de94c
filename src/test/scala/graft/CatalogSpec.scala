package graft

/** Every catalog entry must plan, execute at sf0.001, and return rows —
  * the same shape the driver's smoke/verify checks take. */
class CatalogSpec extends SparkSpecBase {

  test("catalog has no duplicate query names") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracle key is a query key") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.all.foreach { q =>
    test(s"${q.name} executes and returns rows at sf0.001") {
      val df = q.run(spark, sf0001)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
