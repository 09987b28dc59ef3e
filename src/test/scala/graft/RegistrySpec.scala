package graft

/** Contract-level checks over the whole declared inventory (SURVEY §2):
  * every query must build a plan, run at sf0.001, and keep queries/oracle
  * keys consistent — the exact invariants the driver's gate assumes.
  */
class RegistrySpec extends SparkSpec {

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // join_anti legitimately returns 0 rows at sf0.001 (every customer has
  // at least one order there); it is non-empty at sf0.01.
  private val mayBeEmptyAtSf0001 = Set("join_anti")

  for (q <- Registry.all) {
    test(s"${q.name} runs at sf0.001") {
      val df = q.fn(spark, sf0001)
      val n = df.count()
      if (!mayBeEmptyAtSf0001(q.name)) assert(n > 0, s"${q.name} returned no rows")
      assert(df.schema.fields.nonEmpty)
    }
  }
}
