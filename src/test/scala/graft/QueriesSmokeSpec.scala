package graft

import graft.queries.Registry

/** Every registered query must run and return rows on sf0.001, and
  * every oracle key must reference a registered query.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Registry.all.foreach { q =>
    test(s"${q.name} runs on sf0.001 with rows > 0") {
      assert(q.run(spark, sf001).count() > 0)
    }
  }

  test("oracleSql keys ⊆ queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
