package graft

import graft.queries.Registry

/** t1-style smoke: every registered query runs at sf0.001 and returns
  * rows; oracle'd queries also carry SQL. (Exact oracle equality is
  * checked by tools/verify_local.py against DuckDB — not re-tested here.)
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and oracle keys match") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Registry.all.foreach { q =>
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
