package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-level invariants: every declared query runs on sf0.001 and
  * produces rows; names stay aligned with the oracle map; entry smoke.
  * (Value-level correctness is the driver's DuckDB pass — locally run
  * `tools/check.py`.)
  */
class QueriesSpec extends AnyFunSuite with SparkFixture {

  test("every oracle key is a declared query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("every declared query has an oracle (no silent rows-only downgrade)") {
    // the driver records a weaker rows-only check for keys missing from
    // oracleSql — this engine's contract is the FULL hash compare for
    // every key, so a missing oracle is a regression, not an option
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"keys without an oracle: $missing")
  }

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} runs and returns rows on sf0.001") {
      val df = q.fn(spark, sf("sf0.001"))
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
