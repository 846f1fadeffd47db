package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract registry consistency: every query key must carry an
  * oracle and every oracle a query — a drifted pair silently weakens the
  * correctness gate to a rows-only (or no) check. Pure map checks, no
  * Spark session. */
class RegistrySpec extends AnyFunSuite {

  test("queries and oracleSql carry exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("bench overrides only override keys that exist in the registry") {
    val q = SparkEntry.queries.keySet
    val over = graft.entry.AQueries.benchOverrides.keySet ++
      graft.entry.DQueries.benchOverrides.keySet ++
      graft.entry.OlapQueries.benchOverrides.keySet
    assert((over -- q).isEmpty,
      s"bench overrides for unknown keys: ${(over -- q).toSeq.sorted}")
  }

  test("key families follow the documented prefix convention") {
    val known = "^(a|b|d|s|t|m)\\d{2}_[a-z0-9_]+$".r
    val bad = SparkEntry.queries.keySet.filterNot(k =>
      known.pattern.matcher(k).matches())
    assert(bad.isEmpty, s"keys outside the naming convention: ${bad.toSeq.sorted}")
  }
}
