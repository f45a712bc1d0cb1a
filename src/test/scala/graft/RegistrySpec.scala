package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene — the contracts the driver's gate assumes but
  * nothing else enforces: every entry must carry an oracle (an
  * oracle-less row can never go green), names must be unique in the
  * DECLARATION Seq (a duplicate would silently shadow its earlier twin
  * when the maps collapse), and names must stay snake_case (the
  * harness keys artifacts by them).
  */
class RegistrySpec extends AnyFunSuite {

  test("every query has an oracle and vice versa") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("registry names are unique in declaration order") {
    val names = SparkEntry.registryNames
    val dups = names.groupBy(identity).collect {
      case (n, occ) if occ.size > 1 => n
    }
    assert(dups.isEmpty, s"shadowed entries: ${dups.mkString(", ")}")
    assert(names.size == SparkEntry.queries.size)
  }

  test("names are snake_case identifiers") {
    val bad = SparkEntry.registryNames.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("oracle SQL never references scratch paths or engine-only state") {
    // oracles run in DuckDB over the sf tables alone: a path or temp-dir
    // reference would pass locally and break on the driver
    val bad = SparkEntry.oracleSql.filter { case (_, sql) =>
      sql.contains("/tmp") || sql.contains("/dev/shm") ||
        sql.contains("scratch")
    }
    assert(bad.isEmpty, bad.keys.mkString(", "))
  }
}
