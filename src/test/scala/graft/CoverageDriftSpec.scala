package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md ⇄ SparkEntry.queries drift gate.
  *
  * 210 queries over 19 families outgrew manual bookkeeping: this spec
  * fails the build the moment a query is registered without a
  * COVERAGE.md citation, or COVERAGE.md cites a query name that no
  * longer exists. Query names follow the `<fam><n>_<slug>` convention
  * (q1_pricing_summary, dd2_minhash_lsh, …), which is what the
  * reverse-direction regex keys on — prose tokens that merely look like
  * query names are already a bug in the doc.
  */
class CoverageDriftSpec extends AnyFunSuite {

  private lazy val coverage: String = {
    val src = scala.io.Source.fromFile("COVERAGE.md", "UTF-8")
    try src.mkString finally src.close()
  }

  private val NamePattern = "`([a-z]{1,3}[0-9]+[a-z]?_[a-z0-9_]+)`".r

  test("every registered query is cited in COVERAGE.md") {
    val missing = SparkEntry.queries.keySet.filterNot(coverage.contains)
    assert(missing.isEmpty,
      s"queries with no COVERAGE.md citation: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every query-shaped name cited in COVERAGE.md is a registered query") {
    val cited = NamePattern.findAllMatchIn(coverage).map(_.group(1)).toSet
    val stale = cited -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"COVERAGE.md cites unregistered query names: ${stale.toSeq.sorted.mkString(", ")}")
  }
}
