package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that the type system cannot enforce. */
class ContractSpec extends AnyFunSuite {

  test("queries and oracleSql are 1:1 (every query has an oracle and vice versa)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"only in queries: ${q -- o}; only in oracles: ${o -- q}")
  }

  test("no duplicate query keys in the source (Map literals last-win SILENTLY)") {
    // a duplicated name shadows the older query without any compile
    // error — round 5 shipped a Verify run of 193/194 before this was
    // caught (tg_gremlin_2hop). Guard at the source-text level.
    val src = scala.io.Source.fromFile(
      "src/main/scala/graft/SparkEntry.scala", "UTF-8")
    val text = try src.mkString finally src.close()
    val keys = """"([a-z0-9_]+)"\s*->\s*\(\(s, dir\)""".r
      .findAllMatchIn(text).map(_.group(1)).toList
    val dups = keys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query keys: $dups")
    assert(keys.size == SparkEntry.queries.size)
  }
}
