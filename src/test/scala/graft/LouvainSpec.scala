package graft

import graft.algos.Louvain

class LouvainSpec extends SparkSpec {

  test("louvain finds the two cliques joined by a bridge") {
    val cliqueA = (0 until 5).combinations(2).map(p => (p(0), p(1))).toSeq
    val cliqueB = (5 until 10).combinations(2).map(p => (p(0), p(1))).toSeq
    val g = graphFrom(10, cliqueA ++ cliqueB ++ Seq((4, 5)))
    val comm = Louvain.run(g, maxRounds = 10)
    val got = comm.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = (0 until 5).map(i => got(i.toLong)).toSet
    val b = (5 until 10).map(i => got(i.toLong)).toSet
    assert(a.size == 1, s"clique A split: $got")
    assert(b.size == 1, s"clique B split: $got")
    assert(a != b, s"cliques merged: $got")
    val q = Louvain.modularity(g, comm)
    assert(q > 0.3, s"modularity $q too low")
  }

  test("louvain leaves a clique as one community with high modularity gain over singletons") {
    val clique = (0 until 6).combinations(2).map(p => (p(0), p(1))).toSeq
    val g = graphFrom(6, clique)
    val comm = Louvain.run(g, maxRounds = 10)
    val got = comm.collect().map(r => r.getLong(1)).toSet
    assert(got.size == 1, s"clique fragmented into $got")
  }
}
