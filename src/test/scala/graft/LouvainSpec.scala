package graft

import graft.algos.Louvain

class LouvainSpec extends SparkSpec {

  test("louvain finds the two cliques joined by a bridge") {
    val cliqueA = (0 until 5).combinations(2).map(p => (p(0), p(1))).toSeq
    val cliqueB = (5 until 10).combinations(2).map(p => (p(0), p(1))).toSeq
    val g = graphFrom(10, cliqueA ++ cliqueB ++ Seq((4, 5)))
    // Single-level parity sweeps can plateau on a symmetric split of a
    // clique (same-parity members swap labels in a period-4 cycle —
    // synchronous Louvain's classic failure mode). Phase-2 coarsening is
    // the escape: the split halves become super-vertices whose merge is
    // a plain positive-gain move on the coarse graph.
    val comm = Louvain.runMultiLevel(g, roundsPerLevel = 10, levels = 2)
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

  test("phase-2 coarsening improves modularity over first-phase-only sweeps") {
    // Transcript-derived graph (the bench graph's shape at spec scale):
    // first-phase synchronous sweeps plateau with many small communities;
    // the coarsened re-sweep must strictly improve the objective.
    val g = graph.GraphBuilder.fromTranscripts(
      synth.Synth.transcripts(spark, 0.001).toDF)
    val q1 = Louvain.modularity(g, Louvain.run(g, maxRounds = 5))
    val multi = Louvain.runMultiLevel(g, roundsPerLevel = 5, levels = 2)
    val q2 = Louvain.modularity(g, multi)
    info(f"first-phase Q=$q1%.4f multilevel Q=$q2%.4f")
    assert(q2 > q1, f"multilevel Q=$q2%.4f did not improve on first-phase Q=$q1%.4f")
  }
}
