package graft

import org.apache.spark.sql.functions._

import graft.algos.{CDLP, PageRank, Triangles, WCC}
import graft.graph.GraphBuilder
import graft.oracle.Oracle
import graft.synth.Synth

/** Distributed algorithms vs the single-threaded oracle — the analog of
  * the reference's golden-output CI (`analytical_engine/test/
  * app_tests.sh:118-127`): exact for WCC/CDLP/triangles, allclose 1e-6
  * for PageRank (`python/graphscope/tests/unittest/test_app.py:68`).
  */
class AlgoSpec extends SparkSpec {

  private val n = 60
  private val edges = randomEdges(n, 300)
  private lazy val g = graphFrom(n, edges).persist()

  // A second, structured fixture: the real transcript-derived graph.
  private lazy val tg = {
    val turns = Synth.transcripts(spark, 0.0001).toDF
    GraphBuilder.fromTranscripts(turns).persist()
  }
  private lazy val tgEdges: Seq[(Int, Int)] =
    tg.edges.collect().map(e => (e.src.toInt, e.dst.toInt)).toSeq
  private lazy val tgN: Int = tg.numVertices.toInt

  test("pagerank matches oracle (fixed 10 rounds, allclose 1e-6)") {
    val got = PageRank.run(g, PageRank.Config(0.85, 10))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Oracle.pageRank(n, edges, 0.85, 10)
    assert(got.size == n)
    (0 until n).foreach { i =>
      assert(math.abs(got(i.toLong) - want(i)) < 1e-6, s"vertex $i: ${got(i.toLong)} vs ${want(i)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "ranks must sum to 1 (dangling mass conserved)")
  }

  test("pagerank with tolerance converges like oracle") {
    val log = new graft.engine.Engine.MetricsLog
    val got = PageRank.run(g, PageRank.Config(0.85, 100, Some(1e-6)), log)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val oracleIters = Oracle.pageRankIterations(n, edges, 0.85, 100, 1e-6)
    assert(log.iterations == oracleIters, s"iterations ${log.iterations} vs oracle $oracleIters")
    val want = Oracle.pageRank(n, edges, 0.85, 100, Some(1e-6))
    (0 until n).foreach(i => assert(math.abs(got(i.toLong) - want(i)) < 1e-6))
  }

  test("pagerank on transcript graph matches oracle") {
    val got = PageRank.run(tg, PageRank.Config(0.85, 10))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Oracle.pageRank(tgN, tgEdges, 0.85, 10)
    (0 until tgN).foreach(i => assert(math.abs(got(i.toLong) - want(i)) < 1e-6))
  }

  test("weighted pagerank matches oracle on the weighted transcript graph") {
    val wEdges = tg.edges.collect().map(e => (e.src.toInt, e.dst.toInt, e.weight)).toSeq
    val got = PageRank.run(tg, PageRank.Config(0.85, 10, weighted = true))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Oracle.pageRankWeighted(tgN, wEdges, 0.85, 10)
    (0 until tgN).foreach(i => assert(math.abs(got(i.toLong) - want(i)) < 1e-6))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the transcript weights are non-uniform, so the weighted ranks must
    // genuinely differ from the unweighted run
    val unw = Oracle.pageRank(tgN, wEdges.map(e => (e._1, e._2)), 0.85, 10)
    assert((0 until tgN).exists(i => math.abs(want(i) - unw(i)) > 1e-6))
  }

  test("personalized pagerank matches oracle and conserves mass at the seed") {
    val seed = 3
    val got = PageRank.personalized(g, seed.toLong, rounds = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Oracle.personalizedPageRank(n, edges, seed, 0.85, 10)
    assert(got.size == n)
    (0 until n).foreach { i =>
      assert(math.abs(got(i.toLong) - want(i)) < 1e-9, s"vertex $i: ${got(i.toLong)} vs ${want(i)}")
    }
    // teleport + dangling mass both restart at the seed → total mass 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "ppr mass must be conserved")
    // the teleport term alone guarantees the seed at least (1 - d)
    assert(got(seed.toLong) >= 0.15, "seed rank must carry the teleport floor")
  }

  test("frontier-sparse personalized pagerank equals the dense form") {
    val seed = 3
    val dense = PageRank.personalized(g, seed.toLong, rounds = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sparse = PageRank.personalizedSparse(g, seed.toLong, rounds = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // identical recurrence, dropped terms are exact zeros — the only
    // divergence channel is fp aggregation order, so the bound is tight
    assert(sparse.size == n, "sparse PPR must re-densify to full rank at exit")
    (0 until n).foreach { i =>
      assert(math.abs(dense(i.toLong) - sparse(i.toLong)) < 1e-12,
        s"vertex $i: dense ${dense(i.toLong)} vs sparse ${sparse(i.toLong)}")
    }
  }

  test("wcc matches oracle exactly") {
    val got = WCC.run(g).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Oracle.wcc(n, edges)
    (0 until n).foreach(i => assert(got(i.toLong) == want(i).toLong, s"vertex $i"))
  }

  test("wcc finds multiple components") {
    // two disjoint cliques + an isolated vertex
    val es = Seq((0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3))
    val gg = graphFrom(7, es)
    val got = WCC.run(gg).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 0L && got(1L) == 0L && got(2L) == 0L)
    assert(got(3L) == 3L && got(4L) == 3L && got(5L) == 3L)
    assert(got(6L) == 6L)
  }

  test("cdlp matches oracle exactly (10 rounds, min-label tie-break)") {
    val got = CDLP.run(g, 10).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Oracle.cdlp(n, edges, 10)
    (0 until n).foreach(i => assert(got(i.toLong) == want(i), s"vertex $i: ${got(i.toLong)} vs ${want(i)}"))
  }

  test("cdlp tie-break picks the smallest label") {
    // v2 has neighbors v0 and v1 with equal frequency → label min(0,1)=0.
    val es = Seq((0, 2), (1, 2))
    val got = CDLP.run(graphFrom(3, es), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) == 0L)
  }

  test("triangles match oracle exactly") {
    val got = Triangles.run(g).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Oracle.triangles(n, edges)
    (0 until n).foreach(i => assert(got(i.toLong) == want(i), s"vertex $i: ${got(i.toLong)} vs ${want(i)}"))
  }

  test("triangles on transcript graph match oracle") {
    val got = Triangles.run(tg).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Oracle.triangles(tgN, tgEdges)
    assert(want.sum > 0, "fixture should contain triangles")
    (0 until tgN).foreach(i => assert(got(i.toLong) == want(i), s"vertex $i"))
  }

  test("triangles on a known graph") {
    // K4 minus one edge: triangles {0,1,2} and {0,1,3}.
    val es = Seq((0, 1), (0, 2), (0, 3), (1, 2), (1, 3))
    val got = Triangles.run(graphFrom(4, es))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 1L, 3L -> 1L))
  }
}
