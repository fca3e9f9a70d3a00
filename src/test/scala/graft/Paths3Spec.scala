package graft

import org.apache.spark.sql.functions._

import graft.algos.{Betweenness, Paths3}
import graft.oracle.OracleBrandes

class Paths3Spec extends SparkSpec {

  private val n = 30
  private val edges = randomEdges(n, 120)
  private lazy val g = graphFrom(n, edges).persist()

  test("betweenness matches Brandes oracle (all sources)") {
    val allOids = (0 until n).map(i => f"v$i%06d")
    val got = Betweenness.run(g, allOids).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    val want = OracleBrandes.betweenness(n, edges, 0 until n)
    (0 until n).foreach(i =>
      assert(math.abs(got(i) - want(i)) < 1e-6, s"vertex $i: ${got(i)} vs ${want(i)}"))
  }

  test("neighbor sampling: deterministic fanout slots over real edges") {
    val seeds = Seq("v000000", "v000003")
    val res = graft.ml.NeighborSample.sample(g, seeds, Seq(2, 2))
    val rows = res.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3), r.getInt(4)))
    assert(rows.nonEmpty)
    // one child per (seed, hop, parent, slot); <= fanout slots per parent
    assert(rows.map(t => (t._1, t._2, t._3, t._5)).distinct.length == rows.length)
    assert(rows.groupBy(t => (t._1, t._2, t._3)).values.forall(_.size <= 2))
    // every sampled (parent, child) is a real edge
    val eset = edges.map { case (a, b) => (f"v$a%06d", f"v$b%06d") }.toSet
    assert(rows.forall(t => eset.contains((t._3, t._4))), "sampled a non-edge")
    // hop-2 parents came from hop-1 children of the same seed
    val h1c = rows.filter(_._2 == 1).map(t => (t._1, t._4)).toSet
    assert(rows.filter(_._2 == 2).forall(t => h1c.contains((t._1, t._3))))
    // slot diversification: with the avalanche-mixed pick, the two slots
    // of a parent with out-degree >= 2 usually choose DIFFERENT children
    // (a linear slot offset preserved the candidate ordering mod p, so
    // every slot picked the same child ~99.9% of the time)
    val odeg = edges.groupBy(_._1).map { case (a, es) =>
      (f"v$a%06d", es.map(_._2).distinct.size) }
    val eligible = rows.groupBy(t => (t._1, t._2, t._3)).values.toSeq
      .filter(grp => grp.size == 2 && odeg.getOrElse(grp.head._3, 0) >= 2)
    val diverse = eligible.count(grp => grp.map(_._4).distinct.size == 2)
    assert(eligible.nonEmpty && diverse * 2 > eligible.size,
      s"slots rarely diversify: $diverse of ${eligible.size}")
    // hash-gated, not rand(): re-running reproduces the sample exactly
    val again = graft.ml.NeighborSample.sample(g, seeds, Seq(2, 2))
      .collect().map(_.toString).sorted.toSeq
    assert(again == res.collect().map(_.toString).sorted.toSeq)
  }

  test("ranked neighbor strategies: topk by weight, no-replacement distinct") {
    val s = spark
    import s.implicits._
    // parent 0 with weighted out-edges so top-k order is observable
    val vs = (0 until 6).map(i => graft.schema.Vertex(i.toLong, f"v$i%06d")).toDS()
    val es = Seq((0, 1, 5.0), (0, 2, 9.0), (0, 3, 9.0), (0, 4, 1.0), (2, 5, 2.0))
      .map { case (a, b, w) => graft.schema.Edge(a.toLong, b.toLong, w) }.toDS()
    val gg = graft.graph.LinkGraph(vs, es)
    val top = graft.ml.NeighborSample.sampleTopK(gg, Seq("v000000"), Seq(3))
      .collect().map(r => (r.getString(3), r.getInt(4))).sortBy(_._2)
    // weight desc, tie on 9.0 breaks to smaller oid: v2, v3, then v1
    assert(top.toSeq == Seq(("v000002", 0), ("v000003", 1), ("v000001", 2)))
    val nr = graft.ml.NeighborSample.sampleWithoutReplacement(gg, Seq("v000000"), Seq(3))
      .collect().map(_.getString(3))
    // without replacement: 3 DISTINCT children out of the 4 neighbors
    assert(nr.length == 3 && nr.distinct.length == 3)
    // padding rule: fanout beyond the degree returns all, unpadded
    val all = graft.ml.NeighborSample.sampleTopK(gg, Seq("v000000"), Seq(9))
      .collect()
    assert(all.length == 4)
  }

  test("probability neighbor strategies: edge_weight / in_degree interval draws") {
    val s = spark
    import s.implicits._
    val vs = (0 until 6).map(i => graft.schema.Vertex(i.toLong, f"v$i%06d")).toDS()
    // parent 0: child 1 at weight 9 vs child 2 at weight 1; child 2 has
    // the higher GLOBAL in-degree (4 in-edges vs 2)
    val es = Seq((0, 1, 9.0), (0, 2, 1.0), (3, 2, 1.0), (4, 2, 1.0), (5, 2, 1.0), (3, 1, 1.0))
      .map { case (a, b, w) => graft.schema.Edge(a.toLong, b.toLong, w) }.toDS()
    val gg = graft.graph.LinkGraph(vs, es)
    val ew = graft.ml.NeighborSample.sampleEdgeWeight(gg, Seq("v000000"), Seq(10))
      .collect().map(r => (r.getInt(4), r.getString(3)))
    // every slot fills (total weight > 0) and lands on a real neighbor
    assert(ew.length == 10)
    assert(ew.forall(t => t._2 == "v000001" || t._2 == "v000002"))
    // 9:1 edge-weight mass → strong majority of slots pick v000001
    assert(ew.count(_._2 == "v000001") >= 7, ew.mkString(","))
    // in_degree flips the preference: v000002 carries 2/3 of the mass
    // (30 slots so the proportionality dominates hash noise)
    val ind = graft.ml.NeighborSample.sampleByInDegree(gg, Seq("v000000"), Seq(30))
      .collect().map(_.getString(3))
    assert(ind.length == 30)
    assert(ind.count(_ == "v000002") > 15, ind.mkString(","))
    // sharding params are a pure physical choice: degenerate sub-bucket
    // and bin widths must reproduce the sample exactly
    val alt = graft.ml.NeighborSample.sampleEdgeWeight(gg, Seq("v000000"), Seq(10),
      subBuckets = 1, binW = 1).collect().map(_.toString).sorted.toSeq
    assert(alt == graft.ml.NeighborSample.sampleEdgeWeight(gg, Seq("v000000"), Seq(10))
      .collect().map(_.toString).sorted.toSeq)
    // GSL front-end routes the strategy onto the same draws
    val viaGsl = graft.ml.Gsl.run(gg,
      "g.V().batch(1).outV().sample(10).by('edge_weight')")
      .collect().map(r => (r.getString(3), r.getInt(4))).sorted.toSeq
    assert(viaGsl == ew.map(t => (t._2, t._1)).sorted.toSeq)
  }

  test("GSL chain lowers onto the sampler plane (strategy + neg equivalence)") {
    // random-strategy GSL hop == NeighborSample.sample on the same seeds
    val all = (0 until n).map(i => f"v$i%06d")
    val viaGsl = graft.ml.Gsl.run(g, "g.V().outV().sample(2).by('random')")
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(3), r.getInt(4))).toSet
    val direct = graft.ml.NeighborSample.sample(g, all, Seq(2))
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(3), r.getInt(4))).toSet
    assert(viaGsl == direct)
    // shuffled batch is a deterministic prefix of the hash permutation
    val b1 = graft.ml.Gsl.run(g, "g.V().shuffle().batch(5).outV().sample(1).by('full')")
      .collect().map(_.getString(0)).toSet
    val b2 = graft.ml.Gsl.run(g, "g.V().shuffle().batch(5).outV().sample(1).by('full')")
      .collect().map(_.getString(0)).toSet
    assert(b1 == b2 && b1.size <= 5)
    // terminal outNeg: negatives are never out-neighbors of their parent
    val eset = edges.map { case (a, b) => (f"v$a%06d", f"v$b%06d") }.toSet
    val negs = graft.ml.Gsl.run(g,
      "g.V().batch(4).outV().sample(2).by('random_without_replacement')" +
        ".outNeg().sample(2).by('random')")
      .collect().filter(_.getString(5) == "neg")
      .map(r => (r.getString(2), r.getString(3)))
    assert(negs.nonEmpty)
    negs.foreach { case (parent, neg) =>
      assert(neg != parent && !eset.contains((parent, neg)))
    }
    intercept[IllegalArgumentException](graft.ml.Gsl.run(g, "g.V().out()"))
    // edge source: terminal batch is a deterministic positive stream;
    // with an endpoint jump, negatives come from the batch's sources
    val eb = graft.ml.Gsl.run(g, "g.E().batch(5)").collect()
    assert(eb.length == 5 && eb.forall(_.getString(5) == "edge"))
    assert(eb.forall(r => eset.contains((r.getString(2), r.getString(3)))))
    val en = graft.ml.Gsl.run(g,
      "g.E().shuffle().batch(5).outV().outNeg().sample(2).by('random')")
      .collect()
    assert(en.nonEmpty && en.forall(_.getString(5) == "neg"))
    en.foreach { r =>
      assert(!eset.contains((r.getString(2), r.getString(3))))
    }
  }

  test("negative sampling: non-neighbors only, deterministic, diverse") {
    val seeds = Seq("v000000", "v000003")
    val res = graft.ml.NegativeSample.sample(g, seeds, f = 4)
    val rows = res.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(rows.nonEmpty)
    // at most one pick per (seed, slot), at most f slots per seed
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
    assert(rows.groupBy(_._1).values.forall(_.size <= 4))
    val eset = edges.map { case (a, b) => (f"v$a%06d", f"v$b%06d") }.toSet
    val candSet = edges.map(e => f"v${e._2}%06d").toSet
    rows.foreach { case (s, _, neg) =>
      assert(neg != s, s"sampled the seed itself: $s")
      assert(!eset.contains((s, neg)), s"sampled a neighbor: $s -> $neg")
      assert(candSet.contains(neg), s"sampled a non-candidate: $neg")
    }
    // the avalanche-mixed draws should diversify across slots: a 30-
    // vertex graph with out-degree ~4 leaves >20 valid negatives per
    // seed, so 4 slots collapsing to one value would be a hash defect
    assert(rows.groupBy(_._1).values.forall(g => g.map(_._3).distinct.size >= 2))
    // hash-gated, not rand(): re-running reproduces the sample exactly
    val again = graft.ml.NegativeSample.sample(g, seeds, f = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(again == res.collect().map(_.toString).sorted.toSeq)
  }

  test("in-degree negative sampling: interval draws, valid negatives, shard-invariant") {
    val seeds = Seq("v000000", "v000003")
    val res = graft.ml.NegativeSample.sampleInDegree(g, seeds, f = 6)
    val rows = res.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(rows.nonEmpty)
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
    val eset = edges.map { case (a, b) => (f"v$a%06d", f"v$b%06d") }.toSet
    val candSet = edges.map(e => f"v${e._2}%06d").toSet
    rows.foreach { case (s, _, neg) =>
      assert(neg != s, s"sampled the seed itself: $s")
      assert(!eset.contains((s, neg)), s"sampled a neighbor: $s -> $neg")
      assert(candSet.contains(neg), s"sampled a zero-in-degree vertex: $neg")
    }
    // the bucketed prefix sum + binned range join must be a pure
    // physical choice: degenerate sharding (bucketSize=1 → offsets do
    // all the work; binW=1 → one bin per interval unit) is a different
    // plan over the same arithmetic and must reproduce the sample
    val alt = graft.ml.NegativeSample.sampleInDegree(g, seeds, f = 6,
      bucketSize = 1, binW = 1).collect().map(_.toString).sorted.toSeq
    assert(alt == res.collect().map(_.toString).sorted.toSeq)
    // node_weight ≡ in_degree on a unit-weight graph (in-strength =
    // in-degree); they diverge only where occurrence counts exceed 1
    val nw = graft.ml.NegativeSample.sampleNodeWeight(g, seeds, f = 6)
      .collect().map(_.toString).sorted.toSeq
    assert(nw == res.collect().map(_.toString).sorted.toSeq)
  }

  test("in-degree negative sampling: draw mass proportional to in-degree") {
    // candidates: vertex 9 (indeg 8 — the draw space is 9/10ths its
    // intervals) and vertex 0 (indeg 1, but it is seed 10's
    // out-neighbor, so rejected); every filled slot must return v000009
    val star = (1 to 8).map(i => (i, 9)) :+ (10, 0)
    val sg = graphFrom(11, star)
    val negs = graft.ml.NegativeSample.sampleInDegree(sg, Seq("v000010"), f = 8)
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(negs.length >= 4, s"too many exhausted slots: ${negs.length}")
    assert(negs.forall(_._2 == "v000009"), negs.mkString(","))
    // GSL front-end accepts the strategy and routes to the same draws
    val viaGsl = graft.ml.Gsl.run(sg,
      "g.V().batch(11).outV().sample(1).by('full')" +
        ".outNeg().sample(8).by('in_degree')")
      .collect().filter(_.getString(5) == "neg")
    assert(viaGsl.nonEmpty && viaGsl.forall(r =>
      r.getString(3) == "v000009" || r.getString(3) == "v000000"))
  }

  test("apsp lengths agree with per-source sssp") {
    val res = Paths3.apspLengths(g, Seq("v000000", "v000001")).collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getDouble(2) >= 0.0))
    val zero = res.filter(r => r.getString(0) == r.getString(1))
    assert(zero.forall(_.getDouble(2) == 0.0))
  }

  test("attribute assortativity: assortative vs random attribute") {
    val s = spark
    import s.implicits._
    // two cliques: attribute = clique id → strongly assortative
    val cl = (0 until 6).combinations(2).flatMap(p => Seq((p(0), p(1)), (p(1), p(0)))).toSeq ++
      (6 until 12).combinations(2).flatMap(p => Seq((p(0), p(1)), (p(1), p(0)))).toSeq ++
      Seq((0, 6))
    val gg = graphFrom(12, cl)
    val attr = (0 until 12).map(i => (i.toLong, if (i < 6) "a" else "b")).toDF("id", "cat")
    val r = Paths3.attributeAssortativity(gg, attr)
    assert(r > 0.8, s"expected assortative, got $r")
  }

  test("dfs preorder visits reachable vertices exactly once, children sorted") {
    val gg = graphFrom(5, Seq((0, 1), (0, 2), (1, 3), (2, 4)))
    val order = Paths3.dfsOrder(gg, "v000000")
    assert(order == Seq("v000000", "v000001", "v000003", "v000002", "v000004"))
  }

  test("simple-path predicate and bounded enumeration") {
    val gg = graphFrom(5, Seq((0, 1), (1, 2), (0, 2), (2, 3)))
    assert(Paths3.isSimplePath(gg, Seq("v000000", "v000001", "v000002")))
    assert(!Paths3.isSimplePath(gg, Seq("v000000", "v000002", "v000001"))) // no 2→1 edge
    assert(!Paths3.isSimplePath(gg, Seq("v000000", "v000001", "v000002", "v000000"))) // repeat
    val paths = Paths3.allSimplePaths(gg, "v000000", "v000003", 4).collect()
      .map(_.getSeq[String](0)).toSet
    assert(paths == Set(
      Seq("v000000", "v000001", "v000002", "v000003"),
      Seq("v000000", "v000002", "v000003")))
  }

  test("sampling paths are deterministic and respect edges") {
    val gg = graphFrom(6, Seq((0, 1), (1, 2), (2, 3), (3, 4), (0, 5)))
    val p1 = Paths3.samplingPaths(gg, Seq("v000000"), 3).collect().head.getSeq[String](1)
    val p2 = Paths3.samplingPaths(gg, Seq("v000000"), 3).collect().head.getSeq[String](1)
    assert(p1 == p2)
    assert(p1.length >= 2 && p1.head == "v000000")
    // dead-end walks stop early but keep the tip
    val stuck = Paths3.samplingPaths(gg, Seq("v000004"), 3).collect().head.getSeq[String](1)
    assert(stuck == Seq("v000004"))
  }
}
