package graft

import org.apache.spark.sql.functions._

import graft.gie.G

/** GIE traversal DSL (graft.gie.Traversal) vs hand-computed results on a
  * small fixture:
  *
  *   u0 → a0 → t0,  u0 → a1 → t0,  u1 → a0,  a0 → a1,  t0 → u1
  */
class GieSpec extends SparkSpec {

  private lazy val g = {
    val s = spark
    import s.implicits._
    val names = Seq("u0", "u1", "a0", "a1", "t0")
    val vs = names.zipWithIndex.map { case (n, i) => graft.schema.Vertex(i.toLong, n) }.toDS()
    def id(n: String) = names.indexOf(n).toLong
    val es = Seq(
      ("u0", "a0"), ("u0", "a1"), ("u1", "a0"), ("a0", "t0"), ("a1", "t0"),
      ("a0", "a1"), ("t0", "u1"))
      .map { case (a, b) => graft.schema.Edge(id(a), id(b), 1.0) }.toDS()
    graft.graph.LinkGraph(vs, es)
  }

  test("scan + has + out preserves traverser multiplicity (path counts)") {
    // u* .out() .has(a*) .out() — paths: u0→a0→{t0,a1}, u0→a1→t0, u1→a0→{t0,a1}
    val counts = G.V(g, col("oid").like("u%"))
      .out().has(col("oid").like("a%")).out()
      .auxilia().groupCount("oid")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("t0" -> 3L, "a1" -> 2L))
  }

  test("as/back tags + auxilia") {
    // tag the user, expand two hops, jump back to the tag
    val back = G.V(g, col("oid").like("u%")).as_("who")
      .out().out().back("who").auxilia()
      .values("oid").collect().map(_.getString(0))
    // u0 has 3 two-hop paths, u1 has 2 (a0→t0, a0→a1)
    assert(back.count(_ == "u0") == 3 && back.count(_ == "u1") == 2)
  }

  test("whereExists / whereNotExists (Apply SEMI/ANTI)") {
    val withTool = G.V(g, col("oid").like("a%"))
      .whereExists(_.out().has(col("oid") === "t0"))
      .auxilia().values("oid").collect().map(_.getString(0)).toSet
    assert(withTool == Set("a0", "a1"))
    val noTool = G.V(g, col("oid").like("u%"))
      .whereNotExists(_.out().has(col("oid") === "t0"))
      .auxilia().values("oid").collect().map(_.getString(0)).toSet
    assert(noTool == Set("u0", "u1")) // users only reach tools at 2 hops
  }

  test("pathExpand min-hop semantics and bounds") {
    val hops = G.V(g, col("oid") === "u0").pathExpand(1, 3)
      .auxilia().df.select(col("oid"), col("__hops"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hops == Map("a0" -> 1L, "a1" -> 1L, "t0" -> 2L, "u1" -> 3L))
    val bounded = G.V(g, col("oid") === "u0").pathExpand(2, 2)
      .auxilia().values("oid").collect().map(_.getString(0)).toSet
    assert(bounded == Set("t0"))
  }

  test("shortestPathExpand includes the start at hop 0") {
    val hops = G.V(g, col("oid") === "t0").shortestPathExpand(10)
      .auxilia().df.select(col("oid"), col("__hops"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hops == Map("t0" -> 0L, "u1" -> 1L, "a0" -> 2L, "a1" -> 3L))
  }

  test("in / both expansions") {
    val preds = G.V(g, col("oid") === "t0").in().auxilia()
      .values("oid").collect().map(_.getString(0)).toSet
    assert(preds == Set("a0", "a1"))
    val around = G.V(g, col("oid") === "a1").both().dedup()
      .auxilia().values("oid").collect().map(_.getString(0)).toSet
    assert(around == Set("u0", "a0", "t0"))
  }

  test("outE + segmentTopK (SegmentApply): top-1 out-edge per source") {
    // all weights 1.0 → tie-break by dst id asc; ids: u0=0,u1=1,a0=2,a1=3,t0=4
    val top1 = G.V(g).outE()
      .segmentTopK("__src", 1, col("__w").desc, col("__v").asc)
      .df.select(col("__src"), col("__v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1 == Map(0L -> 2L, 1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L))
  }

  test("dedup + topK") {
    val top = G.V(g).out().auxilia().groupCount("oid")
      .orderBy(col("n").desc, col("oid").asc).limit(2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("a0", 2L), ("a1", 2L)))
  }
}
