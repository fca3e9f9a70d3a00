package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.algos.Paths2
import graft.graph.{GraphBuilder, GraphOps}
import graft.ingest.SnapshotStore

/** Session-plane ops + path-derived algorithms. */
class OpsPathsSpec extends SparkSpec {

  // 0→1→2→3, 0→3 heavy shortcut, 4 isolated-ish
  private lazy val g = {
    val s = spark
    import s.implicits._
    val vs = (0 until 5).map(i => graft.schema.Vertex(i.toLong, f"v$i%06d")).toDS()
    val es = Seq(
      graft.schema.Edge(0, 1, 1.0), graft.schema.Edge(1, 2, 1.0),
      graft.schema.Edge(2, 3, 1.0), graft.schema.Edge(0, 3, 10.0)).toDS()
    graft.graph.LinkGraph(vs, es)
  }

  test("report + neighbors") {
    val r = GraphOps.report(g).head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 4 && r.getLong(2) == 0)
    val nb = GraphOps.neighbors(g, "v000000").collect().map(_.getString(0)).toSet
    assert(nb == Set("v000001", "v000003"))
  }

  test("addColumn joins results onto vertices") {
    val s = spark
    import s.implicits._
    val res = Seq((0L, 0.5), (1L, 0.3)).toDF("id", "score")
    val out = GraphOps.addColumn(g, res)
    assert(out.count() == 5)
    assert(out.where(col("oid") === "v000000").head().getAs[Double]("score") == 0.5)
    assert(out.where(col("oid") === "v000004").head().isNullAt(2) ||
      out.where(col("oid") === "v000004").head().getAs[Any]("score") == null)
  }

  test("modifyEdges commits snapshot versions and applies add/delete") {
    val s = spark
    import s.implicits._
    val store = new SnapshotStore(Files.createTempDirectory("graft-ops").toString)
    val add = Seq(graft.schema.Edge(3, 4, 2.0)).toDS()
    val del = Seq(graft.schema.Edge(0, 3, 10.0)).toDS()
    val (g2, v1) = GraphOps.modifyEdges(g, add, del, store, "edges")
    assert(v1 == 0)
    val es = g2.edges.collect().map(e => (e.src, e.dst)).toSet
    assert(es.contains((3L, 4L)) && !es.contains((0L, 3L)))
    val (g3, v2) = GraphOps.clearEdges(g2, store, "edges")
    assert(v2 == 1 && g3.edges.count() == 0)
    // history remains readable (snapshot isolation)
    assert(store.read(spark, "edges", 0).count() == 4)
  }

  test("modifyVertices commits both planes; delete prunes incident edges") {
    val s = spark
    import s.implicits._
    val store = new SnapshotStore(Files.createTempDirectory("graft-ops-v").toString)
    val add = Seq(graft.schema.Vertex(5L, "v000005")).toDS()
    val del = Seq(graft.schema.Vertex(3L, "v000003")).toDS()
    val (g2, vv, ev) = GraphOps.modifyVertices(g, add, del, store, "vertices", "edges")
    assert(vv == 0 && ev == 0)
    val oids = g2.vertices.collect().map(_.oid).toSet
    assert(oids.contains("v000005") && !oids.contains("v000003"))
    // incident edges of the deleted vertex are pruned (2→3 and 0→3)
    val es = g2.edges.collect().map(e => (e.src, e.dst)).toSet
    assert(es == Set((0L, 1L), (1L, 2L)))
    // idempotent re-add of an existing id keeps one row
    val (g3, _, _) = GraphOps.modifyVertices(
      g2, Seq(graft.schema.Vertex(5L, "v000005")).toDS(),
      s.emptyDataset[graft.schema.Vertex], store, "vertices", "edges")
    assert(g3.vertices.where(col("id") === 5L).count() == 1)
    // history remains readable (snapshot isolation)
    assert(store.read(spark, "vertices", 0).count() == 5)
  }

  test("sssp parents + path extraction") {
    val wp = Paths2.withParents(g, "v000000").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(wp(3L).contains(2L)) // cheap path wins over heavy shortcut
    val p = Paths2.pathTo(g, "v000000", "v000003")
    assert(p.contains(Seq("v000000", "v000001", "v000002", "v000003")))
    assert(Paths2.pathTo(g, "v000000", "v000004").isEmpty)
  }

  test("hasPath + averageLength + closeness") {
    assert(Paths2.hasPath(g, "v000000", "v000003"))
    assert(!Paths2.hasPath(g, "v000003", "v000000"))
    assert(Paths2.averageLength(g, 5) > 0.0)
    val c = Paths2.closeness(g, Seq("v000003", "v000004")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // v3 is reachable from 0,1,2 → positive closeness; v4 from nobody
    assert(c("v000003") > 0.0 && c("v000004") == 0.0)
    // harmonic (nx: Σ 1/d over incoming distances, no normalization):
    // d(·→v3) = {v2: 1, v1: 2, v0: min(10, 3) = 3} → 1 + 1/2 + 1/3
    val h = Paths2.harmonic(g, Seq("v000003", "v000004")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(h("v000003") == BigDecimal(1.0 + 0.5 + 1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"got $h")
    assert(h("v000004") == 0.0)
  }

  test("bfs_generic: tree, predecessors, successors") {
    // BFS from v0: levels 0,1,2,{1 via shortcut},unreached
    val tr = graft.algos.BFSGeneric.tree(g, "v000000").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(tr(0L) == ((0L, None)))
    assert(tr(1L) == ((1L, Some(0L))))
    assert(tr(2L) == ((2L, Some(1L))))
    assert(tr(3L) == ((1L, Some(0L)))) // shortcut edge is the 1-hop parent
    assert(!tr.contains(4L))
    val preds = graft.algos.BFSGeneric.predecessors(g, "v000000").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(preds == Set((1L, 0L), (3L, 0L), (2L, 1L)))
    val succs = graft.algos.BFSGeneric.successors(g, "v000000").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(succs == Set((0L, 1L), (0L, 3L), (1L, 2L)))
  }

  test("projectEdges filters by predicate") {
    val pg = GraphOps.projectEdges(g, col("weight") < 5.0)
    assert(pg.edges.count() == 3)
  }

  test("induceSubgraph keeps only edges with both endpoints in the set") {
    val s = spark
    import s.implicits._
    val keep = Seq(0L, 1L, 3L).toDF("id")
    val sub = GraphBuilder.induceSubgraph(g, keep)
    assert(sub.vertices.collect().map(_.id).toSet == Set(0L, 1L, 3L))
    // 0→1 survives, 0→3 survives; 1→2 and 2→3 drop (2 excluded)
    val es = sub.edges.collect().map(e => (e.src, e.dst)).toSet
    assert(es == Set((0L, 1L), (0L, 3L)))
  }

  test("toUndirected symmetrizes and merges weights") {
    val und = GraphBuilder.toUndirected(g.edges)
    val m = und.collect().map(e => (e.src, e.dst) -> e.weight).toMap
    assert(m((0L, 1L)) == 1.0 && m((1L, 0L)) == 1.0)
    assert(m((0L, 3L)) == 10.0 && m((3L, 0L)) == 10.0)
  }
}
