package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.engine.{Engine, IterationMetrics}
import graft.engine.Engine.MetricsLog
import graft.graph.LinkGraph

/** Single-source shortest paths, semantics of the reference's
  * `grape::SSSP` / `gs::SSSPProjected` (`benchmarks/apps/sssp/sssp.h`,
  * `apps/projected/sssp_projected.h`): directed relaxation over the edge
  * weight property, frontier-driven (only vertices whose distance improved
  * re-relax), until no distance changes. Unreachable vertices report null.
  *
  * Spark shape mirrors WCC: frontier join on src (co-partitioned, no
  * exchange) → `min(dist + w)` per dst (partial agg) → fused materialize +
  * changed-count action.
  */
object SSSP {

  /** Returns (id: Long, dist: Double nullable). */
  def run(
      g: LinkGraph,
      sourceOid: String,
      log: MetricsLog = new MetricsLog
  ): DataFrame = {
    val e = g.edges.toDF.select(col("src"), col("dst"), col("weight"))
      .repartition(col("src"))
      .localCheckpoint(true)
    val eCount = e.count()

    val state0 = g.vertices.toDF
      .select(col("id"), when(col("oid") === sourceOid, 0.0).otherwise(lit(null)).as("dist"))
      .repartition(col("id"))

    var state = Engine.materialize(state0)
    var frontier = state.where(col("dist").isNotNull)
    var changed = 1L
    var iter = 0
    while (changed > 0) {
      val t0 = System.nanoTime()
      val msgs = e
        .join(frontier.select(col("id").as("src"), col("dist").as("sd")).hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("sd") + col("weight")).as("nd"))
      val next = state
        .join(msgs.hint("shuffle_hash"), Seq("id"), "left")
        .select(
          col("id"),
          when(col("nd").isNotNull && (col("dist").isNull || col("nd") < col("dist")), col("nd"))
            .otherwise(col("dist")).as("dist"),
          (col("nd").isNotNull && (col("dist").isNull || col("nd") < col("dist"))).as("changed"))
      val nextM = Engine.materialize(next)
      changed = {
        val r = nextM.agg(sum(when(col("changed"), 1L))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      frontier = nextM.where(col("changed")).select(col("id"), col("dist"))
      state = nextM.select(col("id"), col("dist"))
      log.record(IterationMetrics(iter, (System.nanoTime() - t0) / 1e9, changed.toDouble, eCount))
      iter += 1
    }
    state
  }

  /** Batched multi-source SSSP: ALL sources relax simultaneously with
    * state keyed by (source s, vertex id) — the same batching shape as
    * [[Betweenness]] — instead of a driver loop of single-source runs.
    * State is *sparse* (only reached pairs exist), so the frontier join
    * and the improve-merge are ordinary keyed join-aggregates; one
    * message exchange per superstep. Returns (s, id, dist) for reached
    * pairs; `reversed=true` relaxes over flipped edges (closeness).
    */
  def multiSource(g: LinkGraph, sourceOids: Seq[String], reversed: Boolean = false): DataFrame =
    multiSource(g,
      g.vertices.toDF.where(col("oid").isin(sourceOids: _*)).select(col("id").as("s")),
      reversed, new MetricsLog)

  /** Source-frame form (one `s` column of vertex ids) — the entry point
    * for large source sets (all-sources closeness caps by degree rather
    * than naming oids). `log` records per-superstep wall/frontier/edge
    * metrics for the bench report.
    */
  def multiSource(
      g: LinkGraph, sources: DataFrame, reversed: Boolean, log: MetricsLog
  ): DataFrame = {
    val spark = g.vertices.sparkSession
    Engine.withoutAQE(spark) {
      val e0 = g.edges.toDF
      val e = (if (reversed)
        e0.select(col("dst").as("src"), col("src").as("dst"), col("weight"))
      else e0.select(col("src"), col("dst"), col("weight")))
        .repartition(col("src"))
        .localCheckpoint(true)
      val eCount = e.count()
      var state = Engine.materialize(
        sources.select(col("s"), col("s").as("id"), lit(0.0).as("dist")))
      var frontier = state
      var changed = 1L
      var iter = 0
      while (changed > 0) {
        val t0 = System.nanoTime()
        val msgs = e
          .join(frontier.select(col("s"), col("id").as("src"), col("dist").as("sd"))
            .hint("shuffle_hash"), "src")
          .groupBy(col("s"), col("dst").as("id"))
          .agg(min(col("sd") + col("weight")).as("nd"))
        val upd = Engine.materialize(
          msgs.join(state.withColumnRenamed("dist", "old").hint("shuffle_hash"),
            Seq("s", "id"), "left")
            .where(col("old").isNull || col("nd") < col("old"))
            .select(col("s"), col("id"), col("nd").as("dist")))
        changed = upd.count()
        if (changed > 0) {
          state = Engine.materialize(
            state.join(upd.select(col("s"), col("id")), Seq("s", "id"), "left_anti")
              .unionByName(upd))
          state.count()
          frontier = upd
        }
        log.record(IterationMetrics(iter, (System.nanoTime() - t0) / 1e9, changed.toDouble, eCount))
        iter += 1
      }
      state
    }
  }
}

/** NetworkX-style BFS outputs (reference `gs::BFSGeneric`,
  * `apps/bfs/bfs_generic.h`): the BFS tree (shortest-path parent
  * pointers with a deterministic min-id tie-break), and the full
  * predecessor/successor relations of the BFS DAG. All derived from the
  * level table with one edge join each — no extra fixpoint.
  */
object BFSGeneric {

  /** (id, level, parent) for reachable vertices; parent = smallest-id
    * predecessor on a shortest path, null for the source.
    */
  def tree(g: LinkGraph, sourceOid: String): DataFrame = {
    val lvl = BFS.run(g, sourceOid).where(col("level").isNotNull)
      .localCheckpoint(true)
    val parents = dagEdges(g, lvl)
      .groupBy(col("dst").as("id")).agg(min(col("src")).as("parent"))
    lvl.join(parents, Seq("id"), "left").select(col("id"), col("level"), col("parent"))
  }

  /** All (id, pred) pairs of the BFS DAG (every shortest-path
    * predecessor, not just the tree parent).
    */
  def predecessors(g: LinkGraph, sourceOid: String): DataFrame = {
    val lvl = BFS.run(g, sourceOid).where(col("level").isNotNull)
    dagEdges(g, lvl).select(col("dst").as("id"), col("src").as("pred"))
  }

  /** All (id, succ) pairs of the BFS DAG. */
  def successors(g: LinkGraph, sourceOid: String): DataFrame = {
    val lvl = BFS.run(g, sourceOid).where(col("level").isNotNull)
    dagEdges(g, lvl).select(col("src").as("id"), col("dst").as("succ"))
  }

  /** Edges u→v of the BFS DAG: level(u) = level(v) − 1. */
  private def dagEdges(g: LinkGraph, lvl: DataFrame): DataFrame =
    g.edges.toDF.select(col("src"), col("dst"))
      .join(lvl.select(col("id").as("src"), col("level").as("sl")), "src")
      .join(lvl.select(col("id").as("dst"), col("level").as("dl")), "dst")
      .where(col("sl") === col("dl") - 1)
}

/** BFS levels from a source over out-edges, semantics of `grape::BFS`
  * (`benchmarks/apps/bfs/bfs.h`): level(source)=0, unvisited = null;
  * frontier expansion, first visit wins.
  */
object BFS {

  def run(g: LinkGraph, sourceOid: String): DataFrame = {
    val spark = g.vertices.sparkSession
    val e = g.edges.toDF.select(col("src"), col("dst"))
      .repartition(col("src"))
      .localCheckpoint(true)
    e.count()

    val state0 = g.vertices.toDF
      .select(col("id"), when(col("oid") === sourceOid, 0L).otherwise(lit(null)).as("level"))
      .repartition(col("id"))

    var state = Engine.materialize(state0)
    var frontier = state.where(col("level").isNotNull)
    var level = 0L
    var advanced = 1L
    while (advanced > 0) {
      val nextLevel = level + 1L
      // iteration-varying scalar via broadcast 1-row frame (identical
      // codegen every superstep; see Engine.scalar)
      val nl = broadcast(Engine.scalarLong(spark, "__nl", nextLevel))
      val msgs = e
        .join(frontier.select(col("id").as("src")).hint("shuffle_hash"), "src")
        .select(col("dst").as("id")).distinct()
      val next = state
        .join(msgs.withColumn("__hit", lit(true)).hint("shuffle_hash"), Seq("id"), "left")
        .crossJoin(nl)
        .select(
          col("id"),
          when(col("level").isNull && col("__hit"), col("__nl")).otherwise(col("level")).as("level"),
          (col("level").isNull && col("__hit").isNotNull && col("__hit")).as("changed"))
      val nextM = Engine.materialize(next)
      advanced = {
        val r = nextM.agg(sum(when(col("changed"), 1L))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      frontier = nextM.where(col("changed")).select(col("id"))
      state = nextM.select(col("id"), col("level"))
      level = nextLevel
    }
    state
  }
}
