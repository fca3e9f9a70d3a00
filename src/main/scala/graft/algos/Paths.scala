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
      .persist(StorageLevel.MEMORY_AND_DISK)
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
    e.unpersist()
    state
  }
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
      .persist(StorageLevel.MEMORY_AND_DISK)
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
    e.unpersist()
    state
  }
}
