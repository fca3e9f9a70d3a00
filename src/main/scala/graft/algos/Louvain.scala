package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.engine.Engine
import graft.graph.LinkGraph

/** Louvain-style modularity community detection (reference
  * `gs::LouvainAppBase`, `apps/pregel/louvain/louvain_app_base.h:43`,
  * Pregel-style with Sum aggregators `:81-120`): the synchronous
  * first-phase sweep — every vertex simultaneously evaluates moving to
  * each neighbor community and takes the move with the best modularity
  * gain (ties to the smallest community id), repeated until no vertex
  * moves or `maxRounds`.
  *
  * Spark shape: per round, two join-aggregates — (vertex, neighbor
  * community) weight sums and per-community weighted-degree totals — and
  * a deterministic struct-max argmax; all partial-aggregated (hub-safe).
  * Synchronous sweeps can oscillate on symmetric graphs, hence the
  * round cap + no-move termination (same trade the reference's
  * Pregel-style Louvain makes).
  */
object Louvain {

  /** Returns (id, community). */
  def run(g: LinkGraph, maxRounds: Int = 10, resolution: Double = 1.0): DataFrame = {
    val spark = g.vertices.sparkSession
    Engine.withoutAQE(spark) {
      // symmetric weighted adjacency (each undirected edge in both
      // directions; weights of the two directions merged)
      val und = g.edges.toDF.where(col("src") =!= col("dst"))
        .select(col("src"), col("dst"), col("weight"))
        .unionAll(g.edges.toDF.where(col("src") =!= col("dst"))
          .select(col("dst").as("src"), col("src").as("dst"), col("weight")))
        .groupBy(col("src"), col("dst")).agg(sum(col("weight")).as("w"))
        .repartition(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val m2 = und.agg(sum(col("w"))).head() match {
        case r if r.isNullAt(0) => 1.0
        case r => r.getDouble(0)
      }
      val deg = und.groupBy(col("src").as("id")).agg(sum(col("w")).as("kdeg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      deg.count()

      var comm = Engine.materialize(
        g.vertices.toDF.select(col("id"), col("id").as("community")).repartition(col("id")))
      var round = 0
      var moved = 1L
      while (round < maxRounds && moved > 0) {
        val commTot = comm.join(deg, Seq("id"), "left")
          .groupBy(col("community"))
          .agg(sum(coalesce(col("kdeg"), lit(0.0))).as("tot"))
        // weight from each vertex to each neighbor community
        val wvc = und
          .join(comm.select(col("id").as("dst"), col("community").as("c")).hint("shuffle_hash"), "dst")
          .groupBy(col("src").as("id"), col("c"))
          .agg(sum(col("w")).as("wvc"))
        val cand = wvc
          .join(deg, Seq("id"))
          .join(comm, Seq("id")) // current community
          .join(commTot.withColumnRenamed("community", "c"), Seq("c"))
          .select(col("id"), col("c"), col("community"),
            (col("wvc") - lit(resolution) * col("kdeg") *
              (col("tot") - when(col("c") === col("community"), col("kdeg")).otherwise(0.0)) / m2)
              .as("gain"))
        val best = cand
          .groupBy(col("id"))
          .agg(max(struct(col("gain"), (-col("c")).as("negc"), col("c").as("cc"))).as("m"),
            max(when(col("c") === col("community"), col("gain"))).as("stay"),
            first(col("community")).as("cur"))
          .select(col("id"),
            when(col("m.gain") > coalesce(col("stay"), lit(0.0)) + lit(1e-12), col("m.cc"))
              .otherwise(col("cur")).as("newc"),
            col("cur"))
        val next = comm
          .join(best.hint("shuffle_hash"), Seq("id"), "left")
          .select(col("id"), coalesce(col("newc"), col("community")).as("community"),
            (col("newc").isNotNull && col("newc") =!= col("community")).as("changed"))
        val nextM = Engine.materialize(next)
        moved = {
          val r = nextM.agg(sum(when(col("changed"), 1L))).head()
          if (r.isNullAt(0)) 0L else r.getLong(0)
        }
        comm = nextM.select(col("id"), col("community"))
        round += 1
      }
      und.unpersist(); deg.unpersist()
      comm
    }
  }

  /** Modularity of a community assignment. */
  def modularity(g: LinkGraph, comm: DataFrame, resolution: Double = 1.0): Double = {
    val und = g.edges.toDF.where(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), col("weight"))
      .unionAll(g.edges.toDF.where(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst"), col("weight")))
      .groupBy(col("src"), col("dst")).agg(sum(col("weight")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m2 = und.agg(sum(col("w"))).head().getDouble(0)
    val in = und
      .join(comm.select(col("id").as("src"), col("community").as("cs")), "src")
      .join(comm.select(col("id").as("dst"), col("community").as("cd")), "dst")
      .where(col("cs") === col("cd"))
      .agg(sum(col("w"))).head() match {
      case r if r.isNullAt(0) => 0.0
      case r => r.getDouble(0)
    }
    val deg = und.groupBy(col("src").as("id")).agg(sum(col("w")).as("kdeg"))
    val totSq = comm.join(deg, Seq("id"), "left")
      .groupBy(col("community")).agg(sum(coalesce(col("kdeg"), lit(0.0))).as("tot"))
      .agg(sum((col("tot") / m2) * (col("tot") / m2))).head().getDouble(0)
    und.unpersist()
    in / m2 - resolution * totSq
  }
}
