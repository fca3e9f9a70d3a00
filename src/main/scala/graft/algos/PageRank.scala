package graft.algos

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.engine.{CheckpointConfig, Engine, IterationMetrics}
import graft.engine.Engine.MetricsLog
import graft.graph.LinkGraph

/** Damped PageRank with dangling-mass redistribution, semantics of the
  * reference's benchmark app (`analytical_engine/benchmarks/apps/pagerank/
  * pagerank.h:82-196`): init `rank = 1/N`; each round
  * `base = (1-d)/N + d*danglingSum/N`, `rank'(v) = base + d*Σ_{u→v}
  * rank(u)/outdeg(u)`; fixed `maxIter` rounds, or (NetworkX variant,
  * `apps/pagerank/pagerank_networkx.h:135-147`) stop when the L1 delta
  * `Σ|r - r_prev| < tol·N`.
  *
  * Spark shape (north rule "hash-partitioned sparse gather-scatter"):
  * the edge table is joined with out-degrees once, hash-partitioned by
  * `dst` and persisted; each superstep is one job — join current ranks on
  * `src` (broadcast-able: |V| ≪ |E| for the transcript graph), partial+
  * final `sum` per `dst` (map-side combine absorbs hub skew: a vertex with
  * 10^6 in-edges contributes one partial row per task, not 10^6 shuffle
  * rows), then a single fused scalar aggregate returns (L1 delta, next
  * dangling mass) — the reference's cross-worker `Sum()` reduce
  * (`pagerank.h:123-125`) — so per-iteration driver work is O(1).
  */
object PageRank {

  final case class Config(
      damping: Double = 0.85,
      maxIter: Int = 100,
      tol: Option[Double] = None
  )

  /** Returns (id: Long, rank: Double). */
  def run(
      g: LinkGraph,
      cfg: Config = Config(),
      log: MetricsLog = new MetricsLog,
      ckpt: Option[CheckpointConfig] = None
  ): DataFrame = {
    val n = g.numVertices
    require(n > 0, "empty graph")
    val d = cfg.damping

    val simpleEdges = g.edges.toDF.select(col("src"), col("dst")) // distinct by construction
    val outDeg = simpleEdges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = simpleEdges
      .join(outDeg, "src")
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCount = e.count()

    val state0 = g.vertices.toDF
      .join(outDeg.select(col("src").as("id")).withColumn("__has_out", lit(true)), Seq("id"), "left")
      .select(
        col("id"),
        lit(1.0 / n).as("rank"),
        col("__has_out").isNull.as("dangling"))

    // Resume from the latest durable snapshot if present (exact resume:
    // manifest metrics carry iter + dangling sum).
    val resumed = ckpt.flatMap { c =>
      c.store.latestVersion(c.table).map { v =>
        val m = c.store.readManifest(c.table, v)
        (c.store.read(g.vertices.sparkSession, c.table, v),
          m.metrics("iter").toInt + 1,
          m.metrics("dsum"))
      }
    }

    var state = Engine.materialize(resumed.map(_._1).getOrElse(state0))
    var iter = resumed.map(_._2).getOrElse(0)
    var dsum = resumed.map(_._3).getOrElse {
      val r = state.agg(sum(when(col("dangling"), col("rank")))).head()
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    }
    var delta = Double.MaxValue

    def converged: Boolean = cfg.tol.exists(t => delta < t * n)

    while (iter < cfg.maxIter && !converged) {
      val t0 = System.nanoTime()
      val contrib = e
        .join(state.select(col("id").as("src"), col("rank").as("srank")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("srank") / col("outdeg")).as("c"))
      val base = (1.0 - d) / n + d * dsum / n
      val next = state
        .select(col("id"), col("rank").as("prev"), col("dangling"))
        .join(contrib, Seq("id"), "left")
        .select(
          col("id"),
          (lit(base) + lit(d) * coalesce(col("c"), lit(0.0))).as("rank"),
          col("prev"),
          col("dangling"))
      val nextM = Engine.materialize(next)
      val row: Row = nextM.agg(
        sum(abs(col("rank") - col("prev"))),
        sum(when(col("dangling"), col("rank")))).head()
      delta = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
      dsum = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
      state = nextM.select(col("id"), col("rank"), col("dangling"))
      val secs = (System.nanoTime() - t0) / 1e9
      log.record(IterationMetrics(iter, secs, delta, edgeCount,
        Map("dsum" -> dsum)))
      ckpt.foreach { c =>
        if (c.every > 0 && iter % c.every == 0)
          c.store.write(c.table, state,
            Map("iter" -> iter.toDouble, "dsum" -> dsum, "delta" -> delta))
      }
      iter += 1
    }
    e.unpersist()
    state.select(col("id"), col("rank"))
  }
}
