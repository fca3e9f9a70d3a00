package graft.engine

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

import graft.ingest.SnapshotStore

/** One superstep's bookkeeping: wall seconds, convergence delta, edges
  * processed (for the BASELINE.json throughput metric edges/sec per
  * superstep), plus algorithm-specific scalars.
  */
final case class IterationMetrics(
    iter: Int,
    seconds: Double,
    delta: Double,
    edgesProcessed: Long,
    extra: Map[String, Double] = Map.empty
) {
  def edgesPerSec: Double = if (seconds > 0) edgesProcessed / seconds else 0.0
}

/** Optional per-iteration durable checkpointing of algorithm state into a
  * [[SnapshotStore]] table — the north rule's "per-iteration state
  * checkpointed to snapshots … for exact resume". `every = 0` disables
  * durable snapshots (state still materializes in memory each superstep).
  */
final case class CheckpointConfig(store: SnapshotStore, table: String, every: Int = 1)

/** Driver-side helpers for the BSP-style fixpoint loops (Catalyst has no
  * iterative operator; this mirrors the reference's worker loop
  * `core/worker/default_worker.h:87-130`: PEval once, IncEval until no
  * change). Key mechanics:
  *
  *  - `materialize` eagerly evaluates each superstep's state and
  *    truncates lineage via `localCheckpoint` — without it the logical
  *    plan grows linearly with iterations and analysis/planning time
  *    dominates (SURVEY.md §7.3).
  *  - per-iteration driver work is O(1) (scalar aggregates only), keeping
  *    the job shuffle-bound so parallelism scaling stays near-linear.
  */
object Engine {

  /** Mark a superstep's state for materialization + lineage truncation.
    * Lazy (`localCheckpoint(false)`): the caller's next action — typically
    * the fused convergence aggregate — computes the state, caches it, and
    * truncates lineage in a single job, so each superstep costs exactly
    * one Spark job instead of checkpoint-then-aggregate.
    */
  def materialize(df: DataFrame): DataFrame = df.localCheckpoint(false)

  /** Pin a loop-invariant frame (edge/degree/neighbor tables a fixpoint
    * loop reads every round) as an EAGER private checkpoint instead of
    * `persist()`. Learned from the concurrent Verify driver (round 5):
    * `persist()` entries live in the session-global CacheManager keyed
    * by CANONICAL PLAN, so two concurrently-running queries that derive
    * the same frame from the shared graph (tg_pagerank vs the Gremlin
    * pageRank step; tg_ppr vs tg_ppr_sparse) SHARE one entry — the
    * first to finish unpersists it out from under the survivor's loop
    * (measured: four co-scheduled fixpoints took 812 s vs ~90 s
    * standalone, each round recomputing its "cached" edges from
    * source; one such race also over-peeled a kcore run to a wrong
    * 2736-row core). A checkpoint is a private, content-immutable RDD:
    * no cross-thread uncache can drop or swap it mid-loop, so the frame
    * a loop counted is bit-identical to the frame its joins read.
    * Partitioning survives (the LogicalRDD keeps outputPartitioning),
    * so co-partitioned superstep joins still plan zero input exchanges.
    * No unpersist needed — blocks are freed by the ContextCleaner once
    * the frame is unreferenced.
    */
  def pin(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** [[materialize]] + stats reset, for superstep states the next
    * round's plan references MORE THAN ONCE (e.g. Louvain's community
    * frame rides four joins per sweep round). `localCheckpoint` seeds
    * the new LogicalRDD's sizeInBytes from the child plan's stats, and
    * Catalyst's join-stats visitor multiplies children — so a state with
    * k self-references compounds sizeInBytes bits by k× PER ROUND.
    * Exponential bit growth turns the driver's stats BigInt arithmetic
    * into the bottleneck (measured: a 30-round Louvain sweep wedged the
    * driver for 20+ min in BigInteger.multiply around round ~25; states
    * with one self-reference, like PageRank's, grow linearly and never
    * hit this). Rebuilding the frame over the checkpointed RDD resets
    * propagated stats to the session default each round. Join planning
    * is unaffected — superstep joins are explicitly hinted — and the
    * Row round-trip cost is bounded by the state's |V| rows.
    */
  def materializeReset(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(false)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Run `f` with AQE disabled, restoring the previous setting after.
    *
    * The superstep plans are statically shaped — co-partitioned hinted
    * joins, shuffle partitions pinned to the core count — so AQE has
    * nothing to improve and its per-query-stage materialize/re-optimize
    * barriers add ~0.1s of driver-serial latency per stage, which is pure
    * loss repeated every superstep. AQE stays on for the derivation and
    * the relational plane, where join-strategy/skew adaptivity does pay.
    *
    * `-Dgraft.aqe.freeze=true` turns the toggle into a no-op (AQE stays
    * wherever the session left it). The concurrent Verify driver sets it:
    * the session conf is SHARED across threads, so racing save/restore
    * pairs from parallel queries would flip AQE at arbitrary points in
    * other queries' planning — and a session whose graph cache
    * materializes under AQE-off loses cached-plan substitution for the
    * persist-chained fixed-round PageRank states (measured: every
    * superstep re-derived the graph from the synth source; 19.5 s →
    * 6+ min for tg_pagerank at sf0.01). At verify scale the forgone
    * AQE-off saving is ~0.1 s per superstep — noise.
    */
  def withoutAQE[A](spark: org.apache.spark.sql.SparkSession)(f: => A): A = {
    if (sys.props.get("graft.aqe.freeze").contains("true")) return f
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try f
    finally spark.conf.set(key, old)
  }

  /** A per-iteration scalar as a broadcast 1-row DataFrame column.
    *
    * Embedding an iteration-dependent value with `lit(x)` changes the
    * generated whole-stage code every superstep, forcing a fresh Janino
    * compile (~0.5-1s, driver-serial) per iteration — it flattens
    * multi-core scaling completely. Routing the value through a
    * LocalRelation keeps the plan (and the codegen cache key) identical
    * across iterations; only the row data changes.
    */
  def scalar(spark: org.apache.spark.sql.SparkSession, name: String, value: Double): DataFrame = {
    import spark.implicits._
    Seq(value).toDF(name)
  }

  def scalarLong(spark: org.apache.spark.sql.SparkSession, name: String, value: Long): DataFrame = {
    import spark.implicits._
    Seq(value).toDF(name)
  }

  /** Collects per-iteration metrics for the bench report. */
  final class MetricsLog {
    private val buf = ArrayBuffer.empty[IterationMetrics]
    def record(m: IterationMetrics): Unit = buf += m
    def all: Seq[IterationMetrics] = buf.toSeq
    def iterations: Int = buf.size
    def totalSeconds: Double = buf.map(_.seconds).sum
    def totalEdges: Long = buf.map(_.edgesProcessed).sum
    /** Mean of per-superstep edges/sec (the BASELINE metric). */
    def edgesPerSecPerSuperstep: Double =
      if (buf.isEmpty) 0.0 else buf.map(_.edgesPerSec).sum / buf.size
  }
}
