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

  /** Eagerly materialize a superstep's state and cut its lineage. The
    * previous state must stay available until the new one is computed, so
    * callers unpersist the old frame *after* this returns.
    */
  def materialize(df: DataFrame): DataFrame = df.localCheckpoint(true)

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
