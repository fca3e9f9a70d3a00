package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit deterministic hub-vertex salting (north rule: "explicit
  * salting/splitting of hub-vertex skew").
  *
  * The engine's superstep kernels normally don't need this: their
  * message aggregations are Catalyst partial+final aggregates, so a hub
  * key's reducer input is already bounded at one partial row per map
  * task (audited in PLANS.md). Explicit salting is the tool for the
  * remaining shapes — aggregation buffers too wide to combine map-side
  * (collect_list/collect_set per hub), or a skewed *join* against a
  * per-key table where one reducer would receive a hub's entire
  * adjacency. Both shapes appear in the reference as mirror/split
  * vertices (`SendMsgThroughOEdges` to outer-vertex copies).
  *
  * Salt assignment is a deterministic hash of a caller-chosen column
  * (not `rand()`): re-execution of a stage after failure reproduces the
  * same placement, which the checkpoint/resume contract requires.
  */
object Skew {

  /** Deterministic salt in [0, nSalts) from `from`. */
  def salt(from: Column, nSalts: Int): Column =
    pmod(xxhash64(from), lit(nSalts.toLong))

  /** Two-phase salted sum of `valueCol` per `keyCol`: phase 1 aggregates
    * (key, salt) groups — a hub key fans out over `nSalts` reducers —
    * phase 2 merges the ≤ nSalts partials per key. Result is identical
    * to `df.groupBy(keyCol).sum(valueCol)` (addition reassociates; for
    * fp the usual shuffle-order caveat applies as it does unsalted).
    */
  def saltedSum(
      df: DataFrame, keyCol: String, valueCol: String,
      saltFrom: String, nSalts: Int = 32
  ): DataFrame =
    df.select(col(keyCol), col(valueCol), salt(col(saltFrom), nSalts).as("__salt"))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as(valueCol))

  /** Salted collect_list: per-key element lists whose map-side buffers
    * don't combine — the canonical case where partial aggregation can't
    * bound a hub (every element survives to the reducer). Phase 1
    * collects per (key, salt), phase 2 flattens the ≤ nSalts chunk
    * lists. Element order is canonicalized by sorting (collect_list
    * order is nondeterministic under shuffle anyway).
    */
  def saltedCollectSorted(
      df: DataFrame, keyCol: String, valueCol: String,
      saltFrom: String, nSalts: Int = 32
  ): DataFrame =
    df.select(col(keyCol), col(valueCol), salt(col(saltFrom), nSalts).as("__salt"))
      .groupBy(col(keyCol), col("__salt"))
      .agg(collect_list(col(valueCol)).as("__chunk"))
      .groupBy(col(keyCol))
      .agg(array_sort(flatten(collect_list(col("__chunk")))).as(valueCol))

  /** Two-phase salted per-key top-k — the hub-safe replacement for a
    * `row_number() OVER (PARTITION BY key ORDER BY ord)` window: phase 1
    * keeps at most k elements per (key, salt) group (a hub key's
    * adjacency reduces to ≤ nSalts·k survivors before any single
    * reducer sees it), phase 2 merges and re-truncates. `ord` must be a
    * TOTALLY ordering struct (include the payload as the final
    * tiebreak) or the result is nondeterministic. Returns
    * `(keyCols…, rank, payloadCol)` with rank 0-based in `ord` order.
    */
  def saltedTopK(
      df: DataFrame, keyCols: Seq[String], payloadCol: String, ord: Column,
      k: Int, saltFrom: String, nSalts: Int = 32
  ): DataFrame = {
    require(k > 0, "top-k needs k > 0")
    val kc = keyCols.map(col)
    val pairs = df.select(
      kc :+ struct(ord.as("o"), col(payloadCol).as("p")).as("__op") :+
        salt(col(saltFrom), nSalts).as("__salt"): _*)
    val partial = pairs.groupBy(kc :+ col("__salt"): _*)
      .agg(slice(array_sort(collect_list(col("__op"))), 1, k).as("__top"))
    val merged = partial.groupBy(kc: _*)
      .agg(slice(array_sort(flatten(collect_list(col("__top")))), 1, k).as("__top"))
    merged.select(kc :+ posexplode(col("__top")): _*)
      .select(kc :+ col("pos").as("rank") :+ col("col.p").as(payloadCol): _*)
  }
}
