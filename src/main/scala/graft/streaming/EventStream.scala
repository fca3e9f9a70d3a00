package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.{GraphBuilder, LinkGraph}
import graft.ingest.SnapshotStore
import graft.schema.Edge

/** Streaming/incremental surface.
  *
  * The reference has no streaming dataflow — its "realtime" story is
  * groot's snapshot-ID-versioned batch-atomic writes
  * (`docs/persistent_graph_store.rst:9,310-350`) — so this module offers
  * both shapes:
  *
  *  - [[windowedEventCounts]]: a Structured Streaming windowed
  *    aggregation over the events stream (watermark + tumbling window),
  *    the standard Spark-native continuous-ingest operator;
  *  - [[appendConversations]]: groot-style incremental maintenance —
  *    append a batch of *whole conversations*, derive their edges, merge
  *    the weighted edge counts with the current snapshot and commit a new
  *    version (append granularity is whole conversations because reply
  *    edges are windows within a conversation; cross-batch conversations
  *    would need per-conv tail state).
  */
object EventStream {

  /** Tumbling-window counts per event type with a watermark; works for
    * both batch and streaming DataFrames (same plan — run it off
    * `readStream` for continuous mode).
    */
  def windowedEventCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"
  ): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp")) // parquet NTZ → event time
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("total"))

  /** Merge newly-derived oid-space edges into the latest committed edge
    * snapshot; returns (merged edges in oid space, committed version).
    */
  def appendConversations(
      spark: SparkSession,
      store: SnapshotStore,
      table: String,
      newTurns: DataFrame
  ): (DataFrame, Int) = {
    val newEdges = GraphBuilder.oidEdges(newTurns)
    val current = store.latestVersion(table)
      .map(v => store.read(spark, table, v))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], newEdges.schema))
    val merged = current.unionByName(newEdges)
      .groupBy(col("src_oid"), col("dst_oid"))
      .agg(sum(col("weight")).as("weight"))
    val version = store.write(table, merged,
      Map("appended_rows" -> newTurns.count().toDouble))
    (store.read(spark, table, version), version)
  }

  /** Rebuild the dense-id LinkGraph from a committed oid-edge snapshot
    * (incremental append + re-run, SURVEY.md §1.4).
    */
  def graphFromSnapshot(spark: SparkSession, store: SnapshotStore, table: String): LinkGraph = {
    import spark.implicits._
    val oe = store.readLatest(spark, table).map(_._2)
      .getOrElse(throw new IllegalStateException(s"no snapshot for $table"))
    val vs = graft.graph.Ids.denseRank(
      oe.select(col("src_oid").as("oid"))
        .unionAll(oe.select(col("dst_oid").as("oid"))), "oid")
      .select(col("id"), col("oid")).as[graft.schema.Vertex]
    val vsDf = vs.toDF
    val es = oe
      .join(vsDf.select(col("id").as("src"), col("oid").as("src_oid")), "src_oid")
      .join(vsDf.select(col("id").as("dst"), col("oid").as("dst_oid")), "dst_oid")
      .select(col("src"), col("dst"), col("weight")).as[Edge]
    LinkGraph(vs, es)
  }
}
