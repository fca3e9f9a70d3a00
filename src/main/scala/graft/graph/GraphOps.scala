package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ingest.SnapshotStore
import graft.schema.{Edge, Vertex}

/** Session-plane graph management operators (SURVEY.md §2.A, reference
  * `OperationType` in `proto/graphscope/proto/types.proto:77-137`,
  * dispatch `core/grape_instance.cc:1096-1293`), expressed as library
  * functions over [[LinkGraph]].
  */
object GraphOps {

  /** REPORT_GRAPH (`core/fragment/fragment_reporter.h:56-116`): node /
    * edge / self-loop counts.
    */
  def report(g: LinkGraph): DataFrame = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val nodes = g.vertices.count()
    val edges = g.edges.count()
    val selfLoops = g.edges.toDF.where(col("src") === col("dst")).count()
    Seq((nodes, edges, selfLoops)).toDF("nodes", "edges", "self_loops")
  }

  /** Out-neighbors of a vertex by oid (reporter `neighbors`). */
  def neighbors(g: LinkGraph, oid: String): DataFrame =
    g.edges.toDF
      .join(g.vertices.toDF.where(col("oid") === oid).select(col("id").as("src")), "src")
      .join(g.vertices.toDF.select(col("id").as("dst"), col("oid").as("nbr_oid")), "dst")
      .select(col("nbr_oid"), col("weight"))

  /** ADD_COLUMN (`dag_utils.py:912`, `grape_instance.cc:731,1274`): join
    * an algorithm result (id, value…) back onto the vertex table as new
    * properties.
    */
  def addColumn(g: LinkGraph, result: DataFrame): DataFrame =
    g.vertices.toDF.join(result, Seq("id"), "left")

  /** TO_DIRECTED of an undirected view is identity for our directed base;
    * TO_UNDIRECTED lives in [[GraphBuilder.toUndirected]]. MODIFY_EDGES
    * add/delete (`dag_utils.py:317`): apply a batch and commit the result
    * as a new snapshot version (groot's snapshot-per-write-group model,
    * `docs/persistent_graph_store.rst:9`).
    */
  def modifyEdges(
      g: LinkGraph,
      add: Dataset[Edge],
      delete: Dataset[Edge],
      store: SnapshotStore,
      table: String
  ): (LinkGraph, Int) = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val afterDelete = g.edges.toDF
      .join(delete.toDF.select(col("src"), col("dst")), Seq("src", "dst"), "left_anti")
    val merged = afterDelete
      .unionAll(add.toDF)
      .groupBy(col("src"), col("dst")).agg(sum(col("weight")).as("weight"))
      .as[Edge]
    val version = store.write(table, merged.toDF,
      Map("op" -> 1.0, "added" -> add.count().toDouble, "deleted" -> delete.count().toDouble))
    (LinkGraph(g.vertices, store.read(spark, table, version).as[Edge]), version)
  }

  /** MODIFY_VERTICES add/delete (`dag_utils.py:289`,
    * `grape_instance.cc:1143`): apply a vertex batch and commit both
    * planes as new snapshot versions. Deleting a vertex prunes its
    * incident edges (induced-subgraph delete semantics); re-adding an
    * existing id REPLACES its oid with the add-batch's (the batch is the
    * newer write — ids are the identity, oid the property); duplicate
    * ids within one add batch resolve to the max oid (deterministic).
    * The merge asserts the oid↔id bijection other components (dense
    * relabeling, oid joins) assume — an oid rename that collides with a
    * surviving vertex fails the commit instead of silently corrupting it.
    */
  def modifyVertices(
      g: LinkGraph,
      add: Dataset[Vertex],
      delete: Dataset[Vertex],
      store: SnapshotStore,
      vertexTable: String,
      edgeTable: String
  ): (LinkGraph, Int, Int) = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val delIds = delete.toDF.select(col("id"))
    val addVs = add.toDF.groupBy(col("id")).agg(max(col("oid")).as("oid"))
    val mergedVs = g.vertices.toDF.join(delIds, Seq("id"), "left_anti")
      .join(addVs.select(col("id")), Seq("id"), "left_anti") // add-batch oid wins
      .unionAll(addVs)
    val dupOids = mergedVs.groupBy(col("oid")).agg(count(lit(1)).as("n"))
      .where(col("n") > 1).count()
    require(dupOids == 0,
      s"modifyVertices would break the oid<->id bijection: $dupOids duplicate oid(s)")
    val prunedEs = g.edges.toDF
      .join(delIds.select(col("id").as("src")), Seq("src"), "left_anti")
      .join(delIds.select(col("id").as("dst")), Seq("dst"), "left_anti")
      .select(col("src"), col("dst"), col("weight"))
    val nAdd = add.count().toDouble
    val nDel = delete.count().toDouble
    val vv = store.write(vertexTable, mergedVs,
      Map("op" -> 3.0, "added" -> nAdd, "deleted" -> nDel))
    val ev = store.write(edgeTable, prunedEs, Map("op" -> 3.0, "deleted" -> nDel))
    (LinkGraph(
      store.read(spark, vertexTable, vv).as[Vertex],
      store.read(spark, edgeTable, ev).as[Edge]), vv, ev)
  }

  /** CLEAR_EDGES (`dag_utils.py:676`): commit an empty edge snapshot. */
  def clearEdges(g: LinkGraph, store: SnapshotStore, table: String): (LinkGraph, Int) = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val empty = spark.emptyDataset[Edge]
    val version = store.write(table, empty.toDF, Map("op" -> 2.0))
    (LinkGraph(g.vertices, empty), version)
  }

  /** VIEW/COPY via projection (PROJECT_GRAPH, `dag_utils.py:417`):
    * filter edges by predicate into a new simple view.
    */
  def projectEdges(g: LinkGraph, predicate: org.apache.spark.sql.Column): LinkGraph = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    LinkGraph(g.vertices, g.edges.toDF.where(predicate).as[Edge])
  }
}
