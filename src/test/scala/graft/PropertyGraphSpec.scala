package graft

import org.apache.spark.sql.functions._

import graft.graph.{GraphBuilder, PropertyGraph}
import graft.synth.Synth

/** Multi-label property graph: label partitioning, projection semantics,
  * and flatten ≡ single-label derivation.
  */
class PropertyGraphSpec extends SparkSpec {

  private lazy val turns = Synth.transcripts(spark, 0.001).toDF.cache()
  private lazy val pg = PropertyGraph.fromTranscripts(turns)

  test("vertex labels partition the oid universe") {
    val byLabel = pg.vertices.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet.subsetOf(Set("user", "assistant", "agent", "system", "tool")))
    assert(byLabel.values.sum == pg.vertices.count())
    // every tool oid is labeled tool, etc.
    assert(pg.vertices.where(col("oid").like("tool:%") && col("label") =!= "tool").count() == 0)
    assert(pg.vertices.where(col("oid").like("u%") && col("label") =!= "user").count() == 0)
  }

  test("flatten reproduces the single-label derivation exactly") {
    val flat = pg.flatten.edges.collect().map(e => (e.src, e.dst) -> e.weight).toMap
    val mono = GraphBuilder.fromTranscripts(turns).edges.collect()
      .map(e => (e.src, e.dst) -> e.weight).toMap
    assert(flat == mono)
  }

  test("invoke projection only links assistants to tools") {
    val g = pg.project(Seq("assistant", "tool"), Seq("invoke"))
    val vs = pg.vertices
    val bad = g.edges.toDF
      .join(vs.select(col("id").as("src"), col("label").as("sl")), "src")
      .join(vs.select(col("id").as("dst"), col("label").as("dl")), "dst")
      .where(col("sl") =!= "assistant" || col("dl") =!= "tool")
      .count()
    assert(bad == 0 && g.edges.count() > 0)
  }

  test("projection induces on the vertex-label selection") {
    // reply edges into tool vertices must vanish when tools are excluded
    val g = pg.project(Seq("user", "assistant", "agent", "system"), Seq("reply"))
    val toolIds = pg.vertices.where(col("label") === "tool").select(col("id"))
    assert(g.edges.toDF.join(toolIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi").count() == 0)
    assert(g.vertices.count() == pg.vertices.where(col("label") =!= "tool").count())
  }
}
