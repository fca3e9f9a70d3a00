package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.LinkGraph

/** Clustering-coefficient family over the undirected simple closure,
  * semantics of the reference's `gs::Clustering`
  * (`apps/clustering/clustering.h`), `gs::AvgClustering`
  * (`avg_clustering.h`) and `gs::Transitivity` (`transitivity.h`):
  *   lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1))   (0 when deg < 2)
  *   avg_clustering = mean over vertices of lcc
  *   transitivity = 3·#triangles / #open-triads,
  *     #open-triads = Σ_v deg(v)·(deg(v)−1)/2.
  */
object Clustering {

  /** (id, lcc). Reuses the degree-ordered-orientation triangle counts. */
  def lcc(g: LinkGraph): DataFrame = {
    val tri = Triangles.run(g) // (id, triangles)
    val und = g.undirectedEdges
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    g.vertices.toDF
      .join(tri, Seq("id"), "left")
      .join(deg, Seq("id"), "left")
      .select(
        col("id"),
        when(coalesce(col("deg"), lit(0L)) < 2, 0.0)
          .otherwise(col("triangles") * 2.0 / (col("deg") * (col("deg") - 1)))
          .as("lcc"))
  }

  def avgClustering(g: LinkGraph): Double = {
    val r = lcc(g).agg(avg(col("lcc"))).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  def transitivity(g: LinkGraph): Double = {
    val tri = Triangles.run(g)
    val triTotal = {
      val r = tri.agg(sum(col("triangles"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    } // counts each triangle 3×, once per corner
    val und = g.undirectedEdges
    val triads2 = { // 2 × #open-triads (Spark `/` is double division; stay in Long)
      val r = und.select(col("a").as("id"))
        .unionAll(und.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .agg(sum(col("deg") * (col("deg") - 1))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    if (triads2 == 0L) 0.0 else 2.0 * triTotal.toDouble / triads2.toDouble
  }
}
