package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.LinkGraph

/** Mixing/assortativity family (SURVEY.md §2.B):
  *  - degree assortativity (`gs::DegreeAssortativity`,
  *    `apps/assortativity/degree_assortativity_coefficient.h`): Pearson
  *    correlation of endpoint degrees over the undirected edge ends;
  *  - average degree connectivity (`gs::AverageDegreeConnectivity`,
  *    `apps/assortativity/average_degree_connectivity.h`): mean neighbor
  *    degree, bucketed by vertex degree;
  *  - node/edge boundary (`gs::{Node,Edge}Boundary`,
  *    `apps/boundary/node_boundary.h`, `edge_boundary.h`): NX boundary
  *    sets vs a vertex set.
  */
object Assortativity {

  /** Pearson correlation of (deg(u), deg(v)) over both orientations of
    * every undirected edge (NetworkX convention).
    */
  def degreeAssortativity(g: LinkGraph): Double = {
    val und = g.undirectedEdges
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val pairs = und.select(col("a"), col("b"))
      .unionAll(und.select(col("b").as("a"), col("a").as("b")))
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val r = pairs.agg(corr(col("da").cast("double"), col("db").cast("double"))).head()
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  /** Same, as a 1-row DataFrame (driver-contract form, rounded). */
  def degreeAssortativityDf(g: LinkGraph): DataFrame = {
    val und = g.undirectedEdges
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    und.select(col("a"), col("b"))
      .unionAll(und.select(col("b").as("a"), col("a").as("b")))
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .agg(round(corr(col("da").cast("double"), col("db").cast("double")), 6).as("assortativity"))
  }

  /** (degree, avg neighbor degree) over the undirected closure. */
  def averageDegreeConnectivity(g: LinkGraph): DataFrame = {
    val und = g.undirectedEdges
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    und.select(col("a"), col("b"))
      .unionAll(und.select(col("b").as("a"), col("a").as("b")))
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .groupBy(col("da").as("degree"))
      .agg(avg(col("db").cast("double")).as("avg_nbr_degree"))
  }

  /** Node boundary of S: vertices outside S adjacent (via out-edges) to S. */
  def nodeBoundary(g: LinkGraph, s: DataFrame): DataFrame =
    g.edges.toDF
      .join(s.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(s.select(col("id").as("dst")), Seq("dst"), "left_anti")
      .select(col("dst").as("id")).distinct()

  /** Edge boundary of S: edges from S to V∖S. */
  def edgeBoundary(g: LinkGraph, s: DataFrame): DataFrame =
    g.edges.toDF
      .join(s.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(s.select(col("id").as("dst")), Seq("dst"), "left_anti")
      .select(col("src"), col("dst"))
}
