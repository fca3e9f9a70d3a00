package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.LinkGraph
import graft.schema.{Edge, Vertex}

/** Shared session + helpers for all suites (one session per JVM — suites
  * share it via getOrCreate).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  /** A LinkGraph over vertices 0..n-1 (oid = zero-padded index so dense
    * ranks coincide with indices) from an explicit edge list.
    */
  def graphFrom(n: Int, edges: Seq[(Int, Int)]): LinkGraph = {
    val s = spark
    import s.implicits._
    val vs = (0 until n).map(i => Vertex(i.toLong, f"v$i%06d")).toDS()
    val es = edges.distinct.map { case (a, b) => Edge(a.toLong, b.toLong, 1.0) }.toDS()
    LinkGraph(vs, es)
  }

  /** Deterministic pseudo-random digraph (LCG; no java Random semantics
    * dependence) with n vertices, m edge draws.
    */
  def randomEdges(n: Int, m: Int, seed: Long = 7L): Seq[(Int, Int)] = {
    var x = seed
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x >>> 16 }
    (0 until m).map { _ =>
      val a = (next() % n).toInt.abs
      val b = (next() % n).toInt.abs
      (a, b)
    }.distinct.filter { case (a, b) => a != b }
  }
}
