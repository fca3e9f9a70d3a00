package graft.oracle

import scala.collection.mutable

/** In-memory references for the second wave of algorithms (SSSP, BFS,
  * HITS, cores, clustering, centralities). Same conventions as [[Oracle]]:
  * dense ids 0..n-1, directed distinct edges, single-threaded.
  */
object Oracle2 {

  /** Bellman-Ford over weighted directed edges; None = unreachable. */
  def sssp(n: Int, edges: Seq[(Int, Int, Double)], source: Int): Array[Option[Double]] = {
    val dist = Array.fill[Option[Double]](n)(None)
    dist(source) = Some(0.0)
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (u, v, w) =>
        dist(u).foreach { du =>
          val nd = du + w
          if (dist(v).forall(_ > nd)) { dist(v) = Some(nd); changed = true }
        }
      }
    }
    dist
  }

  /** BFS levels over directed out-edges; None = unreachable. */
  def bfs(n: Int, edges: Seq[(Int, Int)], source: Int): Array[Option[Long]] = {
    val adj = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    edges.foreach { case (u, v) => adj(u) += v }
    val level = Array.fill[Option[Long]](n)(None)
    level(source) = Some(0L)
    var frontier = List(source)
    var l = 0L
    while (frontier.nonEmpty) {
      l += 1
      val next = mutable.ListBuffer.empty[Int]
      frontier.foreach(u => adj(u).foreach { v =>
        if (level(v).isEmpty) { level(v) = Some(l); next += v }
      })
      frontier = next.toList
    }
    level
  }

  /** HITS with per-iteration L1 normalization, matching [[graft.algos.HITS]]. */
  def hits(n: Int, edges: Seq[(Int, Int)], maxIter: Int, tol: Double): (Array[Double], Array[Double]) = {
    var auth = Array.fill(n)(1.0 / n)
    var hub = Array.fill(n)(1.0 / n)
    var iter = 0
    var delta = Double.MaxValue
    while (iter < maxIter && delta >= tol) {
      val aRaw = new Array[Double](n)
      edges.foreach { case (u, v) => aRaw(v) += hub(u) }
      val asum = { val s = aRaw.sum; if (s == 0.0) 1.0 else s }
      val aNew = aRaw.map(_ / asum)
      val hRaw = new Array[Double](n)
      edges.foreach { case (u, v) => hRaw(u) += aNew(v) }
      val hsum = { val s = hRaw.sum; if (s == 0.0) 1.0 else s }
      val hNew = hRaw.map(_ / hsum)
      delta = (0 until n).map(i => math.abs(aNew(i) - auth(i))).sum
      auth = aNew; hub = hNew
      iter += 1
    }
    (auth, hub)
  }

  /** Undirected simple adjacency from directed edges. */
  private def undirected(n: Int, edges: Seq[(Int, Int)]): Array[mutable.Set[Int]] = {
    val nbr = Array.fill(n)(mutable.Set.empty[Int])
    edges.foreach { case (u, v) => if (u != v) { nbr(u) += v; nbr(v) += u } }
    nbr
  }

  /** k-core member ids with their in-core degrees. */
  def kcore(n: Int, edges: Seq[(Int, Int)], k: Int): Map[Int, Int] = {
    val nbr = undirected(n, edges).map(_.clone())
    var changed = true
    while (changed) {
      changed = false
      (0 until n).foreach { v =>
        if (nbr(v).nonEmpty && nbr(v).size < k) {
          nbr(v).foreach(u => nbr(u) -= v)
          nbr(v).clear()
          changed = true
        }
      }
    }
    (0 until n).filter(nbr(_).size >= k).map(v => v -> nbr(v).size).toMap
  }

  /** Shell index per vertex (0 for isolated). */
  def kshell(n: Int, edges: Seq[(Int, Int)]): Array[Long] = {
    val nbr = undirected(n, edges).map(_.clone())
    val shell = new Array[Long](n)
    var k = 1L
    while (nbr.exists(_.nonEmpty)) {
      var changed = true
      while (changed) {
        changed = false
        (0 until n).foreach { v =>
          if (nbr(v).nonEmpty && nbr(v).size < k) {
            shell(v) = k - 1L
            nbr(v).foreach(u => nbr(u) -= v)
            nbr(v).clear()
            changed = true
          }
        }
      }
      (0 until n).foreach(v => if (nbr(v).nonEmpty) shell(v) = k)
      k += 1L
    }
    shell
  }

  def lcc(n: Int, edges: Seq[(Int, Int)]): Array[Double] = {
    val tri = Oracle.triangles(n, edges)
    val nbr = undirected(n, edges)
    (0 until n).map { v =>
      val d = nbr(v).size
      if (d < 2) 0.0 else 2.0 * tri(v) / (d.toDouble * (d - 1))
    }.toArray
  }

  def transitivity(n: Int, edges: Seq[(Int, Int)]): Double = {
    val tri = Oracle.triangles(n, edges).sum // 3 × #triangles
    val nbr = undirected(n, edges)
    val triads2 = nbr.map(s => s.size.toLong * (s.size - 1)).sum
    if (triads2 == 0L) 0.0 else 2.0 * tri / triads2.toDouble
  }

  def degreeAssortativity(n: Int, edges: Seq[(Int, Int)]): Double = {
    val nbr = undirected(n, edges)
    val deg = nbr.map(_.size)
    val pairs = (0 until n).flatMap(u => nbr(u).toSeq.map(v => (deg(u).toDouble, deg(v).toDouble)))
    val m = pairs.size.toDouble
    val mx = pairs.map(_._1).sum / m
    val my = pairs.map(_._2).sum / m
    val cov = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
    val sx = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum)
    val sy = math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum)
    cov / (sx * sy)
  }
}

/** Brandes betweenness reference (unweighted, directed). */
object OracleBrandes {
  def betweenness(n: Int, edges: Seq[(Int, Int)], sources: Seq[Int]): Array[Double] = {
    val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    edges.distinct.filter { case (a, b) => a != b }.foreach { case (u, v) => adj(u) += v }
    val bc = new Array[Double](n)
    sources.foreach { s =>
      val dist = Array.fill(n)(-1)
      val sigma = new Array[Double](n)
      val order = scala.collection.mutable.ArrayBuffer.empty[Int]
      dist(s) = 0; sigma(s) = 1.0
      var frontier = List(s)
      while (frontier.nonEmpty) {
        val next = scala.collection.mutable.ListBuffer.empty[Int]
        frontier.foreach { u =>
          order += u
          adj(u).foreach { v =>
            if (dist(v) < 0) { dist(v) = dist(u) + 1; next += v }
            if (dist(v) == dist(u) + 1) sigma(v) += sigma(u)
          }
        }
        frontier = next.toList.distinct
      }
      // note: sigma accumulation above double-counts when a vertex is
      // discovered twice in one wave; recompute cleanly:
      java.util.Arrays.fill(sigma, 0.0)
      sigma(s) = 1.0
      order.distinct.sortBy(dist(_)).foreach { u =>
        adj(u).foreach { v => if (dist(v) == dist(u) + 1) sigma(v) += sigma(u) }
      }
      // dependency accumulation over the shortest-path DAG predecessors
      val delta = new Array[Double](n)
      val preds = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
      edges.distinct.filter { case (a, b) => a != b }.foreach { case (u, v) =>
        if (dist(u) >= 0 && dist(v) == dist(u) + 1) preds(v) += u
      }
      order.distinct.sortBy(v => -dist(v)).foreach { w =>
        preds(w).foreach { v =>
          delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
        }
        if (w != s) bc(w) += delta(w)
      }
    }
    bc
  }
}
