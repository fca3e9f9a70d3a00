package graft.oracle

import scala.collection.mutable

/** Single-threaded in-memory reference implementations of the four
  * north-rule recurrences, with semantics matching the cited reference
  * code (SURVEY.md §7.1 item 7): dangling handling per
  * `benchmarks/apps/pagerank/pagerank.h:117-125`, min-id init per
  * `apps/projected/wcc_projected.h:76-81`, degree-tie orientation per
  * `apps/clustering/triangles.h:80-90`, CDLP smallest-most-frequent
  * tie-break. Used as the test oracle; the distributed implementations in
  * `graft.algos` must match these (allclose 1e-6 for PageRank, exact for
  * the rest).
  *
  * Input: edge list over dense ids 0..n-1 (distinct directed pairs).
  */
object Oracle {

  def pageRank(n: Int, edges: Seq[(Int, Int)], damping: Double, maxIter: Int,
      tol: Option[Double] = None): Array[Double] = {
    val outDeg = new Array[Int](n)
    edges.foreach { case (s, _) => outDeg(s) += 1 }
    var rank = Array.fill(n)(1.0 / n)
    var iter = 0
    var delta = Double.MaxValue
    while (iter < maxIter && !tol.exists(t => delta < t * n)) {
      val dsum = (0 until n).iterator.filter(outDeg(_) == 0).map(rank).sum
      val base = (1.0 - damping) / n + damping * dsum / n
      val next = Array.fill(n)(base)
      edges.foreach { case (s, d) => next(d) += damping * rank(s) / outDeg(s) }
      delta = (0 until n).iterator.map(i => math.abs(next(i) - rank(i))).sum
      rank = next
      iter += 1
    }
    rank
  }

  /** nx `pagerank` on a WEIGHTED graph: contributions split by
    * edge weight / Σ out-weights (the nx default when the graph carries
    * weights).
    */
  def pageRankWeighted(n: Int, edges: Seq[(Int, Int, Double)],
      damping: Double, rounds: Int): Array[Double] = {
    val outW = new Array[Double](n)
    edges.foreach { case (s, _, w) => outW(s) += w }
    var rank = Array.fill(n)(1.0 / n)
    (1 to rounds).foreach { _ =>
      val dsum = (0 until n).iterator.filter(outW(_) == 0.0).map(rank).sum
      val base = (1.0 - damping) / n + damping * dsum / n
      val next = Array.fill(n)(base)
      edges.foreach { case (s, d, w) => next(d) += damping * rank(s) * (w / outW(s)) }
      rank = next
    }
    rank
  }

  /** Personalized PageRank with single-seed teleport + dangling
    * redistribution (nx pagerank personalization={seed: 1}).
    */
  def personalizedPageRank(n: Int, edges: Seq[(Int, Int)], seed: Int,
      damping: Double, rounds: Int): Array[Double] = {
    val outDeg = new Array[Int](n)
    edges.foreach { case (s, _) => outDeg(s) += 1 }
    var rank = Array.tabulate(n)(i => if (i == seed) 1.0 else 0.0)
    (1 to rounds).foreach { _ =>
      val dsum = (0 until n).iterator.filter(outDeg(_) == 0).map(rank).sum
      val next = new Array[Double](n)
      next(seed) = (1.0 - damping) + damping * dsum
      edges.foreach { case (s, d) => next(d) += damping * rank(s) / outDeg(s) }
      rank = next
    }
    rank
  }

  def pageRankIterations(n: Int, edges: Seq[(Int, Int)], damping: Double,
      maxIter: Int, tol: Double): Int = {
    val outDeg = new Array[Int](n)
    edges.foreach { case (s, _) => outDeg(s) += 1 }
    var rank = Array.fill(n)(1.0 / n)
    var iter = 0
    var delta = Double.MaxValue
    while (iter < maxIter && delta >= tol * n) {
      val dsum = (0 until n).iterator.filter(outDeg(_) == 0).map(rank).sum
      val base = (1.0 - damping) / n + damping * dsum / n
      val next = Array.fill(n)(base)
      edges.foreach { case (s, d) => next(d) += damping * rank(s) / outDeg(s) }
      delta = (0 until n).iterator.map(i => math.abs(next(i) - rank(i))).sum
      rank = next
      iter += 1
    }
    iter
  }

  /** HashMin WCC over the undirected closure; comp = min reachable id. */
  def wcc(n: Int, edges: Seq[(Int, Int)]): Array[Int] = {
    val adj = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    edges.foreach { case (s, d) =>
      if (s != d) { adj(s) += d; adj(d) += s }
    }
    val comp = Array.tabulate(n)(identity)
    var changed = true
    while (changed) {
      changed = false
      var v = 0
      while (v < n) {
        adj(v).foreach { u =>
          if (comp(u) < comp(v)) { comp(v) = comp(u); changed = true }
        }
        v += 1
      }
    }
    comp
  }

  /** Synchronous CDLP: label' = smallest most-frequent neighbor label;
    * neighbor multiset = both endpoints of every directed edge.
    */
  def cdlp(n: Int, edges: Seq[(Int, Int)], rounds: Int): Array[Long] = {
    val nbrs = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    edges.foreach { case (s, d) =>
      if (s != d) { nbrs(d) += s; nbrs(s) += d }
    }
    var label = Array.tabulate(n)(_.toLong)
    for (_ <- 0 until rounds) {
      val next = new Array[Long](n)
      var v = 0
      while (v < n) {
        if (nbrs(v).isEmpty) next(v) = label(v)
        else {
          val cnt = mutable.LongMap.empty[Long].withDefaultValue(0L)
          nbrs(v).foreach(u => cnt(label(u)) += 1L)
          var bestLabel = Long.MaxValue
          var bestCnt = -1L
          cnt.foreach { case (l, c) =>
            if (c > bestCnt || (c == bestCnt && l < bestLabel)) {
              bestLabel = l; bestCnt = c
            }
          }
          next(v) = bestLabel
        }
        v += 1
      }
      label = next
    }
    label
  }

  /** Per-vertex triangle counts over the undirected simple closure. */
  def triangles(n: Int, edges: Seq[(Int, Int)]): Array[Long] = {
    val nbr = Array.fill(n)(mutable.Set.empty[Int])
    edges.foreach { case (s, d) =>
      if (s != d) { nbr(s) += d; nbr(d) += s }
    }
    val deg = nbr.map(_.size)
    def before(u: Int, v: Int): Boolean =
      deg(u) < deg(v) || (deg(u) == deg(v) && u < v)
    // Oriented adjacency: u → v iff before(u, v).
    val out = Array.tabulate(n)(u => nbr(u).filter(v => before(u, v)).toArray.sorted)
    val count = new Array[Long](n)
    var u = 0
    while (u < n) {
      val ou = out(u)
      var i = 0
      while (i < ou.length) {
        val v = ou(i)
        var j = i + 1
        while (j < ou.length) {
          val w = ou(j)
          val (x, y) = if (before(v, w)) (v, w) else (w, v)
          if (out(x).contains(y)) { count(u) += 1; count(v) += 1; count(w) += 1 }
          j += 1
        }
        i += 1
      }
      u += 1
    }
    count
  }
}
