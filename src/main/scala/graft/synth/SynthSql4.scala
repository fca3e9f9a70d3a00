package graft.synth

/** DuckDB oracle SQL, wave 4: the last spec-only §2.B algorithms get
  * driver twins — k-shell decomposition, SSSP parent pointers, and the
  * sampled average-shortest-path-length estimator.
  */
object SynthSql4 {

  /** k-shell (= core number) per vertex, twin of `Cores.kshell`.
    *
    * The Spark side peels (delete degree<k until stable, k = 1, 2, …) —
    * a doubly-nested loop that would need hundreds of unrolled CTEs.
    * The twin instead iterates the neighborhood H-index fixpoint
    * (Lü et al. 2016, "The H-index of a network and its relation to
    * degree and coreness"): h₀(v) = degree(v),
    * h_{k+1}(v) = H-index of {h_k(u) : u ~ v}; the sequence is
    * monotonically non-increasing and converges exactly to the core
    * number. Both formulations compute the same function, so a fixed
    * unroll that reaches the fixpoint (verified `rounds` vs `rounds+1`
    * at build time for sf0.01) equals the Spark peel.
    *
    * H-index in SQL: sort neighbor values descending, rank them, take
    * max(min(rank, value)) — 0 for isolated vertices.
    */
  def kshellSql(sf: Double, rounds: Int = 18): String = {
    val body = (1 to rounds).map { k =>
      val p = s"hx${k - 1}"
      s"""nb$k AS (
         |  SELECT ue.a AS v, h.h AS val,
         |         row_number() OVER (PARTITION BY ue.a ORDER BY h.h DESC) AS rn
         |  FROM ue JOIN $p h ON ue.b = h.id),
         |hx$k AS MATERIALIZED (
         |  SELECT v.id, coalesce(m.h, 0) AS h
         |  FROM vertices v LEFT JOIN (
         |    SELECT v AS id, max(least(rn, val)) AS h FROM nb$k GROUP BY v) m
         |    ON v.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${SynthSql.graphCtes(sf)},
       |und1 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |         FROM dedges WHERE src <> dst),
       |ue AS MATERIALIZED (SELECT a, b FROM und1 UNION ALL SELECT b, a FROM und1),
       |hx0 AS MATERIALIZED (
       |  SELECT v.id, coalesce(m.d, 0) AS h
       |  FROM vertices v LEFT JOIN (SELECT a AS id, count(*) AS d FROM ue GROUP BY a) m
       |    ON v.id = m.id),
       |$body
       |SELECT v.oid AS oid, CAST(h.h AS BIGINT) AS shell
       |FROM vertices v JOIN hx$rounds h ON v.id = h.id""".stripMargin
  }

  /** One synchronous Louvain sweep level as CTE text — `pre` prefixes
    * every CTE name; `und`/`deg`/`verts` name the level's adjacency,
    * degree, and vertex-universe CTEs; the final assignment CTE is
    * `${pre}cm$rounds`. The gain algebra is the exact twin of
    * `Louvain.sweep`.
    */
  private def louvainLevel(
      pre: String, und: String, deg: String, verts: String, rounds: Int): String = {
    val body = (1 to rounds).map { r =>
      val p = s"${pre}cm${r - 1}"
      s"""${pre}tot$r AS MATERIALIZED (
         |  SELECT c.community, sum(coalesce(d.kdeg, 0.0)) AS tot
         |  FROM $p c LEFT JOIN $deg d ON c.id = d.id GROUP BY c.community),
         |${pre}wvc$r AS MATERIALIZED (
         |  SELECT u.src AS id, c.community AS c, sum(u.w) AS wvc
         |  FROM $und u JOIN $p c ON u.dst = c.id GROUP BY u.src, c.community),
         |${pre}cand$r AS MATERIALIZED (
         |  SELECT w.id, w.c, cm.community AS cur,
         |         w.wvc - ((1.0 * d.kdeg) * (t.tot - CASE WHEN w.c = cm.community THEN d.kdeg ELSE 0.0 END)) / (SELECT m2 FROM m2t) AS gain
         |  FROM ${pre}wvc$r w JOIN $deg d ON w.id = d.id JOIN $p cm ON w.id = cm.id
         |  JOIN ${pre}tot$r t ON t.community = w.c),
         |${pre}stay$r AS (SELECT id, max(gain) AS stay FROM ${pre}cand$r WHERE c = cur GROUP BY id),
         |${pre}best$r AS (
         |  SELECT s.id, CASE WHEN s.id % 2 = ${(r - 1) % 2} AND s.gain > coalesce(st.stay, 0.0) + 1e-12 THEN s.c ELSE s.cur END AS newc
         |  FROM (SELECT id, c, cur, gain,
         |               row_number() OVER (PARTITION BY id ORDER BY gain DESC, c ASC) AS rn
         |        FROM ${pre}cand$r) s
         |  LEFT JOIN ${pre}stay$r st ON st.id = s.id
         |  WHERE s.rn = 1),
         |${pre}cm$r AS MATERIALIZED (
         |  SELECT c.id, coalesce(b.newc, c.community) AS community
         |  FROM ${pre}cm${r - 1} c LEFT JOIN ${pre}best$r b ON c.id = b.id)""".stripMargin
    }.mkString(",\n")
    s"""${pre}cm0 AS (SELECT id, id AS community FROM $verts),
       |$body""".stripMargin
  }

  /** Multi-level Louvain, twin of `Louvain.runMultiLevel(g,
    * roundsPerLevel, levels)`: after each level's sweep, communities are
    * compressed to super-vertices (coarse kdeg = sum of member kdegs —
    * intra-community mass stays in the degree totals; coarse adjacency
    * keeps only inter-community weight) and the next level sweeps the
    * coarse graph with the SAME m2. Assignments compose back down to the
    * original vertices.
    */
  def louvainMultiSql(sf: Double, rounds: Int = 5, levels: Int = 2): String = {
    val parts = (1 to levels).map { lvl =>
      val pre = if (lvl == 1) "" else s"l$lvl"
      val (und, deg, verts) =
        if (lvl == 1) ("und2", "degl", "vertices")
        else (s"l${lvl}und", s"l${lvl}deg", s"l${lvl}deg")
      val coarsen = if (lvl == 1) "" else {
        val prevPre = if (lvl == 2) "" else s"l${lvl - 1}"
        val prevCm = s"${prevPre}cm$rounds"
        val (prevUnd, prevDeg) =
          if (lvl == 2) ("und2", "degl") else (s"l${lvl - 1}und", s"l${lvl - 1}deg")
        s"""l${lvl}deg AS MATERIALIZED (
           |  SELECT c.community AS id, sum(coalesce(d.kdeg, 0.0)) AS kdeg
           |  FROM $prevCm c LEFT JOIN $prevDeg d ON c.id = d.id GROUP BY c.community),
           |l${lvl}und AS MATERIALIZED (
           |  SELECT a.community AS src, b.community AS dst, sum(u.w) AS w
           |  FROM $prevUnd u JOIN $prevCm a ON u.src = a.id JOIN $prevCm b ON u.dst = b.id
           |  WHERE a.community <> b.community GROUP BY 1, 2),
           |""".stripMargin
      }
      coarsen + louvainLevel(pre, und, deg, verts, rounds)
    }.mkString(",\n")
    // compose the per-level assignments down to original vertices
    val composed = (2 to levels).foldLeft("cm" + rounds + " c") { (acc, lvl) =>
      s"($acc JOIN l${lvl}cm$rounds d$lvl ON ${if (lvl == 2) "c" else s"d${lvl - 1}"}.community = d$lvl.id)"
    }
    val finalComm = if (levels == 1) "c.community" else s"d$levels.community"
    s"""WITH ${SynthSql.graphCtes(sf)},
       |und2 AS MATERIALIZED (
       |  SELECT src, dst, sum(w) AS w FROM (
       |    SELECT src, dst, weight AS w FROM dedges WHERE src <> dst
       |    UNION ALL SELECT dst, src, weight FROM dedges WHERE src <> dst) x
       |  GROUP BY src, dst),
       |m2t AS (SELECT sum(w) AS m2 FROM und2),
       |degl AS MATERIALIZED (SELECT src AS id, sum(w) AS kdeg FROM und2 GROUP BY src),
       |$parts
       |SELECT v.oid AS oid, cv.oid AS community_oid
       |FROM $composed
       |JOIN vertices v ON c.id = v.id JOIN vertices cv ON $finalComm = cv.id""".stripMargin
  }

  /** SSSP with parent pointers, twin of `Paths2.withParents`: the
    * converged distances from [[SynthSql2.ssspSql]]'s unrolled chain,
    * parent = min-id predecessor on a tight edge (sd + w = dd within
    * 1e-9 — the same guard as the Spark side; both engines computed the
    * identical converged doubles, each candidate is one IEEE add).
    * Output (oid, dist, parent_oid); unreachable ⇒ both NULL.
    */
  /** Shared walk CTEs for the PathExpand result_opt=ALL_V twins: all
    * SIMPLE walks of 1..2 hops from `source` with their oid path
    * strings ('>'-joined) and end-vertex ids — the exact walk set
    * `Traversal.pathExpandPaths(1, 2, simple = true)` enumerates.
    */
  private def walkCtes(sf: Double, source: String): String =
    s"""${SynthSql.graphCtes(sf)},
       |s0 AS (SELECT id, oid FROM vertices WHERE oid = '$source'),
       |w1 AS MATERIALIZED (
       |  SELECT s0.oid AS p0, v1.oid AS p1, s0.id AS i0, e1.dst AS i1
       |  FROM s0 JOIN dedges e1 ON e1.src = s0.id
       |  JOIN vertices v1 ON v1.id = e1.dst),
       |w2 AS (
       |  SELECT w1.p0, w1.p1, v2.oid AS p2, e2.dst AS i2
       |  FROM w1 JOIN dedges e2 ON e2.src = w1.i1
       |  JOIN vertices v2 ON v2.id = e2.dst
       |  WHERE e2.dst <> w1.i0 AND e2.dst <> w1.i1),
       |allw AS (
       |  SELECT p0 || '>' || p1 AS path_str, i1 AS tip FROM w1
       |  UNION ALL
       |  SELECT p0 || '>' || p1 || '>' || p2 AS path_str, i2 AS tip FROM w2)""".stripMargin

  /** Per-end-vertex walk summary (twin of the `tg_gie_paths` driver
    * query): walk count + lexicographically-least path per end oid.
    */
  def giePathsSql(sf: Double, source: String): String =
    s"""WITH ${walkCtes(sf, source)}
       |SELECT v.oid AS oid, count(*) AS n_walks, min(path_str) AS min_path
       |FROM allw JOIN vertices v ON v.id = allw.tip
       |GROUP BY v.oid""".stripMargin

  /** First `k` materialized walk strings in path order (twin of the
    * `tg_gremlin_paths` string-front-end query).
    */
  def giePathsTopSql(sf: Double, source: String, k: Int): String =
    s"""WITH ${walkCtes(sf, source)}
       |SELECT path_str FROM allw ORDER BY path_str LIMIT $k""".stripMargin

  def ssspPathSql(sf: Double, rounds: Int = 25): String = {
    val body = (1 to rounds).map { k =>
      val p = s"s${k - 1}"
      s"""s$k AS MATERIALIZED (
         |  SELECT v.id,
         |         CASE WHEN m.nd IS NOT NULL AND (p.dist IS NULL OR m.nd < p.dist)
         |              THEN m.nd ELSE p.dist END AS dist
         |  FROM vertices v JOIN $p p ON v.id = p.id
         |  LEFT JOIN (
         |    SELECT e.dst AS id, min(p2.dist + e.weight) AS nd
         |    FROM dedges e JOIN $p p2 ON e.src = p2.id
         |    WHERE p2.dist IS NOT NULL GROUP BY e.dst) m ON m.id = v.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${SynthSql.graphCtes(sf)},
       |s0 AS (SELECT id, CASE WHEN oid = 'assistant' THEN 0.0 ELSE NULL END AS dist FROM vertices),
       |$body,
       |fin AS (SELECT id, dist FROM s$rounds),
       |par AS (
       |  SELECT e.dst AS id, min(e.src) AS par
       |  FROM dedges e
       |  JOIN fin sd ON e.src = sd.id
       |  JOIN fin dd ON e.dst = dd.id
       |  WHERE sd.dist IS NOT NULL AND dd.dist IS NOT NULL
       |    AND abs(sd.dist + e.weight - dd.dist) < 1e-9
       |  GROUP BY e.dst)
       |SELECT v.oid AS oid, round(f.dist, 6) AS dist, pv.oid AS parent_oid
       |FROM vertices v JOIN fin f ON v.id = f.id
       |LEFT JOIN par p ON p.id = v.id
       |LEFT JOIN vertices pv ON p.par = pv.id""".stripMargin
  }

  /** Sampled average shortest-path length, twin of
    * `Paths2.averageLength(g, sourceOids)`: the [[SynthSql3.apspSql]]
    * batched relaxation, then sum(dist) over reachable (source, v)
    * pairs divided by (reachable pairs − #sources) — each source
    * reaches itself at dist 0, excluded from the denominator.
    */
  def avgPathLenSql(sf: Double, sources: Seq[String], rounds: Int = 30): String = {
    val srcs = sources.map(s => s"'$s'").mkString(", ")
    val body = (1 to rounds).map { k =>
      val p = s"ms${k - 1}"
      s"""ms$k AS MATERIALIZED (
         |  SELECT s, id, min(dist) AS dist FROM (
         |    SELECT s, id, dist FROM $p
         |    UNION ALL
         |    SELECT p.s, e.dst AS id, p.dist + e.weight AS dist
         |    FROM dedges e JOIN $p p ON e.src = p.id
         |  ) z GROUP BY s, id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${SynthSql.graphCtes(sf)},
       |srcs AS (SELECT id AS s FROM vertices WHERE oid IN ($srcs)),
       |ms0 AS (SELECT s, s AS id, 0.0 AS dist FROM srcs),
       |$body
       |SELECT round(sum(dist) / (count(*) - ${sources.size}), 6) AS avg_len
       |FROM ms$rounds""".stripMargin
  }
}
