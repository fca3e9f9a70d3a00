package graft.synth

/** DuckDB oracle SQL, wave 6: twins for the round-5 interactive-plane
  * surface — the LDBC CR-1 step family (identity/dedup-by/step-level
  * path + count(local)/tag-then-property ordering), the `g.E()` edge
  * source, RangeGlobal pagination, `math()` per-traverser expressions,
  * and the Gremlin mutation plane (addV/addE/drop over the versioned
  * snapshot store).
  */
object SynthSql6 {

  /** LDBC interactive-complex-1 twin (reference query shape
    * `interactive_engine/benchmark/queries/interactive-complex-1
    * .gremlin:1`): from `seed`, the 1..3-hop reply-neighborhood with
    * `union(identity(), …)` nesting, deduped by vertex KEEPING the
    * minimum-hop walk (`dedup().by('id')`), filtered to user vertices
    * (`has('firstName', eq(…))` analog), with the walk length projected
    * via `path().count(local)` (b = hops + 1 — the path array starts at
    * the seed), ordered by (b, oid) and limited. Unrolled as three
    * distinct-frontier hops; the min-b per vertex is exactly the
    * min-size surviving walk the Spark side's dedup keeps.
    */
  def cr1Sql(sf: Double, seed: String, limit: Int): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |er AS MATERIALIZED (SELECT DISTINCT src_oid, dst_oid FROM reply),
       |h1 AS MATERIALIZED (
       |  SELECT DISTINCT dst_oid AS oid FROM er WHERE src_oid = '$seed'),
       |h2 AS MATERIALIZED (
       |  SELECT DISTINCT e.dst_oid AS oid FROM er e JOIN h1 f ON e.src_oid = f.oid),
       |h3 AS MATERIALIZED (
       |  SELECT DISTINCT e.dst_oid AS oid FROM er e JOIN h2 f ON e.src_oid = f.oid),
       |d AS (SELECT oid, CAST(min(b) AS BIGINT) AS b FROM (
       |  SELECT oid, 2 AS b FROM h1
       |  UNION ALL SELECT oid, 3 AS b FROM h2
       |  UNION ALL SELECT oid, 4 AS b FROM h3) z GROUP BY oid)
       |SELECT oid AS a, b FROM d WHERE oid LIKE 'u%'
       |ORDER BY b, oid LIMIT $limit""".stripMargin

  /** LDBC interactive-complex-2 twin (reference query shape
    * `interactive-complex-2.gremlin:1`): distinct friends of `seed`
    * (tagged p), their distinct reverse-reply sources m with
    * m ≤ `maxOid` (the `has('creationDate', lte($maxDate))` ordered
    * filter analog — binary string collation on both engines), ordered
    * (m desc, p asc — total: (p, m) pairs are distinct) and paginated.
    */
  def cr2Sql(sf: Double, seed: String, maxOid: String, limit: Int): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |er AS MATERIALIZED (SELECT DISTINCT src_oid, dst_oid FROM reply),
       |p AS (SELECT DISTINCT dst_oid AS p FROM er WHERE src_oid = '$seed'),
       |pm AS (SELECT p.p, e.src_oid AS m FROM p JOIN er e ON e.dst_oid = p.p
       |       WHERE e.src_oid <= '$maxOid')
       |SELECT p, m FROM pm ORDER BY m DESC, p ASC LIMIT $limit""".stripMargin

  /** LDBC interactive-complex-4 twin (reference query shape
    * `interactive-complex-4.gremlin:1` — the tags-new-to-the-window
    * anti-predicate): distinct friends of `seed`, their invoked tools,
    * keeping only tools with NO invoker outside the friend set
    * (`where(without('friends')).count().is(0)`), traverser counts per
    * surviving tool — each (friend, tool) distinct pair contributes 1.
    */
  def cr4Sql(sf: Double, seed: String, minW: Double): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |er AS MATERIALIZED (SELECT DISTINCT src_oid, dst_oid FROM reply),
       |ip AS MATERIALIZED (SELECT DISTINCT src_oid, dst_oid FROM invoke),
       |ipw AS MATERIALIZED (
       |  SELECT src_oid, dst_oid, CAST(count(*) AS DOUBLE) AS weight
       |  FROM invoke GROUP BY 1, 2),
       |fr AS (SELECT DISTINCT dst_oid AS oid FROM er WHERE src_oid = '$seed'),
       |ft AS (SELECT fr.oid AS p, ip.dst_oid AS tool
       |       FROM fr JOIN ip ON ip.src_oid = fr.oid),
       |keep AS (SELECT DISTINCT tool FROM ft t
       |         WHERE NOT EXISTS (
       |           SELECT 1 FROM ipw
       |           WHERE ipw.dst_oid = t.tool AND ipw.weight >= $minW
       |             AND ipw.src_oid NOT IN (SELECT oid FROM fr)))
       |SELECT t.tool AS oid, count(*) AS n
       |FROM ft t JOIN keep k ON t.tool = k.tool
       |GROUP BY 1""".stripMargin

  /** LDBC interactive-complex-5 twin (reference query shape
    * `interactive-complex-5.gremlin:1`): seed's 1..2-hop reply
    * neighborhood (union(identity(), out()) + dedup, tagged p), their
    * invoke pairs with weight ≥ `minW` (the `inE('hasMember')
    * .has('joinDate', gt(...))` analog), grouped by the landing tool
    * with the CORRELATED value count — the sub `in('invoke')
    * .where(eq('p')).count()` matches exactly the traverser's own p
    * (which by construction invokes the tool), so each surviving
    * (p, tool) pair contributes exactly 1 — ordered and limited.
    */
  def cr5Sql(sf: Double, seed: String, minW: Double, limit: Int): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |er AS MATERIALIZED (SELECT DISTINCT src_oid, dst_oid FROM reply),
       |ip AS MATERIALIZED (
       |  SELECT src_oid, dst_oid, CAST(count(*) AS DOUBLE) AS weight
       |  FROM invoke GROUP BY 1, 2),
       |h1 AS (SELECT DISTINCT dst_oid AS oid FROM er WHERE src_oid = '$seed'),
       |h12 AS (SELECT DISTINCT oid FROM (
       |  SELECT oid FROM h1
       |  UNION ALL SELECT e.dst_oid FROM er e JOIN h1 ON e.src_oid = h1.oid) z),
       |pairs AS (SELECT h.oid AS p, i.dst_oid AS tool
       |          FROM h12 h JOIN ip i ON i.src_oid = h.oid
       |          WHERE i.weight >= $minW)
       |SELECT tool AS oid, count(*) AS val FROM pairs
       |GROUP BY 1 ORDER BY val DESC, oid ASC LIMIT $limit""".stripMargin

  /** LDBC interactive-complex-6 twin (reference query shape
    * `interactive-complex-6.gremlin:1`): seed → friends →
    * `union(identity(), out())` second hop → dedup → drop the seed
    * (`has('id', neq(personId))` analog) → `filter(<sub>)` keeping
    * vertices with at least one invoke edge of weight ≥ `minW` (the
    * containsAll tag filter analog — an EXISTS semi-join) → expand the
    * distinct invoke pairs → groupCount by tool, ordered (count desc,
    * oid asc — a total order) and limited.
    */
  def cr6Sql(sf: Double, seed: String, minW: Double, limit: Int): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |er AS MATERIALIZED (SELECT DISTINCT src_oid, dst_oid FROM reply),
       |ip AS MATERIALIZED (
       |  SELECT src_oid, dst_oid, CAST(count(*) AS DOUBLE) AS weight
       |  FROM invoke GROUP BY 1, 2),
       |h1 AS (SELECT DISTINCT dst_oid AS oid FROM er WHERE src_oid = '$seed'),
       |h12 AS (SELECT DISTINCT oid FROM (
       |  SELECT oid FROM h1
       |  UNION ALL SELECT e.dst_oid FROM er e JOIN h1 ON e.src_oid = h1.oid) z),
       |d AS (SELECT oid FROM h12 WHERE oid <> '$seed'),
       |f AS (SELECT oid FROM d
       |      WHERE EXISTS (SELECT 1 FROM ip
       |                    WHERE ip.src_oid = d.oid AND ip.weight >= $minW))
       |SELECT i.dst_oid AS oid, count(*) AS n
       |FROM ip i JOIN f ON i.src_oid = f.oid
       |GROUP BY 1 ORDER BY n DESC, oid ASC LIMIT $limit""".stripMargin

  /** LDBC interactive-complex-12 twin (reference query shape
    * `interactive-complex-12.gremlin:1`): seed → friends (tagged) →
    * weighted invoke expand → `filter(<sub>)` with the correlated
    * distinct-count predicate (tools invoked by ≥ `minSrc` distinct
    * sources) → `select('friend')` → groupCount by the TAGGED vertex,
    * ordered (count desc, oid asc) and limited. Each surviving
    * (friend, tool) distinct pair contributes one traverser.
    */
  def cr12Sql(sf: Double, seed: String, minW: Double, minSrc: Int, limit: Int): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |er AS MATERIALIZED (SELECT DISTINCT src_oid, dst_oid FROM reply),
       |ip AS MATERIALIZED (
       |  SELECT src_oid, dst_oid, CAST(count(*) AS DOUBLE) AS weight
       |  FROM invoke GROUP BY 1, 2),
       |fr AS (SELECT DISTINCT dst_oid AS oid FROM er WHERE src_oid = '$seed'),
       |pr AS (SELECT fr.oid AS friend, ip.dst_oid AS tool
       |       FROM fr JOIN ip ON ip.src_oid = fr.oid WHERE ip.weight >= $minW),
       |pop AS (SELECT dst_oid AS tool FROM ip
       |        GROUP BY 1 HAVING count(DISTINCT src_oid) >= $minSrc)
       |SELECT p.friend AS oid, count(*) AS n
       |FROM pr p JOIN pop ON p.tool = pop.tool
       |GROUP BY 1 ORDER BY n DESC, oid ASC LIMIT $limit""".stripMargin

  /** LDBC interactive-complex-11 twin (reference query shape
    * `interactive-complex-11.gremlin:1`): the seed's 1..2-hop dedup
    * neighborhood minus the seed (tagged friends), their invoke pairs
    * with weight < `maxW`, emitted as (friends, orgname, works) —
    * friend oid, tool oid, edge weight (the scalar value tags) —
    * ordered (works asc, friend asc — dense id order ≡ oid order —
    * orgname desc; total: per (friend, works) the tools are distinct)
    * and paginated.
    */
  def cr11Sql(sf: Double, seed: String, maxW: Double, limit: Int): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |er AS MATERIALIZED (SELECT DISTINCT src_oid, dst_oid FROM reply),
       |ipw AS MATERIALIZED (
       |  SELECT src_oid, dst_oid, CAST(count(*) AS DOUBLE) AS weight
       |  FROM invoke GROUP BY 1, 2),
       |h1 AS (SELECT DISTINCT dst_oid AS oid FROM er WHERE src_oid = '$seed'),
       |h12 AS (SELECT DISTINCT oid FROM (
       |  SELECT oid FROM h1
       |  UNION ALL SELECT e.dst_oid FROM er e JOIN h1 ON e.src_oid = h1.oid) z),
       |d AS (SELECT oid FROM h12 WHERE oid <> '$seed'),
       |rws AS (SELECT d.oid AS friends, i.dst_oid AS orgname, i.weight AS works
       |        FROM d JOIN ipw i ON i.src_oid = d.oid
       |        WHERE i.weight < $maxW)
       |SELECT friends, orgname, works FROM rws
       |ORDER BY works ASC, friends ASC, orgname DESC LIMIT $limit""".stripMargin

  /** 1-hop / 2-hop micro benchmark twins (`benchmark/queries/
    * 1-hop.gremlin`, `2-hop.gremlin`): traverser counts after one / two
    * distinct-pair expansions from the seed (2-hop multiplicity = Σ
    * over 1-hop neighbors of their out-degrees).
    */
  def hop1Sql(sf: Double, seed: String): String =
    s"""WITH ${SynthSql.graphCtes(sf)}
       |SELECT count(*) AS n FROM dedges e
       |JOIN vertices v ON v.id = e.src WHERE v.oid = '$seed'""".stripMargin

  def hop2Sql(sf: Double, seed: String): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |h1 AS (SELECT e.dst FROM dedges e
       |       JOIN vertices v ON v.id = e.src WHERE v.oid = '$seed')
       |SELECT count(*) AS n FROM dedges e JOIN h1 ON e.src = h1.dst""".stripMargin

  /** `g.E()` edge-scan source twin (`sourcestep/edge.rs:89`, ScanOpt
    * EDGE): weight predicate directly on the edge table, then
    * GetV(START) + groupCount by source oid.
    */
  def esourceSql(sf: Double, minW: Double): String =
    s"""WITH ${SynthSql.graphCtes(sf)}
       |SELECT vs.oid AS oid, count(*) AS n
       |FROM dedges e JOIN vertices vs ON vs.id = e.src
       |WHERE e.weight >= $minW
       |GROUP BY vs.oid""".stripMargin

  /** RangeGlobal pagination twin (`RangeGlobalTreeNode.java:31`):
    * in-degree groupCount ordered (n desc, oid asc) — a total order, so
    * the [lo, hi) page is deterministic cross-engine.
    */
  def rangeSql(sf: Double, lo: Int, hi: Int): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |gc AS (SELECT vd.oid AS oid, count(*) AS n
       |       FROM dedges e JOIN vertices vd ON vd.id = e.dst
       |       GROUP BY vd.oid)
       |SELECT oid, n FROM gc ORDER BY n DESC, oid ASC
       |LIMIT ${hi - lo} OFFSET $lo""".stripMargin

  /** `math()` twin (`MathTreeNode.java:36`): per-edge computed
    * expression over the weight value. Only IEEE-correctly-rounded ops
    * (+ - * / sqrt abs) — bit-identical across JVM and DuckDB, unlike
    * log/exp (libm last-ulp drift), which the math() grammar therefore
    * excludes.
    */
  def mathSql(sf: Double): String =
    s"""WITH ${SynthSql.graphCtes(sf)}
       |SELECT sqrt(abs(weight - 3.0)) * 2.0 + 1.0 / (weight + 1.0) AS val
       |FROM dedges""".stripMargin

  /** sack() twin: `g.withSack(0).V().has('oid', seed).outE()
    * .sack(sum).by('weight').inV().outE().sack(sum).by('weight')
    * .sack()` — one row per 2-edge walk from `seed`, sack = w1 + w2.
    * Weights are integer-valued doubles, so the sums are exact on both
    * engines.
    */
  def sackSql(sf: Double, seed: String): String =
    s"""WITH ${SynthSql.graphCtes(sf)}
       |SELECT e1.weight + e2.weight AS sack
       |FROM dedges e1
       |JOIN vertices vs ON vs.id = e1.src
       |JOIN dedges e2 ON e2.src = e1.dst
       |WHERE vs.oid = '$seed'""".stripMargin

  /** Value-routed branch twin (`BranchTreeNode.java:49` /
    * CaseWhenTreeNode): `g.V().branch(label()).option('user',
    * out('reply')).option('tool', in('invoke')).option(none,
    * identity()).groupCount().by('label')` — users route to their
    * distinct reply-out neighbors, tools to their distinct invoke-in
    * sources, everyone else passes through; counts by landing label.
    */
  def branchSql(sf: Double): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |er AS (SELECT DISTINCT src_oid, dst_oid FROM reply),
       |ei AS (SELECT DISTINCT src_oid, dst_oid FROM invoke),
       |routed AS (
       |  SELECT e.dst_oid AS oid FROM er e
       |  WHERE ${SynthSql5.labelOf("e.src_oid")} = 'user'
       |  UNION ALL
       |  SELECT e.src_oid AS oid FROM ei e
       |  WHERE ${SynthSql5.labelOf("e.dst_oid")} = 'tool'
       |  UNION ALL
       |  SELECT v.oid AS oid FROM vertices v
       |  WHERE ${SynthSql5.labelOf("v.oid")} NOT IN ('user', 'tool')
       |)
       |SELECT ${SynthSql5.labelOf("oid")} AS label, count(*) AS n
       |FROM routed GROUP BY 1""".stripMargin

  /** `order().by(shuffle)` twin (the IR's third OrderBy direction,
    * `algebra.proto:116` ASC/DESC/SHUFFLE): the traverser bag ordered
    * by the engine's portable pick policy — (portableHash(oid), oid),
    * shared with `sample(n)`/`LshSql.phash` — then paged. Ties at the
    * page boundary are duplicate oids from different sources, which
    * project to identical rows, so any tie-cut yields the same
    * multiset.
    */
  def shuffleOrderSql(sf: Double, srcLike: String, limit: Int): String =
    s"""WITH ${SynthSql.graphCtes(sf)}
       |SELECT v2.oid AS oid FROM dedges e
       |JOIN vertices v1 ON v1.id = e.src
       |JOIN vertices v2 ON v2.id = e.dst
       |WHERE v1.oid LIKE '$srcLike'
       |ORDER BY ${LshSql.phash("v2.oid")}, v2.oid LIMIT $limit""".stripMargin

  /** Gremlin mutation-plane twin (groot realtime write,
    * `record.py:22-82`): the base edge set after
    * `g.addV().property('oid','$newOid')`, `g.V().has('oid',
    * 'assistant').addE().to(V().has('oid','$newOid')).property('weight',
    * $w)` and `g.V().has('oid','$dropOid').drop()` — the dropped
    * vertex's incident edges are pruned, the inserted edge survives.
    */
  def gremlinMutateSql(sf: Double, dropOid: String, newOid: String, w: Double): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |mut AS (
       |  SELECT src_oid, dst_oid, weight FROM edges_oid
       |  WHERE src_oid <> '$dropOid' AND dst_oid <> '$dropOid'
       |  UNION ALL SELECT 'assistant', '$newOid', CAST($w AS DOUBLE))
       |SELECT src_oid, dst_oid, weight FROM mut""".stripMargin
}
