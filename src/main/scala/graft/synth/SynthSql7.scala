package graft.synth

/** DuckDB oracle SQL, wave 7: twins for the TinkerPop side-effect and
  * path-shape steps — `aggregate(tag)` / `where(P.without(tag))` /
  * `cap(tag)` (MaxGraph FoldStore, `unarystep/aggregate.rs:29-815`),
  * step-form `cyclicPath()` (complement of the SimplePath filter,
  * `unarystep/filter.rs:36-362`), and the `tree()` sink (traverser
  * histories merged by shared prefix).
  */
object SynthSql7 {

  /** Visited-set expansion twin: `g.V().has('oid', seed).out()
    * .aggregate('x').out().where(P.without('x')).groupCount().by('oid')`
    * — walks of length 2 from the seed whose endpoint is NOT a 1-hop
    * neighbor, counted per landing oid. The side-effect set is the
    * DISTINCT 1-hop frontier (membership semantics of the bulk set).
    */
  def aggregateSql(sf: Double, seed: String): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |s AS (SELECT id FROM vertices WHERE oid = '$seed'),
       |h1 AS MATERIALIZED (SELECT DISTINCT e.dst FROM dedges e JOIN s ON e.src = s.id),
       |walks AS (
       |  SELECT e2.dst AS v FROM dedges e1
       |  JOIN s ON e1.src = s.id
       |  JOIN dedges e2 ON e2.src = e1.dst
       |  WHERE e2.dst NOT IN (SELECT dst FROM h1))
       |SELECT vd.oid AS oid, count(*) AS n
       |FROM walks JOIN vertices vd ON vd.id = walks.v
       |GROUP BY vd.oid""".stripMargin

  /** `cap(tag)` twin: `g.V().has('oid', TextP.startingWith(prefix))
    * .out().aggregate('x').cap('x')` — the collected bulk set rendered
    * as (oid, n): each landing vertex with the number of traversers
    * (distinct (src,dst) edge rows from the seed set) that reached it.
    */
  def capSql(sf: Double, prefix: String): String =
    s"""WITH ${SynthSql.graphCtes(sf)}
       |SELECT vd.oid AS oid, count(*) AS n
       |FROM dedges e
       |JOIN vertices vs ON vs.id = e.src
       |JOIN vertices vd ON vd.id = e.dst
       |WHERE vs.oid LIKE '$prefix%'
       |GROUP BY vd.oid""".stripMargin

  /** `cyclicPath()` twin: 2-hop walks (v0, v1, v2) from the seed set
    * whose path revisits a vertex (v2 = v0, v1 = v0 or v2 = v1 — the
    * latter two only fire on self-loops, kept for generality), counted
    * per landing oid.
    */
  def cyclicSql(sf: Double, prefix: String): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |walks AS (
       |  SELECT e2.dst AS v FROM dedges e1
       |  JOIN vertices vs ON vs.id = e1.src
       |  JOIN dedges e2 ON e2.src = e1.dst
       |  WHERE vs.oid LIKE '$prefix%'
       |    AND (e2.dst = e1.src OR e1.dst = e1.src OR e2.dst = e2.src))
       |SELECT vd.oid AS oid, count(*) AS n
       |FROM walks JOIN vertices vd ON vd.id = walks.v
       |GROUP BY vd.oid""".stripMargin

  /** Predicated-emit twin: `g.V().has('oid', seed).repeat(__.out())
    * .emit(has('oid', TextP.startingWith(p))).times(2).groupCount()
    * .by('oid')` — round 1 emits only matching traversers, the final
    * round outputs every survivor (RepeatStep halt), bag semantics.
    */
  def emitSql(sf: Double, seed: String, prefix: String): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |s AS (SELECT id FROM vertices WHERE oid = '$seed'),
       |r1 AS MATERIALIZED (SELECT e.dst AS v FROM dedges e JOIN s ON e.src = s.id),
       |r2 AS (SELECT e.dst AS v FROM r1 JOIN dedges e ON e.src = r1.v),
       |outv AS (
       |  SELECT r1.v FROM r1 JOIN vertices vv ON vv.id = r1.v WHERE vv.oid LIKE '$prefix%'
       |  UNION ALL SELECT v FROM r2)
       |SELECT vd.oid AS oid, count(*) AS n
       |FROM outv JOIN vertices vd ON vd.id = outv.v
       |GROUP BY vd.oid""".stripMargin

  /** `g.V(ids)` point-lookup twin: 1-hop walks from an explicit oid set
    * (GlobalIdsScan / id IndexPredicate), counted per landing oid.
    * Unknown ids simply match nothing, as in TinkerPop.
    */
  def vidsSql(sf: Double, oids: Seq[String]): String = {
    val in = oids.map(o => s"'$o'").mkString(", ")
    s"""WITH ${SynthSql.graphCtes(sf)},
       |s AS (SELECT id FROM vertices WHERE oid IN ($in))
       |SELECT vd.oid AS oid, count(*) AS n
       |FROM dedges e JOIN s ON e.src = s.id
       |JOIN vertices vd ON vd.id = e.dst
       |GROUP BY vd.oid""".stripMargin
  }

  /** Deterministic `coin(p)` twin: source vertices pass iff
    * portableHash(oid) % 10000 falls under round(p·10000) — the exact
    * integer gate of `Traversal.coin` / `TextOps.mixtureKeep` — then
    * 1-hop walks counted per landing oid.
    */
  def coinSql(sf: Double, p: Double): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |kept AS (SELECT id FROM vertices WHERE ${LshSql.phash("oid")} % 10000 < ${math.round(p * 10000)}),
       |walks AS (SELECT e.dst AS v FROM dedges e JOIN kept ON e.src = kept.id)
       |SELECT vd.oid AS oid, count(*) AS n
       |FROM walks JOIN vertices vd ON vd.id = walks.v
       |GROUP BY vd.oid""".stripMargin

  /** `profile()` twin for the fixed chain `g.V().has('oid',
    * TextP.startingWith(prefix)).out().out().profile()`: the traverser
    * count after the source and after each step.
    */
  def profileSql(sf: Double, prefix: String): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |src AS MATERIALIZED (SELECT id FROM vertices WHERE oid LIKE '$prefix%'),
       |h1 AS MATERIALIZED (SELECT e.dst FROM dedges e JOIN src ON e.src = src.id)
       |SELECT CAST(0 AS BIGINT) AS step_idx, 'V' AS step,
       |       (SELECT count(*) FROM vertices) AS traversers
       |UNION ALL SELECT 1, 'has', (SELECT count(*) FROM src)
       |UNION ALL SELECT 2, 'out', (SELECT count(*) FROM h1)
       |UNION ALL SELECT 3, 'out',
       |  (SELECT count(*) FROM h1 JOIN dedges e2 ON e2.src = h1.dst)""".stripMargin

  /** `tree()` twin: the distinct path prefixes of the COMPLETED 2-hop
    * walks from the seed (TinkerPop tree() aggregates only traversers
    * that reach the step — a 1-hop neighbor with no out-edge contributes
    * no prefix), as (depth, path_str) rows in root-to-node order.
    */
  def treeSql(sf: Double, seed: String): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |s AS (SELECT id FROM vertices WHERE oid = '$seed'),
       |live1 AS MATERIALIZED (
       |  SELECT DISTINCT e1.dst FROM dedges e1
       |  JOIN s ON e1.src = s.id
       |  WHERE EXISTS (SELECT 1 FROM dedges e2 WHERE e2.src = e1.dst)),
       |p2 AS (SELECT DISTINCT '$seed' || '>' || va.oid AS path_str
       |       FROM live1 JOIN vertices va ON va.id = live1.dst),
       |p3 AS (SELECT DISTINCT '$seed' || '>' || va.oid || '>' || vb.oid AS path_str
       |       FROM live1
       |       JOIN dedges e2 ON e2.src = live1.dst
       |       JOIN vertices va ON va.id = live1.dst
       |       JOIN vertices vb ON vb.id = e2.dst)
       |SELECT CAST(1 AS BIGINT) AS depth, '$seed' AS path_str
       |WHERE EXISTS (SELECT 1 FROM live1)
       |UNION ALL SELECT CAST(2 AS BIGINT), path_str FROM p2
       |UNION ALL SELECT CAST(3 AS BIGINT), path_str FROM p3""".stripMargin

  /** Mid-traversal `hasId`/`hasNot`/`has(key)` twin:
    * `g.V().out().hasId(ids).hasNot('nickname').has('oid').in()
    * .groupCount().by('oid')` — 1-hop landings whose vertex oid is in
    * the id set (hasNot of a non-schema key and has('oid') over the
    * total closed schema are no-ops), reverse-expanded one hop, counted
    * per landing oid. Bag semantics throughout.
    */
  def hasIdSql(sf: Double, oids: Seq[String]): String = {
    val in = oids.map(o => s"'$o'").mkString(", ")
    s"""WITH ${SynthSql.graphCtes(sf)},
       |mid AS MATERIALIZED (
       |  SELECT e1.dst AS v FROM dedges e1
       |  JOIN vertices vm ON vm.id = e1.dst
       |  WHERE vm.oid IN ($in)),
       |walks AS (SELECT e2.src AS v FROM mid JOIN dedges e2 ON e2.dst = mid.v)
       |SELECT vd.oid AS oid, count(*) AS n
       |FROM walks JOIN vertices vd ON vd.id = walks.v
       |GROUP BY vd.oid""".stripMargin
  }

  /** `elementMap()` twin: dense id + the full (closed-schema) property
    * map of the selected vertices — the id plane is the deterministic
    * oid rank shared by both engines.
    */
  def elementMapSql(sf: Double, oids: Seq[String]): String = {
    val in = oids.map(o => s"'$o'").mkString(", ")
    s"""WITH ${SynthSql.graphCtes(sf)}
       |SELECT id, oid FROM vertices WHERE oid IN ($in)""".stripMargin
  }

  /** `properties('oid')` twin over a 1-hop expansion: one (key, value)
    * row per traverser — bag semantics, duplicates preserved.
    */
  def propertiesSql(sf: Double, seed: String): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |s AS (SELECT id FROM vertices WHERE oid = '$seed')
       |SELECT 'oid' AS key, vd.oid AS value
       |FROM dedges e JOIN s ON e.src = s.id
       |JOIN vertices vd ON vd.id = e.dst""".stripMargin

  /** Twin of the GSL driver query `g.V().shuffle().batch(batchN)
    * .outV().sample(fTop).by('topk').outNeg().sample(fNeg).by('random')`
    * (graft.ml.Gsl): portable-hash-ordered source batch, per-(seed,
    * parent) weight-desc top-fTop hop (salt-free), then per-frontier-
    * vertex negative rejection draws with hop-1 salt — the exact
    * NegativeSample formula with parent as the draw seed.
    */
  def gslSql(
      sf: Double, batchN: Int, fTop: Int, fNeg: Int, attempts: Int = 8,
      pickSeed: Long = 42L): String = {
    val p = graft.text.TextOps.HashP
    val mm = graft.ml.Hll.Mask
    val salt2 = pickSeed * 1000003L + 7919L
    val slots = (0 until fNeg).map(j => s"($j)").mkString(", ")
    val ats = (0 until attempts).map(a => s"($a)").mkString(", ")
    val comp = s"((${LshSql.phash("npi.parent")} * 31 + $salt2 + " +
      s"sl.slot * 104729 + att.attempt * 15485863) % $p)"
    val keep = "parent, parent_id, slot, attempt"
    s"""WITH ${SynthSql.graphCtes(sf)},
       |src AS MATERIALIZED (
       |  SELECT v.oid AS seed, v.id AS seed_id FROM vertices v
       |  ORDER BY ${LshSql.phash("v.oid")} ASC, v.oid ASC LIMIT $batchN),
       |c1 AS (SELECT s.seed, e.src_oid AS parent, e.dst_oid AS child, e.weight
       |       FROM src s JOIN edges_oid e ON e.src_oid = s.seed),
       |p1 AS MATERIALIZED (
       |  SELECT seed, parent, child, CAST(rn - 1 AS INTEGER) AS pos FROM (
       |    SELECT seed, parent, child,
       |           row_number() OVER (PARTITION BY seed, parent
       |                              ORDER BY weight DESC, child) AS rn
       |    FROM c1) z WHERE rn <= $fTop),
       |fr2 AS MATERIALIZED (SELECT DISTINCT seed, child FROM p1),
       |np AS (SELECT DISTINCT child AS parent FROM fr2),
       |npi AS (SELECT np.parent, v.id AS parent_id
       |        FROM np JOIN vertices v ON v.oid = np.parent),
       |sl(slot) AS (VALUES $slots),
       |att(attempt) AS (VALUES $ats),
       |c2 AS (SELECT npi.parent, npi.parent_id, sl.slot, att.attempt, $comp AS v
       |       FROM npi CROSS JOIN sl CROSS JOIN att),
       |x1 AS (SELECT $keep, ((v * 2654435761) & $mm) AS v FROM c2),
       |x2 AS (SELECT $keep, xor(v, v >> 15) AS v FROM x1),
       |x3 AS (SELECT $keep, ((v * 2246822519) & $mm) AS v FROM x2),
       |x4 AS (SELECT $keep, xor(v, v >> 13) AS v FROM x3),
       |x5 AS (SELECT $keep, ((v * 3266489917) & $mm) AS v FROM x4),
       |x6 AS (SELECT $keep, xor(v, v >> 16) AS pick FROM x5),
       |d0 AS (SELECT $keep, pick % (SELECT count(*) FROM vertices) AS cand_id FROM x6),
       |kept AS (
       |  SELECT parent, slot, attempt, cand_id FROM d0
       |  WHERE cand_id <> parent_id
       |    AND EXISTS (SELECT 1 FROM dedges e WHERE e.dst = d0.cand_id)
       |    AND NOT EXISTS (SELECT 1 FROM dedges e
       |                    WHERE e.src = d0.parent_id AND e.dst = d0.cand_id)),
       |pk AS (
       |  SELECT parent, slot, cand_id FROM (
       |    SELECT parent, slot, cand_id,
       |           row_number() OVER (PARTITION BY parent, slot ORDER BY attempt) AS rn
       |    FROM kept) z WHERE rn = 1),
       |negr AS (SELECT fr2.seed, fr2.child AS parent, pk.slot AS pos, v.oid AS child_oid
       |         FROM fr2 JOIN pk ON pk.parent = fr2.child
       |         JOIN vertices v ON v.id = pk.cand_id)
       |SELECT seed AS seed_oid, 1 AS hop, parent AS parent_oid,
       |       child AS child_oid, pos, 'nbr' AS kind FROM p1
       |UNION ALL
       |SELECT seed, 2, parent, child_oid, pos, 'neg' FROM negr""".stripMargin
  }

  /** Twin of the edge-source GSL driver query `g.E().shuffle()
    * .batch(batchN).outV().outNeg().sample(fNeg).by('random')`: a
    * portable-hash-ordered edge batch (the edge_sampler positive
    * stream), endpoint jump to the distinct source vertices, then the
    * NegativeSample rejection draws with hop-0 salt.
    */
  def gslEdgeSql(
      sf: Double, batchN: Int, fNeg: Int, attempts: Int = 8,
      pickSeed: Long = 42L): String = {
    val p = graft.text.TextOps.HashP
    val mm = graft.ml.Hll.Mask
    val salt = pickSeed * 1000003L
    val slots = (0 until fNeg).map(j => s"($j)").mkString(", ")
    val ats = (0 until attempts).map(a => s"($a)").mkString(", ")
    val comp = s"((${LshSql.phash("npi.parent")} * 31 + $salt + " +
      s"sl.slot * 104729 + att.attempt * 15485863) % $p)"
    val keep = "parent, parent_id, slot, attempt"
    s"""WITH ${SynthSql.graphCtes(sf)},
       |eb AS MATERIALIZED (
       |  SELECT e.src_oid, e.dst_oid FROM edges_oid e
       |  ORDER BY ${LshSql.phash("e.src_oid || '>' || e.dst_oid")} ASC,
       |           e.src_oid ASC, e.dst_oid ASC LIMIT $batchN),
       |np AS (SELECT DISTINCT src_oid AS parent FROM eb),
       |npi AS (SELECT np.parent, v.id AS parent_id
       |        FROM np JOIN vertices v ON v.oid = np.parent),
       |sl(slot) AS (VALUES $slots),
       |att(attempt) AS (VALUES $ats),
       |c2 AS (SELECT npi.parent, npi.parent_id, sl.slot, att.attempt, $comp AS v
       |       FROM npi CROSS JOIN sl CROSS JOIN att),
       |x1 AS (SELECT $keep, ((v * 2654435761) & $mm) AS v FROM c2),
       |x2 AS (SELECT $keep, xor(v, v >> 15) AS v FROM x1),
       |x3 AS (SELECT $keep, ((v * 2246822519) & $mm) AS v FROM x2),
       |x4 AS (SELECT $keep, xor(v, v >> 13) AS v FROM x3),
       |x5 AS (SELECT $keep, ((v * 3266489917) & $mm) AS v FROM x4),
       |x6 AS (SELECT $keep, xor(v, v >> 16) AS pick FROM x5),
       |d0 AS (SELECT $keep, pick % (SELECT count(*) FROM vertices) AS cand_id FROM x6),
       |kept AS (
       |  SELECT parent, slot, attempt, cand_id FROM d0
       |  WHERE cand_id <> parent_id
       |    AND EXISTS (SELECT 1 FROM dedges e WHERE e.dst = d0.cand_id)
       |    AND NOT EXISTS (SELECT 1 FROM dedges e
       |                    WHERE e.src = d0.parent_id AND e.dst = d0.cand_id)),
       |pk AS (
       |  SELECT parent, slot, cand_id FROM (
       |    SELECT parent, slot, cand_id,
       |           row_number() OVER (PARTITION BY parent, slot ORDER BY attempt) AS rn
       |    FROM kept) z WHERE rn = 1)
       |SELECT pk.parent AS seed_oid, 1 AS hop, pk.parent AS parent_oid,
       |       v.oid AS child_oid, pk.slot AS pos, 'neg' AS kind
       |FROM pk JOIN vertices v ON v.id = pk.cand_id""".stripMargin
  }

  /** `mean(local)` twin over `group().by(oid).by(values('weight')
    * .fold())`: per-landing-oid mean out-edge weight from prefix-matched
    * sources. The folded weights are integral doubles, so the sum is
    * exact and the single division matches bit-for-bit; both engines
    * round to 6 dp.
    */
  def localMeanSql(sf: Double, prefix: String): String =
    s"""WITH ${SynthSql.graphCtes(sf)}
       |SELECT vd.oid AS oid, round(sum(e.weight)/count(*), 6) AS mean_local
       |FROM dedges e
       |JOIN vertices vs ON vs.id = e.src
       |JOIN vertices vd ON vd.id = e.dst
       |WHERE vs.oid LIKE '$prefix%'
       |GROUP BY vd.oid""".stripMargin

  /** Twin of `NeighborSample.sampleEdgeWeight` / `sampleByInDegree`
    * (graphlearn probability strategies, `graph_sampling_en.rst`
    * strategy table): per hop, per parent, children own [lo, lo+w)
    * intervals in the deterministic (portableHash(child), child)
    * layout order; slot j draws
    * u = avalanche((phash(parent)·31 + salt_h + j·104729) % p) % W and
    * takes the containing interval. w = Σ edge weight (integral
    * occurrence counts) or the child's global in-degree. The oracle
    * lays intervals out with ONE per-parent window (fine at sf0.01);
    * the engine side is a two-phase hash-RANGE-bucketed prefix sum +
    * binned range join — result-identical because (bucket asc, hash
    * asc) is the same global (hash, child) order.
    */
  def neighborWeightedSql(
      sf: Double, seeds: Seq[String], fanouts: Seq[Int], byInDegree: Boolean,
      pickSeed: Long = 42L): String = {
    val p = graft.text.TextOps.HashP
    val mm = graft.ml.Hll.Mask
    val sv = seeds.map(s => s"('$s')").mkString(", ")
    val keep = "parent, tw, slot"
    val body = fanouts.zipWithIndex.map { case (f, h) =>
      val prev = if (h == 0) "f0" else s"fr$h"
      val salt = pickSeed * 1000003L + h * 7919L
      val slots = (0 until f).map(j => s"($j)").mkString(", ")
      val aw =
        if (byInDegree)
          s"""aw$h AS (
             |  SELECT pc.parent, pc.child, ind.w FROM (
             |    SELECT DISTINCT pr.parent, e.dst_oid AS child
             |    FROM pr$h pr JOIN edges_oid e ON e.src_oid = pr.parent) pc
             |  JOIN ind ON ind.child = pc.child)""".stripMargin
        else
          s"""aw$h AS (
             |  SELECT pr.parent, e.dst_oid AS child, CAST(sum(e.weight) AS BIGINT) AS w
             |  FROM pr$h pr JOIN edges_oid e ON e.src_oid = pr.parent
             |  GROUP BY pr.parent, e.dst_oid
             |  HAVING CAST(sum(e.weight) AS BIGINT) > 0)""".stripMargin
      val comp = s"((${LshSql.phash("pr.parent")} * 31 + $salt + sl.slot * 104729) % $p)"
      s"""pr$h AS (SELECT DISTINCT parent FROM $prev),
         |$aw,
         |cum$h AS (
         |  SELECT parent, child, w,
         |         sum(w) OVER (PARTITION BY parent
         |                      ORDER BY ${LshSql.phash("child")}, child)
         |           - w AS lo
         |  FROM aw$h),
         |tw$h AS (SELECT parent, sum(w) AS tw FROM aw$h GROUP BY parent),
         |sl$h(slot) AS (VALUES $slots),
         |c$h AS (SELECT pr.parent, tw.tw, sl.slot, $comp AS v
         |        FROM pr$h pr JOIN tw$h tw ON tw.parent = pr.parent
         |        CROSS JOIN sl$h sl),
         |x${h}1 AS (SELECT $keep, ((v * 2654435761) & $mm) AS v FROM c$h),
         |x${h}2 AS (SELECT $keep, xor(v, v >> 15) AS v FROM x${h}1),
         |x${h}3 AS (SELECT $keep, ((v * 2246822519) & $mm) AS v FROM x${h}2),
         |x${h}4 AS (SELECT $keep, xor(v, v >> 13) AS v FROM x${h}3),
         |x${h}5 AS (SELECT $keep, ((v * 3266489917) & $mm) AS v FROM x${h}4),
         |x${h}6 AS (SELECT $keep, xor(v, v >> 16) AS pick FROM x${h}5),
         |d$h AS (SELECT parent, slot, pick % tw AS u FROM x${h}6),
         |k$h AS (SELECT d.parent, d.slot, c.child
         |        FROM d$h d JOIN cum$h c
         |          ON c.parent = d.parent AND d.u >= c.lo AND d.u < c.lo + c.w),
         |p$h AS MATERIALIZED (
         |  SELECT fr.seed, k.parent, k.child, k.slot
         |  FROM $prev fr JOIN k$h k ON k.parent = fr.parent),
         |fr${h + 1} AS (SELECT DISTINCT seed, child AS parent FROM p$h)""".stripMargin
    }.mkString(",\n")
    val sel = fanouts.indices.map(h =>
      s"SELECT seed AS seed_oid, ${h + 1} AS hop, parent AS parent_oid, " +
        s"child AS child_oid, slot FROM p$h")
      .mkString("\nUNION ALL\n")
    s"""WITH ${SynthSql.graphCtes(sf)},
       |ind AS (SELECT dst_oid AS child, count(*) AS w FROM edges_oid GROUP BY dst_oid),
       |sd(seed) AS (VALUES $sv),
       |f0 AS (SELECT seed, seed AS parent FROM sd),
       |$body
       |$sel""".stripMargin
  }

  /** Twin of `NegativeSample.sampleInDegree` (graphlearn
    * `strategy="in_degree"`): each candidate owns the interval
    * [lo, lo+indeg) in dense-id order over [0, |E|); an attempt draws
    * u = avalanche(composite) % |E| and selects the containing interval
    * (per-attempt draw probability exactly indeg/|E|), then the same
    * rejection chain as `SynthSql5.negativeSampleSql` (reject self and
    * out-neighbors, first surviving attempt per slot). The oracle uses
    * a plain ORDER BY id window + inequality join; the engine side is a
    * bucket-partitioned prefix sum + binned range join —
    * result-identical because the intervals partition [0, |E|).
    */
  def negativeInDegreeSql(
      sf: Double, seeds: Seq[String], f: Int, attempts: Int = 8,
      pickSeed: Long = 42L, byNodeWeight: Boolean = false): String = {
    val p = graft.text.TextOps.HashP
    val mm = graft.ml.Hll.Mask
    val salt = pickSeed * 1000003L + 7919L
    val sv = seeds.map(s => s"('$s')").mkString(", ")
    val slots = (0 until f).map(j => s"($j)").mkString(", ")
    val ats = (0 until attempts).map(a => s"($a)").mkString(", ")
    // node_weight analog: the vertex's weight = weighted in-strength
    // (Σ incoming occurrence counts) instead of the plain in-degree
    val w = if (byNodeWeight) "CAST(sum(weight) AS BIGINT)" else "count(*)"
    val t = if (byNodeWeight) "CAST(sum(weight) AS BIGINT)" else "count(*)"
    val comp = s"((${LshSql.phash("sdi.seed")} * 31 + $salt + " +
      s"sl.slot * 104729 + at.attempt * 15485863) % $p)"
    val keep = "seed, seed_id, slot, attempt"
    s"""WITH ${SynthSql.graphCtes(sf)},
       |sd(seed) AS (VALUES $sv),
       |sdi AS (SELECT sd.seed, v.id AS seed_id FROM sd JOIN vertices v ON v.oid = sd.seed),
       |indeg AS (SELECT dst AS id, $w AS wgt FROM dedges GROUP BY dst HAVING $w > 0),
       |cum AS (SELECT id, wgt, sum(wgt) OVER (ORDER BY id) - wgt AS lo FROM indeg),
       |tot AS (SELECT $t AS t FROM dedges),
       |sl(slot) AS (VALUES $slots),
       |at(attempt) AS (VALUES $ats),
       |c0 AS (SELECT sdi.seed, sdi.seed_id, sl.slot, at.attempt, $comp AS v
       |       FROM sdi CROSS JOIN sl CROSS JOIN at),
       |x1 AS (SELECT $keep, ((v * 2654435761) & $mm) AS v FROM c0),
       |x2 AS (SELECT $keep, xor(v, v >> 15) AS v FROM x1),
       |x3 AS (SELECT $keep, ((v * 2246822519) & $mm) AS v FROM x2),
       |x4 AS (SELECT $keep, xor(v, v >> 13) AS v FROM x3),
       |x5 AS (SELECT $keep, ((v * 3266489917) & $mm) AS v FROM x4),
       |x6 AS (SELECT $keep, xor(v, v >> 16) AS pick FROM x5),
       |d0 AS (SELECT $keep, pick % (SELECT t FROM tot) AS u FROM x6),
       |cd AS (SELECT seed, seed_id, slot, attempt, c.id AS cand_id
       |       FROM d0 JOIN cum c ON d0.u >= c.lo AND d0.u < c.lo + c.wgt),
       |kept AS (
       |  SELECT seed, slot, attempt, cand_id FROM cd
       |  WHERE cand_id <> seed_id
       |    AND NOT EXISTS (SELECT 1 FROM dedges e
       |                    WHERE e.src = cd.seed_id AND e.dst = cd.cand_id)),
       |pk AS (
       |  SELECT seed, slot, cand_id FROM (
       |    SELECT seed, slot, cand_id,
       |           row_number() OVER (PARTITION BY seed, slot ORDER BY attempt) AS rn
       |    FROM kept) z WHERE rn = 1)
       |SELECT pk.seed AS seed_oid, pk.slot AS slot, v.oid AS neg_oid
       |FROM pk JOIN vertices v ON v.id = pk.cand_id""".stripMargin
  }
}
