package graft.synth

/** DuckDB-SQL twin of [[Synth]] + the graph derivation + unrolled
  * iterative algorithms.
  *
  * Because every synthesized value is pure 64-bit-safe integer arithmetic,
  * the exact transcript table — and everything derived from it, including
  * fixed-round PageRank/CDLP and converged WCC/triangles — can be stated
  * as a single DuckDB SELECT. That turns the driver's DuckDB oracle into a
  * *full* end-to-end check of the north-rule pipeline (transcripts →
  * edges → dense ids → algorithm), not a weak rows-only check.
  *
  * Iteration is unrolled as chained CTEs (r0..rK) because recursive CTEs
  * cannot carry grouped aggregates portably; round counts are fixed and
  * must match the Spark-side query parameters in `SparkEntry`.
  */
object SynthSql {

  private def H(i: String) =
    s"((CAST(c AS BIGINT)*1000003 + CAST($i AS BIGINT)*7919 + 12345) % 1000000007)"
  private def isA(i: String) = s"(((($i)%2)=1) AND (${H(s"400000+($i)")}%6 <> 0))"
  private def toolInv(i: String) = s"(${H(s"600000+($i)")}%4 = 0)"
  private def toolId(i: String) = s"((${H(s"700000+($i)")}%64) & (${H(s"800000+($i)")}%64))"

  /** CTE chain producing `transcripts(conv_id, turn_idx, role, text, tool, ts)`. */
  def transcriptsCtes(sf: Double): String = {
    val nConv = Synth.nConvs(sf)
    val nAgent = Synth.nAgents(sf)
    val nUser = Synth.nUsers(sf)
    val nAssist = Synth.nAssistants(sf)
    val role =
      s"""CASE WHEN ${isA("i")} THEN (CASE WHEN ${H("300000+i")}%3 = 0 THEN 'assistant' ELSE 'assistant:' || CAST(${H("310000+i")}%$nAssist AS VARCHAR) END)
         |     WHEN i = 0 THEN (CASE WHEN ${H("51")}%13 = 0 THEN 'system' ELSE 'u' || CAST(c % $nUser AS VARCHAR) END)
         |     WHEN ${H("i")}%10 = 0 THEN 'agent:' || CAST(${H("200000+i")}%$nAgent AS VARCHAR)
         |     WHEN (${H("i")}%10 IN (1,2)) AND ${isA("i-1")} AND ${toolInv("i-1")} THEN 'tool'
         |     ELSE 'u' || CAST(c % $nUser AS VARCHAR) END""".stripMargin
    s"""conv AS (SELECT unnest(generate_series(0, ${nConv - 1})) AS c),
       |raw AS MATERIALIZED (
       |  SELECT c, i FROM conv CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) ii
       |  WHERE i < 2 + ${H("1000000")}%7
       |          + (CASE WHEN ${H("1000001")}%10 = 0 THEN ${H("1000002")}%56 ELSE 0 END)
       |),
       |tr0 AS MATERIALIZED (SELECT c, i, $role AS role FROM raw),
       |transcripts AS MATERIALIZED (
       |  SELECT 'c' || lpad(CAST(c AS VARCHAR), 8, '0') AS conv_id,
       |         CAST(i AS INTEGER) AS turn_idx,
       |         role,
       |         'txt-' || CAST(c AS VARCHAR) || '-' || CAST(i AS VARCHAR) || '-' ||
       |             CAST(${H("900000+i")}%100000 AS VARCHAR) AS text,
       |         CASE WHEN ${isA("i")} AND ${toolInv("i")} THEN 't' || CAST(${toolId("i")} AS VARCHAR)
       |              WHEN role = 'tool' THEN 't' || CAST(${toolId("i-1")} AS VARCHAR)
       |              ELSE NULL END AS tool,
       |         epoch_ms((${Synth.BaseEpochSec} + c*300 + i) * 1000) AS ts
       |  FROM tr0
       |)""".stripMargin
  }

  /** CTEs deriving the link graph: edges_oid, vertices (dense ids = oid
    * rank), dedges. Mirrors `GraphBuilder` exactly.
    */
  def graphCtes(sf: Double): String =
    s"""${transcriptsCtes(sf)},
       |turns AS MATERIALIZED (
       |  SELECT conv_id, turn_idx, role, tool,
       |         CASE WHEN role = 'tool' AND tool IS NOT NULL THEN 'tool:' || tool ELSE role END AS oid
       |  FROM transcripts
       |),
       |reply0 AS MATERIALIZED (
       |  SELECT lag(oid) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS src_oid, oid AS dst_oid
       |  FROM turns
       |),
       |reply AS (SELECT src_oid, dst_oid FROM reply0 WHERE src_oid IS NOT NULL AND src_oid <> dst_oid),
       |invoke AS (
       |  SELECT role AS src_oid, 'tool:' || tool AS dst_oid
       |  FROM turns WHERE role LIKE 'assistant%' AND tool IS NOT NULL
       |),
       |edges_oid AS MATERIALIZED (
       |  SELECT src_oid, dst_oid, CAST(count(*) AS DOUBLE) AS weight
       |  FROM (SELECT * FROM reply UNION ALL SELECT * FROM invoke) u
       |  GROUP BY src_oid, dst_oid
       |),
       |voids AS MATERIALIZED (
       |  SELECT DISTINCT oid FROM (
       |    SELECT oid FROM turns
       |    UNION ALL SELECT src_oid FROM edges_oid
       |    UNION ALL SELECT dst_oid FROM edges_oid) x
       |),
       |vertices AS MATERIALIZED (SELECT (row_number() OVER (ORDER BY oid)) - 1 AS id, oid FROM voids),
       |dedges AS MATERIALIZED (
       |  SELECT vs.id AS src, vd.id AS dst, e.weight AS weight
       |  FROM edges_oid e
       |  JOIN vertices vs ON e.src_oid = vs.oid
       |  JOIN vertices vd ON e.dst_oid = vd.oid
       |)""".stripMargin

  def edgesSql(sf: Double): String =
    s"WITH ${graphCtes(sf)} SELECT src_oid, dst_oid, weight FROM edges_oid"

  def degreesSql(sf: Double): String =
    s"""WITH ${graphCtes(sf)}
       |SELECT v.oid AS oid,
       |       CAST(coalesce(o.od, 0) AS BIGINT) AS out_deg,
       |       CAST(coalesce(i.idg, 0) AS BIGINT) AS in_deg
       |FROM vertices v
       |LEFT JOIN (SELECT src, count(*) AS od FROM dedges GROUP BY src) o ON v.id = o.src
       |LEFT JOIN (SELECT dst, count(*) AS idg FROM dedges GROUP BY dst) i ON v.id = i.dst""".stripMargin

  /** Fixed-round damped PageRank with dangling redistribution, unrolled. */
  def pageRankSql(sf: Double, rounds: Int, damping: Double = 0.85): String = {
    val n = "(SELECT n FROM nv)"
    val body = (1 to rounds).map { k =>
      val p = s"r${k - 1}"
      s"""d$k AS MATERIALIZED (
         |  SELECT coalesce(sum(r), 0.0) AS ds FROM $p LEFT JOIN outd ON $p.id = outd.src
         |  WHERE outd.src IS NULL
         |),
         |r$k AS MATERIALIZED (
         |  SELECT v.id,
         |         ((1.0 - $damping)/$n) + $damping*((SELECT ds FROM d$k)/$n)
         |           + $damping*coalesce(m.s, 0.0) AS r
         |  FROM vertices v LEFT JOIN (
         |    SELECT e.dst AS id, sum(p.r/o.od) AS s
         |    FROM dedges e JOIN $p p ON e.src = p.id JOIN outd o ON o.src = e.src
         |    GROUP BY e.dst) m ON v.id = m.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${graphCtes(sf)},
       |outd AS MATERIALIZED (SELECT src, count(*) AS od FROM dedges GROUP BY src),
       |nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices),
       |r0 AS (SELECT id, 1.0/$n AS r FROM vertices),
       |$body
       |SELECT v.oid AS oid, round(r$rounds.r, 6) AS pr
       |FROM vertices v JOIN r$rounds ON v.id = r$rounds.id""".stripMargin
  }

  /** Twin of the WEIGHTED PageRank (nx `pagerank` on a weighted graph:
    * contributions split ∝ edge weight / Σ out-weights): same unrolled
    * recurrence as [[pageRankSql]], the out-degree CTE sums weights and
    * the message term carries the per-edge fraction.
    */
  def pageRankWeightedSql(sf: Double, rounds: Int, damping: Double = 0.85): String = {
    val n = "(SELECT n FROM nv)"
    val body = (1 to rounds).map { k =>
      val p = s"r${k - 1}"
      s"""d$k AS MATERIALIZED (
         |  SELECT coalesce(sum(r), 0.0) AS ds FROM $p LEFT JOIN outd ON $p.id = outd.src
         |  WHERE outd.src IS NULL
         |),
         |r$k AS MATERIALIZED (
         |  SELECT v.id,
         |         ((1.0 - $damping)/$n) + $damping*((SELECT ds FROM d$k)/$n)
         |           + $damping*coalesce(m.s, 0.0) AS r
         |  FROM vertices v LEFT JOIN (
         |    SELECT e.dst AS id, sum((e.weight/o.od) * p.r) AS s
         |    FROM dedges e JOIN $p p ON e.src = p.id JOIN outd o ON o.src = e.src
         |    GROUP BY e.dst) m ON v.id = m.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${graphCtes(sf)},
       |outd AS MATERIALIZED (SELECT src, sum(weight) AS od FROM dedges GROUP BY src),
       |nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices),
       |r0 AS (SELECT id, 1.0/$n AS r FROM vertices),
       |$body
       |SELECT v.oid AS oid, round(r$rounds.r, 6) AS pr
       |FROM vertices v JOIN r$rounds ON v.id = r$rounds.id""".stripMargin
  }

  /** HashMin WCC unrolled `rounds` times. The synthesized graph is
    * small-world (hub assistant/tools + dense replica mixing), so 30
    * rounds converges with a wide margin — verified at build time by
    * checking rounds vs rounds+1 produce identical output; the Spark side
    * iterates to an exact fixpoint.
    */
  def wccSql(sf: Double, rounds: Int = 30): String = {
    val body = (1 to rounds).map { k =>
      val p = s"c${k - 1}"
      s"""c$k AS MATERIALIZED (
         |  SELECT v.id, least(p.comp, coalesce(m.mc, p.comp)) AS comp
         |  FROM vertices v JOIN $p p ON v.id = p.id
         |  LEFT JOIN (
         |    SELECT u.b AS id, min(pc.comp) AS mc
         |    FROM und u JOIN $p pc ON u.a = pc.id GROUP BY u.b) m ON m.id = v.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${graphCtes(sf)},
       |und AS MATERIALIZED (SELECT DISTINCT a, b FROM (
       |  SELECT src AS a, dst AS b FROM dedges WHERE src <> dst
       |  UNION ALL SELECT dst, src FROM dedges WHERE src <> dst) x),
       |c0 AS (SELECT id, id AS comp FROM vertices),
       |$body
       |SELECT v.oid AS oid, cv.oid AS comp_oid
       |FROM vertices v JOIN c$rounds ON v.id = c$rounds.id
       |JOIN vertices cv ON c$rounds.comp = cv.id""".stripMargin
  }

  /** Synchronous CDLP unrolled: smallest-most-frequent neighbor label. */
  def cdlpSql(sf: Double, rounds: Int): String = {
    val body = (1 to rounds).map { k =>
      val p = s"l${k - 1}"
      s"""l$k AS MATERIALIZED (
         |  SELECT v.id, coalesce(w.lab, p.lab) AS lab
         |  FROM vertices v JOIN $p p ON v.id = p.id
         |  LEFT JOIN (
         |    SELECT id, lab FROM (
         |      SELECT u.v AS id, l.lab AS lab, count(*) AS cnt,
         |             row_number() OVER (PARTITION BY u.v ORDER BY count(*) DESC, l.lab ASC) AS rn
         |      FROM nbrs u JOIN $p l ON u.nbr = l.id
         |      GROUP BY u.v, l.lab) z
         |    WHERE rn = 1) w ON w.id = v.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${graphCtes(sf)},
       |nbrs AS MATERIALIZED (
       |  SELECT src AS v, dst AS nbr FROM dedges WHERE src <> dst
       |  UNION ALL SELECT dst, src FROM dedges WHERE src <> dst),
       |l0 AS (SELECT id, id AS lab FROM vertices),
       |$body
       |SELECT v.oid AS oid, lv.oid AS label_oid
       |FROM vertices v JOIN l$rounds ON v.id = l$rounds.id
       |JOIN vertices lv ON l$rounds.lab = lv.id""".stripMargin
  }

  /** Per-vertex triangle counts via degree-ordered orientation. */
  def trianglesSql(sf: Double): String =
    s"""WITH ${graphCtes(sf)},
       |und1 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |         FROM dedges WHERE src <> dst),
       |degt AS MATERIALIZED (SELECT v, count(*) AS d FROM (
       |  SELECT a AS v FROM und1 UNION ALL SELECT b AS v FROM und1) x GROUP BY v),
       |ore AS MATERIALIZED (
       |  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND a < b) THEN a ELSE b END AS src,
       |         CASE WHEN (da.d < db.d) OR (da.d = db.d AND a < b) THEN b ELSE a END AS dst,
       |         CASE WHEN (da.d < db.d) OR (da.d = db.d AND a < b) THEN db.d ELSE da.d END AS dd
       |  FROM und1 JOIN degt da ON und1.a = da.v JOIN degt db ON und1.b = db.v),
       |wedges AS MATERIALIZED (
       |  SELECT e1.src AS s, e1.dst AS v, e2.dst AS w
       |  FROM ore e1 JOIN ore e2 ON e1.src = e2.src
       |  WHERE (e1.dd < e2.dd) OR (e1.dd = e2.dd AND e1.dst < e2.dst)),
       |tri AS MATERIALIZED (SELECT s, v, w FROM wedges
       |        WHERE EXISTS (SELECT 1 FROM ore e3 WHERE e3.src = wedges.v AND e3.dst = wedges.w)),
       |tcnt AS (SELECT id, count(*) AS t FROM (
       |  SELECT s AS id FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri) x
       |  GROUP BY id)
       |SELECT ver.oid AS oid, CAST(coalesce(tcnt.t, 0) AS BIGINT) AS triangles
       |FROM vertices ver LEFT JOIN tcnt ON ver.id = tcnt.id""".stripMargin
}
