package graft.synth

/** DuckDB oracle SQL for the second wave: SSSP/BFS (unrolled relax),
  * HITS (unrolled normalized power iteration), clustering/centrality/
  * assortativity closed forms, pattern/path-expand traversals over the
  * derived graph, and the text/dedup/similarity plane over the driver's
  * `documents`/`embeddings` parquet tables.
  */
object SynthSql2 {

  /** Weighted SSSP from the global "assistant" hub, `rounds` unrolled
    * Bellman-Ford relaxations (weights ≥ 1 ⇒ hop count of a shortest path
    * is bounded by its cost; 25 rounds is verified converged at build
    * time by a rounds-vs-rounds+1 diff). Output (oid, dist) with
    * unreachable = NULL.
    */
  def ssspSql(sf: Double, rounds: Int = 25): String = {
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
       |$body
       |SELECT v.oid AS oid, round(s$rounds.dist, 6) AS dist
       |FROM vertices v JOIN s$rounds ON v.id = s$rounds.id""".stripMargin
  }

  /** BFS levels from "assistant" over out-edges, `rounds` unrolled. */
  def bfsSql(sf: Double, rounds: Int = 15): String = {
    val body = (1 to rounds).map { k =>
      val p = s"b${k - 1}"
      s"""b$k AS MATERIALIZED (
         |  SELECT v.id,
         |         CASE WHEN p.lvl IS NULL AND m.hit THEN $k ELSE p.lvl END AS lvl
         |  FROM vertices v JOIN $p p ON v.id = p.id
         |  LEFT JOIN (
         |    SELECT DISTINCT e.dst AS id, TRUE AS hit
         |    FROM dedges e JOIN $p p2 ON e.src = p2.id
         |    WHERE p2.lvl = ${k - 1}) m ON m.id = v.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${SynthSql.graphCtes(sf)},
       |b0 AS (SELECT id, CASE WHEN oid = 'assistant' THEN 0 ELSE NULL END AS lvl FROM vertices),
       |$body
       |SELECT v.oid AS oid, CAST(b$rounds.lvl AS BIGINT) AS level
       |FROM vertices v JOIN b$rounds ON v.id = b$rounds.id""".stripMargin
  }

  /** HITS unrolled `rounds` times with per-round L1 normalization. */
  def hitsSql(sf: Double, rounds: Int = 5): String = {
    val body = (1 to rounds).map { k =>
      val p = s"hh${k - 1}"
      s"""ar$k AS MATERIALIZED (
         |  SELECT v.id, coalesce(m.s, 0.0) AS araw
         |  FROM vertices v LEFT JOIN (
         |    SELECT e.dst AS id, sum(p.hub) AS s
         |    FROM dedges e JOIN $p p ON e.src = p.id GROUP BY e.dst) m ON v.id = m.id
         |),
         |asum$k AS (SELECT CASE WHEN sum(araw) = 0 THEN 1.0 ELSE sum(araw) END AS s FROM ar$k),
         |an$k AS MATERIALIZED (SELECT id, araw / (SELECT s FROM asum$k) AS auth FROM ar$k),
         |hr$k AS MATERIALIZED (
         |  SELECT v.id, coalesce(m.s, 0.0) AS hraw
         |  FROM vertices v LEFT JOIN (
         |    SELECT e.src AS id, sum(a.auth) AS s
         |    FROM dedges e JOIN an$k a ON e.dst = a.id GROUP BY e.src) m ON v.id = m.id
         |),
         |hsum$k AS (SELECT CASE WHEN sum(hraw) = 0 THEN 1.0 ELSE sum(hraw) END AS s FROM hr$k),
         |hh$k AS MATERIALIZED (
         |  SELECT a.id, a.auth, h.hraw / (SELECT s FROM hsum$k) AS hub
         |  FROM an$k a JOIN hr$k h ON a.id = h.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${SynthSql.graphCtes(sf)},
       |nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices),
       |hh0 AS (SELECT id, 1.0/(SELECT n FROM nv) AS auth, 1.0/(SELECT n FROM nv) AS hub FROM vertices),
       |$body
       |SELECT v.oid AS oid, round(h.auth, 6) AS auth, round(h.hub, 6) AS hub
       |FROM vertices v JOIN hh$rounds h ON v.id = h.id""".stripMargin
  }

  def degCentralitySql(sf: Double, mode: String = "both"): String = {
    val expr = mode match {
      case "in"  => "coalesce(i.idg, 0)"
      case "out" => "coalesce(o.od, 0)"
      case _     => "(coalesce(o.od, 0) + coalesce(i.idg, 0))"
    }
    s"""WITH ${SynthSql.graphCtes(sf)},
       |nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices)
       |SELECT v.oid AS oid,
       |       round($expr / ((SELECT n FROM nv) - 1), 6) AS centrality
       |FROM vertices v
       |LEFT JOIN (SELECT src, count(*) AS od FROM dedges GROUP BY src) o ON v.id = o.src
       |LEFT JOIN (SELECT dst, count(*) AS idg FROM dedges GROUP BY dst) i ON v.id = i.dst""".stripMargin
  }

  /** Numeric assortativity over length(oid) as the numeric attribute
    * (twin of `Paths3.numericAssortativityDf` — the Pearson reduction of
    * the reference's numeric mixing matrix).
    */
  def numericAssortSql(sf: Double): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |x AS (SELECT id, CAST(length(oid) AS DOUBLE) AS x FROM vertices)
       |SELECT round(corr(a.x, b.x), 6) AS numeric_assortativity
       |FROM dedges e JOIN x a ON e.src = a.id JOIN x b ON e.dst = b.id""".stripMargin

  /** Local clustering coefficient, sharing the triangles derivation. */
  def lccSql(sf: Double): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
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
       |tcnt AS MATERIALIZED (SELECT id, count(*) AS t FROM (
       |  SELECT s AS id FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri) x
       |  GROUP BY id)
       |SELECT ver.oid AS oid,
       |       round(CASE WHEN coalesce(dg.d, 0) < 2 THEN 0.0
       |             ELSE coalesce(tcnt.t, 0) * 2.0 / (dg.d * (dg.d - 1)) END, 6) AS lcc
       |FROM vertices ver
       |LEFT JOIN degt dg ON ver.id = dg.v
       |LEFT JOIN tcnt ON ver.id = tcnt.id""".stripMargin

  def avgDegConnectivitySql(sf: Double): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |und1 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |         FROM dedges WHERE src <> dst),
       |degt AS MATERIALIZED (SELECT v, count(*) AS d FROM (
       |  SELECT a AS v FROM und1 UNION ALL SELECT b AS v FROM und1) x GROUP BY v),
       |prs AS (SELECT a, b FROM und1 UNION ALL SELECT b, a FROM und1)
       |SELECT CAST(da.d AS BIGINT) AS degree, round(avg(CAST(db.d AS DOUBLE)), 6) AS avg_nbr_degree
       |FROM prs JOIN degt da ON prs.a = da.v JOIN degt db ON prs.b = db.v
       |GROUP BY da.d""".stripMargin

  def assortativitySql(sf: Double): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |und1 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |         FROM dedges WHERE src <> dst),
       |degt AS MATERIALIZED (SELECT v, count(*) AS d FROM (
       |  SELECT a AS v FROM und1 UNION ALL SELECT b AS v FROM und1) x GROUP BY v),
       |prs AS (SELECT a, b FROM und1 UNION ALL SELECT b, a FROM und1)
       |SELECT round(corr(CAST(da.d AS DOUBLE), CAST(db.d AS DOUBLE)), 6) AS assortativity
       |FROM prs JOIN degt da ON prs.a = da.v JOIN degt db ON prs.b = db.v""".stripMargin

  /** Declarative pattern (GIE Pattern op, `algebra.proto:350`): count
    * user → assistant-replica → tool invocation chains per tool.
    */
  def patternSql(sf: Double): String =
    s"""WITH ${SynthSql.graphCtes(sf)}
       |SELECT e2.dst_oid AS tool_oid, CAST(count(*) AS BIGINT) AS n_paths
       |FROM edges_oid e1
       |JOIN edges_oid e2 ON e1.dst_oid = e2.src_oid
       |WHERE e1.src_oid LIKE 'u%' AND e1.dst_oid LIKE 'assistant%'
       |  AND e2.dst_oid LIKE 'tool:%'
       |GROUP BY e2.dst_oid""".stripMargin

  /** PathExpand 1..2 hops (GIE `algebra.proto:287`): distinct vertices
    * reachable from tool:t0 within 2 directed hops.
    */
  def pathExpandSql(sf: Double): String =
    s"""WITH ${SynthSql.graphCtes(sf)},
       |h1 AS (SELECT DISTINCT dst_oid AS oid FROM edges_oid WHERE src_oid = 'tool:t0'),
       |h2 AS (SELECT DISTINCT e.dst_oid AS oid FROM edges_oid e JOIN h1 ON e.src_oid = h1.oid)
       |SELECT oid, CAST(min(hops) AS BIGINT) AS hops FROM (
       |  SELECT oid, 1 AS hops FROM h1
       |  UNION ALL SELECT oid, 2 AS hops FROM h2) x
       |WHERE oid <> 'tool:t0'
       |GROUP BY oid""".stripMargin

  /** k-core membership by unrolled peeling (reference `gs::KCore`,
    * `apps/kcore/kcore.h`): each round removes every vertex of undirected
    * simple degree < k; monotone, so a fixed unroll that reaches the
    * fixpoint equals the Spark loop (`rounds` vs `rounds+1` verified
    * identical at build time — the sf0.01 graph peels in 4 rounds at
    * k=30). Output = surviving vertices with their in-core degree.
    */
  def kcoreSql(sf: Double, k: Int, rounds: Int = 8): String = {
    val body = (1 to rounds).map { r =>
      val p = s"pe${r - 1}"
      s"""dg$r AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM $p GROUP BY a),
         |pe$r AS MATERIALIZED (
         |  SELECT a, b FROM $p
         |  WHERE a NOT IN (SELECT id FROM dg$r WHERE deg < $k)
         |    AND b NOT IN (SELECT id FROM dg$r WHERE deg < $k)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${SynthSql.graphCtes(sf)},
       |und1 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |         FROM dedges WHERE src <> dst),
       |pe0 AS MATERIALIZED (SELECT a, b FROM und1 UNION ALL SELECT b, a FROM und1),
       |$body
       |SELECT v.oid AS oid, c.deg AS deg FROM
       |  (SELECT a AS id, count(*) AS deg FROM pe$rounds GROUP BY a) c
       |JOIN vertices v ON v.id = c.id""".stripMargin
  }

  // ---- text / dedup / similarity over the driver's parquet tables ----

  private val toksSql =
    """list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"""

  def dedupNormSql: String =
    s"""WITH fp AS (
       |  SELECT doc_id,
       |         array_to_string(list_sort(list_distinct($toksSql)), ' ') AS f
       |  FROM documents)
       |SELECT min(doc_id) OVER (PARTITION BY f) AS canonical_id, doc_id FROM fp""".stripMargin

  /** Twin of `TextOps.gopherRules` (Gopher §A1.1 battery): word count
    * bounds, mean word length, '#'/'...'-symbol ratio, alpha-word
    * fraction, distinct-stopword count, and the conjunction. Integer
    * truncation goes through floor() (DuckDB CAST rounds; Spark's
    * truncates — values are nonnegative so floor == truncate).
    */
  def gopherSql(minWords: Int = 50, maxWords: Int = 100000): String = {
    val stopCase = graft.text.TextOps.GopherStopwords
      .map(w => s"(CASE WHEN list_contains(toks, '$w') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |st AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_aggregate(list_transform(toks, x -> length(x)), 'sum'), 0) AS BIGINT) AS sum_len,
       |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
       |    CAST(floor((length(text) - length(replace(text, '#', ''))) +
       |               (length(text) - length(replace(text, '...', ''))) / 3) AS BIGINT) AS n_sym,
       |    CAST($stopCase AS BIGINT) AS n_stopwords
       |  FROM t),
       |m AS (
       |  SELECT doc_id, n_words,
       |    CASE WHEN n_words > 0 THEN round(CAST(sum_len AS DOUBLE) / n_words, 6) ELSE 0.0 END AS mean_word_len,
       |    CASE WHEN n_words > 0 THEN round(CAST(n_alpha AS DOUBLE) / n_words, 6) ELSE 0.0 END AS frac_alpha,
       |    CASE WHEN n_words > 0 THEN round(CAST(n_sym AS DOUBLE) / n_words, 6) ELSE 0.0 END AS symbol_ratio,
       |    n_stopwords
       |  FROM st)
       |SELECT doc_id, n_words, mean_word_len, frac_alpha, symbol_ratio, n_stopwords,
       |  (n_words BETWEEN $minWords AND $maxWords
       |   AND mean_word_len BETWEEN 3.0 AND 10.0
       |   AND symbol_ratio <= 0.1
       |   AND frac_alpha >= 0.8
       |   AND n_stopwords >= 2) AS keep
       |FROM m""".stripMargin
  }

  /** Shared packing derivation for the concat-and-chunk twins (matches
    * `Packing.packChunks(docs, maxTokens, buckets)` exactly: portable-
    * hash bucketing, doc_id-ordered per-bucket running token sum).
    */
  private def packCtes(maxTokens: Int, buckets: Int): String =
    s"""t AS (SELECT doc_id,
       |  CAST(${LshSql.phash("CAST(doc_id AS VARCHAR)")} % $buckets AS BIGINT) AS bucket,
       |  CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, bucket, n_tokens,
       |  CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id) AS BIGINT) - n_tokens AS strt
       |  FROM t)""".stripMargin

  /** Twin of `Packing.packChunks`: per-document (bucket, seq, off)
    * assignment in the concat-and-chunk training stream.
    */
  def packChunksSql(maxTokens: Int, buckets: Int): String =
    s"""WITH ${packCtes(maxTokens, buckets)}
       |SELECT doc_id, bucket, n_tokens,
       |       strt // $maxTokens AS seq, strt % $maxTokens AS off
       |FROM c""".stripMargin

  /** Twin of `Packing.chunkStats` over the same packing. */
  def packStatsSql(maxTokens: Int, buckets: Int): String =
    s"""WITH ${packCtes(maxTokens, buckets)}
       |SELECT bucket, strt // $maxTokens AS seq,
       |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS stream_tokens
       |FROM c GROUP BY 1, 2""".stripMargin

  /** Twin of `Packing.tokenChunks` (RAG token-window chunking). */
  def tokenChunksSql(chunkTokens: Int, stride: Int): String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |st AS (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1, $stride)) AS s
       |       FROM t WHERE len(toks) > 0)
       |SELECT doc_id, s // $stride AS chunk_id,
       |       CAST(len(list_slice(toks, s + 1, s + $chunkTokens)) AS INTEGER) AS n_chunk_tokens,
       |       array_to_string(list_slice(toks, s + 1, s + $chunkTokens), ' ') AS chunk_text
       |FROM st""".stripMargin

  /** Twin of `TextOps.tfidfTop` (per-doc top-k tf-idf terms). */
  def tfidfTopSql(k: Int = 3): String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
       |tf AS MATERIALIZED (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |s AS (SELECT tf.doc_id, tf.term,
       |             round(tf * ln((SELECT n FROM nn) / df), 6) AS tfidf
       |      FROM tf JOIN dfq USING (term))
       |SELECT doc_id, term, tfidf FROM (
       |  SELECT doc_id, term, tfidf,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
       |  FROM s) z WHERE rn <= $k""".stripMargin

  def textStatsSql: String =
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
       |SELECT doc_id,
       |  CAST(length(text) AS INTEGER) AS n_chars,
       |  CAST(len(toks) AS INTEGER) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct_tokens,
       |  round(CASE WHEN len(toks) > 0
       |        THEN list_aggregate(list_transform(toks, x -> CAST(length(x) AS DOUBLE)), 'sum') / len(toks)
       |        ELSE 0.0 END, 4) AS avg_token_len,
       |  round(CASE WHEN length(text) > 0
       |        THEN CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
       |        ELSE 0.0 END, 4) AS punct_ratio
       |FROM t""".stripMargin

  def qualitySql: String =
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |st AS (
       |  SELECT doc_id,
       |    length(text) AS n_chars,
       |    len(toks) AS n_tokens,
       |    len(list_distinct(toks)) AS n_distinct,
       |    CASE WHEN length(text) > 0
       |         THEN CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
       |         ELSE 0.0 END AS punct_ratio
       |  FROM t)
       |SELECT doc_id,
       |  round((CASE WHEN n_chars BETWEEN 20 AND 20000 THEN 0.4 ELSE 0.0 END) +
       |        (CASE WHEN punct_ratio < 0.2 THEN 0.3 ELSE 0.0 END) +
       |        (CASE WHEN n_tokens > 0 AND CAST(n_distinct AS DOUBLE)/n_tokens > 0.5 THEN 0.3 ELSE 0.0 END), 2)
       |    AS quality
       |FROM st""".stripMargin

  def langIdSql(stopwords: Map[String, Seq[String]]): String = {
    val values = stopwords.toSeq.sortBy(_._1)
      .flatMap { case (l, ws) => ws.map(w => s"('$l','$w')") }.mkString(", ")
    s"""WITH sw(lang, word) AS (VALUES $values),
       |tok AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
       |hits AS (
       |  SELECT doc_id, lang, count(*) AS hits
       |  FROM tok JOIN sw ON tok.word = sw.word
       |  GROUP BY doc_id, lang),
       |best AS (
       |  SELECT doc_id, lang FROM (
       |    SELECT doc_id, lang,
       |           row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
       |    FROM hits) z WHERE rn = 1)
       |SELECT d.doc_id, coalesce(b.lang, 'unk') AS lang_guess
       |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id""".stripMargin
  }

  /** Twin of `TextOps.hashSplit` + per-(split, language) stratified
    * corpus stats: bucket = portableHash(CAST(doc_id AS VARCHAR)) % 10
    * (train 0-7 / valid 8 / test 9 — the same integer arithmetic as the
    * Spark side), language from the standalone langid twin.
    */
  def splitStratifiedSql(stopwords: Map[String, Seq[String]]): String = {
    val values = stopwords.toSeq.sortBy(_._1)
      .flatMap { case (l, ws) => ws.map(w => s"('$l','$w')") }.mkString(", ")
    s"""WITH sw(lang, word) AS (VALUES $values),
       |tok AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
       |hits AS (
       |  SELECT doc_id, lang, count(*) AS hits
       |  FROM tok JOIN sw ON tok.word = sw.word
       |  GROUP BY doc_id, lang),
       |best AS (
       |  SELECT doc_id, lang FROM (
       |    SELECT doc_id, lang,
       |           row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
       |    FROM hits) z WHERE rn = 1),
       |assigned AS (
       |  SELECT d.doc_id,
       |         CASE WHEN b.b < 8 THEN 'train' WHEN b.b = 8 THEN 'valid' ELSE 'test' END AS split,
       |         coalesce(bl.lang, 'unk') AS lang_guess,
       |         len($toksSql) AS n_tokens
       |  FROM documents d
       |  JOIN (SELECT doc_id, ${LshSql.phash("CAST(doc_id AS VARCHAR)")} % 10 AS b
       |        FROM documents) b ON d.doc_id = b.doc_id
       |  LEFT JOIN best bl ON d.doc_id = bl.doc_id)
       |SELECT split, lang_guess,
       |       count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS tot_tokens
       |FROM assigned GROUP BY split, lang_guess""".stripMargin
  }

  /** End-to-end prep-pipeline twin: per-doc 2-dp quality band score,
    * exact normalized dedup (min-doc_id canonical per sorted-distinct-
    * token fingerprint), stopword language ID, then per-language corpus
    * stats over the kept docs (quality >= 0.7 AND canonical survivor).
    * Each stage is the same formula its standalone twin uses.
    */
  def prepPipelineSql(stopwords: Map[String, Seq[String]]): String = {
    val values = stopwords.toSeq.sortBy(_._1)
      .flatMap { case (l, ws) => ws.map(w => s"('$l','$w')") }.mkString(", ")
    s"""WITH sw(lang, word) AS (VALUES $values),
       |t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |q AS (
       |  SELECT doc_id,
       |    round((CASE WHEN length(text) BETWEEN 20 AND 20000 THEN 0.4 ELSE 0.0 END) +
       |          (CASE WHEN (CASE WHEN length(text) > 0
       |               THEN CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
       |               ELSE 0.0 END) < 0.2 THEN 0.3 ELSE 0.0 END) +
       |          (CASE WHEN len(toks) > 0 AND CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks) > 0.5 THEN 0.3 ELSE 0.0 END), 2)
       |      AS quality,
       |    len(toks) AS n_tokens
       |  FROM t),
       |canon AS (
       |  SELECT doc_id, min(doc_id) OVER (
       |    PARTITION BY array_to_string(list_sort(list_distinct(toks)), ' ')) AS canonical_id
       |  FROM t),
       |tok AS (SELECT doc_id, unnest(toks) AS word FROM t),
       |hits AS (
       |  SELECT doc_id, lang, count(*) AS hits
       |  FROM tok JOIN sw ON tok.word = sw.word GROUP BY doc_id, lang),
       |best AS (
       |  SELECT doc_id, lang FROM (
       |    SELECT doc_id, lang,
       |           row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
       |    FROM hits) z WHERE rn = 1),
       |kept AS (
       |  SELECT coalesce(b.lang, 'unk') AS lang, q.quality, q.n_tokens
       |  FROM q JOIN canon c USING (doc_id) LEFT JOIN best b USING (doc_id)
       |  WHERE q.quality >= 0.7 AND c.canonical_id = q.doc_id)
       |SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |       round(sum(quality), 2) AS quality_sum
       |FROM kept GROUP BY lang""".stripMargin
  }

  def fingerprintSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
       |SELECT doc_id,
       |  CAST(coalesce(list_aggregate(list_transform(toks, x ->
       |    (CAST(length(x) AS BIGINT)*1000003 + CAST(ascii(substr(x,1,1)) AS BIGINT)*7919
       |     + CAST(ascii(substr(x,-1,1)) AS BIGINT)) % 1000000007), 'sum'), 0) % 1000000007 AS BIGINT)
       |    AS fp
       |FROM t""".stripMargin

  /** Brute-force cosine top-k for query ids, matching
    * `Similarity.bruteForceTopK` (rounded sim, deterministic tie-break).
    */
  def cosineTopKSql(queryIds: Seq[Long], k: Int): String = {
    val ids = queryIds.mkString(", ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ($ids)),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |         round(list_dot_product(q.qv, e.v) /
       |               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 5)
       |           AS cos_sim
       |  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
       |SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank FROM (
       |  SELECT query_id, neighbor_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
       |  FROM scored) z
       |WHERE rank <= $k""".stripMargin
  }

  /** Twin of `TextOps.piiRedact` over the injected-PII driver query: the
    * same deterministic PII suffix is appended in SQL (the corpus itself
    * is PII-free, so the injection makes the cross-engine regex check
    * real), then counted + masked with the identical regex constants
    * (Java regex / RE2 common subset).
    */
  def piiRedactSql(emailRe: String, ipRe: String, phoneRe: String): String =
    s"""WITH inj AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
       |    '@example.com call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
       |    ' from 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.7' AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$emailRe')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$ipRe')) AS INTEGER) AS n_ips,
       |  CAST(len(regexp_extract_all(text, '$phoneRe')) AS INTEGER) AS n_phones,
       |  regexp_replace(
       |    regexp_replace(
       |      regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
       |      '$ipRe', '<IP>', 'g'),
       |    '$phoneRe', '<PHONE>', 'g') AS clean_text
       |FROM inj""".stripMargin

  /** Twin of `TextOps.repetitionSignals`: word-2-grams via 1-based list
    * indexing over `range(1, len)`, then the same two-level aggregate.
    * Docs with <2 tokens drop on both sides.
    */
  def repetitionSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |bg AS (
       |  SELECT doc_id,
       |         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
       |  FROM t WHERE len(toks) >= 2),
       |c AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2)
       |SELECT doc_id,
       |  CAST(sum(c) AS BIGINT) AS n_bigrams,
       |  count(*) AS n_distinct_bigrams,
       |  round(CAST(1 AS DOUBLE) - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4) AS dup_bigram_frac,
       |  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4) AS top_bigram_frac
       |FROM c GROUP BY 1""".stripMargin

  /** Twin of `TextOps.unigramLogProb`: corpus unigram LM p(term) =
    * count/total, per-doc avg ln p rounded to 6 dp.
    */
  def unigramLogProbSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tok AS MATERIALIZED (SELECT doc_id, unnest(toks) AS term FROM t),
       |tc AS MATERIALIZED (SELECT term, count(*) AS tc FROM tok GROUP BY 1),
       |tot AS (SELECT CAST(sum(tc) AS DOUBLE) AS total FROM tc)
       |SELECT doc_id,
       |  round(avg(ln(CAST(tc AS DOUBLE) / (SELECT total FROM tot))), 6) AS avg_logprob,
       |  count(*) AS n_tokens
       |FROM tok JOIN tc USING (term) GROUP BY 1""".stripMargin

  /** Twin of `TextOps.mixtureSample`: same portable hash of
    * 'id:source', same integer per-10000 thresholds.
    */
  def mixtureSampleSql(rates: Map[String, Double], defaultRate: Double): String = {
    val values = rates.toSeq.sortBy(_._1)
      .map { case (k, v) => s"('$k', ${math.round(v * 10000)})" }.mkString(", ")
    s"""WITH r(source, thr) AS (VALUES $values),
       |h AS (
       |  SELECT d.source,
       |    ${LshSql.phash("CAST(d.doc_id AS VARCHAR) || ':' || d.source")} % 10000 AS hh,
       |    coalesce(r.thr, ${math.round(defaultRate * 10000)}) AS thr
       |  FROM documents d LEFT JOIN r ON d.source = r.source)
       |SELECT source, count(*) AS n_total,
       |  CAST(sum(CASE WHEN hh < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM h GROUP BY 1""".stripMargin
  }
}
