package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of an embedding column — the compression
  * pass a 100 TB embedding pipeline runs before ANN indexing (the SQ8
  * scheme of FAISS/IVF engines, restated relationally; the reference's
  * vector plane stores float vectors raw, so this is a forward-looking
  * training-pipeline op like the dedup/ANN family).
  *
  * Scheme: per-DIMENSION global [lo, hi] over the corpus;
  * `code_i = clamp(floor((x_i - lo_i) / (hi_i - lo_i) * 255 + 0.5), 0, 255)`;
  * dequant `x̂_i = lo_i + code_i/255 · (hi_i - lo_i)`.
  *
  * Scale shape: the stats pass is a posexplode + partial-aggregated
  * `groupBy(pos)` (map-side combine reduces each task to d rows, so the
  * only exchange carries d·tasks rows); the d-row result folds into ONE
  * broadcast row of `lo[]`/`hi[]` arrays, and the quantization itself is
  * a pure map stage over the vectors — zero joins, zero shuffles on the
  * n·d payload.
  *
  * Cross-engine determinism (the DuckDB twin mirrors every expression):
  * per-element arithmetic is IEEE-exact double ops in both engines;
  * the audit outputs are ORDER-FREE — `sum_codes` is an integer sum,
  * `max_abs_err` is a max — so float summation order never crosses the
  * engine boundary (the same policy as the HLL register math).
  */
object Quantize {

  /** SQ8 ANN top-k: exact-k search over int8-QUANTIZED vectors — the
    * compressed-domain search a production ANN engine runs (FAISS
    * SQ8 flat), beside the float brute-force / sign-LSH / IVF
    * families. Codes use a SYMMETRIC GLOBAL scale,
    * `code_i = clamp(floor(x_i / M · 127 + 0.5), −127, 127)` with
    * `M = max |x|` over the corpus — one scale for every dimension, so
    * the integer code dot is `(127/M)²`-proportional to the true inner
    * product up to quantization noise and RANKS like it (the audit's
    * per-dimension [lo, hi] shift would NOT: an affine shift per
    * dimension destroys dot-product monotonicity — measured recall@10
    * 0.06 vs 1.0 for the symmetric scheme on the unit-norm corpus).
    * Scores are INTEGER dot products (|code| ≤ 127, so a 4096-dim dot
    * fits ≪ int64) — bit-exact across engines with no float-rounding
    * policy needed, unlike the cosine family's 5-dp contract.
    *
    * Scale shape: one scalar stats pass (max |x|, partial-aggregated,
    * folded into ONE broadcast row), one pure-map encode pass, then the
    * same broadcast-query scoring pass as
    * [[Similarity.bruteForceTopK]] (per-query Window over candidate
    * scores; parallelism = \|Q\| on the final rank only).
    *
    * @return (query_id, neighbor_id, score: long, rank)
    */
  def sq8TopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int
  ): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val bounds = corpus.select(v.as("__v"))
      .select(expr("array_max(transform(__v, x -> abs(x)))").as("__vm"))
      .agg(max(col("__vm")).as("__m"))
    val code =
      "CAST(least(greatest(floor(CAST(__v[i-1] AS DOUBLE) / __m * 127.0 + 0.5), -127.0), 127.0) AS BIGINT)"
    val coded = corpus.select(col(idCol), v.as("__v"))
      .crossJoin(broadcast(bounds))
      .select(col(idCol),
        expr(s"transform(sequence(1, size(__v)), i -> $code)").as("codes"))
    val q = coded.where(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col("codes").as("qc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    coded.select(col(idCol).as("neighbor_id"), col("codes").as("nc"))
      .crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("aggregate(zip_with(qc, nc, (a, b) -> a * b), CAST(0 AS BIGINT), (acc, x) -> acc + x)")
          .as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** PQ-ADC ANN top-k (product quantization with asymmetric distance
    * computation — the FAISS PQ-flat search pattern): vectors split
    * into `m` subvectors, each encoded as the id of its nearest
    * sub-centroid from a per-subspace codebook; queries stay FLOAT and
    * score against the RECONSTRUCTED docs, `score = Σ_j ⟨q_j,
    * codebook_j[code_j]⟩` (ADC). Codebooks here are the strided-sample
    * policy [[Similarity.ivfTopK]] already uses for its coarse
    * quantizer (deterministic, twin-proven) — i.e. PQ at Lloyd
    * round 0; a trained variant would run [[KMeans]] per subspace.
    *
    * Cross-engine determinism: every per-subspace scalar (sub-L2² for
    * the encode argmin, sub-dot for ADC) is integer-scaled AT the
    * subspace — `⌊x·10⁵ + 0.5⌋` as BIGINT — so the Σ over subspaces
    * and every comparison is ORDER-FREE integer arithmetic; no float
    * summation order ever crosses the engine boundary (stricter than
    * the cosine family's 5-dp rounding, which still sums doubles).
    * Encode ties break to the smaller centroid id.
    *
    * Scale shape: codebook is m·k rows (broadcast); encoding is one
    * map-side-combined `min_by` pass over the corpus (never a window);
    * ADC joins doc codes to the broadcast codebook and the broadcast
    * query set — the n·d float payload is read once to encode and
    * never shuffled.
    *
    * @return (query_id, neighbor_id, score: long ×10⁵, rank)
    */
  def pqTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int,
      m: Int = 8, nCentroids: Int = 16
  ): DataFrame = {
    val base = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val n = base.count()
    val step = math.max(1L, n / nCentroids)
    val d = base.select(size(col("v"))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sw = d / m
    val cb = base.where(pmod(col("id"), lit(step)) === 0)
      .orderBy(col("id")).limit(nCentroids)
      .select(col("id").as("cid"), col("v").as("cv"))
      .select(col("cid"), explode(sequence(lit(0), lit(m - 1))).as("j"), col("cv"))
      .select(col("j"), col("cid"), expr(s"slice(cv, j * $sw + 1, $sw)").as("cvj"))
    val d2i = expr(
      s"CAST(floor(aggregate(zip_with(slice(v, j * $sw + 1, $sw), cvj, (a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) * 100000.0 + 0.5) AS BIGINT)")
    val codes = base.crossJoin(broadcast(cb))
      .select(col("id"), col("j"), col("cid"), d2i.as("d2i"))
      .groupBy(col("id"), col("j"))
      .agg(min_by(col("cid"), struct(col("d2i"), col("cid"))).as("cid"))
    val q = base.where(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("v").as("qv"))
    val sji = expr(
      s"CAST(floor(aggregate(zip_with(slice(qv, j * $sw + 1, $sw), cvj, (a, b) -> a * b), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) * 100000.0 + 0.5) AS BIGINT)")
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    codes.join(broadcast(cb), Seq("j", "cid"))
      .crossJoin(broadcast(q))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"), sji.as("si"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("si")).as("score"))
      .withColumn("rank", row_number().over(wnd))
      .where(col("rank") <= k)
  }

  /** Per-vector quantization audit: `(id, sum_codes, max_abs_err, n_dims)`.
    * `sum_codes` = Σ codes (integer); `max_abs_err` = max_i |x_i − x̂_i|
    * rounded to 9 dp; constant dimensions (hi == lo) code to 0 with
    * exact reconstruction.
    */
  def scalarQuantizeAudit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val stats = df.select(posexplode(v).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val bounds = stats.agg(
      expr("transform(array_sort(collect_list(struct(pos, lo))), s -> s.lo)").as("__los"),
      expr("transform(array_sort(collect_list(struct(pos, hi))), s -> s.hi)").as("__his"))
    val code =
      s"""CASE WHEN __his[i-1] > __los[i-1]
         | THEN CAST(least(greatest(floor(((CAST(__v[i-1] AS DOUBLE) - __los[i-1]) / (__his[i-1] - __los[i-1])) * 255.0 + 0.5), 0.0), 255.0) AS BIGINT)
         | ELSE CAST(0 AS BIGINT) END""".stripMargin.replace("\n", " ")
    val err =
      s"""abs(CAST(__v[i-1] AS DOUBLE) - (__los[i-1] + (CAST(($code) AS DOUBLE) / 255.0) * (__his[i-1] - __los[i-1])))"""
    df.select(col(idCol), v.as("__v"))
      .crossJoin(broadcast(bounds))
      .select(
        col(idCol),
        expr(s"aggregate(transform(sequence(1, size(__v)), i -> $code), CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("sum_codes"),
        round(expr(s"array_max(transform(sequence(1, size(__v)), i -> $err))"), 9)
          .as("max_abs_err"),
        size(col("__v")).cast("long").as("n_dims"))
  }
}
