package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.LinkGraph

/** GNN negative sampling — the learning plane's
  * `g.negative_sampler(type, expand_factor, strategy="random")` / GSL
  * `outNeg()` (reference
  * `docs/reference/gnn_engine/negative_sampling_en.rst:1-80`): for each
  * seed vertex, sample `f` vertices from the candidate set (vertices
  * that RECEIVE at least one edge — the edge-type candidate rule) that
  * are NOT out-neighbors of the seed and not the seed itself.
  *
  * Determinism (resume-safe, cross-engine): the reference's random
  * strategy redraws on collision; ours is the bounded deterministic
  * analog — slot `j` draws candidate ids `Hll.mix(composite) % |V|`
  * for attempts `a = 0..A-1` (the dense id plane IS the draw space, so
  * no candidate indexing pass is needed) and keeps the first attempt
  * that lands on a valid negative. A slot whose whole redraw chain
  * lands on neighbors/non-candidates contributes no row (probability
  * ~(deg/|V|)^A — negligible off mega-hubs).
  *
  * Scale shape: draws are map-generated (|S|·f·A rows), validity is one
  * semi-join (candidate membership) + one anti-join (adjacency) on bare
  * ids, and the per-slot pick is a map-side-combined `min` over the
  * attempt index — never a window over an adjacency list and never a
  * |S|×|candidates| product. The avalanche (`Hll.mix`, one fin pass for
  * composites < 2^30) is shared bit-for-bit with the DuckDB twin
  * (`SynthSql5.negativeSampleSql`), like `NeighborSample`'s pick hash.
  */
object NegativeSample {

  /** Returns (seed_oid, slot, neg_oid) — slot in 0..f-1; unknown seed
    * oids match nothing; exhausted slots contribute no row.
    */
  def sample(
      g: LinkGraph, seedOids: Seq[String], f: Int, attempts: Int = 8,
      pickSeed: Long = 42L): DataFrame = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val seeds = seedOids.toDF("seed").join(
      g.vertices.toDF.select(col("oid").as("seed"), col("id").as("seed_id")),
      Seq("seed"))
    sampleFrom(g, seeds, f, attempts, NeighborSample.hopSalt(pickSeed, 1))
  }

  /** Frame-based core (the GSL `outNeg()` entry point): `seeds` carries
    * (seed: oid, seed_id); `salt` is the per-hop salt so a multi-hop
    * GSL chain draws independently per hop.
    */
  private[ml] def sampleFrom(
      g: LinkGraph, seeds: DataFrame, f: Int, attempts: Int,
      salt: Long): DataFrame = {
    require(f > 0 && attempts > 0, "fanout and attempts must be positive")
    val p = graft.text.TextOps.HashP
    val n = g.numVertices
    val verts = g.vertices.toDF
    val draws = seeds
      .select(col("seed"), col("seed_id"),
        explode(sequence(lit(0), lit(f - 1))).as("slot"))
      .select(col("seed"), col("seed_id"), col("slot"),
        explode(sequence(lit(0), lit(attempts - 1))).as("attempt"))
      .withColumn("cand_id", Hll.mix(
        (graft.text.TextOps.portableHash(col("seed")) * 31L + lit(salt) +
          col("slot").cast("long") * 104729L +
          col("attempt").cast("long") * 15485863L) % p) % n)
    val candIds = g.edges.toDF.select(col("dst").as("cand_id")).distinct()
    val adjacency = g.edges.toDF
      .select(col("src").as("seed_id"), col("dst").as("cand_id"))
    val kept = draws
      .where(col("cand_id") =!= col("seed_id"))
      .join(candIds, Seq("cand_id"), "left_semi")
      .join(adjacency, Seq("seed_id", "cand_id"), "left_anti")
    // first surviving attempt per slot — attempts are unique within a
    // (seed, slot) group, so min is the deterministic pick
    val picked = kept.groupBy(col("seed"), col("slot"))
      .agg(min_by(col("cand_id"), col("attempt")).as("cand_id"))
    picked
      .join(verts.select(col("id").as("cand_id"), col("oid").as("neg_oid")), Seq("cand_id"))
      .select(col("seed").as("seed_oid"), col("slot"), col("neg_oid"))
  }
}
