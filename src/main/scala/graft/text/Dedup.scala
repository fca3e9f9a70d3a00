package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.LinkGraph
import graft.schema.{Edge, Vertex}

/** Deduplication family for training-data pipelines, each a declarative
  * Spark pipeline:
  *
  *  - exact: hash-groupBy on the raw text;
  *  - normalized: groupBy on the sorted-token fingerprint;
  *  - MinHash+LSH: shingles → k minhashes (affine permutation family) →
  *    bands → bucket self-join → Jaccard-verified candidate pairs →
  *    connected duplicate groups via the engine's own WCC;
  *  - SimHash: 64-bit sign-sum sketch, banded for Hamming-radius search.
  *
  * The scale path is the banding: candidate generation is a groupBy/self-
  * join on band keys (no all-pairs), so it survives 10^9-document inputs;
  * hub buckets (boilerplate shingles) are bounded by dropping buckets
  * over `maxBucket` (documented skew guard).
  */
object Dedup {

  /** Exact duplicates: (canonical_id, doc_id) for every doc, canonical =
    * min id among identical texts.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol))
      .groupBy(col(textCol))
      .agg(min(col(idCol)).as("canonical_id"), collect_list(col(idCol)).as("ids"))
      .select(col("canonical_id"), explode(col("ids")).as(idCol))

  /** Normalized duplicates: same but on the sorted-token fingerprint. */
  def normalized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.normFingerprint(col(textCol)).as("__fp"))
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as("canonical_id"), collect_list(col(idCol)).as("ids"))
      .select(col("canonical_id"), explode(col("ids")).as(idCol))

  /** Word n-gram shingles of a document. */
  private def shingles(textCol: String, n: Int) = {
    val t = TextOps.tokens(col(textCol))
    // positions 0..size-n; each shingle joined by ''
    filter(
      transform(sequence(lit(0), greatest(size(t) - n, lit(0))),
        i => when(i + n <= size(t), array_join(slice(t, i + lit(1), lit(n)), ""))),
      x => x.isNotNull)
  }

  /** MinHash signature: for permutation j, min over shingles of
    * (a_j·h + b_j) mod p, with h = [[TextOps.portableHash]] — pure
    * integer arithmetic with an exact DuckDB twin (`LshSql`), so the
    * whole LSH family is oracle-checkable cross-engine.
    */
  private def minhashSig(sh: org.apache.spark.sql.Column, k: Int) = {
    val p = TextOps.HashP
    array((0 until k).map { j =>
      val a = 1L + 2L * j // odd
      val b = 7919L * (j + 1)
      array_min(transform(sh, s => (TextOps.portableHash(s) * a + b) % p))
    }: _*)
  }

  /** Candidate pairs from banded MinHash, Jaccard-verified.
    *
    * Scale shape: only bare (band, key, id) rows enter the candidate
    * self-join and only (id_a, id_b) longs ride the dedup shuffle; the
    * shingle arrays are re-joined *by id* afterwards for Jaccard
    * verification. (Carrying the shingle payload through the candidate
    * shuffle dominated shuffle volume at scale.)
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.7,
      maxBucket: Int = 1000
  ): DataFrame = {
    val rows = numHashes / bands
    // shingle table is used twice (banding + verification re-join): at
    // 100 TB this would be a persisted/bucketed intermediate table
    val docSh = df
      .select(col(idCol).as("id"), shingles(textCol, shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = docSh
      .withColumn("sig", minhashSig(col("sh"), numHashes))
      .select(col("id"), posexplode(
        array((0 until bands).map(b =>
          struct(lit(b).as("band"), slice(col("sig"), b * rows + 1, rows).as("key"))): _*)))
      .select(col("id"), col("col.band").as("band"), col("col.key").as("key"))
    // skew guard: drop pathological buckets (boilerplate shingle sets).
    // groupBy+join, NOT a window count: a window would shuffle the whole
    // pathological bucket onto one task before dropping it — exactly the
    // hub this guard exists to avoid. The aggregate's map-side partial
    // combine bounds any bucket to one row per task.
    val keep = banded.groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bs"))
      .where(col("bs") <= maxBucket)
      .select(col("band"), col("key"))
    val bucketed = banded.join(keep, Seq("band", "key"))
    val candidates = bucketed.as("l")
      .join(bucketed.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    candidates
      .join(docSh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docSh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Duplicate groups: connected components over the verified pair graph,
    * reusing the engine's HashMin WCC. Returns (id, group_id) with
    * group_id = min doc id in the group (docs with no near-dup partner
    * are omitted).
    */
  def minhashGroups(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.7
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = minhashPairs(df, idCol, textCol, numHashes, bands, shingleSize, threshold)
      .persist()
    val ids = pairs.select(col("id_a").as("doc")).unionAll(pairs.select(col("id_b").as("doc")))
      .distinct()
    // dense ids are the doc ids themselves (already Long + unique)
    val vs = ids.select(col("doc").as("id"), col("doc").cast("string").as("oid")).as[Vertex]
    val es = pairs.select(col("id_a").as("src"), col("id_b").as("dst"), lit(1.0).as("weight")).as[Edge]
    val comps = graft.algos.WCC.run(LinkGraph(vs, es))
    comps.select(col("id").as(idCol), col("comp").as("group_id"))
  }

  /** 64-bit SimHash of the token multiset. Bit b's vote comes from the
    * parity of an affine scramble of the token's [[TextOps.portableHash]]
    * (h·A_b + B_b mod p) — one O(len) hash per token, then O(1) per bit,
    * and the whole sketch has an exact DuckDB SQL twin (`LshSql`).
    * h·A_b ≤ p·(2654435761 + 63·40503) ≈ 2.7e18 stays inside int64.
    */
  def simhash(textCol: String): org.apache.spark.sql.Column = {
    val p = TextOps.HashP
    val t = TextOps.tokens(col(textCol))
    val hashes = transform(t, x => TextOps.portableHash(x))
    // For each bit: +1 if scrambled-parity set else -1, summed; bit set
    // in the sketch if the vote sum > 0.
    val bits = (0 until 64).map { b =>
      val a = 2654435761L + 40503L * b
      val c = 7919L * b + 17L
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(((h * a + c) % p) % 2 === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L).cast("long") * (1L << b)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup candidate pairs within Hamming distance `maxDist`,
    * banded into 4 16-bit keys (two sketches within distance ≤ 3 share at
    * least one band — pigeonhole).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3
  ): DataFrame = {
    // zero-token docs are excluded (no content signal): keeps the Spark
    // side in lockstep with the SQL twin, which seeds sketches from
    // tokenized rows and so never emits a row for an empty token list.
    val withSig = df
      .where(size(TextOps.tokens(col(textCol))) > 0)
      .select(col(idCol).as("id"), simhash(textCol).as("sig"))
    val banded = withSig.select(col("id"), col("sig"), posexplode(
      array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .select(col("id"), col("sig"), col("pos").as("band"), col("col").as("key"))
    val pairs = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .where(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Benchmark decontamination — flag documents in one split whose text
    * shares at least `minShared` distinct word n-grams with ANY document
    * of a held-out split (the train-vs-eval overlap scrub every serious
    * training-data build runs before pretraining). Returns
    * (idCol, n_shared) for flagged `flagSplit` docs.
    *
    * Scale shape: per-doc DISTINCT n-grams hash to longs
    * ([[TextOps.portableHash]]) so the overlap join ships bare
    * (id, gram_hash) rows; the held-out gram set is a distinct
    * projection joined with left-semi (broadcastable when the benchmark
    * split is small — the common case — and a plain hash equi-join
    * otherwise); the per-doc tally is one partial+final countDistinct.
    */
  def decontaminate(
      df: DataFrame, idCol: String, textCol: String, splitCol: String,
      flagSplit: String = "train", holdoutSplit: String = "test",
      n: Int = 3, minShared: Int = 2
  ): DataFrame = {
    val grams = df.select(col(idCol).as("id"), col(splitCol).as("split"),
        explode(array_distinct(shingles(textCol, n))).as("g"))
      .select(col("id"), col("split"), TextOps.portableHash(col("g")).as("gh"))
    val holdout = grams.where(col("split") === holdoutSplit).select(col("gh")).distinct()
    grams.where(col("split") === flagSplit)
      .join(holdout, Seq("gh"), "left_semi")
      .groupBy(col("id"))
      .agg(countDistinct(col("gh")).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select(col("id").as(idCol), col("n_shared"))
  }
}
