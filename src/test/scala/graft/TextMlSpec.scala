package graft

import org.apache.spark.sql.functions._

import graft.ml.Similarity
import graft.text.{Dedup, TextOps}

/** Dedup / text-analysis / similarity operators: planted-duplicate
  * fixtures + the real testdata tables.
  */
class TextMlSpec extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "The quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "the QUICK brown fox, jumps over the lazy dog!"), // normalized dup of 1
      (4L, "dog lazy the over jumps fox brown quick The"), // reordered → norm dup
      (5L, "The quick brown fox jumps over the sleepy dog today"), // near dup
      (6L, "Completely different content about spark engines and graphs"),
      (7L, "El perro duerme en la casa y el gato come pescado"),
      (8L, "Der Hund und die Katze sind nicht in dem Haus")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts") {
    val g = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(g(1L) == 1L && g(2L) == 1L)
    assert(g(3L) == 3L) // different raw text
  }

  test("normalized dedup catches case/punct/reorder variants") {
    val g = Dedup.normalized(docs, "doc_id", "text").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(g(1L) == 1L && g(2L) == 1L && g(3L) == 1L && g(4L) == 1L)
    assert(g(5L) != 1L && g(6L) != 1L)
  }

  test("minhash pairs find the near-duplicate, not the unrelated doc") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      numHashes = 16, bands = 8, shingleSize = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((1L, 5L)) || pairs.contains((2L, 5L)), s"near dup missing from $pairs")
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L), "unrelated doc must not pair")
  }

  test("minhash groups are transitive via WCC") {
    val g = Dedup.minhashGroups(docs, "doc_id", "text",
      numHashes = 16, bands = 8, shingleSize = 2, threshold = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g(1L) == g(2L) && g(2L) == g(5L), s"groups: $g")
  }

  test("simhash pairs exact dup at distance 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.get((1L, 2L)).contains(0L), s"got $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("text stats + quality") {
    val st = TextOps.textStats(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(st(1L).getInt(1) == 43) // n_chars
    assert(st(1L).getInt(2) == 9) // n_tokens
    assert(st(3L).getDouble(4) > 0.0) // punct ratio
    val q = TextOps.qualityScore(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(6L) >= 0.7) // clean diverse text scores high
  }

  test("language id picks the right stopword language") {
    val l = TextOps.langId(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(l(1L) == "en" && l(7L) == "es" && l(8L) == "de")
  }

  test("hashSplit partitions deterministically with no rand()") {
    val s = spark
    import s.implicits._
    val ids = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = TextOps.hashSplit(ids, "doc_id")
    // every row gets exactly one split; re-evaluation reproduces it
    assert(a.count() == 500L)
    val m1 = a.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val m2 = TextOps.hashSplit(ids, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m1 == m2)
    // all three splits populated, train the large share (8/1/1 buckets)
    val bySplit = m1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "valid", "test"))
    assert(bySplit("train") > bySplit("valid") && bySplit("train") > bySplit("test"))
    assert(bySplit.values.sum == 500)
  }

  test("doc fingerprint is order-independent and content-sensitive") {
    val fp = docs.select(col("doc_id"), TextOps.docFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) == fp(4L)) // reorder-invariant
    assert(fp(1L) != fp(6L))
  }

  test("brute-force cosine top-k on real embeddings, self excluded") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val res = Similarity.bruteForceTopK(emb, "vec_id", "embedding", Seq(0L, 1L), 5)
    val rows = res.collect()
    assert(rows.length == 10)
    assert(rows.forall(r => r.getLong(1) != r.getLong(0)))
    val top = rows.filter(_.getLong(0) == 0L).minBy(_.getInt(3))
    assert(top.getDouble(2) <= 1.00001)
  }

  test("lsh top-k achieves reasonable recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", qids, 10, nPlanes = 4, nTables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall > 0.4, s"recall $recall too low")
  }

  test("sq8 quantized top-k: k rows per query, self excluded, high recall vs float") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val sq8 = graft.ml.Quantize.sq8TopK(emb, "vec_id", "embedding", qids, 10).collect()
    assert(sq8.length == qids.size * 10)
    assert(sq8.forall(r => r.getLong(1) != r.getLong(0)))
    // integer dot of 8-bit codes tracks the float inner product closely;
    // recall@10 vs the float brute force should be near-perfect
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = sq8.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall > 0.6, s"sq8 recall $recall vs float brute force too low")
  }

  test("pq-adc top-k: k rows per query, self excluded, usable recall vs float") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    // finer codebooks than the driver defaults (16 subspaces of width 4)
    // — round-0 strided codebooks are coarse, and the 100-vector corpus
    // gives them little to work with; the ADC ranking must still beat
    // noise clearly (random recall@10 over ~100 candidates ≈ 0.1)
    val pq = graft.ml.Quantize.pqTopK(emb, "vec_id", "embedding", qids, 10, m = 16).collect()
    assert(pq.length == qids.size * 10)
    assert(pq.forall(r => r.getLong(1) != r.getLong(0)))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall > 0.25, s"pq recall $recall vs float brute force too low")
  }

  test("ivf top-k degrades to exact brute force when probing all centroids") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qids = Seq(0L, 1L, 2L)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, 5)
      .collect().map(key).toSet
    // nProbe = nCentroids probes every partition ⇒ candidate set = corpus
    val full = Similarity.ivfTopK(emb, "vec_id", "embedding", qids, 5,
      nCentroids = 8, nProbe = 8).collect().map(key).toSet
    assert(full == brute)
    // the real approximate setting keeps decent recall on this corpus
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", qids, 5,
      nCentroids = 8, nProbe = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteIds = brute.map(t => (t._1, t._2))
    val recall = (bruteIds intersect ivf).size.toDouble / bruteIds.size
    assert(recall > 0.3, s"recall $recall too low")
  }

  test("cosine near-dup pairs are symmetric-free and above threshold") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.05f, 0.0f, 0.0f)), // near dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("k-means recovers planted clusters; empty clusters keep centroids") {
    val s = spark
    import s.implicits._
    // ids 0..2 hug the x-axis, 3..5 the y-axis; strided init (n=6, k=2,
    // step=3) seeds centroids from ids 0 and 3 — one per true cluster
    val vecs = Seq(
      (0L, Array(1.0f, 0.05f)), (1L, Array(0.9f, 0.1f)), (2L, Array(1.1f, 0.0f)),
      (3L, Array(0.05f, 1.0f)), (4L, Array(0.1f, 0.9f)), (5L, Array(0.0f, 1.1f))
    ).toDF("vec_id", "embedding")
    val asg = graft.ml.KMeans.assignments(vecs, "vec_id", "embedding", k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 3L))
    val sizes = graft.ml.KMeans.clusterSizes(
      graft.ml.KMeans.assignments(vecs, "vec_id", "embedding", k = 2, rounds = 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(0L -> 3L, 3L -> 3L))
  }

  test("token-window chunking covers every token with stride overlap") {
    val chunks = graft.text.Packing.tokenChunks(docs, "doc_id", "text", 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    // doc 1 has 9 tokens -> starts 0,3,6 -> chunks of 4,4,3 tokens
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq == Seq(4, 4, 3))
    assert(d1.head._4 == "the quick brown fox")
    assert(d1(1)._4 == "fox jumps over the")       // stride-3 overlap
    assert(d1(2)._4 == "the lazy dog")             // short tail window
    // reconstruction: consecutive chunks overlap by chunkTokens - stride
    chunks.groupBy(_._1).foreach { case (_, cs) =>
      assert(cs.map(_._2).sorted.toSeq == (0L until cs.length).toSeq)
    }
  }

  test("tfidf top terms rank distinctive words above corpus-wide ones") {
    val top = graft.text.TextOps.tfidfTop(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    // doc 5's distinctive terms (sleepy/today appear nowhere else)
    assert(top(5L) == Set("sleepy", "today"))
    // doc 6 shares no terms with 1-5, so any of its words are distinctive
    assert(top(6L).subsetOf(
      "completely different content about spark engines and graphs".split(" ").toSet))
  }

  test("decontamination flags train docs sharing held-out n-grams") {
    val s = spark
    import s.implicits._
    val split = Seq(
      (1L, "alpha beta gamma delta epsilon", "train"), // shares 3-grams with doc 3
      (2L, "one two three four five six", "train"),    // no overlap
      (3L, "beta gamma delta epsilon zeta", "test"),
      (4L, "unrelated held out benchmark text", "test")
    ).toDF("doc_id", "text", "split")
    val flagged = graft.text.Dedup.decontaminate(
      split, "doc_id", "text", "split", n = 3, minShared = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "beta gamma delta" and "gamma delta epsilon" with doc 3
    assert(flagged == Map(1L -> 2L))
    // raising the threshold above the overlap clears the flag
    assert(graft.text.Dedup.decontaminate(
      split, "doc_id", "text", "split", n = 3, minShared = 3).isEmpty)
  }

  test("sequence packing: contiguous per-bucket token stream, chunk-local offsets") {
    val maxTokens = 10
    val packed = graft.text.Packing.packChunks(docs, maxTokens, buckets = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap // doc_id -> (bucket, n_tokens, seq, off)
    assert(packed.size == 8)
    // offsets live inside a chunk; seqs are non-negative
    packed.values.foreach { case (_, _, seq, off) =>
      assert(off >= 0 && off < maxTokens && seq >= 0)
    }
    // within a bucket, doc_id order concatenates with no gaps: each
    // doc's global start = sum of the n_tokens of earlier docs
    packed.groupBy(_._2._1).foreach { case (_, ds) =>
      val inOrder = ds.toSeq.sortBy(_._1)
      var cursor = 0L
      inOrder.foreach { case (_, (_, n, seq, off)) =>
        assert(seq == cursor / maxTokens && off == cursor % maxTokens)
        cursor += n
      }
    }
    // chunkStats reconciles: total stream tokens = total doc tokens
    val stats = graft.text.Packing.chunkStats(
      graft.text.Packing.packChunks(docs, maxTokens, buckets = 2))
    val totStats = stats.agg(sum(col("stream_tokens"))).head().getLong(0)
    val totDocs = packed.values.map(_._2).sum
    assert(totStats == totDocs)
  }

  test("pii redaction counts and masks emails, ips, phones") {
    val s = spark
    import s.implicits._
    val pii = Seq(
      (1L, "write to alice.smith+x@corp.example.org or bob@ex.io from 192.168.1.42 call 555-0142 now"),
      (2L, "no pii here at all"),
      (3L, "edge 999.1.2.3 and 1-800 and a@b (not an email)")
    ).toDF("doc_id", "text")
    val out = TextOps.piiRedact(pii, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    val (e1, i1, p1, t1) = out(1L)
    assert(e1 == 2 && i1 == 1 && p1 == 1, s"counts: $e1 $i1 $p1")
    assert(t1 == "write to <EMAIL> or <EMAIL> from <IP> call <PHONE> now", t1)
    assert(out(2L) == ((0, 0, 0, "no pii here at all")))
    val (e3, i3, p3, t3) = out(3L)
    // 999.1.2.3 still octet-shaped per the \d{1,3} heuristic; 1-800 and
    // a@b (no TLD) are not
    assert(e3 == 0 && i3 == 1 && p3 == 0 && t3 == "edge <IP> and 1-800 and a@b (not an email)")
  }

  test("repetition signals: dup/top 2-gram fractions on a crafted looper") {
    val s = spark
    import s.implicits._
    val rep = Seq(
      (1L, "a b a b a b"),           // bigrams: ab,ba,ab,ba,ab → 5 total, 2 distinct
      (2L, "all distinct words here"), // 3 bigrams, all distinct
      (3L, "solo")                     // <2 tokens → drops
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(rep, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((5L, 2L, 0.6, 0.6)), s"got ${out(1L)}")
    assert(out(2L) == ((3L, 3L, 0.0, 0.3333)), s"got ${out(2L)}")
    assert(!out.contains(3L))
  }

  test("scalar quantization audit matches hand computation") {
    val s = spark
    import s.implicits._
    // dim0 range [0,1]: codes round((x)*255); dim1 constant (hi == lo)
    val vecs = Seq(
      (1L, Seq(0.0f, 2.0f)),
      (2L, Seq(1.0f, 2.0f)),
      (3L, Seq(0.5f, 2.0f))
    ).toDF("vec_id", "embedding")
    val out = graft.ml.Quantize.scalarQuantizeAudit(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // codes: v1 = (0, 0), v2 = (255, 0), v3 = (floor(127.5+0.5)=128, 0)
    assert(out(1L) == ((0L, 0.0, 2L)), s"got ${out(1L)}")
    assert(out(2L) == ((255L, 0.0, 2L)), s"got ${out(2L)}")
    assert(out(3L)._1 == 128L && out(3L)._3 == 2L)
    // v3 err: |0.5 - 128/255| ≈ 0.001960784
    assert(math.abs(out(3L)._2 - (128.0 / 255 - 0.5)) < 1e-9, s"got ${out(3L)}")
  }

  test("gopher rule battery matches hand computation") {
    val s = spark
    import s.implicits._
    // doc 1: 6 words incl. 2 stopwords, mean len (3+3+3+2+4+4)/6 — fails
    //        only the 50-word floor
    // doc 2: short words (mean < 3) and no stopwords
    // doc 3: empty text
    val docs = Seq(
      (1L, "the cat sat of good mats"),
      (2L, "a b c d"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.gopherRules(docs, "doc_id", "text", minWords = 5).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getBoolean(6)))).toMap
    assert(out(1L) == ((6L, round6(19.0 / 6), 1.0, 0.0, 2L, true)), s"got ${out(1L)}")
    assert(out(2L) == ((4L, 1.0, 1.0, 0.0, 0L, false)), s"got ${out(2L)}")
    assert(out(3L) == ((0L, 0.0, 0.0, 0.0, 0L, false)), s"got ${out(3L)}")
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("unigram log-prob matches hand computation") {
    val s = spark
    import s.implicits._
    val lm = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextOps.unigramLogProb(lm, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // counts: a=2, b=2, c=1, total=5
    val exp1 = math.log(2.0 / 5)                         // avg of three ln(0.4)
    val exp2 = (math.log(2.0 / 5) + math.log(1.0 / 5)) / 2
    assert(math.abs(out(1L)._1 - exp1) < 1e-6 && out(1L)._2 == 3L)
    assert(math.abs(out(2L)._1 - exp2) < 1e-6 && out(2L)._2 == 2L)
  }

  test("mixture sampling: rate 1 keeps all, rate 0 keeps none, deterministic") {
    val s = spark
    import s.implicits._
    val d = (0L until 40L).map(i => (i, if (i % 2 == 0) "keep" else "drop"))
      .toDF("doc_id", "source")
    val rates = Map("keep" -> 1.0, "drop" -> 0.0)
    val run1 = TextOps.mixtureSample(d, "doc_id", "source", rates, 0.5).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(run1("keep") == ((20L, 20L)) && run1("drop") == ((20L, 0L)))
    // fractional rate: deterministic across runs (hash-gated, no rand)
    val frac = Map("keep" -> 0.5, "drop" -> 0.5)
    val a = TextOps.mixtureSample(d, "doc_id", "source", frac, 0.5).collect().toSeq.map(_.toString).sorted
    val b = TextOps.mixtureSample(d, "doc_id", "source", frac, 0.5).collect().toSeq.map(_.toString).sorted
    assert(a == b)
  }

  test("hll estimate: raw branch within error bound, deterministic, duplicate-blind") {
    val s = spark
    import s.implicits._
    // 5000 distinct keys >> 2.5·m = 2560 → raw harmonic branch
    val n = 5000
    val keys = (0 until n).map(_.toLong).toDF("id")
    val est = graft.ml.Hll.estimateOf(keys, col("id")).collect().head.getDouble(0)
    assert(est > 0.85 * n && est < 1.15 * n, s"estimate $est vs true $n") // ~4.7σ at 3.2% std err
    // multiplicity must not move the sketch (register max is idempotent)
    val dup = keys.unionAll(keys).unionAll(keys)
    val est2 = graft.ml.Hll.estimateOf(dup, col("id")).collect().head.getDouble(0)
    assert(est2 == est)
    // small-range linear counting recovers tiny cardinalities exactly
    val tiny = (0 until 7).map(_.toLong).toDF("id")
    val e3 = graft.ml.Hll.estimateOf(tiny, col("id")).collect().head.getDouble(0)
    assert(math.round(e3) == 7L)
    // empty stream → 0
    val e4 = graft.ml.Hll.estimateOf(keys.where(col("id") < 0), col("id")).collect().head.getDouble(0)
    assert(e4 == 0.0)
  }
}
