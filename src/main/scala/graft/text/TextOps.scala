package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * normalization, token/char statistics, quality scoring, language ID,
  * and a cheap structural fingerprint. Everything is built from codegen'd
  * `functions._` (no UDFs), so the whole plane stays inside whole-stage
  * codegen and is pushdown/prune-friendly; each op has an ANSI-SQL twin
  * for the DuckDB oracle.
  */
object TextOps {

  /** Lowercased alphanumeric tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), x => x =!= "")

  /** Canonical near-dup key: sorted distinct tokens joined by one space
    * (catches reordered / re-punctuated copies; the "sorted-token
    * fingerprint" family of dedup keys).
    */
  def normFingerprint(text: Column): Column =
    array_join(array_sort(array_distinct(tokens(text))), " ")

  /** Per-document statistics: chars, tokens, distinct tokens, mean token
    * length, punctuation ratio.
    */
  def textStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = tokens(col(textCol))
    df.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_distinct_tokens"),
      round(
        when(size(t) > 0,
          aggregate(transform(t, x => length(x).cast("double")), lit(0.0), (a, x) => a + x) /
            size(t).cast("double")).otherwise(0.0), 4).as("avg_token_len"),
      round(
        when(length(col(textCol)) > 0,
          length(regexp_replace(lower(col(textCol)), "[a-z0-9\\s]", "")).cast("double") /
            length(col(textCol)).cast("double")).otherwise(0.0), 4).as("punct_ratio"))
  }

  /** Heuristic quality score in [0,1]: length band + punctuation band +
    * token-diversity band (the usual cheap pre-filter before expensive
    * model-based scoring).
    */
  def qualityScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val stats = textStats(df, textCol, idCol)
    stats.select(
      col(idCol),
      round(
        (when(col("n_chars").between(20, 20000), 0.4).otherwise(0.0) +
          when(col("punct_ratio") < 0.2, 0.3).otherwise(0.0) +
          when(col("n_tokens") > 0 &&
            col("n_distinct_tokens").cast("double") / col("n_tokens") > 0.5, 0.3)
            .otherwise(0.0)), 2).as("quality"))
  }

  /** Tiny built-in stopword lists per language (deterministic, enough for
    * an n-gram-free language-ID heuristic).
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "des", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "los", "las", "es", "de", "en", "una", "por", "para", "con")
  )

  /** Language ID: most stopword hits wins, ties to the alphabetically
    * first language, no hits → "unk".
    */
  def langId(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sw = Stopwords.toSeq.flatMap { case (l, ws) => ws.map(w => (l, w)) }
      .toDF("lang", "word")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("hits").desc, col("lang").asc)
    val hits = df.select(col(idCol), explode(tokens(col(textCol))).as("word"))
      .join(broadcast(sw), "word")
      .groupBy(col(idCol), col("lang")).agg(count(lit(1)).as("hits"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(idCol), col("lang").as("lang_guess"))
    df.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("lang_guess"), lit("unk")).as("lang_guess"))
  }

  /** Deterministic train/valid/test split — the split step of a
    * training-data pipeline: bucket = portableHash(id) mod `buckets`,
    * `train` buckets → "train", the next `valid` → "valid", the rest →
    * "test". Hash-based, NOT rand(): stage re-execution after failure
    * reproduces the assignment exactly (the same resume contract the
    * engine's salting uses), and the split is stable across runs and
    * cluster sizes. Pure codegen'd column expression — the split rides
    * the scan, no shuffle.
    */
  def hashSplit(
      df: DataFrame, idCol: String,
      buckets: Int = 10, train: Int = 8, valid: Int = 1): DataFrame = {
    require(buckets > train + valid, "need at least one test bucket")
    // hash the decimal string form so non-string ids split identically
    // across engines (DuckDB twin: phash(CAST(id AS VARCHAR)))
    val b = pmod(portableHash(col(idCol).cast("string")), lit(buckets.toLong))
    df.withColumn("split",
      when(b < train, "train")
        .when(b < train + valid, "valid")
        .otherwise("test"))
  }

  /** Large prime modulus shared by [[portableHash]] and its DuckDB SQL
    * twin (`LshSql`).
    */
  val HashP = 1000000007L

  /** Position-weighted character hash mod a large prime — a *portable*
    * 64-bit-safe string hash: identical pure-integer arithmetic is
    * expressible in DuckDB SQL, so every operator built on it (MinHash,
    * SimHash, banding) gets a full-value cross-engine oracle. Weight of
    * position i is the quadratic scramble ((i²%p)·1000003 + i·7919 +
    * 12345) % p, so the hash is position-sensitive (unlike a plain char
    * sum) while needing no modular powers. All intermediates fit int64:
    * ascii·weight ≤ 127·p ≈ 1.3e11, running sum re-modded every step.
    * Codegen'd `functions._` only — no UDF.
    */
  def portableHash(s: Column): Column = {
    val p = HashP
    val terms = transform(sequence(lit(1), length(s)), i => {
      val il = i.cast("long")
      val w = (((il * il) % p) * 1000003L + il * 7919L + 12345L) % p
      ascii(s.substr(i, lit(1))).cast("long") * w
    })
    when(length(s) === 0, 0L)
      .otherwise(coalesce(aggregate(terms, lit(0L), (acc, t) => (acc + t) % p), lit(0L)))
  }

  /** Cheap structural per-token hash (length, first/last char) summed over
    * tokens — order-independent document fingerprint that is expressible
    * identically in DuckDB SQL. A production pipeline would swap in
    * xxhash64; the shape (token → int64 → order-independent reduce) is
    * the load-bearing part.
    */
  def docFingerprint(text: Column): Column = {
    val t = tokens(text)
    aggregate(
      transform(t, x =>
        (length(x).cast("long") * 1000003L +
          ascii(substring(x, 1, 1)).cast("long") * 7919L +
          ascii(substring(x, -1, 1)).cast("long")) % 1000000007L),
      lit(0L), (acc, h) => (acc + h) % 1000000007L)
  }

  /** PII regexes shared verbatim with the DuckDB twin — restricted to the
    * dialect subset Java regex and RE2 interpret identically (char
    * classes, `\d`, `\b`, bounded repetition; no backrefs/lookaround).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** PII scrub — the redaction pass a training-data pipeline runs before
    * anything leaves the raw zone: counts then masks emails, IPv4s and
    * phone-shaped digit runs (counted on the ORIGINAL text; masked in
    * email → ip → phone order so replacement tokens can't be re-matched).
    * Pure codegen'd `regexp_count`/`regexp_replace` — rides the scan, no
    * shuffle, trivially 100 TB-parallel.
    */
  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_count(t, lit(EmailRe)).cast("int").as("n_emails"),
      regexp_count(t, lit(Ipv4Re)).cast("int").as("n_ips"),
      regexp_count(t, lit(PhoneRe)).cast("int").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("clean_text"))
  }

  /** Gopher-style repetition quality signals per document: word-2-gram
    * totals, the duplicate-2-gram fraction (1 − distinct/total) and the
    * top-2-gram fraction (most frequent 2-gram / total) — the cheap
    * detectors for boilerplate/looping text. Bigrams are built with
    * `zip_with` over two array slices (codegen'd, no UDF), then a
    * two-level aggregate: (doc, bigram) counts partial-combine map-side,
    * the per-doc rollup is a second partial+final agg — no window, no
    * skew hazard. Documents with fewer than two tokens have no 2-grams
    * and drop from the output (twin matches).
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val m = greatest(size(t) - 1, lit(0))
    val bigrams = zip_with(slice(t, lit(1), m), slice(t, lit(2), m),
      (a, b) => concat(a, lit(" "), b))
    df.select(col(idCol), explode(bigrams).as("bg"))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum("c").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        round(lit(1.0) - count(lit(1)).cast("double") / sum("c").cast("double"), 4)
          .as("dup_bigram_frac"),
        round(max("c").cast("double") / sum("c").cast("double"), 4)
          .as("top_bigram_frac"))
  }

  /** The Gopher rule battery's stopword set (Rae et al. 2021, §A1.1 —
    * "contains at least 2 of a predefined set of stop words").
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality rule battery (Rae et al. 2021
    * §A1.1, the published rule set behind MassiveText; also the
    * reference point for most later corpus-filtering stacks): per doc,
    * word count in [minWords, maxWords], mean word length in [3, 10],
    * symbol-to-word ratio ('#' and '...') ≤ 0.1, ≥ 80% of words contain
    * an alphabetic character, and ≥ 2 distinct stopwords present; plus
    * the conjunction as `keep`. Everything is per-row codegen'd array
    * arithmetic over one tokenization — zero shuffles, zero UDFs; at
    * 100 TB this is a pure map stage that fuses with the scan.
    * Ratios round to 6 dp (project fp convention).
    */
  def gopherRules(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, x) => acc + length(x))
    val meanLen = when(nWords > 0, round(sumLen.cast("double") / nWords, 6))
      .otherwise(lit(0.0))
    val nAlpha = size(filter(toks, x => x.rlike("[a-z]"))).cast("long")
    val fracAlpha = when(nWords > 0, round(nAlpha.cast("double") / nWords, 6))
      .otherwise(lit(0.0))
    val raw = col(textCol)
    val nSym = ((length(raw) - length(replace(raw, lit("#"), lit("")))) +
      (length(raw) - length(replace(raw, lit("..."), lit("")))) / 3).cast("long")
    val symRatio = when(nWords > 0, round(nSym.cast("double") / nWords, 6))
      .otherwise(lit(0.0))
    val nStop = GopherStopwords
      .map(w => when(array_contains(toks, w), 1L).otherwise(0L))
      .reduce(_ + _)
    df.select(
      col(idCol),
      nWords.as("n_words"),
      meanLen.as("mean_word_len"),
      fracAlpha.as("frac_alpha"),
      symRatio.as("symbol_ratio"),
      nStop.as("n_stopwords"),
      (nWords.between(minWords, maxWords) &&
        meanLen.between(3.0, 10.0) &&
        symRatio <= 0.1 &&
        fracAlpha >= 0.8 &&
        nStop >= 2).as("keep"))
  }

  /** Per-document mean corpus-unigram log-probability — the cheap
    * LM-quality proxy (KenLM stand-in): fit p(term) = count/total over
    * the whole corpus, score each doc by avg ln p(term), rounded to 6 dp
    * (project fp-rounding convention). The unigram table is a partial+
    * final aggregate keyed by term; the corpus total rides a broadcast
    * 1-row frame (`Engine.scalar` shape) — no driver collect, and the
    * doc-side join is a plain term-keyed shuffle join that AQE can
    * broadcast when the vocabulary is small.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tc = tok.groupBy(col("term")).agg(count(lit(1)).as("__tc"))
    val total = tc.agg(sum("__tc").cast("double").as("__total"))
    tok.join(tc, "term")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        round(avg(log(col("__tc").cast("double") / col("__total"))), 6).as("avg_logprob"),
        count(lit(1)).as("n_tokens"))
  }

  /** Deterministic domain-mixture resampling — the source-reweighting
    * step of a pretraining mix (e.g. upsample curated sources, down-
    * sample crawl): doc survives iff portableHash(id:domain) mod 10000
    * falls under the domain's per-10000 keep threshold. Hash-based, NOT
    * rand(): stage re-execution reproduces the sample exactly and the
    * mix is stable across cluster sizes. Returns per-domain (n_total,
    * n_kept) audit counts; the kept-row filter itself is the same
    * predicate inline (see [[mixtureKeep]]).
    */
  def mixtureSample(
      df: DataFrame, idCol: String, domainCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame =
    df.withColumn("__keep", mixtureKeep(col(idCol), col(domainCol), rates, defaultRate))
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"))

  /** Keep-predicate of [[mixtureSample]] (exposed so a pipeline can
    * filter rows directly). Thresholds are exact integers per 10000 —
    * no float compare crosses the engine boundary.
    */
  def mixtureKeep(
      id: Column, domain: Column,
      rates: Map[String, Double], defaultRate: Double): Column = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(math.round(defaultRate * 10000))) {
      case (acc, (k, v)) => when(domain === k, lit(math.round(v * 10000))).otherwise(acc)
    }
    pmod(portableHash(concat(id.cast("string"), lit(":"), domain)), lit(10000L)) < thr
  }

  /** Top-`k` tf-idf terms per document (the keyword/topic signal a
    * corpus-analysis pass extracts): tf = in-doc term count, idf =
    * ln(N / doc-frequency), score rounded to 6 dp with ties to the
    * lexicographically smaller term (cross-engine determinism). Shapes
    * for scale: tf and df are partial+final aggregates; the per-doc
    * top-k window partitions on the document id (max parallelism); N is
    * one count job.
    */
  def tfidfTop(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val n = df.count()
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("tfidf", round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col(idCol), col("term"), col("tfidf"))
  }
}
