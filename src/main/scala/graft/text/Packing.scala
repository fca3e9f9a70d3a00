package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the training-data prep step that
  * assigns every document a position in a stream of fixed-token-budget
  * training sequences (the GPT-style "concatenate the corpus, chunk at
  * max_len" packing; documents may span chunk boundaries).
  *
  * Deterministic distributed form: documents are hash-bucketed by
  * `portableHash(doc_id) % buckets`; within a bucket the token streams
  * concatenate in doc_id order and chunk at `maxTokens` boundaries.
  * Each bucket packs independently, so the only non-partial-aggregable
  * step (the running token sum) is a window whose partition is 1/buckets
  * of the corpus — at 100 TB set buckets ≈ cluster cores and no task
  * ever sees more than one bucket (a single global pack order would
  * serialize the corpus through one task; hash bucketing is how real
  * packers shard this while keeping the assignment reproducible).
  */
object Packing {

  /** One row per document: (doc_id, bucket, n_tokens, seq, off) where
    * `seq` is the chunk index within the bucket where the document
    * starts and `off` the token offset inside that chunk.
    */
  def packChunks(
      docs: DataFrame,
      maxTokens: Int,
      buckets: Int = 64,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(maxTokens > 0 && buckets > 0, "need positive maxTokens and buckets")
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
    docs.select(
        col(idCol),
        pmod(TextOps.portableHash(col(idCol).cast("string")), lit(buckets.toLong))
          .as("bucket"),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col("bucket"), col("n_tokens"),
        (col("__start") / maxTokens).cast("long").as("seq"),
        (col("__start") % maxTokens).as("off"))
  }

  /** Per-(bucket, seq) packing summary — chunk fill statistics a
    * training pipeline monitors (documents starting in the chunk and the
    * tokens they contribute to the stream).
    */
  def chunkStats(packed: DataFrame): DataFrame =
    packed.groupBy(col("bucket"), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("stream_tokens"))

  /** Overlapping token-window chunking — the retrieval-corpus (RAG) prep
    * step: each document becomes one row per `stride`-spaced window of
    * `chunkTokens` tokens (the tail window may be shorter). Pure
    * per-row array expressions — no shuffle at all until the caller
    * aggregates; a 100 TB corpus chunks entirely map-side.
    */
  def tokenChunks(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int
  ): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "need positive chunkTokens and stride")
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))).as("s"))
      .select(col(idCol),
        (col("s") / stride).cast("long").as("chunk_id"),
        size(slice(col("toks"), col("s") + 1, lit(chunkTokens))).as("n_chunk_tokens"),
        array_join(slice(col("toks"), col("s") + 1, lit(chunkTokens)), " ").as("chunk_text"))
  }
}
