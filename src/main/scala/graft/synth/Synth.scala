package graft.synth

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.schema.Turn

/** Deterministic transcript synthesizer — the canonical input table per
  * BASELINE.json `input_hint` (conv_id, turn_idx, role, text, tool, ts).
  *
  * Every value is a pure function of (sf, conv_id, turn_idx) built from
  * 64-bit-safe integer arithmetic (`+ * % &` only, operands kept far below
  * 2^62) so the exact same table can be re-generated inside DuckDB SQL by
  * [[SynthSql]] — that is what lets the driver's DuckDB oracle check even
  * the graph-derivation and iterative-algorithm queries end-to-end.
  *
  * Replaces the reference's external `gstest` fixture clone
  * (`analytical_engine/test/app_tests.sh:83`) with an in-repo generator.
  * Shape follows FIXTURES.md §1: roles {user, assistant, system, agent:%d,
  * tool}, ~25% of assistant turns invoke a tool, a small Zipf-skewed tool
  * set so the derived graph has extreme hub skew (exercises the skew
  * handling the north rule demands).
  */
object Synth {

  /** Fixed epoch: 2026-01-01T00:00:00Z, seconds. No wall-clock anywhere. */
  val BaseEpochSec: Long = 1767225600L

  val NTools: Int = 64

  /** The one mixing hash. Both operands stay < 2^41, product < 2^62. */
  def h(c: Long, i: Long): Long = (c * 1000003L + i * 7919L + 12345L) % 1000000007L

  def nConvs(sf: Double): Long = math.max(64L, math.round(sf * 20000000L))

  def nAgents(sf: Double): Long = math.max(8L, nConvs(sf) / 40L)

  /** Distinct human participants; each has ~16 conversations (web-like
    * edge density E/V ≈ 40-60: vertex state stays cache-resident while
    * edge volume carries the per-superstep work). Participants
    * are first-class vertices (north star: "vertices are conversation
    * participants/tools") — at real 10^12-turn scale these number in the
    * millions, so the vertex space must grow with the corpus.
    */
  def nUsers(sf: Double): Long = math.max(16L, nConvs(sf) / 16L)

  def userOf(c: Long, sf: Double): Long = c % nUsers(sf)

  /** Distinct assistant replicas ("assistant:<k>"). The global "assistant"
    * vertex still takes ~1/3 of assistant turns — the mega-hub the north
    * rule's skew handling is exercised against — while the replicas make
    * most consecutive-turn pairs distinct, giving the derived graph
    * web-link-graph edge density (E ≈ total turns) instead of a star.
    */
  def nAssistants(sf: Double): Long = math.max(4L, nConvs(sf) / 64L)

  def assistantOid(c: Long, i: Long, sf: Double): String =
    if (h(c, 300000L + i) % 3L == 0L) "assistant"
    else "assistant:" + (h(c, 310000L + i) % nAssistants(sf))

  /** Turns per conversation: 2..64, Zipf-ish (90% short, 10% long tail). */
  def turnsPerConv(c: Long): Int = {
    val base = 2L + h(c, 1000000L) % 7L
    val long = if (h(c, 1000001L) % 10L == 0L) h(c, 1000002L) % 56L else 0L
    (base + long).toInt
  }

  /** Agent participating at turn i — per-turn, not per-conversation, so a
    * long conversation touches many agents: keeps the derived graph's
    * average degree ~T(c) (web-link-graph-like density) instead of ~2.5
    * (star-like), which is what makes supersteps edge-bound rather than
    * vertex-bound at bench scale.
    */
  def agentOf(c: Long, i: Long, sf: Double): Long = h(c, 200000L + i) % nAgents(sf)

  /** Does the (odd-indexed, assistant) turn i invoke a tool? */
  def toolInvoked(c: Long, i: Long): Boolean = h(c, 600000L + i) % 4L == 0L

  /** Zipf-skewed tool id in [0,64): AND of two uniforms → mass near 0, so
    * tool:t0 is a mega-hub (north-rule skew fixture, FIXTURES.md §1).
    */
  def toolId(c: Long, i: Long): Long =
    (h(c, 700000L + i) % NTools) & (h(c, 800000L + i) % NTools)

  /** Is turn i an assistant turn? Odd turns are assistant except for a
    * deterministic ~1/6 of "interjections" (a follow-up from the human/
    * agent/tool side) — without interjections every edge would touch the
    * assistant vertex and the graph would be structurally triangle-free.
    */
  def isAssistant(c: Long, i: Long): Boolean =
    i % 2L == 1L && h(c, 400000L + i) % 6L != 0L

  /** Role of turn i: assistant per [[isAssistant]]; otherwise the human/
    * system/agent side, or a "tool" result turn echoing the tool the
    * previous (assistant) turn invoked.
    */
  def role(c: Long, i: Long, sf: Double): String =
    if (isAssistant(c, i)) assistantOid(c, i, sf)
    else if (i == 0L) { if (h(c, 51L) % 13L == 0L) "system" else "u" + userOf(c, sf) }
    else {
      val r = h(c, i) % 10L
      if (r == 0L) "agent:" + agentOf(c, i, sf)
      else if ((r == 1L || r == 2L) && isAssistant(c, i - 1L) && toolInvoked(c, i - 1L)) "tool"
      else "u" + userOf(c, sf)
    }

  /** Tool column: set on assistant turns that invoke a tool, and on the
    * "tool" result turn (naming the tool invoked one turn earlier).
    */
  def tool(c: Long, i: Long, sf: Double): Option[String] =
    if (isAssistant(c, i) && toolInvoked(c, i)) Some("t" + toolId(c, i))
    else if (!isAssistant(c, i) && i > 0L && role(c, i, sf) == "tool") Some("t" + toolId(c, i - 1L))
    else None

  def text(c: Long, i: Long): String =
    "txt-" + c + "-" + i + "-" + (h(c, 900000L + i) % 100000L)

  def tsSec(c: Long, i: Long): Long = BaseEpochSec + c * 300L + i

  def convId(c: Long): String = f"c$c%08d"

  def turn(c: Long, i: Long, sf: Double): Turn = Turn(
    conv_id = convId(c),
    turn_idx = i.toInt,
    role = role(c, i, sf),
    text = text(c, i),
    tool = tool(c, i, sf),
    ts = new Timestamp(tsSec(c, i) * 1000L)
  )

  /** Distributed generation, columnar: one `spark.range` over
    * conversations, `explode(sequence)` to turns, every column a pure
    * Catalyst expression mirroring the Scala functions above (verified
    * equal by SynthGraphSpec). Stays inside whole-stage codegen — ~5×
    * faster than the row-wise `flatMap[Turn]` it replaced at bench scale
    * (no per-row case-class allocation / encoder round trip).
    */
  def transcripts(spark: SparkSession, sf: Double): Dataset[Turn] = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val nAssist = nAssistants(sf)
    val nAgent = nAgents(sf)
    val nUser = nUsers(sf)
    def H(c: Column, i: Column): Column =
      (c * 1000003L + i * 7919L + 12345L) % 1000000007L
    val c = col("c")
    def Hi(off: Long, i: Column): Column = H(c, i + off)
    val turnsOf =
      lit(2L) + Hi(0L, lit(1000000L)) % 7L +
        when(Hi(0L, lit(1000001L)) % 10L === 0L, Hi(0L, lit(1000002L)) % 56L).otherwise(0L)
    val base = spark.range(0L, nConvs(sf)).toDF("c")
      .select(c, explode(sequence(lit(0L), turnsOf - 1L)).as("i"))
    val i = col("i")
    def isA(ii: Column): Column = ii % 2L === 1L && Hi(400000L, ii) % 6L =!= 0L
    def toolInv(ii: Column): Column = Hi(600000L, ii) % 4L === 0L
    def toolIdC(ii: Column): Column =
      (Hi(700000L, ii) % NTools).bitwiseAND(Hi(800000L, ii) % NTools)
    val roleC =
      when(isA(i),
        when(Hi(300000L, i) % 3L === 0L, lit("assistant"))
          .otherwise(concat(lit("assistant:"), (Hi(310000L, i) % nAssist).cast("string"))))
        .when(i === 0L,
          when(H(c, lit(51L)) % 13L === 0L, lit("system"))
            .otherwise(concat(lit("u"), (c % nUser).cast("string"))))
        .when(H(c, i) % 10L === 0L,
          concat(lit("agent:"), (Hi(200000L, i) % nAgent).cast("string")))
        .when((H(c, i) % 10L).isin(1L, 2L) && isA(i - 1L) && toolInv(i - 1L), lit("tool"))
        .otherwise(concat(lit("u"), (c % nUser).cast("string")))
    base
      .withColumn("role", roleC)
      .select(
        format_string("c%08d", c).as("conv_id"),
        i.cast("int").as("turn_idx"),
        col("role"),
        concat(lit("txt-"), c.cast("string"), lit("-"), i.cast("string"), lit("-"),
          (Hi(900000L, i) % 100000L).cast("string")).as("text"),
        when(isA(i) && toolInv(i), concat(lit("t"), toolIdC(i).cast("string")))
          .when(col("role") === "tool", concat(lit("t"), toolIdC(i - 1L).cast("string")))
          .otherwise(lit(null).cast("string")).as("tool"),
        timestamp_seconds(lit(BaseEpochSec) + c * 300L + i).as("ts"))
      .as[Turn]
  }

  /** Row-wise reference generator (kept as the equivalence oracle for the
    * columnar path above).
    */
  def transcriptsRowWise(spark: SparkSession, sf: Double): Dataset[Turn] = {
    import spark.implicits._
    spark
      .range(0L, nConvs(sf))
      .as[Long]
      .flatMap(c => (0L until turnsPerConv(c).toLong).map(i => turn(c, i, sf)))
  }

  /** Map a testdata dir name (".../sf0.01") to its scale factor. Unknown
    * dirs default to the smallest test scale.
    */
  def sfOfDir(dir: String): Double = {
    val name = dir.split('/').filter(_.nonEmpty).lastOption.getOrElse("")
    if (name.startsWith("sf")) {
      try name.drop(2).toDouble
      catch { case _: NumberFormatException => 0.001 }
    } else 0.001
  }
}
