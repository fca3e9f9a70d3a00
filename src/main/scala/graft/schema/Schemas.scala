package graft.schema

import java.sql.Timestamp

/** Core row types for the transcript-derived link-graph engine.
  *
  * `Turn` is the canonical input shape fixed by BASELINE.json `input_hint`:
  * (conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp). The reference models this as a labeled property graph
  * (vineyard ArrowFragment, see SURVEY.md §1.1); we keep it relational and
  * derive the simple graph ourselves (reference analog:
  * `analytical_engine/core/fragment/arrow_projected_fragment.h:339-409`
  * Project → one vertex/edge label, ≤1 property).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp
)

/** A vertex of the derived graph. `oid` is the external (original) id —
  * a participant role or "tool:<name>" — and `id` a dense Long assigned
  * deterministically (row_number over sorted distinct oids). Mirrors the
  * reference's oid→gid vertex map (`core/vertex_map/global_vertex_map.h`)
  * with dense per-engine ids.
  */
final case class Vertex(id: Long, oid: String)

/** A weighted directed edge in dense-id space. Weight = number of
  * occurrences of the (src,dst) link in the transcript stream.
  */
final case class Edge(src: Long, dst: Long, weight: Double)

/** An edge in oid space, before dense-id assignment. */
final case class OidEdge(src_oid: String, dst_oid: String, weight: Double)

/** Per-vertex degree summary (out/in over distinct weighted edges). */
final case class Degree(id: Long, outDeg: Long, inDeg: Long)
