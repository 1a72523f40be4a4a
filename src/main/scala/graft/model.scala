package graft

import java.sql.Timestamp
import java.time.Instant

/** Record types of the engine — Scala case-class parity with the
  * reference dataclasses (`/root/reference/aeuc_vector_db/types.py`).
  * Stored as Datasets/DataFrames; validation constraints from
  * `types.py:52-62,120-128,206-214` are enforced at ingest.
  *
  * `meta` is the reference's heterogeneous `Dict[str, Any]`
  * (`types.py:116`): in the typed case-class view it is a JSON document
  * string; in the facade's stored frames it is a `variant` column
  * (Spark 4's semi-structured type), so nested values — numbers, lists,
  * objects — survive JSONL export/import byte-faithfully and are
  * queryable with `variant_get`.
  */

/** Instance Glyph — one stored observation (`types.py:89-165`). */
case class IGlyph(
    iglyph_id: String,
    glyph_id: Int,
    outer_context_id: Int,
    embedding: Array[Float],
    label: String = "",
    proto_id: Option[String] = None,
    meta: String = "{}",
    version: String = "1.0.0",
    timestamp: Timestamp = Timestamp.from(Instant.now()))

/** Proto Glyph — cluster centroid prototype (`types.py:173-233`). */
case class PGlyph(
    pglyph_id: String,
    glyph_id: Int,
    outer_context_id: Int,
    centroid: Array[Float],
    member_ids: Array[String],
    cluster_tag: String = "",
    inertia: Double = 0.0,
    meta: String = "{}",
    version: String = "1.0.0",
    timestamp: Timestamp = Timestamp.from(Instant.now()))

/** Lightweight raw embedding record for streaming/bulk use
  * (`types.py:29-81`).
  */
case class VectorEntry(
    entry_id: String,
    glyph_id: Int,
    outer_context_id: Int,
    embedding: Array[Float],
    source_tag: String = "",
    meta: String = "{}",
    version: String = "1.0.0",
    timestamp: Timestamp = Timestamp.from(Instant.now()))

object Validation {
  /** Address-space bounds — `types.py:121-128`. */
  val GlyphIdMax = 143999
  val CtxMax = 9

  def requireGlyphId(v: Int): Unit =
    require(v >= 0 && v <= GlyphIdMax,
      s"glyph_id must be in [0, $GlyphIdMax], got $v")

  def requireCtx(v: Int): Unit =
    require(v >= 0 && v <= CtxMax,
      s"outer_context_id must be in [0, $CtxMax], got $v")

  /** Embedding must be 1-D of exactly `dim` — `vector_field.py:119-127`. */
  def requireDim(e: Array[Float], dim: Int): Unit =
    require(e != null && e.length == dim,
      s"embedding must have dimension $dim, got ${if (e == null) "null" else e.length}")

  def requireNonEmpty(e: Array[Float]): Unit =
    require(e != null && e.nonEmpty, "embedding must not be empty")
}
