package graft

import java.sql.Timestamp
import java.time.Instant
import java.util.UUID
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.operators.Clustering

/** Audit record — schema from `vector_field.py:109-117`. */
case class AuditRecord(action: String, timestamp: Timestamp,
    hash_before: String, hash_after: String, details: Map[String, String])

/** The engine facade — Spark re-expression of `VectorFieldDB`
  * (`/root/reference/aeuc_vector_db/vector_field.py:45-486`).
  *
  * State is two managed DataFrames (iglyphs, pglyphs) plus an append-only
  * audit log. DataFrames are immutable, so every mutation builds the new
  * plan and swaps the reference — serialized mutations exactly like the
  * reference's single-threaded model. The reference's two inverted-list
  * indexes (`vector_field.py:81-82`) have no materialized equivalent:
  * they are predicate pushdown + (at scale) partitioning by
  * outer_context_id.
  *
  * Deviations from the reference, documented per SURVEY.md §7.4:
  *  - membership hash is sha2-256 (JVM has no Blake2b built-in); the
  *    audited property — hash changes iff membership changes — holds.
  *  - the hash canonicalizes per-table digests of the sorted id lists
  *    rather than the full lists (the reference JSON-serializes every id,
  *    `vector_field.py:95-103`, which cannot scale past driver memory).
  */
class VectorFieldDB(val spark: SparkSession, val dim: Int) {
  require(dim >= 1, s"dim must be >= 1, got $dim")

  import spark.implicits._

  private var iglyphsDF: DataFrame = spark.emptyDataset[IGlyph].toDF()
  private var pglyphsDF: DataFrame = spark.emptyDataset[PGlyph].toDF()
  private val history = ArrayBuffer[AuditRecord]()
  private var mutationsSinceCheckpoint = 0

  var currentHash: String = computeHash()

  def iglyphs: DataFrame = iglyphsDF
  def pglyphs: DataFrame = pglyphsDF
  def changeHistory: DataFrame = history.toSeq.toDF()

  // -------------------------------------------------------------- audit

  /** Membership hash — `vector_field.py:95-103` (sha2-256 deviation).
    * One Spark job: both id sets digested in a single union-aggregate.
    */
  private def computeHash(): String = {
    val row = iglyphsDF.select(lit("i").as("t"), col("iglyph_id").as("id"))
      .unionByName(pglyphsDF.select(lit("p").as("t"), col("pglyph_id").as("id")))
      .agg(
        sha2(concat_ws(",", sort_array(collect_list(when(col("t") === "i", col("id"))))), 256),
        sha2(concat_ws(",", sort_array(collect_list(when(col("t") === "p", col("id"))))), 256))
      .head()
    val canonical =
      s"""{"iglyphs": "${row.getString(0)}", "pglyphs": "${row.getString(1)}"}"""
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(canonical.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Append an audit record — `vector_field.py:105-117`. */
  private def log(action: String, details: (String, String)*): Unit = {
    val before = currentHash
    currentHash = computeHash()
    history += AuditRecord(action, Timestamp.from(Instant.now()), before,
      currentHash, details.toMap)
  }

  /** Long mutation chains grow the logical plan; truncate lineage. */
  private def maybeCheckpoint(): Unit = {
    mutationsSinceCheckpoint += 1
    if (mutationsSinceCheckpoint >= 16) {
      iglyphsDF = iglyphsDF.localCheckpoint(true)
      pglyphsDF = pglyphsDF.localCheckpoint(true)
      mutationsSinceCheckpoint = 0
    }
  }

  // --------------------------------------------------------------- CRUD

  private def validated(g: IGlyph): IGlyph = {
    Validation.requireGlyphId(g.glyph_id)
    Validation.requireCtx(g.outer_context_id)
    Validation.requireDim(g.embedding, dim)
    g
  }

  /** Batch insert — the engine-native write path (`add_iglyph`,
    * `vector_field.py:133-175`, batch-oriented). Duplicate ids (against
    * the store or within the batch) are an error, matching the
    * reference's ValueError.
    */
  def addIGlyphs(rows: Seq[IGlyph]): Seq[String] = {
    val vs = rows.map(validated)
    val ids = vs.map(_.iglyph_id)
    require(ids.distinct.size == ids.size, s"duplicate iglyph_id in batch")
    val dups = iglyphsDF.join(ids.toDF("iglyph_id"), Seq("iglyph_id"), "left_semi")
      .select("iglyph_id").as[String].collect()
    require(dups.isEmpty, s"IGlyph id already exists: ${dups.mkString(",")}")
    iglyphsDF = iglyphsDF.unionByName(vs.toDS().toDF())
    maybeCheckpoint()
    log("ADD_IGLYPH", "count" -> vs.size.toString)
    ids
  }

  /** Distributed batch insert — no driver materialization: validation as
    * distributed counts, duplicate check as an anti-join, then union.
    * This is the write path that scales (addIGlyphs(Seq) mirrors the
    * reference's row-at-a-time API for parity).
    */
  def addIGlyphsDF(rows: DataFrame): Long = {
    val df = rows.select(iglyphsDF.columns.map(col): _*).cache()
    // all validation counts in one job: constraint violations, batch
    // size, batch-internal dups, collisions with the existing store
    val v = df
      .join(iglyphsDF.select($"iglyph_id", lit(1).as("existing")), Seq("iglyph_id"), "left")
      .agg(
        count(lit(1)).as("n"),
        countDistinct($"iglyph_id").as("n_ids"),
        // every constrained column checked isNull explicitly: a NULL
        // comparison is NULL, which would otherwise fall through
        // otherwise(0) and let the row pass as valid
        sum(when(
          $"embedding".isNull || size($"embedding") =!= dim ||
            $"glyph_id".isNull || $"glyph_id" < 0 || $"glyph_id" > Validation.GlyphIdMax ||
            $"outer_context_id".isNull ||
            $"outer_context_id" < 0 || $"outer_context_id" > Validation.CtxMax ||
            $"iglyph_id".isNull, 1L).otherwise(0L)).as("bad"),
        sum(when($"existing".isNotNull, 1L).otherwise(0L)).as("dups"))
      .head()
    val n = v.getLong(0)
    if (n == 0L) { df.unpersist(); return 0L } // sums are NULL on an empty batch
    require(v.getLong(2) == 0L, s"${v.getLong(2)} rows violate schema constraints")
    require(v.getLong(1) == n, "duplicate iglyph_id within batch")
    require(v.getLong(3) == 0L, s"${v.getLong(3)} iglyph ids already exist")
    iglyphsDF = iglyphsDF.unionByName(df).localCheckpoint(true)
    log("ADD_IGLYPH", "count" -> n.toString)
    n
  }

  /** Single insert convenience; generates a UUID when id not supplied. */
  def addIGlyph(glyphId: Int, ctx: Int, embedding: Array[Float],
      label: String = "", id: Option[String] = None,
      meta: Map[String, String] = Map.empty): String = {
    val gid = id.getOrElse(UUID.randomUUID().toString)
    addIGlyphs(Seq(IGlyph(gid, glyphId, ctx, embedding, label, None, meta)))
    gid
  }

  /** Point lookup — `vector_field.py:177-179`. */
  def getIGlyph(id: String): Option[IGlyph] =
    iglyphsDF.filter($"iglyph_id" === id).as[IGlyph].collect().headOption

  def getPGlyph(id: String): Option[PGlyph] =
    pglyphsDF.filter($"pglyph_id" === id).as[PGlyph].collect().headOption

  /** Replace embedding + refresh timestamp — `vector_field.py:181-194`.
    * Missing id → NoSuchElementException (reference KeyError).
    */
  def updateIGlyphEmbedding(id: String, embedding: Array[Float]): Unit = {
    Validation.requireDim(embedding, dim)
    if (getIGlyph(id).isEmpty) throw new NoSuchElementException(s"IGlyph not found: $id")
    iglyphsDF = iglyphsDF
      .withColumn("embedding",
        when($"iglyph_id" === id, typedLit(embedding.toSeq)).otherwise($"embedding"))
      .withColumn("timestamp",
        when($"iglyph_id" === id, lit(Timestamp.from(Instant.now()))).otherwise($"timestamp"))
    maybeCheckpoint()
    log("UPDATE_IGLYPH", "iglyph_id" -> id)
  }

  /** Delete + clean parent PGlyph member lists — `vector_field.py:196-216`. */
  def deleteIGlyph(id: String): Unit = {
    if (getIGlyph(id).isEmpty) throw new NoSuchElementException(s"IGlyph not found: $id")
    iglyphsDF = iglyphsDF.filter($"iglyph_id" =!= id)
    pglyphsDF = pglyphsDF.withColumn("member_ids", array_remove($"member_ids", id))
    maybeCheckpoint()
    log("DELETE_IGLYPH", "iglyph_id" -> id)
  }

  // --------------------------------------------------------- clustering

  /** Form a PGlyph from explicit member ids — `vector_field.py:222-265` +
    * `clustering.py:42-79`. Unknown ids are silently dropped
    * (`vector_field.py:244`); all-unknown → error.
    */
  def formCluster(memberIds: Seq[String], anchorGlyphId: Int, ctx: Int,
      clusterTag: String = "", meta: Map[String, String] = Map.empty): String = {
    Validation.requireGlyphId(anchorGlyphId)
    Validation.requireCtx(ctx)
    val members = iglyphsDF
      .join(memberIds.toDF("iglyph_id"), Seq("iglyph_id"), "left_semi")
    val pgId = UUID.randomUUID().toString
    val row = aggregateCluster(members)
      .getOrElse(throw new IllegalArgumentException("no valid member ids"))
    val (centroid, ids, inertia) = row
    val pg = PGlyph(pgId, anchorGlyphId, ctx, centroid, ids, clusterTag, inertia, meta)
    pglyphsDF = pglyphsDF.unionByName(Seq(pg).toDS().toDF())
    // back-pointers (vector_field.py:256-257)
    iglyphsDF = iglyphsDF.withColumn("proto_id",
      when($"iglyph_id".isin(ids: _*), lit(pgId)).otherwise($"proto_id"))
    maybeCheckpoint()
    log("FORM_CLUSTER", "pglyph_id" -> pgId, "member_count" -> ids.length.toString)
    pgId
  }

  /** centroid + member list + inertia in the reference's two-pass shape
    * (`clustering.py:25-34,66-68`): one vector-mean aggregate, then one
    * squared-distance pass against the (broadcast literal) centroid.
    */
  private def aggregateCluster(members: DataFrame): Option[(Array[Float], Array[String], Double)] = {
    val agg1 = members.agg(
      Clustering.vecMean($"embedding").as("centroid"),
      sort_array(collect_list($"iglyph_id")).as("ids"),
      count(lit(1)).as("n")).head()
    if (agg1.getLong(2) == 0L) return None
    val centroid = agg1.getSeq[Double](0).map(_.toFloat).toArray
    val ids = agg1.getSeq[String](1).toArray
    val inertia = members
      .agg(sum(VectorOps.squaredDistance($"embedding", typedLit(centroid.toSeq))))
      .head().getDouble(0)
    Some((centroid, ids, inertia))
  }

  /** Re-resolve members (dropping deleted), recompute centroid+inertia —
    * `vector_field.py:271-285`.
    */
  def recomputePGlyph(id: String): Unit = {
    val pg = getPGlyph(id).getOrElse(throw new NoSuchElementException(s"PGlyph not found: $id"))
    val members = iglyphsDF
      .join(pg.member_ids.toSeq.toDF("iglyph_id"), Seq("iglyph_id"), "left_semi")
    val (centroid, ids, inertia) = aggregateCluster(members)
      .getOrElse(throw new IllegalStateException(s"PGlyph $id has no remaining members"))
    val now = Timestamp.from(Instant.now())
    pglyphsDF = pglyphsDF
      .withColumn("centroid",
        when($"pglyph_id" === id, typedLit(centroid.toSeq)).otherwise($"centroid"))
      .withColumn("member_ids",
        when($"pglyph_id" === id, typedLit(ids.toSeq)).otherwise($"member_ids"))
      .withColumn("inertia", when($"pglyph_id" === id, lit(inertia)).otherwise($"inertia"))
      .withColumn("timestamp", when($"pglyph_id" === id, lit(now)).otherwise($"timestamp"))
    maybeCheckpoint()
    log("RECOMPUTE_PGLYPH", "pglyph_id" -> id)
  }

  /** φ-banded auto-clustering of one context — `vector_field.py:351-390`.
    * Returns the new pglyph ids (one per non-empty band).
    */
  def autoClusterPhi(ctx: Int, anchorGlyphId: Int, levels: Int = 3): Seq[String] = {
    Validation.requireCtx(ctx)
    val inCtx = iglyphsDF.filter($"outer_context_id" === ctx)
    if (inCtx.isEmpty) return Seq.empty
    val banded = Clustering.withPhiBand(inCtx, levels)
    val bandIds = banded.select($"band", $"iglyph_id").as[(Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    (0 until levels).flatMap { b =>
      bandIds.get(b).filter(_.nonEmpty).map { ids =>
        formCluster(ids, anchorGlyphId, ctx, s"phi_band_$b")
      }
    }
  }

  /** Batched φ-auto-clustering: all band clusters formed in one
    * aggregation pass with a single audit record — the job-count-lean
    * variant of autoClusterPhi for high-core/driver-latency-sensitive
    * runs (reference parity loop above audits one record per band).
    */
  def autoClusterPhiBatch(ctx: Int, anchorGlyphId: Int, levels: Int = 3): Seq[String] = {
    Validation.requireCtx(ctx)
    Validation.requireGlyphId(anchorGlyphId)
    val inCtx = iglyphsDF.filter($"outer_context_id" === ctx)
    val banded = Clustering.withPhiBand(inCtx, levels)
    val rows = operators.Clustering.withInertia(banded, $"band", $"iglyph_id")
      .select($"cluster_key", $"centroid", $"member_ids", $"inertia")
      .collect()
    if (rows.isEmpty) return Seq.empty
    val pgs = rows.sortBy(_.getAs[Int]("cluster_key")).map { r =>
      PGlyph(UUID.randomUUID().toString, anchorGlyphId, ctx,
        r.getSeq[Double](1).map(_.toFloat).toArray,
        r.getSeq[String](2).toArray,
        s"phi_band_${r.getAs[Int]("cluster_key")}",
        r.getAs[Double]("inertia"))
    }
    pglyphsDF = pglyphsDF.unionByName(pgs.toSeq.toDS().toDF())
    val mapping = pgs.flatMap(p => p.member_ids.map(id => (id, p.pglyph_id)))
      .toSeq.toDF("iglyph_id", "new_proto")
    iglyphsDF = iglyphsDF.join(broadcast(mapping), Seq("iglyph_id"), "left")
      .withColumn("proto_id", coalesce($"new_proto", $"proto_id"))
      .drop("new_proto")
    maybeCheckpoint()
    log("AUTO_CLUSTER_PHI", "bands" -> pgs.length.toString, "ctx" -> ctx.toString)
    pgs.map(_.pglyph_id).toSeq
  }

  // ------------------------------------------------------------- search

  /** Brute-force top-k — `vector_field.py:291-326`. Returns iglyph rows +
    * score, descending, with iglyph_id tiebreak (Python's stable sort has
    * no Spark equivalent).
    */
  def search(query: Array[Float], topK: Int = 10, metric: String = "cosine",
      glyphIdFilter: Option[Int] = None, ctxFilter: Option[Int] = None): DataFrame = {
    Validation.requireDim(query, dim)
    val filtered = Seq(
      glyphIdFilter.map(g => $"glyph_id" === g),
      ctxFilter.map(c => $"outer_context_id" === c)
    ).flatten.foldLeft(iglyphsDF)((df, p) => df.filter(p))
    filtered
      .withColumn("score",
        VectorOps.similarity(metric)($"embedding", typedLit(query.toSeq)))
      .orderBy($"score".desc, $"iglyph_id".asc)
      .limit(topK)
  }

  /** Coarse centroid search — `vector_field.py:328-345`. */
  def searchPGlyphs(query: Array[Float], topK: Int = 5,
      metric: String = "cosine"): DataFrame = {
    Validation.requireDim(query, dim)
    pglyphsDF
      .withColumn("score",
        VectorOps.similarity(metric)($"centroid", typedLit(query.toSeq)))
      .orderBy($"score".desc, $"pglyph_id".asc)
      .limit(topK)
  }

  // --------------------------------------------------------------- I/O

  /** Export all iglyphs as JSONL, sorted by timestamp —
    * `vector_field.py:396-406`.
    */
  def exportJsonl(): Dataset[String] =
    iglyphsDF.orderBy($"timestamp", $"iglyph_id").toJSON

  /** Import JSONL — `vector_field.py:408-446`: silently skip rows with
    * wrong dimension; skip existing ids (or replace when overwrite);
    * single audit record; returns imported count.
    */
  def importJsonl(lines: Dataset[String], overwrite: Boolean = false): Long = {
    val parsed = spark.read.schema(iglyphsDF.schema).json(lines)
      .filter(size($"embedding") === dim)
      .filter($"iglyph_id".isNotNull)
      .dropDuplicates("iglyph_id")
    val incoming = parsed.cache()
    val imported =
      if (overwrite) {
        val replaced = iglyphsDF.join(incoming.select("iglyph_id"), Seq("iglyph_id"), "left_anti")
        val n = incoming.count()
        iglyphsDF = replaced.unionByName(incoming)
        n
      } else {
        val fresh = incoming.join(iglyphsDF.select("iglyph_id"), Seq("iglyph_id"), "left_anti")
        val n = fresh.count()
        iglyphsDF = iglyphsDF.unionByName(fresh)
        n
      }
    iglyphsDF = iglyphsDF.localCheckpoint(true)
    log("IMPORT_JSONL", "count" -> imported.toString, "overwrite" -> overwrite.toString)
    imported
  }

  /** Full-state checkpoint — `vector_field.py:448-461`: parquet per table
    * plus a manifest.
    */
  def snapshot(outDir: String): Unit = {
    // ctx partitioning (10 values) makes the reference's ctx equality
    // filter partition pruning on reload — the 100 TB layout
    iglyphsDF.write.mode("overwrite").partitionBy("outer_context_id")
      .parquet(s"$outDir/iglyphs")
    pglyphsDF.write.mode("overwrite").parquet(s"$outDir/pglyphs")
    changeHistory.write.mode("overwrite").parquet(s"$outDir/change_history")
    val manifest =
      s"""{"version": "1.0.0", "dim": $dim, "current_hash": "$currentHash"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/manifest.json"), manifest)
  }

  /** Restore from a snapshot directory, verifying it against the
    * manifest: the snapshot's dimensionality must match this store, the
    * audit history is reloaded, and the recomputed membership hash must
    * equal the manifest's `current_hash` (tamper evidence — the point of
    * the audit chain, `vector_field.py:88-103`).
    */
  def restore(snapDir: String): Unit = {
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$snapDir/manifest.json"))
    def field(name: String): String =
      s""""$name":\\s*"?([^",}]+)"?""".r.findFirstMatchIn(manifest)
        .getOrElse(throw new IllegalStateException(
          s"manifest.json missing field '$name'")).group(1)
    val snapDim = field("dim").trim.toInt
    require(snapDim == dim,
      s"snapshot dim $snapDim does not match store dim $dim")
    iglyphsDF = spark.read.parquet(s"$snapDir/iglyphs")
    pglyphsDF = spark.read.parquet(s"$snapDir/pglyphs")
    history.clear()
    history ++= spark.read.parquet(s"$snapDir/change_history").as[AuditRecord]
      .collect().sortBy(_.timestamp.getTime)
    currentHash = computeHash()
    val expected = field("current_hash").trim
    if (currentHash != expected) throw new IllegalStateException(
      s"snapshot hash mismatch: manifest=$expected recomputed=$currentHash")
  }

  /** Live counts — `vector_field.py:467-478` (exact count-distincts). */
  def stats(): Map[String, Any] = {
    val ig = iglyphsDF.agg(count(lit(1)), countDistinct($"glyph_id"),
      countDistinct($"outer_context_id")).head()
    Map(
      "iglyph_count" -> ig.getLong(0),
      "glyph_ids_used" -> ig.getLong(1),
      "contexts_used" -> ig.getLong(2),
      "pglyph_count" -> pglyphsDF.count(),
      "history_len" -> history.size.toLong,
      "current_hash" -> currentHash,
      "version" -> "1.0.0",
      "dim" -> dim)
  }

  override def toString: String =
    s"VectorFieldDB(dim=$dim, iglyphs=${iglyphsDF.count()}, pglyphs=${pglyphsDF.count()})"
}
