package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Brute-force and coarse-to-fine top-k vector search.
  *
  * Re-expresses the reference's scan→score→sort→limit query engine
  * (`/root/reference/aeuc_vector_db/vector_field.py:291-345`) as a
  * declarative Spark plan: `filter → project(score) → orderBy desc →
  * limit k`. Catalyst plans this as a parquet scan (with predicate
  * pushdown for the equality filters) followed by
  * `TakeOrderedAndProject` — per-partition top-k heaps merged on the
  * driver, no shuffle, no full sort materialization. This is the shape
  * that survives a 1000-executor 100 TB scan: each task returns at most
  * k rows.
  *
  * Tie-breaking: the reference relies on Python's stable sort
  * (`vector_field.py:325`); Spark sorts are not stable, so every query
  * adds an explicit secondary ascending sort on the id column.
  */
object Search {

  /** The query vector: the embedding of `vec_id = queryId`, broadcast as a
    * one-row dimension to every candidate row. Self-contained per sf dir.
    */
  def queryVector(emb: DataFrame, queryId: Long = 0L): DataFrame =
    emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))

  /** A score that can participate in a ranking: non-null (a NULL
    * embedding scores null) and non-NaN (a corrupt value anywhere in a
    * vector propagates NaN through the dot product). Spark's ordering
    * puts NaN ABOVE every real double, so without this guard ONE
    * poisoned row in 100 TB would sit at rank 1 of every descending
    * top-k in the corpus; nulls would ride along under `limit` whenever
    * candidates < k. Every ranking path filters on it.
    */
  private[operators] def rankable(score: org.apache.spark.sql.Column) =
    score.isNotNull && !isnan(score)

  /** Top-k most-similar vectors to the query — `vector_field.py:291-326`
    * with no filters. Output: (vec_id, score) sorted by score desc.
    */
  def topK(emb: DataFrame, metric: String, k: Int, queryId: Long = 0L): DataFrame =
    emb.crossJoin(broadcast(queryVector(emb, queryId)))
      .select(col("vec_id"),
        round(VectorOps.similarity(metric)(col("embedding"), col("q_embedding")), 6)
          .as("score"))
      .filter(rankable(col("score")))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)

  /** Top-k with the reference's two equality filters
    * (`vector_field.py:316-322`). The test tables carry no
    * glyph_id/outer_context_id, so the engine derives the reference's
    * address space from vec_id: glyph_id = vec_id % 144000, ctx = vec_id
    * % 10. The filters are plain pushdown-able predicates — at scale they
    * become partition pruning when the table is partitioned by ctx.
    */
  def topKFiltered(emb: DataFrame, metric: String, k: Int,
                   glyphIdFilter: Option[Long] = None,
                   ctxFilter: Option[Int] = None,
                   queryId: Long = 0L): DataFrame = {
    val withAddr = graft.sources.Tables.withAddressSpace(emb)
    val filtered = Seq(
      glyphIdFilter.map(g => col("glyph_id") === g),
      ctxFilter.map(c => col("outer_context_id") === c)
    ).flatten.foldLeft(withAddr)((df, p) => df.filter(p))
    filtered.crossJoin(broadcast(queryVector(emb, queryId)))
      .select(col("vec_id"), col("glyph_id"), col("outer_context_id"),
        round(VectorOps.similarity(metric)(col("embedding"), col("q_embedding")), 6)
          .as("score"))
      .filter(rankable(col("score")))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Bounded top-k aggregate over (id, score) pairs: keeps at most k
    * entries per buffer, ordered score desc then id asc. Map-side
    * partial aggregation means the per-query shuffle carries k rows per
    * partition instead of every scored pair — the difference between a
    * k-NN join that survives 100 TB and one that sorts n·q rows
    * (the window/row_number formulation sorts each query's full
    * candidate list).
    */
  class TopKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Double), Array[(Long, Double)], Array[(Long, Double)]] {
    private def better(a: (Long, Double), b: (Long, Double)): Boolean =
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    private def trim(buf: Array[(Long, Double)]): Array[(Long, Double)] =
      if (buf.length <= k) buf
      else buf.sortWith(better).take(k)
    def zero: Array[(Long, Double)] = Array.empty
    // amortized: let the buffer grow to 2k unsorted, trim back to the
    // best k only when it fills — O(log k) amortized per row instead of
    // a sort per insert; any superset of the true top-k trims identically
    def reduce(b: Array[(Long, Double)], a: (Long, Double)): Array[(Long, Double)] = {
      val grown = b :+ a
      if (grown.length >= 2 * k) trim(grown) else grown
    }
    def merge(x: Array[(Long, Double)], y: Array[(Long, Double)]): Array[(Long, Double)] =
      trim(x ++ y)
    def finish(r: Array[(Long, Double)]): Array[(Long, Double)] = trim(r).sortWith(better)
    def bufferEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Double)]]()
    def outputEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Double)]]()
  }

  /** k-NN join: for each of the `nQueries` lowest-id vectors, its top-k
    * neighbours among all other vectors. The query side is tiny →
    * broadcast; per-query top-k via the bounded TopKAgg (map-side
    * partial top-k, no per-query sort of the full candidate list).
    */
  def knnJoin(emb: DataFrame, metric: String, k: Int, nQueries: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]())
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorOps.similarity(metric)(col("embedding"), col("q_embedding")), 6)
          .as("score"))
    scored
      .filter(rankable(col("score")))
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("score")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p._1").as("neighbor_id"), col("p._2").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** Batched brute-force top-k: for every (query_id, q_embedding) row,
    * the top-k most-similar vectors — the [[knnJoin]] scan shape
    * WITHOUT the self-exclusion (a query is allowed to find itself;
    * evaluators want that). Broadcast query side, bounded [[TopKAgg]]
    * map-side partial top-k.
    */
  def topKMany(emb: DataFrame, queries: DataFrame, metric: String,
      k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]())
    emb.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        round(VectorOps.similarity(metric)(col("embedding"), col("q_embedding")), 6)
          .as("score"))
      .filter(rankable(col("score")))
      .groupBy(col("query_id"))
      .agg(topk(col("vec_id"), col("score")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p._1").as("vec_id"), col("p._2").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Matryoshka-truncation recall (Kusupati et al. 2022, MRL): how much
    * of the full-dimension top-k survives when vectors are cut to their
    * FIRST `dims` dimensions — the storage/recall dial of
    * matryoshka-trained embeddings, where prefixes are usable
    * representations (4× storage cut at dims = d/4 before any
    * quantization). Both arms share the [[topKMany]] scan shape; cosine
    * is scale-invariant, so the truncated arm needs no renormalization.
    * Output: (query_id, n_hits, recall) — exact integer hits over an
    * exact k denominator, engine-portable.
    *
    * For matryoshka-TRAINED embeddings this recall stays near 1 at
    * aggressive cuts; for arbitrary embeddings (the synthetic test
    * vectors) it is just a truncation-damage report — either way the
    * evaluator an embedding-storage decision reads.
    */
  def mrlTruncationRecall(emb: DataFrame, metric: String, dims: Int,
      k: Int, nQueries: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    val full = emb
    val trunc = emb.select(col("vec_id"),
      slice(col("embedding"), 1, dims).as("embedding"))
    val queries = full.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val queriesT = trunc.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val exact = topKMany(full, queries, metric, k)
      .select(col("query_id"), col("vec_id"))
    val cut = topKMany(trunc, queriesT, metric, k)
      .select(col("query_id"), col("vec_id"))
    val hits = exact.join(cut, Seq("query_id", "vec_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    queries.select(col("query_id")).join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / k.toDouble, 6)
          .as("recall"))
      .orderBy(col("query_id"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    * score-free combiner for hybrid retrieval: fuse two ranked lists
    * (id, rank) into one by Σ 1/(k0 + rank), ids missing from a list
    * contributing 0 from it. Score-free matters: BM25 and cosine live
    * on incomparable scales, and RRF never compares them — only the
    * ranks.
    *
    * Shape: both inputs are top-k lists (bounded by construction), so
    * the full-outer equi-join and the final TakeOrdered cut are
    * driver-trivial at any corpus size — the heavy lifting happened in
    * the retrievers. The two reciprocal terms add left-to-right in
    * both engines; k0 = 60 is the paper's constant.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k0: Int = 60, topK: Int = 10): DataFrame = {
    require(k0 >= 1, s"k0 must be >= 1, got $k0")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val fa = a.select(col("id"), col("rank").as("rank_a"))
    val fb = b.select(col("id"), col("rank").as("rank_b"))
    fa.join(fb, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"), col("rank_a"), col("rank_b"),
        round(coalesce(lit(1.0) / (lit(k0) + col("rank_a")), lit(0.0))
            + coalesce(lit(1.0) / (lit(k0) + col("rank_b")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)
  }

  /** Binary-quantized sign signatures: `(vec_id, sig0..sigW)` — one
    * 32-bit word per 32 dims ([[VectorOps.signWord]]). This is the
    * materialization step of the binary-quantization path: at 100 TB
    * the signature table is what gets persisted (8 bytes/row for
    * 64-dim vectors — a 32× IO cut over the float table), and
    * [[hammingRerank]]'s first stage scans ONLY it.
    */
  def signSignatures(emb: DataFrame, dim: Int): DataFrame = {
    require(dim >= 1 && dim % 32 == 0, s"dim must be a positive multiple of 32, got $dim")
    val words = dim / 32
    val sigCols = (0 until words).map(w =>
      VectorOps.signWord(col("embedding"), w * 32).as(s"sig$w"))
    emb.select(col("vec_id") +: sigCols: _*)
  }

  /** Two-stage binary-quantized search: (1) rank the WHOLE corpus by
    * Hamming distance between 1-bit sign signatures — a popcount-XOR
    * scan over the 8-byte signature table, cut to `candidates` rows by
    * `TakeOrderedAndProject` (no shuffle, k rows per task); (2) rerank
    * only those candidates with the exact float cosine, joined back to
    * the raw table by a broadcast of the bounded candidate list. The
    * modern vector-DB "binary quantization + rescore" operating point:
    * stage 1 reads 1/32nd of the bytes, stage 2 touches `candidates`
    * rows regardless of corpus size. Recall is governed by the
    * candidates/topK ratio (the caller's dial); ties in both stages
    * break on vec_id so the cut is deterministic in any engine.
    */
  def hammingRerank(emb: DataFrame, q: Array[Float], candidates: Int,
      topK: Int): DataFrame = {
    require(candidates >= topK, s"candidates $candidates must be >= topK $topK")
    val dim = q.length
    val words = dim / 32
    val qWords = Array.tabulate(words) { w =>
      (0 until 32).foldLeft(0L)((acc, i) =>
        if (q(w * 32 + i) > 0f) acc | (1L << i) else acc)
    }
    val ham = (0 until words).map(w =>
      bit_count(col(s"sig$w").bitwiseXOR(lit(qWords(w))))).reduce(_ + _)
    val cand = signSignatures(emb, dim)
      .select(col("vec_id"), ham.cast("int").as("hamming"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
      .limit(candidates)
    val qd = typedLit(q.map(_.toDouble).toSeq)
    emb.join(broadcast(cand), "vec_id")
      .select(col("vec_id"), col("hamming"),
        round(VectorOps.cosineSimilarity(col("embedding"), qd), 6).as("score"))
      .filter(rankable(col("score")))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(topK)
  }

  /** Hard-negative mining for contrastive / metric training data: for
    * each query vector, its top-k most-similar vectors carrying a
    * DIFFERENT label — the negatives nearest the decision boundary,
    * which are the ones worth putting in a batch (Robinson et al. 2021,
    * "Contrastive Learning with Hard Negative Samples"). Identical
    * scan shape to [[knnJoin]] (broadcast query side, bounded
    * [[TopKAgg]], map-side partial top-k) with the label-mismatch
    * predicate applied BEFORE scoring, so same-label rows never pay
    * the dot product. The neighbor's label rides along via a final
    * broadcast join of the tiny (queries × k) result against the
    * label projection — the big table streams, nothing driver-side.
    */
  def hardNegatives(emb: DataFrame, metric: String, k: Int, nQueries: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]())
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("q_embedding"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("label") =!= col("q_label"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(VectorOps.similarity(metric)(col("embedding"), col("q_embedding")), 6)
          .as("score"))
    val ranked = scored
      .filter(rankable(col("score")))
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("score")).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p._1").as("neighbor_id"), col("p._2").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
    emb.select(col("vec_id").as("neighbor_id"), col("label"))
      .join(broadcast(ranked), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("label").cast("int").as("label"),
        col("score"), col("rank"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** Triplet mining — the full contrastive-training input
    * [[hardNegatives]] supplies only half of: for each anchor, its
    * nearest SAME-label neighbor (the positive, self excluded) and its
    * nearest DIFFERENT-label neighbor (the hard negative), plus the
    * margin between them — the quantity a triplet loss drives positive
    * and a mining dashboard histograms (anchors with negative margin
    * are the batch-worthy ones: their impostor currently outranks
    * their positive; Schroff et al. 2015, FaceNet §3.2).
    *
    * ONE broadcast-join scan scores every (anchor, candidate) pair
    * once; both arms come out of a SINGLE aggregation pass by grouping
    * on (anchor, label-match flag) — two bounded [[TopKAgg]] rows per
    * anchor cross the exchange, never a per-anchor sort of the corpus,
    * and the arm split happens on that tiny 2·|anchors| frame. Anchors
    * missing an arm (no same-label partner, or single-label data) drop
    * out via the inner join — a triplet needs both sides.
    */
  def tripletMining(emb: DataFrame, metric: String, nQueries: Int): DataFrame = {
    val top1 = udaf(new TopKAgg(1),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]())
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("q_embedding"))
    val arms = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), (col("label") === col("q_label")).as("same"),
        col("vec_id").as("cand_id"),
        round(VectorOps.similarity(metric)(col("embedding"), col("q_embedding")), 6)
          .as("score"))
      .filter(rankable(col("score")))
      .groupBy(col("query_id"), col("same"))
      .agg(top1(col("cand_id"), col("score")).as("nn"))
      .select(col("query_id"), col("same"),
        col("nn")(0).getField("_1").as("cand_id"),
        col("nn")(0).getField("_2").as("score"))
    arms.filter(col("same"))
      .select(col("query_id"), col("cand_id").as("positive_id"),
        col("score").as("pos_score"))
      .join(arms.filter(!col("same"))
        .select(col("query_id"), col("cand_id").as("negative_id"),
          col("score").as("neg_score")), Seq("query_id"))
      .select(col("query_id"), col("positive_id"), col("pos_score"),
        col("negative_id"), col("neg_score"),
        round(col("pos_score") - col("neg_score"), 6).as("margin"))
      .orderBy(col("query_id"))
  }
}
