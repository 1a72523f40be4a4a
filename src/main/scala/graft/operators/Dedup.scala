package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Deduplication operators for large-scale training-data pipelines.
  *
  * None of these exist in the reference (SURVEY.md §2.9) — they are the
  * north-star LLM-pipeline extensions. All are built join-first so the
  * same plan runs at 100 TB:
  *
  *  - exact:   hash-groupBy on a text digest — one shuffle on the digest.
  *  - n-gram Jaccard: inverted shingle index self-join (only pairs that
  *    share ≥1 shingle are ever materialized — no O(n²) cross product).
  *  - MinHash+LSH: md5-keyed minhash signatures → banded bucket join →
  *    exact-Jaccard verification of candidates only.
  *  - SimHash: 16-bit signature; candidate pairs by nibble blocking
  *    (pigeonhole: hamming ≤ 3 ⇒ ≥1 of 4 nibbles equal), then exact
  *    hamming filter via xor+bit_count.
  *  - embedding cosine: brute-force scored pairs (baseline; the IVF/LSH
  *    scale path lives in Ann.scala).
  *
  * Hashes are md5/sha2 column functions — identical in DuckDB, which
  * keeps every operator oracle-checkable.
  */
object Dedup {

  /** Whitespace tokenization shared by all text operators. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct 3-word shingles per document: (doc_id, shingle). */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val ws = words(col("text"))
    docs
      .withColumn("ws", ws)
      .filter(size(col("ws")) >= n)
      .withColumn("shingle", explode(array_distinct(
        transform(sequence(lit(0), size(col("ws")) - n),
          i => concat_ws(" ", (0 until n).map(o => element_at(col("ws"), i + o + 1)): _*)))))
      .select(col("doc_id"), col("shingle"))
  }

  /** Exact-duplicate summary via content digest groupBy. */
  def exactSummary(docs: DataFrame): DataFrame =
    docs.select(sha2(col("text"), 256).as("h"), col("doc_id"))
      .groupBy(col("h")).agg(count(lit(1)).as("c"))
      .agg(
        sum(col("c")).as("n_docs"),
        count(lit(1)).as("n_distinct"),
        (sum(col("c")) - count(lit(1))).as("n_dup_docs"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_groups"))

  /** Pairwise shingle-set Jaccard via inverted index: explode → self-join
    * on shingle → count the intersection per pair → join per-doc set
    * sizes. Only co-occurring pairs are generated; at scale add a
    * document-frequency cutoff on pathological shingles before the join.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double, n: Int = 3): DataFrame = {
    val sh = shingles(docs, n).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash signatures: sig(seed) = min over shingles of
    * md5(seed || ':' || shingle), seeds 0..k−1. A string-min minhash —
    * md5 is available verbatim in DuckDB, making the whole LSH pipeline
    * oracle-checkable. Output: (doc_id, seed, minhash).
    */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame =
    sh.crossJoin(broadcast(
        spark_range_df(sh, k)))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("shingle"))))
        .as("minhash"))

  private def spark_range_df(ref: DataFrame, k: Int): DataFrame =
    ref.sparkSession.range(k).select(col("id").as("seed"))

  /** MinHash-LSH near-dup pairs: k=16 signature, 4 bands × 4 rows.
    * Candidates = pairs sharing any band digest; verified with exact
    * shingle Jaccard. One shuffle to build signatures, one band-key
    * self-join on tiny (doc, band) rows, one verification join.
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double,
                      k: Int = 16, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val sh = shingles(docs).cache()
    val sig = minhashSignatures(sh, k)
    val banded = sig
      // floor(): Spark double→int cast truncates but DuckDB rounds — make
      // the band id an explicit floor on both engines
      .withColumn("band", floor(col("seed") / rows).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      // order within the band is fixed by seed → deterministic digest
      .agg(md5(concat_ws("|", array_sort(collect_list(
        concat(col("seed").cast("string"), lit("="), col("minhash")))))).as("band_key"))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val inter = candidates
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingle", "sa"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingle", "sb"), "doc_b")
      .filter(col("sa") === col("sb"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 32-bit SimHash per document. Bit j = sign of Σ_words count(word) ·
    * (±1 by the high bit of the j-th nibble of md5(word) — md5 has
    * exactly 32 hex nibbles). Pure integer arithmetic → bit-stable
    * across engines.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val wordCounts = docs
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("w")))
    val bits = wordCounts
      .crossJoin(broadcast(spark_range_df(docs, 32).withColumnRenamed("seed", "j")))
      // high bit of the j-th md5 nibble: hex chars '8'..'f' sort >= '8'
      .withColumn("contrib",
        when(col("h").substr(col("j").cast("int") + lit(1), lit(1)) >= "8",
          col("cnt")).otherwise(-col("cnt")))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("contrib")).as("weight"))
    bits
      .groupBy(col("doc_id"))
      .agg(sum(when(col("weight") > 0, expr("shiftleft(1L, CAST(j AS INT))"))
        .otherwise(0L)).as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup pairs, hamming ≤ maxDist (≤3 with 4-byte
    * blocking: any pair within hamming 3 of a 32-bit hash shares at
    * least one exact byte — pigeonhole over 4 blocks) → candidates via
    * byte equi-join, then the exact xor+bit_count filter.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val nibbles = sh.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("q"))
      .withColumn("nib", expr("shiftright(simhash, CAST(q*8 AS INT)) & 255"))
    val cand = nibbles.as("x").join(nibbles.as("y"),
        col("x.q") === col("y.q") && col("x.nib") === col("y.nib") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Brute-force embedding near-dup: top-N pairs by cosine. Baseline for
    * Ann.scala's bucketed variant; the a<b self-join halves the score
    * work and the top-N is a TakeOrderedAndProject merge.
    */
  def embeddingTopPairs(emb: DataFrame, topN: Int): DataFrame = {
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(VectorOps.cosineSimilarity(col("ea"), col("eb")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(topN)
  }
}
