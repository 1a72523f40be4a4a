package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north-star
  * extensions; SURVEY.md §2.9). All expressions are chosen to evaluate
  * identically in DuckDB for the oracle: whitespace tokenization via
  * regex split, marker-word language scoring with integer counts,
  * RE2-compatible token regexes, md5/sha2 fingerprints.
  */
object TextAnalysis {

  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Per-document quality stats: token counts, type-token ratio, average
    * word length, share of "long" words. Integer-derived ratios rounded
    * once → hash-stable.
    */
  def textStats(docs: DataFrame): DataFrame =
    docs
      .withColumn("ws", words(col("text")))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_txt"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct_words"),
        round(size(array_distinct(col("ws"))).cast("double") / size(col("ws")), 6).as("ttr"),
        round(aggregate(transform(col("ws"), w => length(w).cast("long")),
          lit(0L), (acc, x) => acc + x).cast("double") / size(col("ws")), 6)
          .as("avg_word_len"),
        round(size(filter(col("ws"), w => length(w) >= 6)).cast("double") / size(col("ws")), 6)
          .as("long_word_ratio"))
      .orderBy(col("doc_id"))

  /** Marker words per language — deterministic, tiny, broadcast as
    * literals into the scoring expression on both engines.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow", "key"),
    "de" -> Seq("der", "die", "und", "table", "value"),
    "es" -> Seq("el", "la", "y", "data", "row"),
    "fr" -> Seq("le", "la", "et", "query", "window"),
    "zh" -> Seq("的", "是", "了", "join", "merge"))

  /** n-gram-heuristic language ID: score = marker-word hits per language;
    * prediction = argmax with ties broken by language-name order (strict
    * `>` fold keeps it deterministic).
    */
  def langId(docs: DataFrame): DataFrame = {
    val ws = col("ws")
    def score(markers: Seq[String]): Column =
      size(filter(ws, w => markers.map(m => w === m).reduce(_ || _))).cast("long")
    val scored = docs.withColumn("ws", words(col("text")))
      .select(col("doc_id") +: langMarkers.map { case (l, m) => score(m).as(s"score_$l") }: _*)
    val pred = langMarkers.map(_._1).tail.foldLeft(
      (lit(langMarkers.head._1), col(s"score_${langMarkers.head._1}"))) {
      case ((bestLang, bestScore), l) =>
        (when(col(s"score_$l") > bestScore, lit(l)).otherwise(bestLang),
          when(col(s"score_$l") > bestScore, col(s"score_$l")).otherwise(bestScore))
    }._1
    scored.withColumn("pred_lang", pred).orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex tokenizer
    * (letters | digits | single punctuation) — RE2-compatible pattern.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(words(col("text"))).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")).cast("long")
        .as("re_tokens"))
      .orderBy(col("doc_id"))

  /** Bounded distinct-min-k: the k lexicographically smallest distinct
    * md5 hashes of the text's 8-grams, in one O(n log k) pass (the
    * column-expression formulation pays O(n²) in `array_distinct` plus a
    * full sort).
    */
  private def minKUdf(k: Int) = udf { text: String =>
    val md = graft.functions.HashUtil.md5Digest
    // codepoints, not UTF-16 code units: the oracle's substr() and the
    // upstream length() filter both count codepoints, and a code-unit
    // window would split surrogate pairs on non-BMP text
    val cp = text.codePoints().toArray
    val kept = new java.util.TreeSet[String]()
    var i = 0
    val last = cp.length - 8
    while (i <= last) {
      val h = graft.functions.HashUtil.md5Hex(md, new String(cp, i, 8))
      if (kept.size < k || h < kept.last()) {
        kept.add(h)
        if (kept.size > k) kept.pollLast()
      }
      i += 1
    }
    kept.toArray(new Array[String](kept.size)).toSeq
  }

  /** Bottom-k md5 sketch over character 8-grams — a winnowing-style
    * document fingerprint: the k lexicographically smallest 8-gram
    * hashes identify near-identical content under local edits. Computed
    * entirely per-row; no explode-then-window shuffle of the gram set.
    */
  def minKSketch(docs: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    Partitioning.spread(docs)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"), posexplode(minKUdf(k)(col("text"))).as(Seq("pos", "h")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("rank"), col("h"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** TF-IDF top terms per document: tf(d,w) · ln(N/df(w)), the k
    * highest-scoring terms per doc. The inverted shape — one tf row per
    * (doc, word), one df row per word, broadcast corpus size — is the
    * plan that scales: no per-doc vocabulary materialization, shuffles
    * keyed by word then by doc.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    // tf feeds both the df aggregation and the scoring join; exchange
    // reuse does not deduplicate the two subtrees (verified: 3 parquet
    // scans, 0 ReusedExchange uncached), so the explode+count pass over
    // the corpus would run twice. MEMORY_AND_DISK cache (DF default)
    // spills gracefully when the (doc, word) table outgrows memory.
    val tf = Partitioning.spread(docs)
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      .cache()
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf.join(df, "word").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("word"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** Sliding word-window chunking for training pipelines: windows of
    * `chunkSize` tokens advancing by `chunkSize − overlap`, last window
    * truncated. Pure per-row array slicing → explode; no shuffle.
    */
  def chunkWords(docs: DataFrame, chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val ws = words(col("text"))
    docs
      .withColumn("ws", ws)
      .withColumn("n_chunks",
        greatest(ceil((size(col("ws")) - lit(overlap)).cast("double") / stride), lit(1))
          .cast("int"))
      .withColumn("chunk_idx", explode(sequence(lit(0), col("n_chunks") - 1)))
      .withColumn("chunk_ws",
        slice(col("ws"), col("chunk_idx") * stride + 1, lit(chunkSize)))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk_ws")).cast("long").as("n_words"),
        concat_ws(" ", col("chunk_ws")).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Full-text digests. */
  def digests(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), sha2(col("text"), 256).as("sha256"),
        md5(col("text")).as("md5"))
      .orderBy(col("doc_id"))
}
