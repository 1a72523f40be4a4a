package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.VecExpressions

/** Array-column vector kernels — the engine's scalar function library.
  *
  * Re-expresses the reference's similarity metrics
  * (`/root/reference/aeuc_vector_db/similarity.py:31-74`) as Spark column
  * expressions over `array<float>` columns. The first four metrics are pure
  * higher-order-function expressions (`zip_with` + `aggregate`), which stay
  * inside whole-stage codegen — no UDF boxing on the hot path. Only the
  * φ-weighted metric (a 23-line numpy kernel in the reference) drops to a
  * Scala UDF, with float64 math matching `similarity.py:52-74` exactly.
  *
  * Accumulation is left-to-right over the array in Double, which makes
  * per-row scores bit-deterministic (same fold order as a sequential loop)
  * — required for the DuckDB oracle comparison.
  */
object VectorOps {

  /** Golden ratio — `similarity.py:22`. */
  val Phi: Double = (1.0 + math.sqrt(5.0)) / 2.0

  /** φ^n for n ∈ [-3, 6] — `similarity.py:23`. Aliases the codegen
    * kernel's table so the engine's native expression and the oracle
    * SQL interpolation (SparkEntry reads this val) consume the SAME
    * doubles — one source of truth for a bit-parity-critical constant.
    */
  val PhiPowers: Array[Double] = org.apache.spark.sql.graftx.PhiKernel.PhiPowers

  private def d(c: Column): Column = c.cast("double")

  /** Σ aᵢ·bᵢ in double precision — `similarity.py:47-49`. Native codegen
    * expression (same left-to-right double fold as the HOF formulation —
    * bit-identical results, no per-row allocation).
    */
  def dotProduct(a: Column, b: Column): Column = VecExpressions.vecDot(a, b)

  /** L2 norm ‖a‖. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** L2 distance ‖a−b‖ — `similarity.py:37-39`. */
  def euclideanDistance(a: Column, b: Column): Column =
    sqrt(VecExpressions.vecSqDist(a, b))

  /** cos(a,b) = dot/(‖a‖·‖b‖ + 1e-12), zero-vector-safe — `similarity.py:31-34`. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b) + lit(1e-12))

  /** 1/(1+L2) similarity in (0,1] — `similarity.py:42-44`. */
  def euclideanSimilarity(a: Column, b: Column): Column =
    lit(1.0) / (lit(1.0) + euclideanDistance(a, b))

  /** φ-harmonic weighted cosine — exact float64 port of `similarity.py:52-74`.
    * Per-dim weight = 1/(dist of avg-magnitude to nearest φⁿ + 1e-8),
    * normalized to sum 1 (+1e-12 guard); cosine over the weighted vectors.
    */
  def phiWeightedSimilarity(a: Array[Float], b: Array[Float]): Double = {
    val n = a.length
    val wRaw = new Array[Double](n)
    var wSum = 0.0
    var i = 0
    while (i < n) {
      val avgMag = (math.abs(a(i).toDouble) + math.abs(b(i).toDouble)) / 2.0 + 1e-12
      var minD = Double.MaxValue
      var p = 0
      while (p < PhiPowers.length) {
        val dd = math.abs(avgMag - PhiPowers(p))
        if (dd < minD) minD = dd
        p += 1
      }
      wRaw(i) = 1.0 / (minD + 1e-8)
      wSum += wRaw(i)
      i += 1
    }
    val norm = wSum + 1e-12
    var dot = 0.0; var na = 0.0; var nb = 0.0
    i = 0
    while (i < n) {
      val w = wRaw(i) / norm
      val wa = a(i).toDouble * w
      val wb = b(i).toDouble * w
      dot += wa * wb; na += wa * wa; nb += wb * wb
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb) + 1e-12)
  }

  val phiWeightedUdf =
    udf((a: Array[Float], b: Array[Float]) => phiWeightedSimilarity(a, b))

  /** φ-weighted cosine as a native codegen expression (PhiKernel) — the
    * column form used on search paths; SimilaritySpec pins it equal to
    * the scalar reference port above.
    */
  def phiWeighted(a: Column, b: Column): Column = VecExpressions.vecPhiSim(a, b)

  /** Metric dispatch — `similarity.py:82-110`. Higher = more similar for all. */
  def similarity(metric: String)(a: Column, b: Column): Column = metric match {
    case "cosine"       => cosineSimilarity(a, b)
    case "euclidean"    => euclideanSimilarity(a, b)
    case "dot"          => dotProduct(a, b)
    case "phi_weighted" => phiWeighted(a, b)
    case m => throw new IllegalArgumentException(
      s"Unknown metric '$m'. Valid options: 'cosine', 'euclidean', 'dot', 'phi_weighted'.")
  }

  /** Squared L2 distance (inertia term) — `clustering.py:32-34`. */
  def squaredDistance(a: Column, b: Column): Column =
    VecExpressions.vecSqDist(a, b)

  /** Content fingerprint of an embedding column — `types.py:68-71`
    * (`VectorEntry.fingerprint`). sha2-256 over the JSON-serialized
    * array: the codegen'd, oracle-expressible engine default. The
    * audited property is identical to the reference's: equal embeddings
    * ⇒ equal fingerprint, any element change ⇒ different fingerprint.
    * For byte parity with the reference's digests use
    * [[fingerprintReference]].
    */
  def fingerprint(embedding: Column): Column = sha2(to_json(embedding), 256)

  /** BYTE-PARITY fingerprint — blake2b-256 (bundled RFC 7693 core) over
    * the reference's exact payload: `json.dumps(embedding,
    * separators=(",", ":"))` with Python float repr (`types.py:68-71`).
    * A store migrated from the reference keeps identical fingerprints.
    * UDF (not codegen): content digests are ingest-path, not
    * search-path, and the digest already dominates the row cost.
    */
  val fingerprintReference = udf { e: Seq[Float] =>
    if (e == null) null
    else Blake2b.hex(Blake2b.pyJsonFloats(e).getBytes("UTF-8"), 32)
  }

  /** Johnson–Lindenstrauss random projection to `planes.length`
    * dimensions: outputᵢ = (v · planeᵢ) / √m with seeded Gaussian
    * planes ([[graft.operators.Ann.hyperplanes]] — the same quantized,
    * locale-safe generator the sign-LSH buckets use, so the projection
    * is bit-deterministic and oracle-replayable). The 1/√m scale makes
    * squared distances unbiased estimates of the originals (the JL
    * lemma), so downstream cosine/L2 operators run unchanged on the
    * compressed vectors.
    *
    * Shape at 100 TB: a narrow per-row projection — the m·d plane
    * matrix folds into the codegen'd [[dotProduct]] expressions as
    * literals (no broadcast variable, no UDF); output is m doubles per
    * row, an 8× width cut at m=8 on dim 64 before anything shuffles.
    */
  def randomProject(v: Column, planes: Array[Array[Double]]): Column = {
    require(planes.nonEmpty, "need at least one projection plane")
    val dim = planes.head.length
    val scale = 1.0 / math.sqrt(planes.length.toDouble)
    val proj = array(planes.map(p =>
      dotProduct(v, org.apache.spark.sql.functions.typedLit(p.toSeq)) * lit(scale)): _*)
    // loud dim-mismatch, like Ann.signBucket: VecDot would null out and
    // the projection would silently collapse to an all-null array. The
    // size is coalesced so a NULL embedding names itself in the error
    // instead of raising with a null message (concat of a null is null)
    when(coalesce(size(v), lit(-1)) === dim, proj).otherwise(raise_error(
      concat(lit("randomProject: embedding dim "),
        coalesce(size(v).cast("string"), lit("NULL (null embedding)")),
        lit(s" != plane dim $dim"))))
  }

  /** Per-vector absolute max (int8 quantization scale). */
  def absMax(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => greatest(acc, abs(d(x))))

  /** Symmetric int8 quantization: qᵢ = round(xᵢ·127/scale) with scale =
    * max|x| — the 4× embedding storage compression step of an LLM data
    * pipeline. Returns array<int> in [−127, 127].
    */
  def quantizeInt8(a: Column, scale: Column): Column =
    transform(a, x => round(d(x) * lit(127.0) / scale, 0).cast("int"))

  /** Dequantize back to doubles: xᵢ ≈ qᵢ·scale/127. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => d(x) * scale / lit(127.0))

  /** Max absolute reconstruction error of the quantize/dequantize
    * round-trip (bounded by scale/254 for symmetric int8).
    */
  def quantizationError(a: Column, scale: Column): Column =
    aggregate(
      zip_with(a, dequantizeInt8(quantizeInt8(a, scale), scale),
        (x, y) => abs(d(x) - y)),
      lit(0.0), (acc, e) => greatest(acc, e))

  /** One 32-bit word of the 1-bit sign signature: bit i of the word is
    * set iff element `offset + i` of the vector is strictly positive.
    * Binary quantization (sign-bit hashing over the identity basis) is
    * the most aggressive embedding compression that still ranks — 32×
    * smaller than float32 — and for high-dimensional, roughly-centered
    * embeddings the Hamming distance between signatures tracks the
    * angle (Charikar 2002 SimHash with axis-aligned planes). A
    * 64-term literal when-chain, pure whole-stage codegen per row; the
    * 32-bit word granularity avoids ever touching a long's sign bit,
    * so the packing replays exactly in engines with signed-only shifts.
    */
  def signWord(a: Column, offset: Int, width: Int = 32): Column = {
    require(width >= 1 && width <= 32, s"word width must be in [1,32], got $width")
    (0 until width).map { i =>
      when(d(element_at(a, offset + i + 1)) > lit(0.0), lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** L2-normalize to a unit vector — the ingest step that turns cosine
    * ranking into plain dot-product ranking downstream (one multiply
    * per dimension saved on EVERY subsequent search). The norm is the
    * same left-to-right [[dotProduct]] fold both engines use, so the
    * result is oracle-reproducible; zero vectors pass through unchanged
    * (no 0/0), mirroring the reference's zero-safe cosine.
    */
  def l2Normalize(a: Column): Column = {
    val norm = sqrt(VecExpressions.vecDot(a, a))
    when(norm === 0.0, transform(a, x => d(x)))
      .otherwise(transform(a, x => d(x) / norm))
  }
}
