package graft.functions

/** BLAKE2b (RFC 7693), unkeyed, parameterizable digest size — bundled
  * because the JVM ships no Blake2b provider and the reference's
  * content digests use it (`/root/reference/aeuc_vector_db/types.py:68-71`,
  * `vector_field.py:95-103`). Streaming (update/digest) so arbitrarily
  * large payloads — e.g. the canonical sorted-id membership document —
  * hash in constant memory. Public algorithm, implemented from the RFC.
  */
final class Blake2b(digestSize: Int) {
  require(digestSize >= 1 && digestSize <= 64, s"digest size 1..64, got $digestSize")

  private val IV = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val Sigma = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3))

  private val h = IV.clone()
  h(0) ^= 0x01010000L ^ digestSize.toLong // param block: unkeyed, fanout=depth=1

  private val buf = new Array[Byte](128)
  private var bufLen = 0
  private var t = 0L // bytes compressed so far (< 2^64 suffices here)
  private var finished = false

  private def g(v: Array[Long], a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 32)
    v(c) = v(c) + v(d)
    v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 24)
    v(a) = v(a) + v(b) + y
    v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 63)
  }

  private def compress(block: Array[Byte], off: Int, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (block(off + i * 8 + j) & 0xffL); j -= 1 }
      m(i) = w
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t
    // t is < 2^64 for any realistic payload; the high counter word stays 0
    if (last) v(14) = ~v(14)
    var r = 0
    while (r < 12) {
      val s = Sigma(r)
      g(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
      g(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
      g(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
      g(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
      g(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
      g(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
      g(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
      g(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  def update(data: Array[Byte], off: Int, len: Int): this.type = {
    require(!finished, "digest already finalized")
    var o = off
    var remaining = len
    while (remaining > 0) {
      if (bufLen == 128) { // full buffer AND more input → not the last block
        t += 128
        compress(buf, 0, last = false)
        bufLen = 0
      }
      val take = math.min(128 - bufLen, remaining)
      System.arraycopy(data, o, buf, bufLen, take)
      bufLen += take
      o += take
      remaining -= take
    }
    this
  }

  def update(data: Array[Byte]): this.type = update(data, 0, data.length)

  def digest(): Array[Byte] = {
    require(!finished, "digest already finalized")
    finished = true
    t += bufLen
    java.util.Arrays.fill(buf, bufLen, 128, 0.toByte)
    compress(buf, 0, last = true)
    val out = new Array[Byte](digestSize)
    var i = 0
    while (i < digestSize) { out(i) = ((h(i / 8) >>> (8 * (i % 8))) & 0xff).toByte; i += 1 }
    out
  }
}

object Blake2b {
  def hex(data: Array[Byte], digestSize: Int = 32): String =
    new Blake2b(digestSize).update(data).digest().map("%02x".format(_)).mkString

  /** Python `repr(float)` — the formatting `json.dumps` uses — so
    * JSON payloads of doubles serialize to the reference's exact bytes.
    * Shortest correctly-rounded digits (Java's `Double.toString` is NOT
    * always shortest — ~2.5% of float32-widened values get extra
    * digits): the exact BigDecimal expansion of the double is rounded
    * HALF_EVEN at increasing precision until the result parses back to
    * the same double, exactly CPython's shortest-repr contract; then
    * rendered under Python's notation rules — fixed for leading-digit
    * exponents in [-4, 16), otherwise scientific `d[.rest]e±XX`.
    */
  def pyFloatRepr(d: Double): String = {
    // json.dumps (allow_nan=True, CPython default) emits these bare
    // tokens; BigDecimal would throw on non-finite input
    if (d.isNaN) return "NaN"
    if (d == Double.PositiveInfinity) return "Infinity"
    if (d == Double.NegativeInfinity) return "-Infinity"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val sign = if (d < 0) "-" else ""
    val a = math.abs(d)
    val bd = new java.math.BigDecimal(a) // exact decimal expansion
    var digits: String = null
    var e10 = 0
    var p = 1
    while (digits == null) {
      val r = bd.round(new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
      if (r.doubleValue() == a || p == 17) {
        val unscaled = r.unscaledValue.toString
        e10 = (unscaled.length - 1) - r.scale // exponent of the leading digit
        digits = unscaled.reverse.dropWhile(_ == '0').reverse match {
          case "" => "0"
          case s  => s
        }
      }
      p += 1
    }
    if (e10 >= -4 && e10 < 16) {
      if (e10 >= 0) {
        val intPart =
          if (digits.length > e10 + 1) digits.substring(0, e10 + 1)
          else digits + "0" * (e10 + 1 - digits.length)
        val frac =
          if (digits.length > e10 + 1) digits.substring(e10 + 1) else "0"
        s"$sign$intPart.$frac"
      } else {
        sign + "0." + "0" * (-e10 - 1) + digits
      }
    } else {
      val mantissa =
        if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val es = if (e10 < 0) "-" else "+"
      f"$sign$mantissa%se$es%s${math.abs(e10)}%02d"
    }
  }

  /** `json.dumps(values, separators=(",", ":"))` over a float32 list
    * widened to double — the reference fingerprint payload
    * (`types.py:68-71`), byte-for-byte.
    */
  def pyJsonFloats(values: Seq[Float]): String =
    values.map(f => pyFloatRepr(f.toDouble)).mkString("[", ",", "]")

  /** A JSON string literal as python's `json.dumps` (ensure_ascii=True)
    * emits it: named escapes, `\u00XX` for other controls, `\uXXXX`
    * for every non-ASCII char.
    */
  def pyJsonStr(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }
}
