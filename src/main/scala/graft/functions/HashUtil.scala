package graft.functions

import java.security.MessageDigest

/** Fast hex digests for the hash-heavy dedup/fingerprint paths.
  * (`"%02x".format` costs ~10µs per 16-byte digest — a formatter
  * allocation per byte — which dominates multi-million-hash pipelines.)
  */
object HashUtil {
  private val hexChars = "0123456789abcdef".toCharArray

  // MessageDigest.getInstance takes a synchronized JCA provider lookup —
  // per-row getInstance calls serialize all executor threads at high
  // core counts. One digest per thread, reset per use.
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Thread-local reusable MD5 instance. */
  def md5Digest: MessageDigest = md5Local.get()

  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = hexChars(b >>> 4)
      out(i * 2 + 1) = hexChars(b & 15)
      i += 1
    }
    new String(out)
  }

  /** Lowercase-hex md5, byte-identical to Spark's `md5()` / DuckDB's
    * `md5()`. Caller supplies (and reuses) the MessageDigest.
    */
  def md5Hex(md: MessageDigest, s: String): String = {
    md.reset()
    hex(md.digest(s.getBytes("UTF-8")))
  }
}
