package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** One `manifest.json` per persisted layout, integer fields only — the
  * shared read/write every persisted-index family uses so encoding,
  * parsing and error text cannot drift between layouts (they had
  * started to: four inline copies before this).
  *
  * The manifest doubles as the layout's COMMIT MARKER: a rebuild
  * DELETES it first and writes it LAST, so a rebuild that dies between
  * table overwrites leaves no valid manifest and the probe REFUSES
  * (naming the manifest) instead of silently reading one table from
  * the new generation next to another from the old — the torn-rebuild
  * failure a stale-but-valid manifest would wave through. This
  * protects crash-recovery only; concurrent READERS must still quiesce
  * across rebuilds (each layout's scaladoc says so).
  */
private[graft] object LayoutManifest {

  /** Drop the commit marker before touching any table — step 1 of a
    * rebuild. Idempotent when no manifest exists.
    */
  def uncommit(conf: Configuration, path: String): Unit = {
    val p = new Path(path, "manifest.json")
    p.getFileSystem(conf).delete(p, false)
    ()
  }

  /** Write the commit marker — the LAST step of a rebuild. */
  def commit(conf: Configuration, path: String,
      fields: (String, Int)*): Unit = {
    val p = new Path(path, "manifest.json")
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(fields.map { case (k, v) => s""""$k": $v""" }
      .mkString("{", ", ", "}").getBytes("UTF-8"))
    finally out.close()
  }

  /** All requested integer fields of a committed layout's manifest in
    * ONE open+scan (multi-field readers used to reopen and re-scan the
    * file per field); `kind` and `builder` name the layout family in
    * the refusal message (e.g. "no dedup-index manifest at … — not a
    * persistDedupIndex layout"). Integer-only by design (the schema
    * [[commit]] writes); a present-but-non-integer value fails naming
    * that restriction, not a bare "missing field".
    */
  def readFields(conf: Configuration, path: String, kind: String,
      builder: String, names: String*): Seq[Int] = {
    val p = new Path(path, "manifest.json")
    val fs = p.getFileSystem(conf)
    require(fs.exists(p),
      s"no $kind manifest at $p — not a $builder layout")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    names.map { name =>
      (s""""$name"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(text) match {
        case Some(m) => m.group(1).toInt
        case None =>
          require(!(s""""$name"\\s*:""").r.findFirstIn(text).isDefined,
            s"manifest at $p field $name is not an integer (this " +
              s"manifest format is integer-only): $text")
          throw new IllegalArgumentException(
            s"requirement failed: manifest at $p missing field $name: $text")
      }
    }
  }

  /** One integer field — [[readFields]] for the single-field layouts. */
  def readField(conf: Configuration, path: String, name: String,
      kind: String, builder: String): Int =
    readFields(conf, path, kind, builder, name).head
}
