package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the driver contract itself (SparkEntry). Scala `Map`
  * literals silently drop duplicate keys — a re-added query name
  * shadows (or is shadowed by) the original with no compiler warning,
  * which is exactly what happened transiently in round 8 with
  * `embedding_quantize`. The source scan below fails loudly instead.
  */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a query; no orphan oracles") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphans = o.diff(q)
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("no duplicate contract keys in the SparkEntry source") {
    // a name may appear at most twice at key position: once in
    // `queries`, once in `oracleSql`. A third occurrence means a
    // duplicate literal key that Scala's Map would swallow silently.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")), "UTF-8")
    val keyPattern = """(?m)^    "([a-z0-9_]+)" ->""".r
    val counts = keyPattern.findAllMatchIn(src).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val dups = counts.filter(_._2 > 2)
    assert(dups.isEmpty,
      s"contract keys at >2 key positions (duplicate map literal keys): $dups")
    // and each queries key is where it claims: the map sizes match the
    // distinct key counts seen at key position
    assert(counts.count(_._2 >= 1) >= SparkEntry.queries.size,
      "source scan found fewer key positions than the queries map holds")
  }
}
