package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Blake2b, VectorOps}

/** Byte-parity digests: the bundled RFC 7693 BLAKE2b-256 against
  * `hashlib.blake2b(digest_size=32)` ground truth, Python float repr /
  * json.dumps formatting, and the reference's exact fingerprint and
  * membership-hash payloads (`types.py:68-71`, `vector_field.py:95-103`).
  */
class Blake2bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("blake2b-256 matches hashlib on known vectors") {
    assert(Blake2b.hex("".getBytes) ==
      "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8")
    assert(Blake2b.hex("abc".getBytes) ==
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
    assert(Blake2b.hex("The quick brown fox jumps over the lazy dog".getBytes) ==
      "01718cec35cd3d796dd00020e0bfecb473ad23457d063b75eff29c0ffa2e58a9")
  }

  test("multi-block streaming: split updates equal one-shot over >128 bytes") {
    val big = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val oneShot = Blake2b.hex(big)
    val b = new Blake2b(32)
    var off = 0
    for (chunk <- Seq(1, 127, 128, 129, 300, 315)) {
      b.update(big, off, chunk); off += chunk
    }
    assert(off == 1000)
    assert(b.digest().map("%02x".format(_)).mkString == oneShot)
  }

  test("pyFloatRepr: non-finite values use json.dumps' bare tokens") {
    assert(Blake2b.pyFloatRepr(Double.NaN) == "NaN")
    assert(Blake2b.pyFloatRepr(Double.PositiveInfinity) == "Infinity")
    assert(Blake2b.pyFloatRepr(Double.NegativeInfinity) == "-Infinity")
    assert(Blake2b.pyJsonFloats(Seq(Float.NaN, Float.PositiveInfinity))
      == "[NaN,Infinity]")
  }

  test("pyFloatRepr matches Python repr across notation regimes") {
    // ground truth from python: repr() of float32-widened values
    assert(Blake2b.pyFloatRepr(0.5) == "0.5")
    assert(Blake2b.pyFloatRepr(0.1f.toDouble) == "0.10000000149011612")
    assert(Blake2b.pyFloatRepr(3.2e-5f.toDouble) == "3.199999991920777e-05")
    assert(Blake2b.pyFloatRepr(-1.75) == "-1.75")
    assert(Blake2b.pyFloatRepr(12345678.0) == "12345678.0") // Java says 1.2345678E7
    assert(Blake2b.pyFloatRepr(1e-4f.toDouble) == "9.999999747378752e-05")
    assert(Blake2b.pyFloatRepr(1e16) == "1e+16")
    assert(Blake2b.pyFloatRepr(0.0001) == "0.0001") // Java says 1.0E-4
    assert(Blake2b.pyFloatRepr(0.0) == "0.0")
  }

  test("pyFloatRepr boundary + fuzz vectors (python ground truth by bit pattern)") {
    def check(d: Double, expected: String): Unit =
      assert(Blake2b.pyFloatRepr(d) == expected,
        s"bits=${java.lang.Double.doubleToLongBits(d)}")
    check(java.lang.Double.longBitsToDouble(4547007122018943789L), "0.0001")
    check(java.lang.Double.longBitsToDouble(4547007048231967494L), "9.9999e-05")
    check(java.lang.Double.longBitsToDouble(4547007122018943790L), "0.00010000000000000002")
    check(java.lang.Double.longBitsToDouble(4831355200913801216L), "1000000000000000.0")
    check(java.lang.Double.longBitsToDouble(4846369599423283199L), "9999999999999998.0")
    check(java.lang.Double.longBitsToDouble(4846369599423283200L), "1e+16")
    check(java.lang.Double.longBitsToDouble(4848869599423283200L), "1.5e+16")
    check(java.lang.Double.longBitsToDouble(1L), "5e-324")
    check(java.lang.Double.longBitsToDouble(9218868437227405311L), "1.7976931348623157e+308")
    check(java.lang.Double.longBitsToDouble(118622047889322841L), "1e-300")
    check(java.lang.Double.longBitsToDouble(4817745636528479846L), "123456789012345.6")
    check(java.lang.Double.longBitsToDouble(4832797072101665539L), "1234567890123456.8")
    check(java.lang.Double.longBitsToDouble(4599075939470750516L), "0.30000000000000004")
    check(java.lang.Double.longBitsToDouble(4611686018427387904L), "2.0")
    check(java.lang.Double.longBitsToDouble(4636737291354636288L), "100.0")
    check(java.lang.Double.longBitsToDouble(4711630319722168320L), "10000000.0")
    check(java.lang.Double.longBitsToDouble(4711630319185297408L), "9999999.0")
    check(java.lang.Double.longBitsToDouble(4711630320259039232L), "10000001.0")
    check(java.lang.Double.longBitsToDouble(4562254508917369340L), "0.001")
    check(java.lang.Double.longBitsToDouble(4566650022153682944L), "0.001953125")
    check(java.lang.Double.longBitsToDouble(4781932779669553152L), "495433023488.0")
    check(java.lang.Double.longBitsToDouble(-4155439560345518080L), "-6.62760456036263e+30")
    check(java.lang.Double.longBitsToDouble(4383059784828452864L), "1.0967034258749122e-15")
    check(java.lang.Double.longBitsToDouble(4945626261557870592L), "4.3431769050439316e+22")
    check(java.lang.Double.longBitsToDouble(-4840115563462131712L), "-1.1354934055735413e-15")
    check(java.lang.Double.longBitsToDouble(4146566185829269504L), "1.698664568576658e-31")
    check(java.lang.Double.longBitsToDouble(4202251967440879616L), "8.783768771816667e-28")
    check(java.lang.Double.longBitsToDouble(-4447338697561473024L), "-205118832640.0")
    check(java.lang.Double.longBitsToDouble(-5105408497655218176L), "-2.1132646219869452e-33")
    check(java.lang.Double.longBitsToDouble(4252274368131891200L), "1.9762703141930095e-24")
    check(java.lang.Double.longBitsToDouble(4878446501606457344L), "1.421236426644652e+18")
    check(java.lang.Double.longBitsToDouble(-4997250611498975232L), "-3.5865058773343806e-26")
    check(java.lang.Double.longBitsToDouble(4168961677003325440L), "5.3498922100273585e-30")
    check(java.lang.Double.longBitsToDouble(-4243433518866104320L), "-8.551848294810499e+24")
    check(java.lang.Double.longBitsToDouble(-5171001129751805952L), "-8.496929623342147e-38")
  }

  test("fingerprintReference: byte-identical to the reference's blake2b payload") {
    // python: json.dumps([...float32-widened...], separators=(",",":"))
    val e = Seq(0.5f, 0.1f, 3.2e-5f, -1.75f, 12345678.0f, 1e-4f)
    assert(Blake2b.pyJsonFloats(e) ==
      "[0.5,0.10000000149011612,3.199999991920777e-05,-1.75,12345678.0,9.999999747378752e-05]")
    val got = Seq(Tuple1(e)).toDF("embedding")
      .select(VectorOps.fingerprintReference(col("embedding"))).head().getString(0)
    assert(got == "09f0c58fdef83b142f7f2d49179674e9acc6f97d3f916bd1ebaf0fd25fed0641")
  }

  test("referenceHash: byte-identical to _compute_hash for the same id sets") {
    // python: blake2b(json.dumps({"iglyphs": ["a","b"], "pglyphs": []},
    //                 sort_keys=True).encode(), digest_size=32)
    val db = new VectorFieldDB(spark, 4)
    db.addIGlyph(1, 1, Array(1f, 2f, 3f, 4f), id = Some("b"))
    db.addIGlyph(2, 2, Array(2f, 3f, 4f, 5f), id = Some("a"))
    assert(db.referenceHash() ==
      "d926a6bd2aa3f58c9933645d93c371e416f1aca5406ff92bf04874d4a18ba1cd")
  }
}
