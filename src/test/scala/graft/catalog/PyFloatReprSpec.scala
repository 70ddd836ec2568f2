package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[PyFloatRepr]] vs CPython: the golden set below is the verbatim
  * output of CPython 3.11 `json.dumps(d)` for each double, keyed by
  * the double's exact IEEE-754 bit pattern (big-endian hex) so the
  * fixture can't drift through decimal literals. It covers every
  * notation branch (fixed integral `.0`, fixed fractional, leading
  * zeros, both scientific signs, 1/2/3-digit exponents, subnormals,
  * extremes, negative zero, non-finite) plus 40 uniform-random bit
  * patterns and 40 uniform-random range values (seed 42).
  */
class PyFloatReprSpec extends AnyFunSuite with Matchers {

  private def d(hex: String): Double =
    java.lang.Double.longBitsToDouble(java.lang.Long.parseUnsignedLong(hex, 16))

  // (bits, CPython json.dumps output)
  private val golden: Seq[(String, String)] = Seq(
    "3fb999999999999a" -> "0.1",
    "3fc999999999999a" -> "0.2",
    "3fd3333333333333" -> "0.3",
    "3fd5555555555555" -> "0.3333333333333333",
    "3fe5555555555555" -> "0.6666666666666666",
    "3fe0000000000000" -> "0.5",
    "3ff8000000000000" -> "1.5",
    "4000000000000000" -> "2.0",
    "8000000000000000" -> "-0.0",
    "0000000000000000" -> "0.0",
    "430c6bf526340000" -> "1000000000000000.0",
    "4341c37937e08000" -> "1e+16",
    "434aa535d3d0c000" -> "1.5e+16",
    "3f1a36e2eb1c432d" -> "0.0001",
    "3ee4f8b588e368f1" -> "1e-05",
    "0000000000000001" -> "5e-324",
    "7fefffffffffffff" -> "1.7976931348623157e+308",
    "0010000000000000" -> "2.2250738585072014e-308",
    "4340000000000000" -> "9007199254740992.0",
    "40fe240c9fbe76c9" -> "123456.789",
    "c0fe240c9fbe76c9" -> "-123456.789",
    "400921fb54442d18" -> "3.141592653589793",
    "4005bf0a8b145769" -> "2.718281828459045",
    "54b249ad2594c37d" -> "1e+100",
    "ab2bff2ee48e0530" -> "-1e-100",
    "44dfe185ca57c517" -> "6.02214076e+23",
    "3ff199999999999a" -> "1.1",
    "4005666666666666" -> "2.675",
    "3fd3333333333334" -> "0.30000000000000004",
    "4059000000000000" -> "100.0",
    "c01e000000000000" -> "-7.5",
    "3f1a302cee759401" -> "9.99e-05",
    "43118b54f22aeb03" -> "1234567890123456.8",
    "1c80317fa3b1799d" -> "2.0951218323850843e-171",
    "bdd640fb06671ad1" -> "-8.095896314512539e-11",
    "3eb13b9046685257" -> "1.0271471865319853e-06",
    "23b8c1e9392456de" -> "1.3305406583752764e-136",
    "1a3d1fa7bc8960a9" -> "2.7416277501616697e-182",
    "bd9c66b3ad3c2d6d" -> "-6.4576804899972755e-12",
    "8b9d2434e465e150" -> "-9.936982866895821e-253",
    "972a846916419f82" -> "-4.4342582195166703e-197",
    "0822e8f36c031199" -> "1.7897179706846397e-269",
    "17fc695a07a0ca6e" -> "3.8920410665109616e-193",
    "3b8faa1837f8a88b" -> "8.3815053749933375e-22",
    "9a1de644815ef6d1" -> "-7.0366560133932934e-183",
    "8fadc1a606cb0fb3" -> "-3.74346981262903e-233",
    "b74d0fb132e70629" -> "-2.6063073077576445e-42",
    "b38a088ca65ed389" -> "-2.025077774461046e-60",
    "6b65a6a48b8148f6" -> "2.2243541059934106e+209",
    "72ff5d2a386ecbe0" -> "8.566174015121906e+245",
    "4737819096da1dac" -> "1.2205071412701158e+35",
    "de8a774bcf36d58b" -> "-2.6438463592029654e+147",
    "c241330b01a9e71f" -> "-147741606739.80563",
    "28df6ec4ce4a2bbd" -> "8.168892449408124e-112",
    "6c307511b2b9437a" -> "1.3850822627547856e+213",
    "47229389571aa876" -> "4.82268694405258e+34",
    "371ecd7b27cd8130" -> "3.4530976632468286e-43",
    "c37459eef50bea63" -> "-9.165411812000722e+16",
    "1a2a73ed562b0f79" -> "1.245102053364068e-182",
    "6142ea7d17be3111" -> "3.3242704709371837e+160",
    "5be6128e18c26797" -> "5.013479291044358e+134",
    "580d7b71d8f56413" -> "1.4520725756704513e+116",
    "43b7a3a69a8dca03" -> "1.7033882668101804e+18",
    "0b1f9163ce9ff57f" -> "4.2048429468447037e-255",
    "759cde66bacfb3d0" -> "3.467722627586937e+258",
    "1ff49b7889463e85" -> "9.606020282432862e-155",
    "ec1b8ca1f91e1d4c" -> "-5.796532266416865e+212",
    "142c3fe860e7a113" -> "1.678285985249165e-211",
    "4b0dbb418d5288f1" -> "3.559636223270555e+53",
    "a0ee89aed453dd32" -> "-4.6645554400601785e-150",
    "e2acf72f9e574f7a" -> "-2.135058088242266e+167",
    "5c941cf0dc98d2c1" -> "9.356124026369747e+137",
    "3139d32c93cd59bf" -> "1.4616374818865636e-71",
    "4118f8deb0917328" -> "409143.67242984707",
    "c12bb87e7722f858" -> "-908351.2326886756",
    "c1209b96e5bb99d4" -> "-544203.4486969062",
    "c119b5a04a8afa7a" -> "-421224.0727957856",
    "c129a5c017a15525" -> "-840416.046152745",
    "c1204f24745dc62c" -> "-534418.2272779397",
    "c1285a5a4848d0e4" -> "-797997.1411805418",
    "c11b1a532cd49db4" -> "-444052.7937798158",
    "411090238dda7e6c" -> "271368.88852880034",
    "c1107ffe917821ea" -> "-270335.64205983153",
    "c10fb1b086b0729c" -> "-259638.06576623477",
    "c121baf3e07d706b" -> "-580985.9384570246",
    "c11c71f16c7183b4" -> "-466044.3559017733",
    "412aa6ba59d14dd4" -> "873309.1754249879",
    "4112121b14fc2a80" -> "296070.770493187",
    "410aa4b017364490" -> "218262.0113339764",
    "c1241275683ec210" -> "-657722.703603806",
    "411bf8366233caec" -> "458253.59590069833",
    "c1248b56066345e6" -> "-673195.0124761432",
    "c10d6e08ee8f8860" -> "-241089.11648470443",
    "412de0cd670d4796" -> "979046.7012731906",
    "411116fe142e61f4" -> "279999.5197081857",
    "40fbceb7cd007ca0" -> "113899.48754929239",
    "411689320206fab8" -> "369228.5019797492",
    "4124ed0fae463cca" -> "685703.8403796193",
    "3fe1a9fb88728f98" -> "0.5519998230924896",
    "bfe15746c16cf2c4" -> "-0.5419038560717913",
    "bfedf211d18f4426" -> "-0.9357995121919245",
    "bfd79f3c0994d43c" -> "-0.36909390388183616",
    "bfddbaaabef0e438" -> "-0.46451824804859454",
    "bfe27f41d0b1e5b2" -> "-0.5780343128273471",
    "3fec58a1fc8995b0" -> "0.8858194286701089",
    "3fe816683dbe49d6" -> "0.7527352529453377",
    "bfd7b8a29c9914ec" -> "-0.37064423840304417",
    "3fd3e56a07fcd9e8" -> "0.3108773305897601",
    "bfcab7de23b0acf8" -> "-0.20873619787867148",
    "3fea87f29d248f84" -> "0.829095179481087",
    "bfb5115eb6db3120" -> "-0.0822962948252024",
    "bfde18681dc41300" -> "-0.4702396670038951",
    "bfe03741420a4338" -> "-0.5067449846120331")

  test("golden set: byte-identical to CPython json.dumps") {
    for ((bits, want) <- golden)
      withClue(s"bits=$bits: ") { PyFloatRepr.repr(d(bits)) shouldBe want }
  }

  // (bits, CPython output) pairs from a generated resource file
  private def goldenResource(name: String): Seq[(String, String)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/golden/$name"), "UTF-8")
    try src.getLines().map { line =>
      val Array(bits, want) = line.split("\t", 2); (bits, want)
    }.toList
    finally src.close()
  }

  test("every finite power of two matches CPython (the binade-boundary class)") {
    // the class the nearest-rounding-only search diverged on (46 of
    // these — e.g. 2^-24 — before the bracketing fix; review pass r12):
    // at an exact power of two the rounding interval is asymmetric, so
    // the round-trippable shortest decimal need not be the nearest one
    for ((bits, want) <- goldenResource("pyfloat_pow2.txt"))
      withClue(s"bits=$bits: ") { PyFloatRepr.repr(d(bits)) shouldBe want }
  }

  test("5000 random bit patterns match CPython byte-for-byte") {
    for ((bits, want) <- goldenResource("pyfloat_random.txt"))
      withClue(s"bits=$bits: ") { PyFloatRepr.repr(d(bits)) shouldBe want }
  }

  test("non-finite: json.dumps names under allow_nan") {
    PyFloatRepr.repr(Double.NaN) shouldBe "NaN"
    PyFloatRepr.repr(Double.PositiveInfinity) shouldBe "Infinity"
    PyFloatRepr.repr(Double.NegativeInfinity) shouldBe "-Infinity"
  }

  test("round-trip + shortestness over 100k seeded random doubles") {
    val rnd = new scala.util.Random(42)
    var i = 0
    while (i < 100000) {
      // half raw bit patterns (exercises extreme exponents), half
      // human-range values (exercises the fixed-notation branches)
      val x =
        if (i % 2 == 0) java.lang.Double.longBitsToDouble(rnd.nextLong())
        else (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(20) - 6)
      if (!x.isNaN && !x.isInfinite) {
        val r = PyFloatRepr.repr(x)
        // exact round-trip, bit for bit (covers -0.0 via raw bits)
        java.lang.Double.doubleToRawLongBits(java.lang.Double.parseDouble(r))
          .shouldBe(java.lang.Double.doubleToRawLongBits(x))
        // shortest: CPython never emits more than 17 significant digits
        // (leading zeros in "0.0…" fixed notation aren't significant)
        r.takeWhile(c => c != 'e' && c != 'E')
          .filter(_.isDigit).dropWhile(_ == '0').length should be <= 17
      }
      i += 1
    }
  }
}
