package graft.catalog

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

/** CPython-exact `repr(float)` / `json.dumps(float)` rendering for any
  * JVM `Double` — the byte-portable float renderer behind
  * [[RecordStore]]'s canonical key prefixes.
  *
  * Why not `Double.toString`: this JVM (Java 17) still uses the legacy
  * `FloatingDecimal` algorithm, which carries no shortest-round-trip
  * guarantee (that arrived in JDK 19, JDK-4511638) and in any case
  * formats with different notation rules than CPython (`1.0E-4` vs
  * `0.0001`, `1.0E16` vs `1e+16`). A prefix is a byte-portable id, so
  * the renderer must reproduce CPython, not merely round-trip.
  *
  * CPython's `float_repr_style` output (python/cpython
  * `Python/pystrtod.c`, `format_float_short`) is:
  *
  *  1. the SHORTEST decimal digit string that parses back to exactly
  *     the same double, with correct rounding (David Gay / Grisu
  *     shortest-repr digits);
  *  2. formatted fixed-point when the decimal exponent `e` of the
  *     leading digit satisfies `-4 <= e < 16` (integral values get a
  *     trailing `.0`), scientific otherwise as `<mant>e±XX` with a
  *     mandatory sign and at least two exponent digits and NO trailing
  *     `.0` on a bare mantissa (`1e+16`, not `1.0e+16`);
  *  3. `nan`/`inf` render via `json.dumps` as `NaN` / `Infinity` /
  *     `-Infinity` (CPython's default `allow_nan=True`), and negative
  *     zero keeps its sign (`-0.0`).
  *
  * Step 1 here computes the shortest digits from the EXACT binary
  * value of the double (`new BigDecimal(d)` is exact): at each
  * precision `p = 1..17` it tests BOTH p-digit decimals bracketing the
  * value (FLOOR and CEILING roundings) for round-trip, returning the
  * round-tripping candidate closest to the exact value (HALF_EVEN's
  * pick wins exact ties) at the first `p` where any survives — which
  * is the shortest-correctly-rounded contract Gay's/Ryu's algorithm
  * implements: shortest digits that uniquely identify the double,
  * nearest among those. Testing ONLY the nearest rounding is a known
  * trap this implementation originally fell into: a double's rounding
  * interval is ASYMMETRIC at binade boundaries (the ulp above an exact
  * power of two is twice the ulp below), so the p-digit decimal
  * nearest the value can fall outside the interval while the other
  * bracket round-trips — e.g. 2^-24, where CPython emits the 16-digit
  * `5.960464477539063e-08` (the CEILING bracket) but the nearest
  * rounding `...062` does not round-trip, sending the nearest-only
  * search to 17 digits and a divergent prefix. 17 significant digits
  * always round-trip a double, so the search terminates. Verified
  * against CPython `json.dumps` on a 115-value golden set (every
  * notation branch + random bit patterns), every exact power of two
  * in the finite double range (the binade-boundary class, 2098
  * values), and a 5 000-value random golden sweep in
  * `PyFloatReprSpec`.
  */
object PyFloatRepr {

  /** Render `d` exactly as CPython's `repr`/`json.dumps` would. */
  def repr(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else if (d == 0.0)
      if (java.lang.Double.doubleToRawLongBits(d) != 0L) "-0.0" else "0.0"
    else {
      val a = math.abs(d)
      val shortest = shortestDigits(a)
      val stripped = shortest.stripTrailingZeros
      val digits = stripped.unscaledValue.toString
      // decimal exponent of the leading digit: digits × 10^(-scale)
      // has its first digit worth 10^(len-1-scale)
      val exp10 = digits.length - 1 - stripped.scale
      val body = format(digits, exp10)
      if (d < 0) "-" + body else body
    }

  private def shortestDigits(a: Double): JBigDecimal = {
    val exact = new JBigDecimal(a)
    var p = 1
    while (p <= 17) {
      // both p-digit brackets of the exact value (a > 0 here): the
      // nearest rounding alone misses round-trippable candidates at
      // binade boundaries, where the rounding interval is asymmetric
      val near = exact.round(new MathContext(p, RoundingMode.HALF_EVEN))
      val down = exact.round(new MathContext(p, RoundingMode.FLOOR))
      val up = exact.round(new MathContext(p, RoundingMode.CEILING))
      // near first: on an exact distance tie the HALF_EVEN pick wins,
      // matching the correctly-rounded tie rule
      val survivors = Seq(near, down, up).filter(_.doubleValue() == a)
      if (survivors.nonEmpty) {
        var best = survivors.head
        var bestDist = best.subtract(exact).abs
        survivors.tail.foreach { c =>
          val dist = c.subtract(exact).abs
          if (dist.compareTo(bestDist) < 0) { best = c; bestDist = dist }
        }
        return best
      }
      p += 1
    }
    // unreachable: 17 significant digits round-trip any finite double
    throw new IllegalStateException(s"no 17-digit round-trip for $a")
  }

  private def format(digits: String, exp10: Int): String =
    if (exp10 >= -4 && exp10 < 16) {
      if (exp10 >= digits.length - 1) // integral: pad zeros, append .0
        digits + "0" * (exp10 - (digits.length - 1)) + ".0"
      else if (exp10 >= 0)
        digits.substring(0, exp10 + 1) + "." + digits.substring(exp10 + 1)
      else
        "0." + "0" * (-exp10 - 1) + digits
    } else {
      val mant =
        if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val sign = if (exp10 < 0) "-" else "+"
      val e = math.abs(exp10)
      val eStr = if (e < 10) "0" + e else e.toString
      s"${mant}e$sign$eStr"
    }
}
