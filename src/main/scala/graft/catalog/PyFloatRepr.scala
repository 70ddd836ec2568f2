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
  * Step 1 here computes the shortest digits by rounding the EXACT
  * binary value of the double (`new BigDecimal(d)` is exact) to
  * `p = 1..17` significant digits with HALF_EVEN and taking the first
  * `p` whose result parses back to the input. Rounding the exact value
  * yields the p-digit decimal CLOSEST to the double, so if any p-digit
  * string round-trips, this one does — which is precisely the
  * shortest-correctly-rounded contract Gay's algorithm implements.
  * 17 significant digits always round-trip a double, so the search
  * terminates. Verified against CPython `json.dumps` on a 115-value
  * golden set (every notation branch + random bit patterns) in
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
      val cand = exact.round(new MathContext(p, RoundingMode.HALF_EVEN))
      if (cand.doubleValue() == a) return cand
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
