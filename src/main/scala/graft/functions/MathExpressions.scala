package graft.functions

import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

/** Correctly-rounded scalar math for driver-side constants.
  *
  * The JVM's `StrictMath.log` (what Spark's builtin `log` evaluates
  * through) is fdlibm, which rounds a handful of hard cases one ulp
  * away from the correctly-rounded result that glibc — and therefore
  * DuckDB and most native engines — produce. `Math.log` is worse:
  * it delegates to StrictMath until the JIT replaces it with the
  * platform intrinsic, so its result can change mid-run with JIT
  * warmth. When a score formula needs a log that hash-matches a
  * native engine, compute it HERE, on the driver, to 50 decimal
  * digits, round once to double (correct rounding by construction),
  * and ship it into the plan as a literal.
  */
object ExactMath {

  private val Prec = new MathContext(50, RoundingMode.HALF_EVEN)
  private val Two = JBD.valueOf(2)
  private val Ln2 = new JBD(
    "0.693147180559945309417232121458176568075500134360255254120680")

  /** Correctly rounded ln(x) for a finite positive double: exact
    * binary expansion → range-reduce to [1,2) → atanh series
    * (t=(m-1)/(m+1) ≤ 1/3, so ~50 terms reach 1e-50) → one decimal
    * string → `Double.parseDouble`, which rounds correctly.
    */
  def ln(x: Double): Double = {
    require(x > 0 && !x.isInfinite && !x.isNaN, s"ln domain: $x")
    var m = new JBD(x) // exact: every double is a finite decimal
    var k = 0
    while (m.compareTo(Two) >= 0) { m = m.divide(Two, Prec); k += 1 }
    while (m.compareTo(JBD.ONE) < 0) { m = m.multiply(Two, Prec); k -= 1 }
    val t = m.subtract(JBD.ONE).divide(m.add(JBD.ONE), Prec)
    val t2 = t.multiply(t, Prec)
    var term = t
    var sum = t
    var n = 3
    val eps = JBD.valueOf(1, 48)
    while (term.abs.compareTo(eps) > 0) {
      term = term.multiply(t2, Prec)
      sum = sum.add(term.divide(JBD.valueOf(n), Prec), Prec)
      n += 2
    }
    val res = sum.multiply(Two, Prec)
      .add(JBD.valueOf(k).multiply(Ln2, Prec), Prec)
    java.lang.Double.parseDouble(res.round(new MathContext(30)).toString)
  }
}
