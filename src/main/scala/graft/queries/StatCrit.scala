package graft.queries

/** Shared critical-value literals for significance thresholds.
  *
  * These are STRINGS, not doubles, because every consumer splices
  * them into two SQL dialects at once (the Spark `expr` and the
  * paired DuckDB oracle) and the digits must be byte-identical on
  * both sides.  Centralizing them closes the round-10 ADVICE drift
  * where two slightly different χ²(1) .95 literals
  * (…694124 vs …694126) had propagated by copy-paste: each operator
  * was internally engine-consistent so parity never broke, but the
  * surface carried two spellings of the same constant.
  *
  * χ²(1).95 is pinned to the exact square of the two-sided z:
  * 1.959963984540054² = 3.841458820694124.  Higher dfs follow the
  * standard qchisq(0.95, df) table to the same precision.
  */
object StatCrit {
  /** Two-sided 5% normal critical value, z_{.975}. */
  final val Z975 = "1.959963984540054"

  /** χ²(df) upper-5% critical values, df = 1..8. */
  final val Chi2_95: Map[Int, String] = Map(
    1 -> "3.841458820694124",
    2 -> "5.991464547107979",
    3 -> "7.814727903251179",
    4 -> "9.487729036781154",
    5 -> "11.070497693516351",
    6 -> "12.591587243743977",
    7 -> "14.067140449340169",
    8 -> "15.50731305586545")

  /** χ²(1).95 — the overwhelmingly common case. */
  final val Chi2_95_Df1: String = Chi2_95(1)
}
