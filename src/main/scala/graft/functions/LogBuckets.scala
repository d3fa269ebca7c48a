package graft.functions

/** The log-scale census bucket idiom, defined ONCE for every family
  * that builds a domain-bounded census from an unbounded int64 value
  * (r14 verdict #5 — the expression previously appeared verbatim in
  * ev_rfm, ev_lorenz_curve, ev_user_activity_hist and
  * graph_degree_hist, in both the Spark exprs and the DuckDB twins).
  *
  * Two variants:
  *
  *  - [[moneyExpr]]/[[moneySql]] — MSB×32 + 5-bit linear mantissa:
  *    bucket = 32·max(bitlen(x)−5, 0) + (x >> max(bitlen(x)−5, 0)).
  *    Strictly monotone in x, ≈3% relative resolution, ≤ 32·59+31
  *    < 1,920 buckets for ANY non-negative int64 distribution. Used
  *    where the value is a money/mass total and rank order matters
  *    (quartile thresholds, Lorenz prefix sums).
  *
  *    The input is clamped with greatest(x, 0) INSIDE the expression
  *    (r14 advice): for a negative total — a refund-heavy user —
  *    Spark's `bin()` renders 64-char two's complement while DuckDB's
  *    rendering differs, and `shiftright` on negatives diverges
  *    between engines; the clamp pins both engines to bucket 0
  *    instead of a silent cross-engine divergence. Callers whose
  *    domain is provably non-negative pay one no-op `greatest`.
  *
  *  - [[bitLenExpr]]/[[bitLenSql]] — plain bit-length ⌊log₂ x⌋+1:
  *    ≤64 buckets, for positive COUNTS (degrees, events-per-user)
  *    where only order-of-magnitude resolution is needed. Counts are
  *    ≥1 by construction (they come out of count(*) aggregations),
  *    so no clamp is required — `bin(0)` would yield bucket 1 and
  *    negatives cannot occur.
  *
  * Both are exact 64-bit integer arithmetic in BOTH engines
  * (`bin`+`shiftright` in Spark, `bin`+`>>` in DuckDB; neither pads
  * leading zeros), so census keys agree bit-for-bit.
  */
object LogBuckets {

  /** Spark SQL-expression string: log-scale money bucket of int64
    * column/expression `x`, clamped non-negative. BIGINT result. */
  def moneyExpr(x: String): String =
    s"cast(greatest(length(bin(greatest($x, 0))) - 5, 0) * 32 + " +
      s"shiftright(greatest($x, 0), " +
      s"greatest(length(bin(greatest($x, 0))) - 5, 0)) as bigint)"

  /** DuckDB twin of [[moneyExpr]] — identical bucket for identical
    * input, including the non-negative clamp. */
  def moneySql(x: String): String =
    s"(greatest(length(bin(greatest($x, 0))) - 5, 0) * 32 + " +
      s"(greatest($x, 0) >> greatest(length(bin(greatest($x, 0))) - 5, 0)))" +
      "::BIGINT"

  /** Spark SQL-expression string: bit-length bucket ⌊log₂ x⌋+1 of a
    * POSITIVE count column `x`. INT result, ≤64 distinct values. */
  def bitLenExpr(x: String): String = s"cast(length(bin($x)) as int)"

  /** DuckDB twin of [[bitLenExpr]]. */
  def bitLenSql(x: String): String = s"length(bin($x))::INT"
}
