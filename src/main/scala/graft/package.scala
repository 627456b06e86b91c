import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

package object graft {

  /** Round half-away-from-zero on the BINARY double value — exactly what
    * DuckDB's `round(x, s)` computes (`std::round(x*10^s)/10^s`).
    *
    * Spark's own `round()` is subtly different: it routes through
    * `BigDecimal.valueOf(double)`, i.e. the SHORTEST DECIMAL PRINT of the
    * double, so a value whose binary form is just under a .5 boundary but
    * prints as ".…5" rounds up in Spark and down in DuckDB. For oracle
    * hash-parity every rounded double output must use this helper.
    */
  def dround(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    val scaled = c * p
    (when(c >= 0, floor(scaled + 0.5)).otherwise(-floor(-scaled + 0.5)) / p)
      .cast("double")
  }

  /** dround at 2 decimals — the default for currency-ish aggregates. */
  def dr2(c: Column): Column = dround(c, 2)

  /** Order-insensitive money aggregate. Summing doubles is order-sensitive —
    * at 100 TB the partial-agg merge order is nondeterministic, so a
    * `round(sum(double), 2)` result can flip at a .005 boundary between runs
    * (and between engines — that is exactly what broke q7 parity in round 1).
    * Money columns in the test data are exact 2-decimal values, so binary
    * half-away-from-zero rounding of `x * 10^decScale` (what DuckDB's
    * double→decimal cast computes) recovers the exact scaled integer
    * (decScale must cover the expression's true decimal digits: 2-digit
    * price × 2-digit rate → 4; × another rate → 6). Scaled longs then sum
    * exactly in a 128-bit two-long codegen buffer
    * ([[org.apache.spark.sql.graft.Int128Sum]] — measured 2.1x faster
    * than Spark's wide-decimal sum, and overflow-proof where a plain
    * 64-bit scaled sum is not); round HALF_UP in decimal (matches
    * DuckDB's half-away-from-zero) and emit DOUBLE.
    */
  def decSum(c: Column, outScale: Int = 2, decScale: Int = 4): Column =
    round(decSumExact(c, decScale), outScale).cast("double")

  /** Exact money sum as DECIMAL(38, decScale) via the int128 aggregate. */
  def decSumExact(c: Column, decScale: Int = 4): Column = {
    val p = math.pow(10, decScale)
    val scaled = c * p
    val asLong =
      when(c >= 0, floor(scaled + 0.5)).otherwise(-floor(-scaled + 0.5)).cast("long")
    functions.MoneyFunctions.int128_sum(asLong, decScale)
  }

  /** Exact decimal sum emitted as DOUBLE without rounding — for ratio
    * numerators/denominators where the division happens in double space
    * (pair with [[dround]] on the quotient).
    */
  def decSumRaw(c: Column, decScale: Int = 4): Column =
    decSumExact(c, decScale).cast("double")
}
