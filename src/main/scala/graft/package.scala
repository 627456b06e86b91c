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
}
