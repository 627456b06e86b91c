package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator/query exposed through [[SparkEntry]].
  *
  * @param fn     builds the result DataFrame from (session, sf data dir)
  * @param oracle equivalent ANSI SQL runnable by DuckDB against the same
  *               parquet tables; None for ops whose semantics are not
  *               SQL-expressible (approximate/sketch results) — the driver
  *               then records a weaker rows-only check.
  *
  * Determinism contract: every query that HAS an oracle must produce a
  * total deterministic row order (ORDER BY including a unique key) and
  * round floating aggregates, so the driver's value-hash compare against
  * DuckDB is stable across engines.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
