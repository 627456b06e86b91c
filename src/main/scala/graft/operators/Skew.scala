package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when one key dominates so badly that a single
  * partition would still exceed executor memory, or when AQE is off
  * (e.g. inside a cached plan). Classic scheme:
  *  - fact side: add `_salt = pmod(hash(<row>), buckets)`;
  *  - dim side: explode each row into all `buckets` salt values;
  *  - join on (key, _salt) — the hot key's rows now spread over
  *    `buckets` partitions instead of one.
  * Cost: dim side replicated ×buckets (keep it the smaller side).
  */
object Skew {

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)).cast("int"))
    val replicated = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) && salted("_salt") === replicated("_salt"),
        joinType)
      .drop("_salt")
  }
}
