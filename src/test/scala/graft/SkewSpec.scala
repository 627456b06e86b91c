package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of fact rows share one key — the classic hot-key shape
    val fact = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong else 7L, i.toDouble))
      .toDF("k", "v")
    val dim = (1 to 10000).map(i => (i.toLong, s"name_$i")).toDF("k2", "name")

    val plain = fact.join(dim, col("k") === col("k2"))
      .agg(count(lit(1)), sum("v")).head()
    val salted = Skew.saltedJoin(fact, dim, "k", "k2", buckets = 8)
      .agg(count(lit(1)), sum("v")).head()
    assert(plain.getLong(0) == salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-6)
  }

  test("salted left join preserves unmatched fact rows") {
    import spark.implicits._
    val fact = Seq((1L, 1.0), (2L, 2.0), (99L, 3.0)).toDF("k", "v")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k2", "name")
    val rows = Skew.saltedJoin(fact, dim, "k", "k2", buckets = 4, joinType = "left")
      .select("k", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (99L, null)))
  }
}
