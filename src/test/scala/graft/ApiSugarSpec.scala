package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Row-varargs session mutations + DataFrame verb implicits (reference
  * SnappySession.insert/put/update/delete(Row*) and SnappyImplicits'
  * df.write.putInto / deleteFrom).
  */
class ApiSugarSpec extends SparkTestBase {

  private def g = GraftSession(spark)

  private def freshTable(name: String): Unit = {
    import spark.implicits._
    g.createTable(name,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("k", "name", "v"),
      keyColumns = Seq("k"), partitionBy = Seq("k"), buckets = 4)
  }

  test("insertRows appends literal rows") {
    freshTable("sug_ins")
    val n = g.insertRows("sug_ins", Row(4L, "d", 40.0), Row(5L, "e", 50.0))
    assert(n == 2)
    assert(g.table("sug_ins").count() == 5)
    assert(g.table("sug_ins").filter(col("k") === 4L).head().getString(1) == "d")
  }

  test("putRows upserts by key") {
    freshTable("sug_put")
    val n = g.putRows("sug_put", Row(2L, "B2", 99.0), Row(9L, "new", 9.0))
    assert(n == 2)
    val m = g.table("sug_put").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "a", 2L -> "B2", 3L -> "c", 9L -> "new"))
  }

  test("updateRows sets columns where the filter matches, returns count") {
    freshTable("sug_upd")
    val n = g.updateRows("sug_upd", "k >= 2", Row(0.0), "v")
    assert(n == 2)
    val vs = g.table("sug_upd").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(vs == Map(1L -> 10.0, 2L -> 0.0, 3L -> 0.0))
  }

  test("deleteWhere removes matching rows, returns count") {
    freshTable("sug_del")
    val n = g.deleteWhere("sug_del", "v > 15.0")
    assert(n == 2)
    assert(g.table("sug_del").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("DataFrame verbs: putInto / deleteFrom / insertInto") {
    import spark.implicits._
    import Implicits._
    freshTable("sug_verbs")
    Seq((3L, "C3", 33.0), (7L, "g", 70.0)).toDF("k", "name", "v")
      .putInto("sug_verbs")
    assert(g.table("sug_verbs").count() == 4)
    assert(g.table("sug_verbs").filter(col("k") === 3L).head().getString(1) == "C3")
    Seq(Tuple1(1L)).toDF("k").deleteFrom("sug_verbs")
    assert(g.table("sug_verbs").collect().map(_.getLong(0)).toSet == Set(2L, 3L, 7L))
    Seq((8L, "h", 80.0)).toDF("k", "name", "v").insertInto("sug_verbs")
    assert(g.table("sug_verbs").count() == 4)
  }
}
