package graft

import org.apache.spark.sql.DataFrame

/** DataFrame enrichments mirroring the reference's `SnappyImplicits`
  * (reference: core/.../SnappyImplicits.scala:185 `df.write.putInto`,
  * `:209` `df.write.deleteFrom`). Spark 4's `DataFrameWriter` keeps its
  * source frame private, so the verbs hang off the DataFrame itself:
  *
  * {{{
  *   import graft.Implicits._
  *   updates.putInto("orders")      // key-matched upsert
  *   tombstones.deleteFrom("orders") // delete rows whose keys appear
  * }}}
  */
object Implicits {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** Upsert this frame into a managed table (PUT INTO semantics:
      * matched keys replaced, unmatched inserted).
      */
    def putInto(table: String): DataFrame =
      GraftSession(df.sparkSession).putInto(table, df)

    /** Delete every target row whose key columns match a row of this
      * frame (the reference's `deleteFrom` contract).
      */
    def deleteFrom(table: String): DataFrame =
      GraftSession(df.sparkSession).deleteKeys(table, df)

    /** Append this frame into a managed table. */
    def insertInto(table: String): DataFrame =
      GraftSession(df.sparkSession).insert(table, df)
  }
}
