package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/** Plan-introspection helpers shared by the plan-asserting queries and
  * specs (one copy, so a change in how graft relations surface in plans
  * breaks every assertion loudly instead of one silently).
  */
object Plans {

  /** DSv2 table names scanned by the query's optimized plan (graft store
    * tables appear as `graftstore.<name>`).
    */
  def scannedTables(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2Relation => r.table.name
      case s: DataSourceV2ScanRelation => s.relation.table.name
    }.toSet

  def scansStoreTable(df: DataFrame, storeName: String): Boolean =
    scannedTables(df).contains(s"graftstore.$storeName")
}
