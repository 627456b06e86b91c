package org.apache.spark.sql.graft.store

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{BucketTransform, Transform}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DSv2 catalog for graftstore tables (`spark.sql.catalog.graft =
  * ...GraftCatalog`): `spark.table("graft.t")`, `INSERT INTO graft.t`,
  * `CREATE TABLE graft.t ... PARTITIONED BY (bucket(n, col))` all route
  * here.
  *
  * The catalog is what makes the scan's bucket-grouped partitioning
  * REAL to the planner: Spark resolves the scan-reported
  * `bucket(n, cols)` transform through this catalog's FunctionCatalog,
  * and two graftstore scans with the same bucket function + count become
  * a storage-partitioned join — the reference's exchange-free colocated
  * join (ExistingPlans.scala:49 outputPartitioning contract) on stock
  * Spark machinery.
  */
class GraftCatalog extends TableCatalog with FunctionCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def tableName(ident: Identifier): String = ident.name().toLowerCase

  override def listTables(namespace: Array[String]): Array[Identifier] =
    (GraftColumnStore.tableNames ++ GraftRowStore.tableNames)
      .map(n => Identifier.of(Array.empty, n)).toArray

  override def loadTable(ident: Identifier): Table = {
    val nm = tableName(ident)
    GraftColumnStore.get(nm) match {
      case Some(t) =>
        val s = t.snapshot
        // carry the snapshot's batch size and index clustering so
        // catalog-routed INSERTs keep the granularity/sort the table's
        // index was built at (the "stats skipping IS the index probe"
        // property depends on both)
        // ...and the codec/eviction budget, or a catalog-routed INSERT
        // would silently reset the table to uncompressed/unevicted
        new GraftTable(nm, s.schema, s.batchSize, s.bucketBy, s.numBuckets,
          s.keyColumns, s.sortedBy, s.compression, s.evictionBudget, s.sketchBy,
          s.expireSeconds)
      case None => GraftRowStore.get(nm) match {
        case Some(t) =>
          val s = t.snapshot
          new GraftRowTable(nm, s.schema, s.keyColumns, s.bucketBy, s.numBuckets,
            s.evictionBudget, s.expireSeconds)
        case None =>
          throw new NoSuchTableException(ident.namespace().toSeq :+ ident.name())
      }
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val nm = tableName(ident)
    // TableCatalog contract: plain CREATE TABLE on an existing table must
    // fail — silently replacing would destroy its data (Spark routes
    // CREATE OR REPLACE / IF NOT EXISTS decisions above this call)
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        ident.namespace().toSeq :+ ident.name())
    // an explicit CREATE supersedes replica status (same rule as the
    // session face): after attachView — which marks the name a replica
    // WITHOUT creating a store table — a DSv2 CREATE must not inherit a
    // stale read-only flag that would refuse every subsequent write
    ReplicaGuard.clear(nm)
    MatViews.unregister(nm) // explicit CREATE supersedes matview status too
    val (declaredBy: Seq[String], declaredBuckets: Int) = partitions.toSeq match {
      case Seq(BucketTransform(n, cols, Nil)) =>
        (cols.map(_.fieldNames.mkString(".")), n)
      case Seq() => (Nil: Seq[String], 0)
      case other =>
        throw new UnsupportedOperationException(
          s"graftstore supports only bucket(n, cols) partitioning, got: ${other.mkString(",")}")
    }
    // COLOCATE_WITH through the DSv2 route (same contract as the SQL
    // DDL route): colocation IS shared bucketing. PERF_NOTES §18 proved
    // mismatched bucket counts forfeit storage-partitioned joins
    // ENTIRELY (bucket(4) vs bucket(16) are incompatible
    // KeyGroupedPartitionings, no align-to-larger) — so a mismatch is an
    // error at CREATE, not a silent full-shuffle at every join.
    val (bucketBy: Seq[String], buckets: Int) =
      Option(properties.get("colocate_with")).map(_.trim.toLowerCase) match {
        case Some(target) =>
          val ts = GraftColumnStore.get(target).map(_.snapshot).getOrElse(
            throw new IllegalArgumentException(
              s"graftstore: COLOCATE_WITH '$target' is not a managed table"))
          require(ts.numBuckets > 0,
            s"graftstore: COLOCATE_WITH '$target' is not bucketed")
          if (declaredBuckets > 0 && declaredBuckets != ts.numBuckets)
            throw new IllegalArgumentException(
              s"graftstore: bucket($declaredBuckets, ...) cannot colocate with " +
                s"'$target' (${ts.numBuckets} buckets) — mismatched counts forfeit " +
                "storage-partitioned joins entirely")
          require(declaredBy.isEmpty || declaredBy.size == ts.bucketBy.size,
            s"graftstore: bucket column arity ${declaredBy.size} cannot colocate " +
              s"with '$target' (${ts.bucketBy.size} columns)")
          val by = if (declaredBy.nonEmpty) declaredBy else ts.bucketBy
          by.foreach(c => require(schema.fieldNames.map(_.toLowerCase).contains(c.toLowerCase),
            s"graftstore: inherited colocation column '$c' is not in the schema of $nm"))
          (by, ts.numBuckets)
        case None => (declaredBy, declaredBuckets)
      }
    val keys = Option(properties.get("key_columns"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    // Validate EVERY property before createOrReplace registers the
    // table: a post-registration failure would leave a phantom entry
    // that makes the corrected retry fail with TableAlreadyExists. And
    // fail at CREATE rather than the first write — an unvalidated codec
    // recorded in the snapshot would poison every later DataFrame
    // write/compact with a confusing late error (same check as
    // GraftTable.fromOptions).
    val compression = Option(properties.get("compression"))
      .map(_.toLowerCase).getOrElse("none")
    require(compression == "none" || compression == "lz4",
      s"graftstore: unsupported compression '$compression' (none | lz4)")
    val evictionBudget = Option(properties.get("eviction_budget_bytes"))
      .map(_.toLong).getOrElse(0L)
    val batchSize = Option(properties.get("batch_size")).map(_.toInt).getOrElse(16384)
    val sketchBy = Option(properties.get("sketch_columns"))
      .map(GraftColumnStore.DistinctSketch.parseSketchColumns(_, schema)).getOrElse(Nil)
    val expireSeconds = Option(properties.get("expire_seconds"))
      .map(_.toLong).getOrElse(0L)
    require(expireSeconds >= 0,
      s"graftstore: expire_seconds must be >= 0, got $expireSeconds")
    GraftColumnStore.createOrReplace(nm, schema, bucketBy, buckets, keys,
      sketchBy, expireSeconds)
    new GraftTable(nm, schema, batchSize,
      bucketBy, buckets, keys, Nil, compression, evictionBudget, sketchBy,
      expireSeconds)
  }

  /** ALTER TABLE graft.t through plain Spark SQL (reference
    * execution/ddl.scala:226,246): ADD COLUMNS / DROP COLUMN / RENAME
    * COLUMN / ALTER COLUMN TYPE fold into ONE layout-preserving rewrite
    * (codec/TTL/sketch/buckets survive, and key/bucket/index metadata
    * FOLLOWS a renamed column — see [[GraftStoreOps.alterRewrite]]);
    * SET/UNSET TBLPROPERTIES routes to the metadata-only
    * [[GraftStoreOps.alterProperties]] (live retention/eviction/codec
    * tuning, no rewrite). Unsupported shapes (NOT NULL adds, positioned
    * adds, nested fields, arbitrary properties) are rejected loudly
    * rather than silently dropped.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val nm = tableName(ident)
    // ALTER rewrites the replica's data/layout locally — same silent
    // divergence as a write, refused at the store level
    ReplicaGuard.requireWritable(nm, "alterTable")
    MatViews.guardWrite(nm)
    val spark = org.apache.spark.sql.SparkSession.active
    import org.apache.spark.sql.functions.{col, lit}
    def topLevel(path: Array[String], what: String): String = {
      if (path.length != 1) throw new UnsupportedOperationException(
        s"graftstore: nested $what not supported: ${path.mkString(".")}")
      path.head
    }
    var renames = Map.empty[String, String]
    var dataChange = false
    var setProps = Map.empty[String, String]
    var unsetProps = List.empty[String]
    val transform = changes.foldLeft(
      identity[org.apache.spark.sql.DataFrame] _) { (acc, ch) =>
      ch match {
        case add: TableChange.AddColumn =>
          val c = topLevel(add.fieldNames(), "ADD COLUMN")
          // reject what the rewrite cannot honor rather than silently
          // dropping the user's constraint/placement
          if (!add.isNullable) throw new UnsupportedOperationException(
            s"graftstore: ADD COLUMN $c NOT NULL not supported (new rows are null-filled)")
          if (add.position() != null) throw new UnsupportedOperationException(
            s"graftstore: ADD COLUMN $c with a position is not supported (appends at the end)")
          dataChange = true
          df => acc(df).withColumn(c, lit(null).cast(add.dataType()))
        case del: TableChange.DeleteColumn =>
          val c = topLevel(del.fieldNames(), "DROP COLUMN")
          dataChange = true
          df => acc(df).drop(c)
        case ren: TableChange.RenameColumn =>
          val c = topLevel(ren.fieldNames(), "RENAME COLUMN")
          val to = ren.newName()
          dataChange = true
          renames += c.toLowerCase -> to
          df => {
            val d = acc(df)
            require(!d.columns.exists(_.equalsIgnoreCase(to)),
              s"graftstore: RENAME COLUMN $c TO $to: target column exists")
            d.withColumnRenamed(c, to)
          }
        case ut: TableChange.UpdateColumnType =>
          val c = topLevel(ut.fieldNames(), "ALTER COLUMN TYPE")
          dataChange = true
          // ANSI cast: an unrepresentable value fails the rewrite job
          // BEFORE the commit, so the table is left untouched
          df => acc(df).withColumn(c, col(c).cast(ut.newDataType()))
        case un: TableChange.UpdateColumnNullability =>
          val c = topLevel(un.fieldNames(), "ALTER COLUMN NULL")
          if (!un.nullable()) throw new UnsupportedOperationException(
            s"graftstore: ALTER COLUMN $c SET NOT NULL not supported " +
              "(the store does not enforce NOT NULL)")
          acc // relaxing to nullable is a no-op: store columns are nullable
        case sp: TableChange.SetProperty =>
          setProps += sp.property() -> sp.value(); acc
        case rp: TableChange.RemoveProperty =>
          unsetProps ::= rp.property(); acc
        case other => throw new UnsupportedOperationException(
          s"graftstore: ALTER TABLE change not supported: $other")
      }
    }
    val exists = GraftColumnStore.get(nm).isDefined || GraftRowStore.get(nm).isDefined
    if (!exists)
      throw new NoSuchTableException(ident.namespace().toSeq :+ ident.name())
    if (dataChange) {
      if (GraftColumnStore.get(nm).isDefined)
        GraftStoreOps.alterRewrite(spark, nm, transform, renames)
      else GraftRowOps.alterRewrite(spark, nm, transform, renames)
    }
    // SET/UNSET TBLPROPERTIES: metadata-only tunables, no rewrite
    if (setProps.nonEmpty || unsetProps.nonEmpty)
      GraftStoreOps.alterProperties(spark, nm, setProps, unsetProps)
    // a GraftSession-managed temp view over this table must re-resolve,
    // or it keeps planning the pre-ALTER relation/schema
    graft.GraftSession(spark).refreshManaged(nm)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val nm = tableName(ident)
    val existed = GraftColumnStore.get(nm).isDefined || GraftRowStore.get(nm).isDefined
    GraftColumnStore.drop(nm)
    GraftRowStore.drop(nm)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graftstore: RENAME not supported")

  override def tableExists(ident: Identifier): Boolean =
    GraftColumnStore.get(tableName(ident)).isDefined ||
      GraftRowStore.get(tableName(ident)).isDefined

  // ---- namespaces: single flat default namespace ----
  override def listNamespaces(): Array[Array[String]] = Array(Array("default"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespace.isEmpty || namespace.sameElements(Array("default")))
      Map.empty[String, String].asJava
    else throw new IllegalArgumentException(s"no such namespace: ${namespace.mkString(".")}")
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graftstore: flat namespace")
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graftstore: flat namespace")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = false

  // ---- functions: the bucket transform ----
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) GraftBucketFunction
    else throw new NoSuchFunctionException(ident)
}

/** The bucket V2 function backing `bucket(n, col)` transforms. Its result
  * matches Spark's own HashPartitioning routing (murmur3 seed 42, pmod) —
  * the exact distribution the write path's clustered requirement produced
  * — so a planner-initiated shuffle-one-side SPJ stays correctly
  * co-located with stored buckets.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String = "graftstore bucket(numBuckets, col)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket expects (numBuckets, key...), got ${inputType.catalogString}")
    val keyTypes = inputType.fields.drop(1).map(_.dataType)
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = IntegerType +: keyTypes
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String =
        s"graft.bucket(${keyTypes.mkString(",")})"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        // shared seed-42 murmur3 routing — identical to the write
        // distribution and the scan-side pruning (BucketRouting)
        BucketRouting.bucketOfRow(input, 1, keyTypes, n)
      }
    }
  }
}
