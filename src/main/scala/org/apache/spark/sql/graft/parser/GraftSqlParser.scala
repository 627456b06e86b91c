package org.apache.spark.sql.graft.parser

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** Session parser for the Snappy statement surface, installed via
  * `injectParser` (the rebuild of the reference's SnappySqlParser
  * delegation: its parser tries the Snappy grammar first and falls back
  * to Spark's). [[GraftStatements]] recognizes the additive statements;
  * embedded expressions/queries are parsed by the DELEGATE (stock Spark
  * parser), so the full Spark expression language — quoted identifiers,
  * subqueries, CASE, intervals — works in WHERE/SET/source position.
  * UPDATE/DELETE are only intercepted for GraftSession-managed tables;
  * everything else (including DSv2 catalog DML) flows to Spark
  * unchanged.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  import GraftStatements._

  private def g = graft.GraftSession(session)

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftStatements.parse(sqlText) match {
      case Some(PutInto(t, src)) =>
        GraftPutIntoCommand(t, delegate.parsePlan(src))
      case Some(Update(t, assigns, where)) if g.isManaged(t.toLowerCase) =>
        // validate all embedded expressions NOW (statement-time parse
        // errors); the command re-parses at run — commands must not carry
        // unresolved Expression fields past the analyzer
        assigns.foreach { case (_, v) => delegate.parseExpression(v) }
        delegate.parseExpression(where)
        GraftUpdateCommand(t, assigns, where)
      case Some(Delete(t, where)) if g.isManaged(t.toLowerCase) =>
        delegate.parseExpression(where)
        GraftDeleteCommand(t, where)
      case Some(CreatePolicy(n, t, users, filter)) =>
        // validate the filter expression now (parse errors surface at
        // statement time, like any DDL)
        delegate.parseExpression(filter)
        GraftCreatePolicyCommand(n, t, users, filter)
      case Some(DropPolicy(n)) => GraftDropPolicyCommand(n)
      case Some(CreateSampleTable(n, base, opts)) =>
        GraftCreateSampleTableCommand(n, base, opts)
      case Some(CreateTableUsing(n, provider, opts, sel)) =>
        GraftCreateTableCommand(n, provider, opts, delegate.parsePlan(sel))
      case Some(CreateStreamTable(n, schema, provider, opts)) =>
        schema.foreach(delegate.parseTableSchema) // validate at statement time
        GraftCreateStreamTableCommand(n, schema, provider, opts)
      case Some(CreateIndex(_, t, cols)) if g.isManaged(t.toLowerCase) =>
        GraftCreateIndexCommand(t.toLowerCase, cols)
      case Some(DropIndex(_, t)) if g.isManaged(t.toLowerCase) =>
        GraftDropIndexCommand(t.toLowerCase)
      case Some(AlterAddColumn(t, c, dt)) if g.isManaged(t.toLowerCase) =>
        delegate.parseDataType(dt) // validate at statement time
        GraftAlterAddColumnCommand(t.toLowerCase, c, dt)
      case Some(AlterDropColumn(t, c)) if g.isManaged(t.toLowerCase) =>
        GraftAlterDropColumnCommand(t.toLowerCase, c)
      case Some(TruncateTable(t)) if g.isManaged(t.toLowerCase) =>
        GraftTruncateTableCommand(t.toLowerCase)
      case _ => delegate.parsePlan(sqlText)
    }

  // the trait DEFAULT ignores the parameters — route to the delegate's
  // real implementation (graft statements themselves take no parameters)
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    if (GraftStatements.parse(sqlText).isDefined) parsePlan(sqlText)
    else delegate.parsePlanWithParameters(sqlText, ctx)

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

// ---- eagerly-executed commands over the GraftSession surface ----

case class GraftPutIntoCommand(table: String, source: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    graft.GraftSession(spark).putInto(table, Dataset.ofRows(classic, source))
    Nil
  }
}

case class GraftUpdateCommand(table: String, assigns: Seq[(String, String)],
    where: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.expr
    graft.GraftSession(spark).update(table, expr(where),
      assigns.map { case (k, e) => k -> expr(e) }: _*)
    Nil
  }
}

case class GraftDeleteCommand(table: String, where: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.expr
    graft.GraftSession(spark).delete(table, expr(where))
    Nil
  }
}

case class GraftCreatePolicyCommand(name: String, table: String,
    users: Seq[String], filterSql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.GraftSession(spark).createPolicy(name, table, filterSql, users.toSet)
    Nil
  }
}

case class GraftDropPolicyCommand(name: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.GraftSession(spark).dropPolicy(name)
    Nil
  }
}

case class GraftCreateSampleTableCommand(name: String, base: String,
    options: Map[String, String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val qcs = options.getOrElse("qcs",
      throw new IllegalArgumentException("CREATE SAMPLE TABLE requires OPTIONS (qcs '...')"))
      .split(",").map(_.trim).toSeq
    val rankKey = options.get("rankkey").map(_.split(",").map(_.trim).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "CREATE SAMPLE TABLE requires OPTIONS (rankKey '<unique key cols>') for deterministic sampling"))
    val g = graft.GraftSession(spark)
    g.createSampleTable(name, spark.table(base),
      qcs = qcs,
      fraction = options.getOrElse("fraction", "0.1").toDouble,
      reservoirFloor = options.getOrElse("stratareservoirsize", "50").toInt,
      rankKey = rankKey)
    g.registerSample(base, name)
    Nil
  }
}

case class GraftAlterAddColumnCommand(table: String, column: String,
    dataTypeSql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val dt = classic.sessionState.sqlParser.parseDataType(dataTypeSql)
    graft.GraftSession(spark).alterTable(table)(df =>
      df.withColumn(column, org.apache.spark.sql.functions.lit(null).cast(dt)))
    Nil
  }
}

case class GraftAlterDropColumnCommand(table: String, column: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.GraftSession(spark).alterTable(table)(_.drop(column))
    Nil
  }
}

case class GraftCreateIndexCommand(table: String, columns: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // row tables get per-column secondary indexes (sorted-slot arrays +
    // pack stats); column tables get clustering (sorted batch rewrite)
    if (org.apache.spark.sql.graft.store.GraftRowStore.get(table).isDefined)
      columns.foreach(c =>
        org.apache.spark.sql.graft.store.GraftRowOps.createIndex(spark, table, c))
    else
      org.apache.spark.sql.graft.store.GraftStoreOps.createIndex(spark, table, columns)
    Nil
  }
}

case class GraftTruncateTableCommand(table: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.GraftSession(spark).truncateTable(table)
    Nil
  }
}

case class GraftDropIndexCommand(table: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (org.apache.spark.sql.graft.store.GraftRowStore.get(table).isDefined)
      org.apache.spark.sql.graft.store.GraftRowOps.dropIndexes(table)
    else
      org.apache.spark.sql.graft.store.GraftStoreOps.dropIndex(spark, table)
    Nil
  }
}

/** CREATE STREAM TABLE (reference SnappyDDLParser stream DDL): registers
  * a Structured-Streaming source as a named view, so stream SQL
  * (`SELECT ... FROM s`) composes with the rest of the surface and the
  * result is started with `writeStream` as usual.
  */
case class GraftCreateStreamTableCommand(name: String, schemaSql: Option[String],
    provider: String, options: Map[String, String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    var reader = spark.readStream.format(provider)
    schemaSql.foreach(s =>
      reader = reader.schema(classic.sessionState.sqlParser.parseTableSchema(s)))
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val df = reader.load() // the path option (if any) rides along

    df.createOrReplaceTempView(name.toLowerCase)
    Nil
  }
}

case class GraftCreateTableCommand(name: String, provider: String,
    options: Map[String, String], source: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    graft.GraftSession(spark).createTable(name, Dataset.ofRows(classic, source),
      keyColumns = options.get("key_columns").toSeq.flatMap(_.split(",").map(_.trim)),
      partitionBy = options.get("partition_by").toSeq.flatMap(_.split(",").map(_.trim)),
      buckets = options.getOrElse("buckets", "32").toInt,
      provider = provider)
    Nil
  }
}
