package org.apache.spark.sql.graft.parser

import scala.util.parsing.combinator.RegexParsers

/** Grammar for the Snappy-specific statement surface (reference:
  * SnappyParser.put:1173 / putValuesOperation:1220, update:1177,
  * delete:1198, SnappyDDLParser.createPolicy:392, createTable:301,
  * CREATE SAMPLE TABLE). A real combinator grammar, not regexes: quoted
  * identifiers, nested parentheses, string literals and subqueries in
  * WHERE/SET/source position all tokenize correctly. Embedded
  * EXPRESSIONS and QUERIES are captured as balanced text chunks and
  * handed to Spark's own parser (delegate.parseExpression/parsePlan) by
  * [[GraftSqlParser]] — the statement skeleton is ours, the expression
  * language is Spark's, exactly the reference's split.
  */
object GraftStatements extends RegexParsers {

  sealed trait Stmt
  /** PUT INTO t (SELECT ...|VALUES ...|TABLE x) */
  final case class PutInto(table: String, sourceSql: String) extends Stmt
  /** MERGE INTO t USING src ON cond WHEN MATCHED THEN UPDATE SET *
    * WHEN NOT MATCHED THEN INSERT * — the canonical upsert form only
    * (it is exactly PUT INTO's contract); richer clauses are rejected
    * with a pointer to PUT INTO / the DataFrame API.
    */
  final case class MergeInto(table: String, source: String,
      onCond: String, clauses: String,
      targetAlias: Option[String] = None,
      sourceAlias: Option[String] = None) extends Stmt
  /** UPDATE t SET a = expr, ... WHERE expr */
  final case class Update(table: String, assigns: Seq[(String, String)],
      whereSql: String) extends Stmt
  /** DELETE FROM t WHERE expr */
  final case class Delete(table: String, whereSql: String) extends Stmt
  /** CREATE POLICY p ON t [FOR SELECT] [TO u1,u2] USING expr */
  final case class CreatePolicy(name: String, table: String, users: Seq[String],
      filterSql: String) extends Stmt
  final case class DropPolicy(name: String) extends Stmt
  /** CREATE SAMPLE TABLE s ON base OPTIONS (qcs 'a,b', fraction '0.1', ...) */
  final case class CreateSampleTable(name: String, base: String,
      options: Map[String, String]) extends Stmt
  /** CREATE TABLE t [(schema)] USING column|row [OPTIONS (...)] [AS SELECT ...]
    * (reference SnappyDDLParser.createTable:301 — both the schema-ful
    * empty-table form and CTAS).
    */
  final case class CreateTableUsing(name: String, provider: String,
      schemaSql: Option[String], options: Map[String, String],
      selectSql: Option[String]) extends Stmt
  /** CREATE STREAM TABLE s [(schema)] USING provider OPTIONS (...) */
  final case class CreateStreamTable(name: String, schemaSql: Option[String],
      provider: String, options: Map[String, String]) extends Stmt
  /** CREATE INDEX i ON t (cols) [USING provider [OPTIONS (...)]] / DROP
    * INDEX i ON t — the USING clause mirrors the reference's index
    * provider (SnappyDDLParser.createIndex:519); `ivf`/`ivfpq` route to
    * the ANN index family, absent means the store-native index
    * (row secondary / column clustering).
    */
  final case class CreateIndex(name: String, table: String,
      columns: Seq[String], using: Option[String] = None,
      options: Map[String, String] = Map.empty) extends Stmt
  final case class DropIndex(name: String, table: String) extends Stmt
  /** OPTIMIZE t ZORDER BY (cols) — multi-column clustering rewrite. */
  final case class OptimizeZorder(table: String, columns: Seq[String]) extends Stmt
  /** ALTER TABLE t ADD COLUMN c type / DROP COLUMN c */
  final case class AlterAddColumn(table: String, column: String,
      dataTypeSql: String) extends Stmt
  final case class AlterDropColumn(table: String, column: String) extends Stmt
  /** ALTER TABLE t ADD [CONSTRAINT n] UNIQUE/FK/CHECK/PK clause / DROP
    * CONSTRAINT n (reference SnappyDDLParser.alterTable:697 forwards
    * these to the store's Derby DDL).
    */
  final case class AlterAddConstraint(table: String, clauseSql: String) extends Stmt
  final case class AlterDropConstraint(table: String, name: String) extends Stmt
  /** ALTER TABLE t REBUCKET n [BY (cols)] — re-hash a live store table
    * into a new bucket count (optionally new bucket columns): the
    * co-location remedy for mismatched bucket counts (PERF_NOTES §18).
    */
  final case class AlterRebucket(table: String, buckets: Int,
      columns: Seq[String]) extends Stmt
  /** TRUNCATE TABLE t (reference SnappyDDLParser.truncateTable:627) */
  final case class TruncateTable(table: String) extends Stmt
  /** CREATE DISKSTORE name [opt value]* [('dir' [size] [, ...])] */
  final case class CreateDiskstore(name: String, ifNotExists: Boolean,
      props: Map[String, String], dirs: Seq[String]) extends Stmt
  final case class DropDiskstore(name: String, ifExists: Boolean) extends Stmt
  final case class CreateSynonym(name: String, target: String) extends Stmt
  final case class DropSynonym(name: String) extends Stmt
  /** SET [CURRENT] ISOLATION [=] level */
  final case class SetIsolation(level: String) extends Stmt
  /** SET [CURRENT] SCHEMA s (reference set-schema.md, Derby semantics):
    * the session's default namespace — Spark's USE. Parsed here because
    * Spark's own SET statement would otherwise swallow it as a conf
    * assignment (key "schema" = s) and silently change nothing.
    */
  final case class SetSchema(name: String) extends Stmt
  /** PUBLISH TABLE t [INCREMENTAL] [TO 'root'] — connector-mode epoch
    * publishing's SQL face (no TO clause = the table's bound DISKSTORE).
    */
  final case class PublishTable(table: String, root: Option[String],
      incremental: Boolean) extends Stmt
  /** ATTACH TABLE x FROM 'root' — restore-and-serve the newest epoch. */
  final case class AttachTable(name: String, root: String) extends Stmt
  /** ATTACH VIEW x FROM 'root' [EPOCH n] [VERIFY] — zero-copy serving,
    * optionally pinned to an immutable epoch (dataset time travel).
    */
  final case class AttachView(name: String, root: String,
      epoch: Option[Long], verify: Boolean) extends Stmt
  /** BOOTSTRAP CATALOG [FROM diskstore] — re-register every durable
    * table the registered diskstores hold (cold-JVM catalog recovery;
    * the reference's store-persisted catalog makes this implicit).
    */
  final case class BootstrapCatalog(diskstore: Option[String]) extends Stmt

  /** INSERT INTO t [(cols)] <VALUES ... | SELECT ... | TABLE x> —
    * captured ONLY so graft store tables with ENFORCED constraints
    * (identity, CHECK, UNIQUE, FK) can route through the session's
    * enforcing insert path; every other target falls through to Spark's
    * native INSERT ([[GraftSqlParser]] guards on the global registries).
    * Without this, a SQL-only client (JDBC/Thrift) writing through the
    * DSv2 catalog would silently bypass identity fill and CHECK
    * validation — the store-level guarantees must hold on every
    * protocol face, like the reference's store-side enforcement.
    */
  final case class InsertInto(table: String, columns: Seq[String],
      sourceSql: String) extends Stmt

  /** ALTER TOPK t DECAY OLDER THAN 'ts' [GENERATIONS g] [MIN WIDTH w] —
    * SQL face of [[graft.GraftSession.decayApproxTSTopK]], so SQL-only
    * deployments can run sketch retention (idempotent: the target width
    * is absolute, a re-run at the same cutoff is a no-op).
    */
  final case class AlterTopkDecay(name: String, olderThan: String,
      generations: Int, minWidth: Int) extends Stmt

  final case class CreateMatView(name: String, selectSql: String,
      options: Map[String, String]) extends Stmt
  final case class DropMatView(name: String) extends Stmt
  final case class RefreshMatView(name: String) extends Stmt
  /** REFRESH SAMPLE [TABLE] s — re-stratify a registered sample over the
    * current base (the repair path for `sys.samples.is_fresh = false`).
    */
  final case class RefreshSample(name: String) extends Stmt
  /** CREATE FUNCTION f AS class [RETURNS type] [USING JAR 'path']
    * (reference SnappyDDLParser.createFunction:765 — the RETURNS clause
    * is Snappy-specific; stock Spark's CREATE FUNCTION lacks it).
    */
  final case class CreateFunction(name: String, className: String,
      returnsSql: Option[String], jarPath: Option[String]) extends Stmt
  /** CREATE TABLE t LIKE src (reference SnappyDDLParser.createTableLike:349). */
  final case class CreateTableLike(name: String, source: String) extends Stmt
  /** STREAMING INIT <interval> / START / STOP (reference
    * SnappyDDLParser.streamContext:875).
    */
  final case class StreamingCtl(action: String, arg: Option[String]) extends Stmt

  final case class GrantRevoke(isGrant: Boolean, privs: Seq[String],
      table: String, users: Seq[String]) extends Stmt

  override def skipWhitespace = true

  private def kw(s: String): Parser[String] = ("(?i)" + s + "\\b").r

  private def ident: Parser[String] =
    "`" ~> "[^`]+".r <~ "`" |
    "\"" ~> "[^\"]+".r <~ "\"" |
    """[a-zA-Z_][a-zA-Z0-9_]*""".r

  private def quoted: Parser[String] = "'" ~> "[^']*".r <~ "'"

  private def options: Parser[Map[String, String]] =
    "(" ~> repsep(ident ~ quoted ^^ { case k ~ v => k.toLowerCase -> v }, ",") <~ ")" ^^ (_.toMap)

  /** Everything to the end of the input (trimmed); must be non-empty. */
  private def restAll: Parser[String] = new Parser[String] {
    def apply(in: Input): ParseResult[String] = {
      val src = in.source
      val start = handleWhiteSpace(src, in.offset)
      val text = src.subSequence(start, src.length).toString.trim
      if (text.isEmpty) Failure("expected more input", in)
      else Success(text, in.drop(src.length - in.offset))
    }
  }

  /** Balanced text chunk up to a TOP-LEVEL stop keyword or (optionally) a
    * top-level comma — parenthesis-depth and quote aware, so subqueries,
    * function calls and string/backquoted literals pass through intact.
    */
  private def chunkUntil(stops: Seq[String], stopAtComma: Boolean): Parser[String] =
    new Parser[String] {
      def apply(in: Input): ParseResult[String] = {
        val src = in.source
        val start = handleWhiteSpace(src, in.offset)
        var i = start
        var depth = 0
        var end = -1
        def stopAt(j: Int): Boolean = stops.exists { s =>
          j + s.length <= src.length &&
            src.subSequence(j, j + s.length).toString.equalsIgnoreCase(s) &&
            (j + s.length == src.length ||
              !Character.isLetterOrDigit(src.charAt(j + s.length))) &&
            (j == start || !Character.isLetterOrDigit(src.charAt(j - 1)))
        }
        while (i < src.length && end < 0) {
          src.charAt(i) match {
            case '(' => depth += 1; i += 1
            case ')' => depth -= 1; i += 1
            case q @ ('\'' | '"' | '`') =>
              i += 1
              while (i < src.length && src.charAt(i) != q) i += 1
              i += 1
            case ',' if depth == 0 && stopAtComma => end = i
            case _ =>
              if (depth == 0 && stopAt(i)) end = i else i += 1
          }
        }
        if (end < 0) end = src.length
        val text = src.subSequence(start, end).toString.trim
        if (text.isEmpty) Failure("empty expression", in)
        else Success(text, in.drop(end - in.offset))
      }
    }

  /** Balanced parenthesized chunk; yields the inner text. */
  private def parenChunk: Parser[String] = new Parser[String] {
    def apply(in: Input): ParseResult[String] = {
      val src = in.source
      val start = handleWhiteSpace(src, in.offset)
      if (start >= src.length || src.charAt(start) != '(')
        return Failure("expected (", in)
      var i = start + 1
      var depth = 1
      while (i < src.length && depth > 0) {
        src.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case q @ ('\'' | '"' | '`') =>
            i += 1
            while (i < src.length && src.charAt(i) != q) i += 1
          case _ =>
        }
        i += 1
      }
      if (depth != 0) Failure("unbalanced parentheses", in)
      else Success(src.subSequence(start + 1, i - 1).toString.trim,
        in.drop(i - in.offset))
    }
  }

  // ---- statements ----

  /** An identifier that is NOT the given keyword (so an optional alias
    * can't swallow the next clause's keyword).
    */
  private def identExcept(stop: String): Parser[String] =
    ident ^? ({ case s if !s.equalsIgnoreCase(stop) => s },
      s => s"'$s' cannot alias here")

  private def mergeInto: Parser[Stmt] =
    kw("MERGE") ~> kw("INTO") ~> ident ~ opt(identExcept("USING")) ~
      (kw("USING") ~> ident) ~ opt(identExcept("ON")) ~
      (kw("ON") ~> chunkUntil(Seq("WHEN"), stopAtComma = false)) ~ restAll ^^ {
        case t ~ ta ~ src ~ sa ~ on ~ clauses =>
          MergeInto(t, src, on.trim, clauses.trim, ta, sa)
      }

  private def putInto: Parser[Stmt] =
    kw("PUT") ~> kw("INTO") ~> ident ~ restAll ^^ { case t ~ src =>
      val s = src.trim
      if (s.toUpperCase.startsWith("TABLE"))
        PutInto(t, s"SELECT * FROM ${s.split("\\s+")(1)}")
      else PutInto(t, s)
    }

  private def assignment: Parser[(String, String)] =
    ident ~ ("=" ~> chunkUntil(Seq("WHERE"), stopAtComma = true)) ^^ {
      case k ~ v => k -> v
    }

  private def update: Parser[Stmt] =
    kw("UPDATE") ~> ident ~ (kw("SET") ~> rep1sep(assignment, ",")) ~
      (kw("WHERE") ~> restAll) ^^ { case t ~ as ~ w => Update(t, as, w) }

  private def delete: Parser[Stmt] =
    kw("DELETE") ~> kw("FROM") ~> ident ~ (kw("WHERE") ~> restAll) ^^ {
      case t ~ w => Delete(t, w)
    }

  private def createPolicy: Parser[Stmt] =
    kw("CREATE") ~> kw("POLICY") ~> ident ~ (kw("ON") ~> ident) ~
      opt(kw("FOR") ~ kw("SELECT")) ~
      opt(kw("TO") ~> rep1sep("""[A-Za-z0-9_*]+""".r, ",")) ~
      (kw("USING") ~> restAll) ^^ { case n ~ t ~ _ ~ users ~ f =>
        CreatePolicy(n, t, users.getOrElse(Seq("*")),
          f.trim.stripPrefix("(").stripSuffix(")"))
      }

  private def dropPolicy: Parser[Stmt] =
    kw("DROP") ~> kw("POLICY") ~> ident ^^ DropPolicy.apply

  private def createSample: Parser[Stmt] =
    kw("CREATE") ~> kw("SAMPLE") ~> kw("TABLE") ~> ident ~
      (kw("ON") ~> ident) ~ (kw("OPTIONS") ~> options) ^^ {
        case n ~ base ~ o => CreateSampleTable(n, base, o)
      }

  private def createTableUsing: Parser[Stmt] =
    kw("CREATE") ~> kw("TABLE") ~> ident ~ opt(parenChunk) ~
      (kw("USING") ~> (kw("COLUMN") | kw("ROW"))) ~
      opt(kw("OPTIONS") ~> options) ~ opt(kw("AS") ~> restAll) ^? ({
        case n ~ schema ~ p ~ o ~ sel if schema.exists(_.nonEmpty) || sel.isDefined =>
          CreateTableUsing(n, p.toLowerCase, schema.filter(_.nonEmpty),
            o.getOrElse(Map.empty), sel)
      }, _ => "CREATE TABLE needs a (schema) or an AS SELECT")

  private def createStream: Parser[Stmt] =
    kw("CREATE") ~> kw("STREAM") ~> kw("TABLE") ~> ident ~ opt(parenChunk) ~
      (kw("USING") ~> """[A-Za-z0-9_.]+""".r) ~ opt(kw("OPTIONS") ~> options) ^^ {
        case n ~ schema ~ p ~ o =>
          CreateStreamTable(n, schema.filter(_.nonEmpty), p, o.getOrElse(Map.empty))
      }

  private def createIndex: Parser[Stmt] =
    kw("CREATE") ~> kw("INDEX") ~> ident ~ (kw("ON") ~> ident) ~
      ("(" ~> rep1sep(ident, ",") <~ ")") ~
      opt(kw("USING") ~> ident) ~ opt(kw("OPTIONS") ~> options) ^^ {
        case n ~ t ~ cs ~ u ~ o =>
          CreateIndex(n, t, cs, u.map(_.toLowerCase), o.getOrElse(Map.empty))
      }

  private def dropIndex: Parser[Stmt] =
    kw("DROP") ~> kw("INDEX") ~> ident ~ (kw("ON") ~> ident) ^^ {
      case n ~ t => DropIndex(n, t)
    }

  private def optimizeZorder: Parser[Stmt] =
    kw("OPTIMIZE") ~> ident ~ (kw("ZORDER") ~> kw("BY") ~>
      "(" ~> rep1sep(ident, ",") <~ ")") ^^ { case t ~ cs => OptimizeZorder(t, cs) }

  private def createFunction: Parser[Stmt] =
    kw("CREATE") ~> kw("FUNCTION") ~> ident ~
      (kw("AS") ~> """[A-Za-z0-9_.$]+""".r) ~
      opt(kw("RETURNS") ~> chunkUntil(Seq("USING"), stopAtComma = false)) ~
      opt(kw("USING") ~> kw("JAR") ~> quoted) ^^ {
        case n ~ cls ~ ret ~ jar => CreateFunction(n, cls, ret, jar)
      }

  private def alterAdd: Parser[Stmt] =
    kw("ALTER") ~> kw("TABLE") ~> ident ~
      (kw("ADD") ~> opt(kw("COLUMN")) ~> ident) ~ restAll ^^ {
        case t ~ c ~ dt => AlterAddColumn(t, c, dt)
      }

  private def alterRebucket: Parser[Stmt] =
    kw("ALTER") ~> kw("TABLE") ~> ident ~ (kw("REBUCKET") ~> """\d+""".r) ~
      opt(kw("BY") ~> "(" ~> rep1sep(ident, ",") <~ ")") ^^ {
        case t ~ n ~ cs => AlterRebucket(t, n.toInt, cs.getOrElse(Nil))
      }

  private def alterDrop: Parser[Stmt] =
    kw("ALTER") ~> kw("TABLE") ~> ident ~
      (kw("DROP") ~> opt(kw("COLUMN")) ~> ident) ^^ {
        case t ~ c => AlterDropColumn(t, c)
      }

  // must try BEFORE alterAdd/alterDrop: "ADD CONSTRAINT uq UNIQUE(...)"
  // would otherwise parse as ADD COLUMN `CONSTRAINT` of type `uq ...`
  private def alterAddConstraint: Parser[Stmt] =
    kw("ALTER") ~> kw("TABLE") ~> ident ~
      (kw("ADD") ~> (kw("CONSTRAINT") | kw("PRIMARY") | kw("UNIQUE") |
        kw("FOREIGN") | kw("CHECK")) ~ restAll) ^^ {
        case t ~ (k ~ rest) => AlterAddConstraint(t, s"$k $rest")
      }

  private def alterDropConstraint: Parser[Stmt] =
    kw("ALTER") ~> kw("TABLE") ~> ident ~
      (kw("DROP") ~> kw("CONSTRAINT") ~> ident) ^^ {
        case t ~ n => AlterDropConstraint(t, n)
      }

  /** A possibly catalog-qualified name (`graft.t`, `t`). */
  private def qualIdent: Parser[String] =
    rep1sep(ident, ".") ^^ (_.mkString("."))

  private def insertInto: Parser[Stmt] = {
    // the column list must be tried WITH its source: `INSERT INTO t
    // (SELECT ...)` has a paren too, and only the source-follows shape
    // disambiguates (rep1sep fails on `SELECT *`, backtracking to the
    // no-list branch, which takes the whole parenthesized source).
    // BY NAME / PARTITION clauses stay with Spark's native INSERT (the
    // guard below fails this grammar so the whole statement delegates —
    // those forms would otherwise error at the source re-parse).
    val colList = "(" ~> rep1sep(ident, ",") <~ ")"
    kw("INSERT") ~> kw("INTO") ~> opt(kw("TABLE")) ~> qualIdent ~
      (not(kw("BY") | kw("PARTITION") | kw("REPLACE")) ~>
        (colList ~ restAll ^^ { case cs ~ src => (cs, src) } |
          restAll ^^ (src => (Seq.empty[String], src)))) ^^ {
        case t ~ ((cols, src)) => InsertInto(t, cols, src)
      }
  }

  private def alterTopkDecay: Parser[Stmt] =
    kw("ALTER") ~> kw("TOPK") ~> ident ~
      (kw("DECAY") ~> kw("OLDER") ~> kw("THAN") ~> quoted) ~
      opt(kw("GENERATIONS") ~> """\d+""".r) ~
      opt(kw("MIN") ~> kw("WIDTH") ~> """\d+""".r) ^^ {
        case n ~ ts ~ gens ~ mw => AlterTopkDecay(n, ts,
          gens.map(_.toInt).getOrElse(1), mw.map(_.toInt).getOrElse(16))
      }

  private def truncateTable: Parser[Stmt] =
    kw("TRUNCATE") ~> kw("TABLE") ~> ident ^^ TruncateTable.apply

  // reference create-diskstore.md oplog-tuning keys: recorded, surfaced
  // in sys.diskstores, behavior-free (we have no oplog format to tune)
  private def diskstoreOpt: Parser[(String, String)] =
    (kw("MAXLOGSIZE") | kw("AUTOCOMPACT") | kw("ALLOWFORCECOMPACTION") |
      kw("COMPACTIONTHRESHOLD") | kw("TIMEINTERVAL") | kw("WRITEBUFFERSIZE") |
      kw("QUEUESIZE")) ~ """[A-Za-z0-9.\-]+""".r ^^ {
      case k ~ v => k.toLowerCase -> v
    }

  private def createDiskstore: Parser[Stmt] =
    kw("CREATE") ~> kw("DISKSTORE") ~>
      opt(kw("IF") ~ kw("NOT") ~ kw("EXISTS")) ~ ident ~ rep(diskstoreOpt) ~
      opt("(" ~> rep1sep(quoted <~ opt("""\d+""".r), ",") <~ ")") ^^ {
        case ine ~ n ~ opts ~ dirs =>
          CreateDiskstore(n, ine.isDefined, opts.toMap, dirs.getOrElse(Nil))
      }

  private def dropDiskstore: Parser[Stmt] =
    kw("DROP") ~> kw("DISKSTORE") ~> opt(kw("IF") ~ kw("EXISTS")) ~ ident ^^ {
      case ie ~ n => DropDiskstore(n, ie.isDefined)
    }

  private def createSynonym: Parser[Stmt] =
    kw("CREATE") ~> kw("SYNONYM") ~> ident ~ (kw("FOR") ~> ident) ^^ {
      case n ~ t => CreateSynonym(n, t)
    }

  private def dropSynonym: Parser[Stmt] =
    kw("DROP") ~> kw("SYNONYM") ~> ident ^^ DropSynonym.apply

  private def setIsolation: Parser[Stmt] =
    kw("SET") ~> opt(kw("CURRENT")) ~> kw("ISOLATION") ~> opt("=") ~> restAll ^^ {
      l => SetIsolation(l.trim)
    } |
    kw("SET") ~> opt(kw("CURRENT")) ~> kw("ISOLATION") ^^ { _ => SetIsolation("RESET") }

  private def publishTable: Parser[Stmt] =
    kw("PUBLISH") ~> kw("TABLE") ~> ident ~ opt(kw("INCREMENTAL")) ~
      opt(kw("TO") ~> quoted) ^^ {
        case t ~ inc ~ root => PublishTable(t, root, inc.isDefined)
      }

  private def attachStmt: Parser[Stmt] =
    kw("ATTACH") ~> kw("TABLE") ~> ident ~ (kw("FROM") ~> quoted) ^^ {
      case n ~ r => AttachTable(n, r)
    } |
    kw("ATTACH") ~> kw("VIEW") ~> ident ~ (kw("FROM") ~> quoted) ~
      opt(kw("EPOCH") ~> "[0-9]+".r) ~ opt(kw("VERIFY")) ^^ {
        case n ~ r ~ e ~ v => AttachView(n, r, e.map(_.toLong), v.isDefined)
      }

  private def createMatView: Parser[Stmt] =
    kw("CREATE") ~> kw("MATERIALIZED") ~> kw("VIEW") ~> ident ~
      opt(kw("OPTIONS") ~> options) ~ (kw("AS") ~> restAll) ^^ {
        case n ~ o ~ sel => CreateMatView(n, sel, o.getOrElse(Map.empty))
      }

  private def dropMatView: Parser[Stmt] =
    kw("DROP") ~> kw("MATERIALIZED") ~> kw("VIEW") ~> ident ^^ DropMatView.apply

  private def refreshMatView: Parser[Stmt] =
    kw("REFRESH") ~> kw("MATERIALIZED") ~> kw("VIEW") ~> ident ^^ RefreshMatView.apply

  private def refreshSample: Parser[Stmt] =
    kw("REFRESH") ~> kw("SAMPLE") ~> opt(kw("TABLE")) ~> ident ^^ RefreshSample.apply

  private def bootstrapCatalog: Parser[Stmt] =
    kw("BOOTSTRAP") ~> kw("CATALOG") ~> opt(kw("FROM") ~> ident) ^^ {
      ds => BootstrapCatalog(ds)
    }

  private def setSchema: Parser[Stmt] =
    kw("SET") ~> opt(kw("CURRENT")) ~> kw("SCHEMA") ~> opt("=") ~> (quoted | ident) ^^ {
      n => SetSchema(n)
    }

  private def createTableLike: Parser[Stmt] =
    kw("CREATE") ~> kw("TABLE") ~> ident ~ (kw("LIKE") ~> ident) ^^ {
      case n ~ s => CreateTableLike(n, s)
    }

  private def streamingCtl: Parser[Stmt] =
    kw("STREAMING") ~> (
      kw("INIT") ~> restAll ^^ (d => StreamingCtl("init", Some(d))) |
      kw("START") ^^^ StreamingCtl("start", None) |
      kw("STOP") ^^^ StreamingCtl("stop", None))

  // GRANT/REVOKE <priv, ...> ON [TABLE] t TO/FROM user[, ...]
  // (reference SnappyDDLParser.grantRevokeExternal:837)
  private def privWord: Parser[String] =
    (kw("SELECT") | kw("INSERT") | kw("UPDATE") | kw("DELETE") |
      kw("ALL")) ^^ (_.toUpperCase)

  // the user-list keyword is bound to the head: GRANT...TO, REVOKE...FROM
  // (accepting the crosswired forms would let a typo mutate grants)
  private def grantRevoke: Parser[Stmt] =
    kw("GRANT") ~> rep1sep(privWord, ",") ~
      (kw("ON") ~> opt(kw("TABLE")) ~> ident) ~
      (kw("TO") ~> rep1sep(ident, ",")) ^^ {
        case privs ~ t ~ users => GrantRevoke(isGrant = true, privs, t, users)
      } |
    kw("REVOKE") ~> rep1sep(privWord, ",") ~
      (kw("ON") ~> opt(kw("TABLE")) ~> ident) ~
      (kw("FROM") ~> rep1sep(ident, ",")) ^^ {
        case privs ~ t ~ users => GrantRevoke(isGrant = false, privs, t, users)
      }

  private def statement: Parser[Stmt] =
    mergeInto | putInto | createPolicy | dropPolicy | createSample | createStream |
      createIndex | dropIndex | optimizeZorder | createFunction | createTableLike |
      createTableUsing | alterTopkDecay | alterRebucket | alterAddConstraint |
      alterDropConstraint |
      alterDrop | alterAdd | truncateTable | createDiskstore | dropDiskstore |
      createSynonym | dropSynonym | setIsolation | setSchema |
      publishTable | attachStmt | bootstrapCatalog |
      createMatView | dropMatView | refreshMatView | refreshSample |
      streamingCtl | grantRevoke | update | delete | insertInto

  /** None = not a graft statement (caller delegates to Spark's parser). */
  def parse(text: String): Option[Stmt] = {
    val cleaned = text.trim.stripSuffix(";").trim
    val r = parseAll(statement, cleaned)
    if (r.successful) Some(r.get) else None
  }
}
