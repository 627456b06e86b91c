package org.apache.spark.sql.graft

import java.net.{URLDecoder, URLEncoder}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Table constraints for row tables — the reference's Derby-heritage
  * CREATE TABLE constraint surface (reference
  * `docs/reference/sql_reference/create-table.md` "Constraint (only for
  * Row Tables)" + "Identity Columns (only for Row Tables)"):
  *
  *   - NOT NULL (column-level, not nameable)
  *   - PRIMARY KEY (column- or table-level; maps onto the store's
  *     `key_columns`, whose per-bucket uniqueness probe already enforces it)
  *   - UNIQUE (column- or table-level; NULL values are not allowed,
  *     matching the reference)
  *   - FOREIGN KEY ... REFERENCES parent(cols) (table-level, plus the
  *     Derby column-level `col type REFERENCES parent(col)` shorthand);
  *     a FK row with ANY null component is considered null and admitted
  *   - CHECK (expr) (column- or table-level; violation only when the
  *     predicate evaluates to FALSE — UNKNOWN passes, per SQL standard)
  *   - GENERATED ALWAYS / BY DEFAULT AS IDENTITY [(START WITH n
  *     [, INCREMENT BY m])] on INTEGER/BIGINT columns
  *
  * Enforcement is DECLARATIVE-DISTRIBUTED, not per-row-driver-side: every
  * write statement pays one aggregate job over its OWN batch for all
  * row-local constraints (NOT NULL + every CHECK fused into a single
  * pass), plus one join per UNIQUE / FOREIGN KEY constraint — the joins
  * are O(batch ⋈ table) equi-joins that Spark plans like any other
  * (broadcast when the batch is small), never a collect. Costs scale with
  * the batch, not the table history.
  */
object Constraints {

  final case class CheckConstraint(name: String, exprSql: String)
  final case class UniqueConstraint(name: String, columns: Seq[String])
  final case class ForeignKey(name: String, columns: Seq[String],
      refTable: String, refColumns: Seq[String])
  /** `nextOrdinal` is the number of values handed out so far: the next
    * generated value is `startWith + nextOrdinal * incrementBy`.
    */
  final case class IdentitySpec(column: String, always: Boolean,
      startWith: Long, incrementBy: Long) {
    val nextOrdinal = new AtomicLong(0L)
  }

  final case class TableConstraints(
      notNull: Seq[String] = Nil,
      checks: Seq[CheckConstraint] = Nil,
      uniques: Seq[UniqueConstraint] = Nil,
      foreignKeys: Seq[ForeignKey] = Nil,
      identity: Option[IdentitySpec] = None,
      primaryKey: Seq[String] = Nil) {
    def isEmpty: Boolean = notNull.isEmpty && checks.isEmpty &&
      uniques.isEmpty && foreignKeys.isEmpty && identity.isEmpty &&
      primaryKey.isEmpty
    /** Everything except the PK (which the store enforces itself). */
    def enforced: Boolean = notNull.nonEmpty || checks.nonEmpty ||
      uniques.nonEmpty || foreignKeys.nonEmpty || identity.nonEmpty
  }

  // ---- registry ----

  private val registry = TrieMap.empty[String, TableConstraints]

  def register(table: String, tc: TableConstraints): Unit =
    if (tc.isEmpty) registry.remove(table.toLowerCase)
    else registry.put(table.toLowerCase, tc)

  def get(table: String): Option[TableConstraints] =
    registry.get(table.toLowerCase)

  def drop(table: String): Unit = registry.remove(table.toLowerCase)

  def all: Seq[(String, TableConstraints)] = registry.toSeq.sortBy(_._1)

  /** Child foreign keys whose parent is `table` (referential restrict
    * checks on parent-side DELETE / key UPDATE / TRUNCATE / DROP).
    */
  def childrenOf(table: String): Seq[(String, ForeignKey)] = {
    val t = table.toLowerCase
    all.flatMap { case (child, tc) =>
      tc.foreignKeys.filter(_.refTable == t).map(child -> _)
    }
  }

  /** Derby RESTRICT on ALTER TABLE DROP COLUMN: refuse while any
    * constraint mentions the column — the table's own NOT NULL / CHECK /
    * UNIQUE / FK / PK / identity, or a child table's foreign key into
    * this parent. (CHECK expressions are matched by word-bounded column
    * occurrence — conservative: a false positive refuses a drop that a
    * full expression analysis might allow, never the reverse.)
    */
  def assertColumnDroppable(table: String, column: String): Unit = {
    val t = table.toLowerCase
    val c = column.toLowerCase
    def bail(what: String): Nothing = throw new IllegalArgumentException(
      s"cannot drop column $c of $t: referenced by $what")
    get(t).foreach { tc =>
      if (tc.primaryKey.contains(c)) bail("the PRIMARY KEY")
      if (tc.notNull.contains(c)) bail("a NOT NULL constraint")
      tc.identity.filter(_.column == c).foreach(_ => bail("the identity column"))
      tc.uniques.find(_.columns.contains(c)).foreach(u =>
        bail(s"UNIQUE constraint ${u.name}"))
      tc.foreignKeys.find(_.columns.contains(c)).foreach(f =>
        bail(s"FOREIGN KEY constraint ${f.name}"))
      val re = ("(?i)(^|[^a-z0-9_])" +
        java.util.regex.Pattern.quote(c) + "($|[^a-z0-9_])").r
      tc.checks.find(ck => re.findFirstIn(ck.exprSql).isDefined).foreach(ck =>
        bail(s"CHECK constraint ${ck.name}"))
    }
    childrenOf(t).find(_._2.refColumns.contains(c)).foreach { case (child, f) =>
      bail(s"foreign key ${f.name} on $child")
    }
  }

  // ---- manifest persistence (checkpoint/restore) ----

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = URLDecoder.decode(s, "UTF-8")

  def encode(tc: TableConstraints): String = {
    val parts = Seq.newBuilder[String]
    tc.notNull.foreach(c => parts += s"nn|${enc(c)}")
    tc.checks.foreach(c => parts += s"ck|${enc(c.name)}|${enc(c.exprSql)}")
    tc.uniques.foreach(u =>
      parts += s"uq|${enc(u.name)}|${enc(u.columns.mkString(","))}")
    tc.foreignKeys.foreach(f => parts += s"fk|${enc(f.name)}|" +
      s"${enc(f.columns.mkString(","))}|${enc(f.refTable)}|" +
      enc(f.refColumns.mkString(",")))
    tc.identity.foreach(i => parts += s"id|${enc(i.column)}|${i.always}|" +
      s"${i.startWith}|${i.incrementBy}|${i.nextOrdinal.get}")
    tc.primaryKey.foreach(c => parts += s"pk|${enc(c)}")
    parts.result().mkString(";")
  }

  def decodeConstraints(s: String): TableConstraints = {
    var tc = TableConstraints()
    s.split(";").filter(_.nonEmpty).foreach { rec =>
      rec.split("\\|", -1).toSeq match {
        case Seq("nn", c) => tc = tc.copy(notNull = tc.notNull :+ dec(c))
        case Seq("ck", n, e) =>
          tc = tc.copy(checks = tc.checks :+ CheckConstraint(dec(n), dec(e)))
        case Seq("uq", n, cs) => tc = tc.copy(uniques = tc.uniques :+
          UniqueConstraint(dec(n), dec(cs).split(",").toSeq))
        case Seq("fk", n, cs, rt, rcs) => tc = tc.copy(foreignKeys =
          tc.foreignKeys :+ ForeignKey(dec(n), dec(cs).split(",").toSeq,
            dec(rt), dec(rcs).split(",").toSeq))
        case Seq("id", c, a, st, inc, next) =>
          val spec = IdentitySpec(dec(c), a.toBoolean, st.toLong, inc.toLong)
          spec.nextOrdinal.set(next.toLong)
          tc = tc.copy(identity = Some(spec))
        case Seq("pk", c) => tc = tc.copy(primaryKey = tc.primaryKey :+ dec(c))
        case other => throw new IllegalArgumentException(
          s"corrupt constraint record: ${other.mkString("|")}")
      }
    }
    tc
  }

  private var anonCounter = new AtomicLong(0L)
  private def anonName(kind: String): String =
    s"${kind}_${anonCounter.incrementAndGet()}"

  // ---- DDL extraction ----

  /** Split a CREATE TABLE schema chunk into (clean column DDL Spark's
    * `parseTableSchema` accepts, extracted constraints). The reference
    * accepts constraint clauses interleaved with column definitions;
    * Spark's schema grammar knows none of them, so they are stripped here
    * and enforced by [[ConstraintEnforcer]].
    */
  def extract(schemaChunk: String): (String, TableConstraints) = {
    var tc = TableConstraints()
    val cleaned = Seq.newBuilder[String]
    splitTopLevel(schemaChunk).foreach { el =>
      val t = el.trim
      val up = t.toUpperCase
      if (up.startsWith("CONSTRAINT ") || up.startsWith("PRIMARY ") ||
          up.startsWith("UNIQUE") || up.startsWith("FOREIGN ") ||
          up.startsWith("CHECK")) {
        tc = mergeTable(tc, parseTableConstraint(t))
      } else {
        val (clean, colTc) = parseColumnDef(t)
        cleaned += clean
        tc = mergeTable(tc, colTc)
      }
    }
    (cleaned.result().mkString(", "), tc)
  }

  /** Merge two constraint sets (CREATE TABLE accumulation and ALTER
    * TABLE ADD CONSTRAINT); at most one PRIMARY KEY and one identity.
    */
  def mergeTable(a: TableConstraints, b: TableConstraints): TableConstraints = {
    require(a.primaryKey.isEmpty || b.primaryKey.isEmpty,
      "multiple PRIMARY KEY constraints")
    require(a.identity.isEmpty || b.identity.isEmpty,
      "multiple identity columns (only one GENERATED ... AS IDENTITY column is allowed)")
    TableConstraints(a.notNull ++ b.notNull, a.checks ++ b.checks,
      a.uniques ++ b.uniques, a.foreignKeys ++ b.foreignKeys,
      a.identity.orElse(b.identity), a.primaryKey ++ b.primaryKey)
  }

  /** Top-level comma split — paren-, quote- AND angle-bracket-aware:
    * `struct<a:int, b:string>` / `map<string,int>` carry commas inside
    * `<...>` type parameters, which are one column def, not two. A `<`
    * counts as a type-parameter bracket only at PAREN DEPTH 0 (type
    * syntax never appears inside parens in this grammar, while
    * comparison operators only appear inside them — `CHECK(a<5)`) and
    * only when it directly follows a TYPE-CONSTRUCTOR keyword
    * (`array<`, `map<`, `struct<`, `interval<`) — a bare comparison in
    * a future default/generated-expression grammar (`b int default
    * a<b`) can then never unbalance the count and swallow the next
    * column def.
    */
  private def typeConstructorEndsAt(s: String, i: Int): Boolean = {
    // scan back over the identifier ending at i-1, compare the word
    var j = i
    while (j > 0 && (Character.isLetterOrDigit(s.charAt(j - 1)) ||
      s.charAt(j - 1) == '_')) j -= 1
    val word = s.substring(j, i).toLowerCase(java.util.Locale.ROOT)
    word == "array" || word == "map" || word == "struct" || word == "interval"
  }

  /** exposed for direct spec coverage of the bracket heuristics */
  def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var angle = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '<' if depth == 0 && angle == 0 && typeConstructorEndsAt(s, i) =>
          angle += 1
        case '<' if depth == 0 && angle > 0 => angle += 1
        case '>' if depth == 0 && angle > 0 => angle -= 1
        case q @ ('\'' | '"' | '`') =>
          i += 1
          while (i < s.length && s.charAt(i) != q) i += 1
        case ',' if depth == 0 && angle == 0 =>
          out += s.substring(start, i)
          start = i + 1
        case _ =>
      }
      i += 1
    }
    if (start < s.length) out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Index of a word-bounded keyword at paren depth 0 outside quotes,
    * or -1.
    */
  private def findKw(s: String, kw: String, from: Int = 0): Int = {
    var depth = 0
    var i = from
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case q @ ('\'' | '"' | '`') =>
          i += 1
          while (i < s.length && s.charAt(i) != q) i += 1
          i += 1
        case _ =>
          if (depth == 0 && i + kw.length <= s.length &&
              s.regionMatches(true, i, kw, 0, kw.length) &&
              (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)) &&
                s.charAt(i - 1) != '_') &&
              (i + kw.length == s.length ||
                !Character.isLetterOrDigit(s.charAt(i + kw.length)) &&
                  s.charAt(i + kw.length) != '_')) return i
          i += 1
      }
    }
    -1
  }

  /** (inner text, index just past the close paren) of the paren group
    * opening at or after `from`.
    */
  private def parenAt(s: String, from: Int): (String, Int) = {
    val open = s.indexOf('(', from)
    require(open >= 0, s"expected ( in: $s")
    var depth = 1
    var i = open + 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case q @ ('\'' | '"' | '`') =>
          i += 1
          while (i < s.length && s.charAt(i) != q) i += 1
        case _ =>
      }
      i += 1
    }
    require(depth == 0, s"unbalanced parentheses in: $s")
    (s.substring(open + 1, i - 1).trim, i)
  }

  private def idents(s: String): Seq[String] =
    splitTopLevel(s).map(_.trim.stripPrefix("`").stripSuffix("`").toLowerCase)

  private val identRe = """^\s*(`[^`]+`|"[^"]+"|[A-Za-z_][A-Za-z0-9_]*)""".r

  private def leadIdent(s: String): (String, String) = identRe.findFirstMatchIn(s) match {
    case Some(m) =>
      val raw = m.group(1)
      val name = raw.stripPrefix("`").stripSuffix("`")
        .stripPrefix("\"").stripSuffix("\"")
      (name, s.substring(m.end))
    case None => throw new IllegalArgumentException(s"expected identifier in: $s")
  }

  /** Parse one table-level constraint clause (`[CONSTRAINT name]
    * PRIMARY KEY (...) | UNIQUE (...) | FOREIGN KEY (...) REFERENCES
    * p (...) | CHECK (expr)`) — the ALTER TABLE ADD CONSTRAINT surface
    * (the reference routes these to its store's Derby DDL,
    * SnappyDDLParser.alterTable:697).
    */
  def parseConstraintClause(clause: String): TableConstraints =
    parseTableConstraint(clause.trim)

  private def parseTableConstraint(el: String): TableConstraints = {
    var rest = el.trim
    var name: Option[String] = None
    if (rest.toUpperCase.startsWith("CONSTRAINT ")) {
      val (n, r) = leadIdent(rest.substring("CONSTRAINT ".length))
      name = Some(n.toLowerCase)
      rest = r.trim
    }
    val up = rest.toUpperCase
    if (up.startsWith("PRIMARY")) {
      val (cols, _) = parenAt(rest, 0)
      TableConstraints(primaryKey = idents(cols))
    } else if (up.startsWith("UNIQUE")) {
      val (cols, _) = parenAt(rest, 0)
      TableConstraints(uniques = Seq(
        UniqueConstraint(name.getOrElse(anonName("uq")), idents(cols))))
    } else if (up.startsWith("FOREIGN")) {
      val (cols, after) = parenAt(rest, 0)
      val refIdx = findKw(rest, "REFERENCES", after)
      require(refIdx >= 0, s"FOREIGN KEY without REFERENCES: $el")
      val (refTable, tail) = leadIdent(rest.substring(refIdx + "REFERENCES".length))
      val (refCols, _) = parenAt(tail, 0)
      TableConstraints(foreignKeys = Seq(ForeignKey(
        name.getOrElse(anonName("fk")), idents(cols),
        refTable.toLowerCase, idents(refCols))))
    } else if (up.startsWith("CHECK")) {
      val (expr, _) = parenAt(rest, 0)
      TableConstraints(checks = Seq(
        CheckConstraint(name.getOrElse(anonName("ck")), expr)))
    } else throw new IllegalArgumentException(s"unsupported table constraint: $el")
  }

  /** Parse one column definition element: returns the cleaned DDL
    * (`name type [COMMENT '...']`) and any column-level constraints.
    */
  private def parseColumnDef(el: String): (String, TableConstraints) = {
    val (colName, afterName) = leadIdent(el)
    val c = colName.toLowerCase
    var tc = TableConstraints()
    var comment = ""
    // the type text ends where the first constraint keyword begins
    val stops = Seq("NOT", "NULL", "PRIMARY", "UNIQUE", "CHECK", "GENERATED",
      "REFERENCES", "COMMENT", "CONSTRAINT")
    val stopIdxs = stops.map(k => findKw(afterName, k)).filter(_ >= 0)
    val typeEnd = if (stopIdxs.isEmpty) afterName.length else stopIdxs.min
    val typeText = afterName.substring(0, typeEnd).trim
    require(typeText.nonEmpty, s"column $colName has no type in: $el")
    var rest = afterName.substring(typeEnd).trim
    var conName: Option[String] = None
    while (rest.nonEmpty) {
      val up = rest.toUpperCase
      if (up.startsWith("CONSTRAINT")) {
        val (n, r) = leadIdent(rest.substring("CONSTRAINT".length))
        conName = Some(n.toLowerCase)
        rest = r.trim
      } else if (up.startsWith("NOT")) {
        val afterNot = rest.substring(3).trim
        require(afterNot.toUpperCase.startsWith("NULL"),
          s"expected NULL after NOT in: $el")
        tc = tc.copy(notNull = tc.notNull :+ c)
        rest = afterNot.substring(4).trim
      } else if (up.startsWith("NULL")) { // Derby-style explicit NULL
        rest = rest.substring(4).trim
      } else if (up.startsWith("PRIMARY")) {
        val afterPk = rest.substring(7).trim
        require(afterPk.toUpperCase.startsWith("KEY"),
          s"expected KEY after PRIMARY in: $el")
        tc = tc.copy(primaryKey = Seq(c))
        rest = afterPk.substring(3).trim
        conName = None
      } else if (up.startsWith("UNIQUE")) {
        tc = tc.copy(uniques = tc.uniques :+
          UniqueConstraint(conName.getOrElse(anonName("uq")), Seq(c)))
        rest = rest.substring(6).trim
        conName = None
      } else if (up.startsWith("CHECK")) {
        val (expr, end) = parenAt(rest, 0)
        tc = tc.copy(checks = tc.checks :+
          CheckConstraint(conName.getOrElse(anonName("ck")), expr))
        rest = rest.substring(end).trim
        conName = None
      } else if (up.startsWith("REFERENCES")) {
        val (refTable, tail) = leadIdent(rest.substring("REFERENCES".length))
        val (refCols, end) = parenAt(tail, 0)
        tc = tc.copy(foreignKeys = tc.foreignKeys :+ ForeignKey(
          conName.getOrElse(anonName("fk")), Seq(c),
          refTable.toLowerCase, idents(refCols)))
        rest = tail.substring(end).trim
        conName = None
      } else if (up.startsWith("GENERATED")) {
        var r = rest.substring("GENERATED".length).trim
        val always =
          if (r.toUpperCase.startsWith("ALWAYS")) { r = r.substring(6).trim; true }
          else if (r.toUpperCase.startsWith("BY")) {
            r = r.substring(2).trim
            require(r.toUpperCase.startsWith("DEFAULT"),
              s"expected DEFAULT after BY in: $el")
            r = r.substring(7).trim
            false
          } else throw new IllegalArgumentException(
            s"expected ALWAYS or BY DEFAULT after GENERATED in: $el")
        require(r.toUpperCase.startsWith("AS"), s"expected AS IDENTITY in: $el")
        r = r.substring(2).trim
        require(r.toUpperCase.startsWith("IDENTITY"),
          s"expected IDENTITY in: $el")
        r = r.substring(8).trim
        var start = 1L
        var incr = 1L
        if (r.startsWith("(")) {
          val (inner, end) = parenAt(r, 0)
          // reference: START WITH / INCREMENT BY only for BY DEFAULT
          require(!always || inner.isEmpty,
            "START WITH / INCREMENT BY are supported only for GENERATED BY " +
              "DEFAULT identity columns (create-table.md)")
          val swIdx = findKw(inner, "START")
          if (swIdx >= 0) {
            val afterWith = inner.substring(findKw(inner, "WITH", swIdx) + 4)
            start = """-?\d+""".r.findFirstIn(afterWith).map(_.toLong)
              .getOrElse(throw new IllegalArgumentException(
                s"expected integer after START WITH in: $el"))
          }
          val incIdx = findKw(inner, "INCREMENT")
          if (incIdx >= 0) {
            val afterBy = inner.substring(findKw(inner, "BY", incIdx) + 2)
            incr = """-?\d+""".r.findFirstIn(afterBy).map(_.toLong)
              .getOrElse(throw new IllegalArgumentException(
                s"expected integer after INCREMENT BY in: $el"))
            require(incr != 0, s"INCREMENT BY 0 in: $el")
          }
          r = r.substring(end).trim
        }
        tc = tc.copy(identity = Some(IdentitySpec(c, always, start, incr)))
        rest = r
      } else if (up.startsWith("COMMENT")) {
        val r = rest.substring("COMMENT".length).trim
        require(r.startsWith("'"), s"expected quoted COMMENT in: $el")
        val close = r.indexOf('\'', 1)
        require(close > 0, s"unterminated COMMENT in: $el")
        comment = s" COMMENT ${r.substring(0, close + 1)}"
        rest = r.substring(close + 1).trim
      } else throw new IllegalArgumentException(
        s"unsupported column constraint at '$rest' in: $el")
    }
    require(conName.isEmpty, s"dangling CONSTRAINT name in: $el")
    (s"`$colName` $typeText$comment", tc)
  }

  /** Validate the shape of the constraints against the final schema +
    * layout (cheap, at CREATE): columns exist, identity type is
    * INTEGER/BIGINT, FK targets exist and reference the parent's PRIMARY
    * KEY or a UNIQUE constraint, PK columns are NOT NULL (implicitly
    * promoted, like the reference).
    */
  def validateShape(table: String, schema: StructType, tc: TableConstraints,
      parentKeys: String => Seq[Seq[String]]): TableConstraints = {
    val cols = schema.fieldNames.map(_.toLowerCase).toSet
    def known(c: String, ctx: String): Unit = require(cols.contains(c),
      s"constraint on $table: unknown column '$c' ($ctx)")
    tc.notNull.foreach(known(_, "NOT NULL"))
    tc.primaryKey.foreach(known(_, "PRIMARY KEY"))
    tc.uniques.foreach(u => u.columns.foreach(known(_, u.name)))
    tc.foreignKeys.foreach { f =>
      f.columns.foreach(known(_, f.name))
      val pks = parentKeys(f.refTable)
      require(pks.exists(k => k.map(_.toLowerCase) == f.refColumns),
        s"foreign key ${f.name} on $table: ${f.refTable}(${f.refColumns.mkString(",")}) " +
          "is not the parent's PRIMARY KEY or a UNIQUE constraint")
    }
    tc.identity.foreach { i =>
      known(i.column, "IDENTITY")
      val dt = schema.fields(schema.fieldNames.map(_.toLowerCase)
        .indexOf(i.column)).dataType
      require(dt == IntegerType || dt == LongType,
        s"identity column ${i.column} on $table must be INTEGER or BIGINT " +
          s"(create-table.md), got ${dt.simpleString}")
    }
    // reference: "The identified columns must be defined as NOT NULL" —
    // PK columns are implicitly NOT NULL
    tc.copy(notNull = (tc.notNull ++ tc.primaryKey).distinct)
  }
}

/** Distributed enforcement of [[Constraints.TableConstraints]] at the
  * session's mutation choke points. Each validation is a Spark job over
  * the STATEMENT'S rows (never a collect): one fused aggregate for all
  * row-local rules, one equi-join per UNIQUE / FOREIGN KEY rule.
  */
object ConstraintEnforcer {
  import Constraints._

  /** One aggregate pass over the incoming batch: every NOT NULL and every
    * CHECK evaluates in the same job. CHECK passes on UNKNOWN (null),
    * fails only on FALSE — the SQL-standard semantics the reference's
    * Derby heritage uses.
    */
  def validateRows(table: String, rows: DataFrame, tc: TableConstraints): Unit = {
    val aggs = Seq.newBuilder[Column]
    val labels = Seq.newBuilder[String]
    tc.notNull.filter(c => rows.columns.exists(_.equalsIgnoreCase(c))).foreach { c =>
      aggs += sum(when(col(c).isNull, 1L).otherwise(0L))
      labels += s"NOT NULL constraint on column '$c'"
    }
    tc.checks.foreach { ck =>
      aggs += sum(when(expr(ck.exprSql) === lit(false), 1L).otherwise(0L))
      labels += s"CHECK constraint ${ck.name} (${ck.exprSql})"
    }
    val a = aggs.result()
    if (a.isEmpty) return
    val counts = rows.agg(a.head, a.tail: _*).head()
    labels.result().zipWithIndex.foreach { case (label, i) =>
      val n = if (counts.isNullAt(i)) 0L else counts.getLong(i)
      if (n > 0) throw new IllegalArgumentException(
        s"$table: ${label} violated by $n row(s)")
    }
  }

  /** UNIQUE checks for an incoming batch: null components are rejected
    * (reference: "NULL values are not allowed"), intra-batch duplicates
    * are found by one aggregate per constraint, and collisions with the
    * CURRENT table by one semi-join per constraint. For PUT INTO,
    * `replacedKeys` carries (pk columns, source frame): target rows whose
    * PK matches the source are being replaced, so they are excluded from
    * the collision check (a row may be re-put with its own unique value).
    */
  def validateUniques(table: String, incoming: DataFrame, existing: DataFrame,
      tc: TableConstraints, replacedKeys: Option[(Seq[String], DataFrame)]): Unit =
    tc.uniques.foreach { u =>
      val cols = u.columns.map(col)
      val withNull = incoming.filter(cols.map(_.isNull).reduce(_ || _))
      if (!withNull.isEmpty) throw new IllegalArgumentException(
        s"$table: UNIQUE constraint ${u.name} (${u.columns.mkString(",")}): " +
          "NULL values are not allowed")
      val dups = incoming.groupBy(cols: _*).count().filter(col("count") > 1)
      if (!dups.isEmpty) throw new IllegalArgumentException(
        s"$table: UNIQUE constraint ${u.name}: duplicate values within the statement")
      val survivors = replacedKeys match {
        case Some((pk, src)) =>
          existing.join(src.select(pk.map(col): _*).distinct(), pk, "left_anti")
        case None => existing
      }
      val clash = incoming.select(u.columns.map(col): _*)
        .join(survivors.select(u.columns.map(col): _*), u.columns, "left_semi")
      if (!clash.isEmpty) throw new IllegalArgumentException(
        s"$table: UNIQUE constraint ${u.name}: value already exists")
    }

  /** Child-side FK check: every incoming FK tuple with NO null component
    * must exist in the parent's referenced columns — one left-anti join
    * per constraint. Rows with any null component are admitted no matter
    * what is in the non-null columns (create-table.md).
    */
  def validateForeignKeys(table: String, incoming: DataFrame,
      tc: TableConstraints, parent: String => DataFrame): Unit =
    tc.foreignKeys.foreach { f =>
      val complete = incoming.filter(f.columns.map(col(_).isNotNull).reduce(_ && _))
      val parentKeys = parent(f.refTable).select(
        f.refColumns.zip(f.columns).map { case (rc, c) => col(rc).as(c) }: _*)
      val orphans = complete.select(f.columns.map(col): _*)
        .join(parentKeys, f.columns, "left_anti")
      if (!orphans.isEmpty) throw new IllegalArgumentException(
        s"$table: FOREIGN KEY constraint ${f.name}: value not present in " +
          s"${f.refTable}(${f.refColumns.mkString(",")})")
    }

  /** Parent-side restrict (Derby RESTRICT): none of the referenced-key
    * values VANISHING from the parent (by DELETE, key UPDATE, or PUT
    * replacement) may still be referenced by a child row. `vanished`
    * produces, for a given referenced-column list, the frame of values
    * present before the statement but on no row afterwards — one
    * semi-join per referencing child FK.
    */
  def validateParentRemoval(table: String, vanished: Seq[String] => DataFrame,
      child: String => DataFrame,
      relevant: ForeignKey => Boolean = _ => true): Unit =
    Constraints.childrenOf(table).filter(p => relevant(p._2))
      .foreach { case (childTable, f) =>
        val childRefs = child(childTable)
          .filter(f.columns.map(col(_).isNotNull).reduce(_ && _))
          .select(f.columns.zip(f.refColumns).map { case (c, rc) => col(c).as(rc) }: _*)
        val stillRefd = vanished(f.refColumns)
          .join(childRefs, f.refColumns, "left_semi")
        if (!stillRefd.isEmpty) throw new IllegalArgumentException(
          s"$table: cannot delete or alter keys referenced by foreign key " +
            s"${f.name} on $childTable")
      }

  /** Fill the identity column of an incoming batch. GENERATED ALWAYS
    * rejects user-supplied values (reference: "You cannot insert a value
    * directly") — callers pass omitted values as NULL. Value assignment is
    * the classic two-pass distributed sequence: reserve a block of
    * `count(toFill)` ordinals from the table's counter, then
    * `zipWithIndex` (per-partition offsets, no single-partition shuffle)
    * hands each row `startWith + ordinal * incrementBy`.
    */
  def fillIdentity(spark: SparkSession, table: String, rows: DataFrame,
      id: IdentitySpec): DataFrame = {
    val c = rows.columns.find(_.equalsIgnoreCase(id.column)).getOrElse(
      throw new IllegalArgumentException(
        s"$table: identity column ${id.column} missing from input"))
    val idx = rows.columns.indexOf(c)
    val isInt = rows.schema(idx).dataType == IntegerType
    val supplied = rows.filter(col(c).isNotNull)
    if (id.always && !supplied.isEmpty) throw new IllegalArgumentException(
      s"$table: cannot insert into GENERATED ALWAYS identity column ${id.column} " +
        "(omit the column or pass NULL)")
    val toFill = rows.filter(col(c).isNull)
    val n = toFill.count()
    if (n == 0) return rows
    val base = id.nextOrdinal.getAndAdd(n)
    val start = id.startWith
    val incr = id.incrementBy
    val schema = rows.schema
    val filled = spark.createDataFrame(
      toFill.rdd.zipWithIndex().map { case (r, i) =>
        val v = start + (base + i) * incr
        require(!isInt || (v >= Int.MinValue && v <= Int.MaxValue),
          s"identity value $v overflows INTEGER")
        Row.fromSeq(r.toSeq.updated(idx, if (isInt) v.toInt else v))
      }, schema)
    if (supplied.isEmpty) filled else supplied.unionByName(filled)
  }
}
