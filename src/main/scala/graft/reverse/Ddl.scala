package graft.reverse

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.functions.Escape

/** DDL synthesis — the reference's reverse-mode output
  * (`module/reverse/oracle/o2m/rule.go:46-230` GenCreateTableDDL,
  * writer `module/reverse/write.go:41-120`, format exemplar
  * `example/reverse_marvin.sql`).
  *
  * Text assembly is pure Scala over bounded catalog structures; only
  * the per-column *type decisions* involve the rule engine
  * ([[RuleSet]]/[[TypeMapper]]). Incompatible index forms (bitmap,
  * function-based) are diverted to a compatibility bucket instead of
  * failing the table, mirroring `rule.go:107-154`.
  */
object Ddl {

  /** Key/index shapes the target can and cannot express directly. */
  final case class IndexDef(name: String, columns: Seq[String],
      unique: Boolean = false, kind: String = "NORMAL")

  final case class ForeignKeyDef(name: String, columns: Seq[String],
      refTable: String, refColumns: Seq[String])

  /** Source-table structure, catalog-shaped (the reference prefetches
    * the same per table in `module/reverse/oracle/o2m/table.go:61-212`).
    */
  final case class TableDef(
      schema: String,
      name: String,
      columns: Seq[OracleColumn],
      primaryKey: Seq[String] = Seq.empty,
      uniques: Seq[IndexDef] = Seq.empty,
      indexes: Seq[IndexDef] = Seq.empty,
      foreignKeys: Seq[ForeignKeyDef] = Seq.empty,
      checks: Seq[String] = Seq.empty,
      comment: Option[String] = None)

  /** Identifier case folding (F11, `config.go:147` +
    * `rule.go:216-224`): "lower" | "upper" | "origin".
    */
  def foldCase(ident: String, mode: String): String = mode.toLowerCase match {
    case "lower" => ident.toLowerCase
    case "upper" => ident.toUpperCase
    case _ => ident
  }

  /** One column DDL line, format per `example/reverse_marvin.sql`:
    * {{{`name` type [NOT NULL] [DEFAULT v] [COMMENT 'c']}}}
    * Types render lowercase (golden-file convention); nullable columns
    * carry no NULL keyword.
    */
  def columnLine(c: OracleColumn, targetType: String,
      caseMode: String = "origin"): String = {
    val parts = Seq(
      s"`${foldCase(c.name, caseMode)}`",
      targetType.toLowerCase) ++
      (if (!c.nullable) Seq("NOT NULL") else Nil) ++
      c.dataDefault.map(_ => s"DEFAULT ${TypeMapper.mapDefault(c.dataDefault)}")
        .toSeq ++
      c.comment.filter(_.nonEmpty)
        .map(cm => s"COMMENT '${Escape.sqlLiteral(cm)}'").toSeq
    parts.mkString(" ")
  }

  /** Table-name rename rules (the reference's `name_rule_table`,
    * `database/meta/name_rule_table.go`, loaded in
    * `module/reverse/oracle/public/change.go:45-98`): source table →
    * target table, case-insensitive lookup, identity when absent.
    */
  def applyNameRule(table: String, renames: Map[String, String]): String =
    // sorted-key scan: with several case-variant keys matching, the
    // winner must not depend on Map iteration order
    renames.toSeq.sortBy(_._1).collectFirst {
      case (src, tgt) if src.equalsIgnoreCase(table) => tgt
    }.getOrElse(table)

  /** Full CREATE TABLE with PRIMARY KEY / UNIQUE KEY / KEY inline,
    * plus trailing compatible statements (FKs as ALTERs) and a
    * compatibility bucket for index forms MySQL can't express
    * (function-based, bitmap — `rule.go:107-154`).
    *
    * Returns (createSql, alterStatements, compatibilityNotes).
    */
  def genCreateTable(t: TableDef, targetSchema: String,
      rules: RuleSet = RuleSet(), caseMode: String = "origin",
      nameRules: Map[String, String] = Map.empty)
      : (String, Seq[String], Seq[String]) = {
    val colLines = t.columns.map { c =>
      columnLine(c, rules.resolve(t.schema, t.name, c), caseMode)
    }
    val pkLine =
      if (t.primaryKey.nonEmpty)
        Seq(s"PRIMARY KEY (${t.primaryKey.map(foldCase(_, caseMode)).mkString(",")})")
      else Nil
    val (okUniques, badUniques) = t.uniques.partition(_.kind == "NORMAL")
    val uqLines = okUniques.map(u =>
      s"UNIQUE KEY `${u.name}` (${u.columns.map(foldCase(_, caseMode)).mkString(",")})")
    val (okIndexes, badIndexes) = t.indexes.partition(_.kind == "NORMAL")
    val keyLines = okIndexes.map(ix =>
      s"KEY `${ix.name}` (${ix.columns.map(foldCase(_, caseMode)).mkString(",")})")
    val ckLines = t.checks.map(ck => s"CHECK ($ck)")
    val body = (colLines ++ pkLine ++ uqLines ++ keyLines ++ ckLines)
      .mkString(",\n")
    val comment = t.comment.filter(_.nonEmpty)
      .map(c => s" COMMENT='${Escape.sqlLiteral(c)}'").getOrElse("")
    val tgtName = applyNameRule(t.name, nameRules)
    val create =
      s"""CREATE TABLE `${foldCase(targetSchema, caseMode)}`.`${foldCase(tgtName, caseMode)}` (
         |$body
         |) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_bin$comment;""".stripMargin
    val alters = t.foreignKeys.map { fk =>
      s"ALTER TABLE `${foldCase(targetSchema, caseMode)}`.`${foldCase(tgtName, caseMode)}` " +
        s"ADD CONSTRAINT `${fk.name}` FOREIGN KEY (${fk.columns.mkString(",")}) " +
        s"REFERENCES `${foldCase(targetSchema, caseMode)}`.`${applyNameRule(fk.refTable, nameRules)}` (${fk.refColumns.mkString(",")});"
    }
    val compat = (badUniques ++ badIndexes).map(ix =>
      s"-- incompatible index [${ix.kind}] ${ix.name} ON ${t.name}(${ix.columns.mkString(",")}): create manually")
    (create, alters, compat)
  }

  /** S9 — DDL/report file sink (`module/reverse/write.go:41-120`):
    * bounded driver-side artifact append; the diff/catalog rows that
    * feed it stay distributed until the final collect of an
    * already-small result.
    */
  def writeArtifact(path: String, statements: Seq[String]): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, statements.mkString("\n\n") + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}
