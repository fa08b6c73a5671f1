package graft.reverse

import org.apache.spark.sql.types._

/** Oracle→MySQL/Spark type system — the reference's reverse-engine
  * core (transferdb `module/reverse/oracle/public/mapping_mysql.go:
  * 83-560`, built-in map `common/buildin.go:130-203`).
  *
  * Pure Scala, no Spark dependency except the DataType target: schema
  * mapping is driver-side planning over a bounded catalog (a few
  * thousand columns), exactly as the reference computes it before any
  * data moves. The per-100TB story lives downstream: [[sparkType]]
  * pins the ingestion schema that the distributed readers then
  * enforce.
  */

/** One column as introspected from the source catalog — the attribute
  * set of `dba_tab_columns` joined with comments (transferdb
  * `database/oracle/reverse.go:516-656`).
  *
  * @param charUsed   "C" = char-length semantics (NCHAR and explicit
  *                   CHAR units), "B" = byte semantics — decides which
  *                   length feeds VARCHAR(n) (`mapping_mysql.go:180-190`)
  */
final case class OracleColumn(
    name: String,
    dataType: String,
    dataLength: Int = 0,
    dataPrecision: Option[Int] = None,
    dataScale: Option[Int] = None,
    charLength: Option[Int] = None,
    charUsed: String = "B",
    nullable: Boolean = true,
    dataDefault: Option[String] = None,
    comment: Option[String] = None) {
  def upperType: String = dataType.trim.toUpperCase
}

object TypeMapper {

  /** NUMBER declaration normalization (transferdb
    * `module/reverse/oracle/public/rule_load.go:141-152` comment):
    *   number / number(*)   -> (38, 127)
    *   number(*, s)         -> (38, s)
    *   number(p)            -> (p, 0)
    * Negative scale (Oracle allows s<0) is clamped to 0 — the
    * reference's switch silently falls through for s<0 (latent bug);
    * we document the divergence instead of copying it.
    */
  def normalizeNumber(p: Option[Int], s: Option[Int]): (Int, Int) = p match {
    case Some(pp) => (pp, math.max(s.getOrElse(0), 0))
    case None => (38, math.max(s.getOrElse(127), 0))
  }

  /** Canonical origin type string, e.g. `NUMBER(11,0)`, `VARCHAR2(50)`
    * — the key custom rules match on (`rule_load.go:98-258`).
    */
  def originType(c: OracleColumn): String = c.upperType match {
    case "NUMBER" =>
      val (p, s) = normalizeNumber(c.dataPrecision, c.dataScale)
      s"NUMBER($p,$s)"
    case t @ ("CHAR" | "CHARACTER" | "NCHAR" | "NCHAR VARYING" |
        "NVARCHAR2" | "VARCHAR" | "VARCHAR2") =>
      s"$t(${charDeclLength(c)})"
    case t @ ("DECIMAL" | "DEC" | "NUMERIC") =>
      s"$t(${c.dataPrecision.getOrElse(38)},${c.dataScale.getOrElse(0)})"
    case t @ ("RAW" | "UROWID") => s"$t(${c.dataLength})"
    case t => t
  }

  private def charDeclLength(c: OracleColumn): Int =
    if (c.charUsed.equalsIgnoreCase("C")) c.charLength.getOrElse(c.dataLength)
    else c.dataLength

  /** The built-in O2M target type (`mapping_mysql.go:83-560`). The
    * NUMBER precision/scale decision tree verbatim:
    *   s>0: p=38,s>30 -> DECIMAL(65,30); p=38 -> DECIMAL(65,s);
    *        s<=30 -> DECIMAL(p,s); else DECIMAL(p,30)
    *   s=0: p∈[1,3) TINYINT; [3,5) SMALLINT; [5,9) INT; [9,19) BIGINT;
    *        [19,38] DECIMAL(p); else DECIMAL(65,0)
    */
  def mysqlType(c: OracleColumn): String = {
    val t = c.upperType
    t match {
      case "NUMBER" =>
        val (p, s) = normalizeNumber(c.dataPrecision, c.dataScale)
        if (s > 0) {
          if (p == 38 && s > 30) "DECIMAL(65,30)"
          else if (p == 38) s"DECIMAL(65,$s)"
          else if (s <= 30) s"DECIMAL($p,$s)"
          else s"DECIMAL($p,30)"
        } else {
          if (p >= 1 && p < 3) "TINYINT"
          else if (p >= 3 && p < 5) "SMALLINT"
          else if (p >= 5 && p < 9) "INT"
          else if (p >= 9 && p < 19) "BIGINT"
          else if (p >= 19 && p <= 38) s"DECIMAL($p)"
          else "DECIMAL(65,0)"
        }
      case "BFILE" => "VARCHAR(255)"
      case "CHAR" | "CHARACTER" | "NCHAR" | "NVARCHAR2" | "VARCHAR" |
          "VARCHAR2" => s"VARCHAR(${charDeclLength(c)})"
      case "NCHAR VARYING" => s"NCHAR VARYING(${charDeclLength(c)})"
      case "CLOB" | "LONG" | "XMLTYPE" => "LONGTEXT"
      case "NCLOB" => "TEXT"
      case "BLOB" => "BLOB"
      case "LONG RAW" => "LONGBLOB"
      case "RAW" => s"VARBINARY(${c.dataLength})"
      case "DATE" => "DATETIME"
      case "DECIMAL" | "DEC" =>
        s"DECIMAL(${c.dataPrecision.getOrElse(38)},${c.dataScale.getOrElse(0)})"
      case "NUMERIC" =>
        s"NUMERIC(${c.dataPrecision.getOrElse(38)},${c.dataScale.getOrElse(0)})"
      case "DOUBLE PRECISION" => "DOUBLE PRECISION"
      case "FLOAT" | "BINARY_FLOAT" | "BINARY_DOUBLE" | "REAL" => "DOUBLE"
      case "INTEGER" | "INT" => "INT"
      case "SMALLINT" => "SMALLINT"
      case "ROWID" => "VARCHAR(64)"
      case "UROWID" => s"VARCHAR(${c.dataLength})"
      case ty if ty.startsWith("INTERVAL YEAR") => "VARCHAR(30)"
      case ty if ty.startsWith("INTERVAL DAY") => "VARCHAR(30)"
      case ty if ty.contains("TIMESTAMP") =>
        // fractional precision is DATA_SCALE, capped at MySQL's 6
        // (`mapping_mysql.go:528-546`)
        val s = math.min(tsScale(c), 6)
        if (ty.contains("TIME ZONE")) s"DATETIME($s)" else s"TIMESTAMP($s)"
      case _ => "TEXT"
    }
  }

  private def tsScale(c: OracleColumn): Int =
    c.dataScale.orElse {
      // parse "(p)" out of e.g. "TIMESTAMP(3) WITH TIME ZONE"
      val m = """TIMESTAMP\((\d+)\)""".r.findFirstMatchIn(c.upperType)
      m.map(_.group(1).toInt)
    }.getOrElse(6)

  /** The Spark-native ingestion type (SURVEY §1.3) — what a 100 TB
    * reader should materialize. Deviations from the MySQL map, by
    * design: DATE carries time in Oracle → TimestampType (DateType
    * would drop it); NUMBER buckets land on exact Catalyst integrals;
    * precision caps at Spark's DECIMAL(38).
    */
  def sparkType(c: OracleColumn): DataType = c.upperType match {
    case "NUMBER" =>
      val (p0, s0) = normalizeNumber(c.dataPrecision, c.dataScale)
      val p = math.min(p0, 38)
      if (s0 > 0) DecimalType(p, math.min(s0, p))
      else if (p >= 1 && p < 3) ByteType
      else if (p >= 3 && p < 5) ShortType
      else if (p >= 5 && p < 9) IntegerType
      else if (p >= 9 && p < 19) LongType
      else DecimalType(p, 0)
    case "DECIMAL" | "DEC" | "NUMERIC" =>
      DecimalType(math.min(c.dataPrecision.getOrElse(38), 38),
        math.min(c.dataScale.getOrElse(0), 38))
    case "FLOAT" | "DOUBLE PRECISION" | "BINARY_DOUBLE" | "REAL" => DoubleType
    case "BINARY_FLOAT" => FloatType
    case "INTEGER" | "INT" => IntegerType
    case "SMALLINT" => ShortType
    case "RAW" | "LONG RAW" | "BLOB" | "BFILE" => BinaryType
    case "DATE" => TimestampType
    case ty if ty.contains("TIMESTAMP") => TimestampType
    case _ => StringType // CHAR/VARCHAR/CLOB/ROWID/INTERVAL/XMLTYPE/...
  }

  /** Spark schema for a whole introspected table — the ingestion
    * contract a chunked JDBC read enforces on every partition.
    */
  def sparkSchema(cols: Seq[OracleColumn]): StructType =
    StructType(cols.map(c => StructField(c.name, sparkType(c), c.nullable)))

  /** Default-value rewrite (`common/buildin.go:22-32`, loaded via
    * `rule_load.go:24-96`): function defaults translate, absent maps
    * to NULL, anything else passes through verbatim (quoted literals
    * stay quoted).
    */
  def mapDefault(v: Option[String],
      overrides: Map[String, String] = Map.empty): String = {
    val builtin = Map("SYSDATE" -> "NOW()", "SYS_GUID()" -> "UUID()")
    v.map(_.trim).filter(_.nonEmpty) match {
      case None => "NULL"
      case Some(raw) =>
        overrides.getOrElse(raw.toUpperCase,
          builtin.getOrElse(raw.toUpperCase, raw))
    }
  }
}

/** MySQL column descriptor for the reverse M2O direction. */
final case class MySQLColumn(
    name: String,
    dataType: String,
    length: Int = 0, // char/binary length or display width
    precision: Option[Int] = None,
    scale: Option[Int] = None,
    datePrecision: Int = 0,
    nullable: Boolean = true,
    dflt: Option[String] = None) {
  def upperType: String = dataType.trim.toUpperCase
}

/** MySQL/TiDB → Oracle mapping (M2O/T2O direction) — transferdb
  * `module/reverse/mysql/public/mapping_oracle.go:90-330`, name map
  * `common/buildin.go:246-277`. SET/ENUM have no Oracle analogue and
  * are flagged UNSUPPORTED (`buildin.go:240-242` — the reference
  * errors them into the compatibility report).
  */
object M2OTypeMapper {

  val Unsupported = "UNSUPPORTED"

  def oracleType(c: MySQLColumn): String = c.upperType match {
    case "TINYINT" => "NUMBER(3,0)"
    case "SMALLINT" => "NUMBER(5,0)"
    case "MEDIUMINT" => "NUMBER(7,0)"
    case "INT" | "INTEGER" => "NUMBER(10,0)"
    case "BIGINT" => "NUMBER(19,0)"
    case "FLOAT" | "REAL" => "BINARY_FLOAT"
    case "DOUBLE" | "DOUBLE PRECISION" => "BINARY_DOUBLE"
    // divergence, documented: the reference emits bare DECIMAL/NUMBER
    // here (`mapping_oracle.go:147-155`), silently dropping declared
    // precision — we carry (p,s) through, which is what a user needs
    case "DECIMAL" | "NUMERIC" =>
      s"NUMBER(${c.precision.getOrElse(10)},${c.scale.getOrElse(0)})"
    case "YEAR" => "NUMBER"
    case "TIME" | "DATE" | "DATETIME" => "DATE"
    case "TIMESTAMP" => s"TIMESTAMP(${c.datePrecision})"
    case "CHAR" => s"CHAR(${c.length} CHAR)"
    case "VARCHAR" | "TINYTEXT" => s"VARCHAR2(${c.length} CHAR)"
    case "TEXT" | "MEDIUMTEXT" | "LONGTEXT" => "CLOB"
    case "BIT" | "BINARY" | "VARBINARY" => s"RAW(${c.length})"
    case "TINYBLOB" | "BLOB" | "MEDIUMBLOB" | "LONGBLOB" => "BLOB"
    case "SET" | "ENUM" => Unsupported
    case _ => "CLOB"
  }
}

/** Custom datatype-rule overrides with the reference's precedence:
  * column > table > schema > built-in
  * (`module/reverse/oracle/public/rule_load.go:98-258`, doc
  * `docs/transferdb_guaid.md:8-13`).
  *
  * Table/schema rules match on the canonical origin type string with
  * the reference's NUMBER wildcard forms: a rule source of
  * `NUMBER(*,s)` matches `NUMBER(38,s)`, `NUMBER(*)` / bare `NUMBER`
  * match `NUMBER(38,127)` (`rule_load.go:141-168`). Column rules
  * match by name alone.
  */
final case class RuleSet(
    columnRules: Map[(String, String, String), String] = Map.empty,
    tableRules: Map[(String, String, String), String] = Map.empty,
    schemaRules: Map[(String, String), String] = Map.empty) {

  private def normalizeRuleSource(src: String): String = {
    val u = src.trim.toUpperCase
    if (u.startsWith("NUMBER")) {
      if (u.contains("*") && u.contains(",")) u.replace("*", "38")
      else if (u == "NUMBER" || u.contains("*")) "NUMBER(38,127)"
      else u
    } else u
  }

  /** Resolve one column's target type. Candidate rules are scanned in
    * sorted-key order so that, should two rules match the same origin
    * type, the winner is deterministic (a Map's iteration order is
    * not).
    */
  def resolve(schema: String, table: String, c: OracleColumn): String =
    resolveScoped(schema, table, c)._1

  /** [[resolve]] plus WHICH precedence tier won — ("LONGTEXT",
    * "column") / ... / (builtin type, "builtin") — the attribution the
    * reference logs when a custom rule overrides the built-in grid.
    */
  def resolveScoped(schema: String, table: String,
      c: OracleColumn): (String, String) = {
    val origin = TypeMapper.originType(c)
    columnRules.get((schema.toUpperCase, table.toUpperCase,
        c.name.toUpperCase)).map((_, "column"))
      .orElse(tableRules.toSeq.sortBy(_._1).collectFirst {
        case ((s, t, src), tgt)
            if s.equalsIgnoreCase(schema) && t.equalsIgnoreCase(table) &&
              normalizeRuleSource(src) == origin => (tgt, "table")
      })
      .orElse(schemaRules.toSeq.sortBy(_._1).collectFirst {
        case ((s, src), tgt)
            if s.equalsIgnoreCase(schema) &&
              normalizeRuleSource(src) == origin => (tgt, "schema")
      })
      .getOrElse((TypeMapper.mysqlType(c), "builtin")) match {
      case (t, scope) => (t.toUpperCase, scope)
    }
  }
}
