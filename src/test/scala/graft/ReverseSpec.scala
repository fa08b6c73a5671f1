package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.types._

import graft.reverse._
import graft.reverse.Ddl.{IndexDef, TableDef}

class ReverseSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def num(p: Option[Int], s: Option[Int]) =
    OracleColumn("c", "NUMBER", 22, p, s)

  test("NUMBER scale-0 buckets hit every boundary (mapping_mysql.go:124-160)") {
    val expect = Seq(
      1 -> "TINYINT", 2 -> "TINYINT",
      3 -> "SMALLINT", 4 -> "SMALLINT",
      5 -> "INT", 8 -> "INT",
      9 -> "BIGINT", 18 -> "BIGINT",
      19 -> "DECIMAL(19)", 38 -> "DECIMAL(38)")
    expect.foreach { case (p, want) =>
      assert(TypeMapper.mysqlType(num(Some(p), Some(0))) == want, s"p=$p")
    }
  }

  test("NUMBER scale>0 rules: caps at (65,30), passthrough below") {
    assert(TypeMapper.mysqlType(num(Some(38), Some(31))) == "DECIMAL(65,30)")
    assert(TypeMapper.mysqlType(num(Some(38), Some(30))) == "DECIMAL(65,30)")
    assert(TypeMapper.mysqlType(num(Some(38), Some(2))) == "DECIMAL(65,2)")
    assert(TypeMapper.mysqlType(num(Some(10), Some(2))) == "DECIMAL(10,2)")
    assert(TypeMapper.mysqlType(num(Some(10), Some(31))) == "DECIMAL(10,30)")
    // bare NUMBER normalizes to (38,127) -> DECIMAL(65,30)
    assert(TypeMapper.mysqlType(num(None, None)) == "DECIMAL(65,30)")
  }

  test("property: every NUMBER(p,0) lands in exactly its bucket") {
    val prop = Prop.forAll(Gen.choose(1, 38)) { p =>
      val t = TypeMapper.mysqlType(num(Some(p), Some(0)))
      val want =
        if (p < 3) "TINYINT" else if (p < 5) "SMALLINT"
        else if (p < 9) "INT" else if (p < 19) "BIGINT"
        else s"DECIMAL($p)"
      t == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: spark integral types can hold every value of their bucket") {
    // p digits max value must fit the chosen integral type
    val prop = Prop.forAll(Gen.choose(1, 18)) { p =>
      val maxVal = BigDecimal("9" * p)
      TypeMapper.sparkType(num(Some(p), Some(0))) match {
        case ByteType => maxVal <= BigDecimal(Byte.MaxValue.toInt)
        case ShortType => maxVal <= BigDecimal(Short.MaxValue.toInt)
        case IntegerType => maxVal <= BigDecimal(Int.MaxValue)
        case LongType => maxVal <= BigDecimal(Long.MaxValue)
        case _ => false
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("char semantics pick char_length only under CHAR_USED='C'") {
    val byteSem = OracleColumn("c", "VARCHAR2", 30, charLength = Some(10),
      charUsed = "B")
    val charSem = byteSem.copy(charUsed = "C")
    assert(TypeMapper.mysqlType(byteSem) == "VARCHAR(30)")
    assert(TypeMapper.mysqlType(charSem) == "VARCHAR(10)")
  }

  test("timestamp precision caps at 6; tz variants map to DATETIME") {
    assert(TypeMapper.mysqlType(OracleColumn("c", "TIMESTAMP(9)",
      dataScale = Some(9))) == "TIMESTAMP(6)")
    assert(TypeMapper.mysqlType(OracleColumn("c",
      "TIMESTAMP(3) WITH LOCAL TIME ZONE", dataScale = Some(3))) ==
      "DATETIME(3)")
    // scale parsed from the type string when DATA_SCALE is absent
    assert(TypeMapper.mysqlType(OracleColumn("c", "TIMESTAMP(2)")) ==
      "TIMESTAMP(2)")
  }

  test("rule precedence: column > table > schema > builtin (rule_load.go:98-258)") {
    val c = num(Some(10), Some(2)) // builtin -> DECIMAL(10,2)
    val schemaR = RuleSet(schemaRules =
      Map(("S", "NUMBER(10,2)") -> "VARCHAR(100)"))
    val tableR = schemaR.copy(tableRules =
      Map(("S", "T", "NUMBER(10,2)") -> "DOUBLE"))
    val colR = tableR.copy(columnRules = Map(("S", "T", "C") -> "TEXT"))
    assert(RuleSet().resolve("S", "T", c) == "DECIMAL(10,2)")
    assert(schemaR.resolve("S", "T", c) == "VARCHAR(100)")
    assert(tableR.resolve("S", "T", c) == "DOUBLE")
    assert(colR.resolve("S", "T", c) == "TEXT")
    // rules for other scopes don't leak
    assert(tableR.resolve("S", "OTHER", c) == "VARCHAR(100)")
    assert(schemaR.resolve("X", "T", c) == "DECIMAL(10,2)")
  }

  test("NUMBER wildcard rule forms match their normalized declarations") {
    val bare = num(None, None) // -> NUMBER(38,127)
    val star10 = num(None, Some(10)) // -> NUMBER(38,10)
    val rs = RuleSet(schemaRules = Map(
      ("S", "NUMBER") -> "STRINGY",
      ("S", "NUMBER(*,10)") -> "DEC38_10"))
    assert(rs.resolve("S", "T", bare) == "STRINGY")
    assert(rs.resolve("S", "T", star10) == "DEC38_10")
  }

  test("default-value rewrite: SYSDATE/SYS_GUID/empty (buildin.go:22-32)") {
    assert(TypeMapper.mapDefault(Some("SYSDATE")) == "NOW()")
    assert(TypeMapper.mapDefault(Some("sysdate")) == "NOW()")
    assert(TypeMapper.mapDefault(Some("SYS_GUID()")) == "UUID()")
    assert(TypeMapper.mapDefault(None) == "NULL")
    assert(TypeMapper.mapDefault(Some("")) == "NULL")
    assert(TypeMapper.mapDefault(Some("'ty'")) == "'ty'")
    assert(TypeMapper.mapDefault(Some("SYSDATE"),
      Map("SYSDATE" -> "CURRENT_TIMESTAMP")) == "CURRENT_TIMESTAMP")
  }

  test("golden DDL format matches reverse_marvin.sql conventions") {
    val t = TableDef("marvin", "T6",
      columns = Seq(
        OracleColumn("id", "NUMBER", 22, Some(11), Some(0),
          nullable = false),
        OracleColumn("name", "VARCHAR2", 10, dataDefault = Some("'pu'")),
        OracleColumn("created", "DATE", dataDefault = Some("SYSDATE"))),
      primaryKey = Seq("id"),
      uniques = Seq(IndexDef("uq_name", Seq("name"), unique = true)),
      indexes = Seq(
        IndexDef("idx_created", Seq("created")),
        IndexDef("idx_fn", Seq("UPPER(name)"), kind = "FUNCTION-BASED")))
    val (create, alters, compat) = Ddl.genCreateTable(t, "steven")
    val expected =
      """CREATE TABLE `steven`.`T6` (
        |`id` bigint NOT NULL,
        |`name` varchar(10) DEFAULT 'pu',
        |`created` datetime DEFAULT NOW(),
        |PRIMARY KEY (id),
        |UNIQUE KEY `uq_name` (name),
        |KEY `idx_created` (created)
        |) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_bin;""".stripMargin
    assert(create == expected, s"\n--- got ---\n$create")
    assert(alters.isEmpty)
    assert(compat.size == 1 && compat.head.contains("FUNCTION-BASED"))
  }

  test("marvin1-style table: keys, FK alters, checks, compat bucket together") {
    // modeled on example/reverse_oracle_test.sql:59-76 (marvin1):
    // pk + named unique + fk + check + normal and function-based index
    val t = TableDef("marvin", "MARVIN1",
      columns = Seq(
        OracleColumn("n1", "NUMBER", 22, None, None, nullable = false),
        OracleColumn("n2", "NUMBER", 22, Some(2)),
        OracleColumn("n4", "NUMBER", 22, Some(8), nullable = false),
        OracleColumn("vchar1", "VARCHAR", 10, dataDefault = Some("'ty'"))),
      primaryKey = Seq("n1"),
      uniques = Seq(IndexDef("unqiue", Seq("n1", "char1"), unique = true)),
      indexes = Seq(
        IndexDef("idx_marvin1_ty", Seq("vchar3")),
        IndexDef("idx_marvin1_tu", Seq("n4", "vchar3")),
        IndexDef("idx_fn", Seq("UPPER(vchar1)"), kind = "FUNCTION-BASED")),
      foreignKeys = Seq(Ddl.ForeignKeyDef("fk_nam1e", Seq("n2"),
        "MARVIN2", Seq("n1"))),
      checks = Seq("n3 in(1,2,3)"))
    val (create, alters, compat) = Ddl.genCreateTable(t, "steven",
      caseMode = "lower")
    assert(create.startsWith("CREATE TABLE `steven`.`marvin1` ("))
    assert(create.contains("`n1` decimal(65,30) NOT NULL"))
    assert(create.contains("`vchar1` varchar(10) DEFAULT 'ty'"))
    assert(create.contains("PRIMARY KEY (n1)"))
    assert(create.contains("UNIQUE KEY `unqiue` (n1,char1)"))
    assert(create.contains("KEY `idx_marvin1_tu` (n4,vchar3)"))
    assert(create.contains("CHECK (n3 in(1,2,3))"))
    assert(create.endsWith(
      ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 COLLATE=utf8mb4_bin;"))
    assert(alters.size == 1 &&
      alters.head.contains("ADD CONSTRAINT `fk_nam1e` FOREIGN KEY (n2)") &&
      alters.head.contains("REFERENCES `steven`.`MARVIN2` (n1)"))
    assert(compat.size == 1 && compat.head.contains("FUNCTION-BASED"))
  }

  test("name rules rename the target table and FK references") {
    val t = TableDef("marvin", "T_SRC",
      columns = Seq(OracleColumn("id", "NUMBER", 22, Some(10),
        nullable = false)),
      primaryKey = Seq("id"),
      foreignKeys = Seq(Ddl.ForeignKeyDef("fk1", Seq("id"), "T_REF",
        Seq("id"))))
    val renames = Map("t_src" -> "T_TARGET", "T_REF" -> "T_REF_NEW")
    val (create, alters, _) = Ddl.genCreateTable(t, "steven",
      nameRules = renames)
    assert(create.startsWith("CREATE TABLE `steven`.`T_TARGET` ("))
    assert(alters.head.contains("ALTER TABLE `steven`.`T_TARGET`"))
    assert(alters.head.contains("REFERENCES `steven`.`T_REF_NEW`"))
    // identity when no rule matches
    val (c2, _, _) = Ddl.genCreateTable(t, "steven")
    assert(c2.startsWith("CREATE TABLE `steven`.`T_SRC` ("))
  }

  test("sparkSchema roundtrips through parquet with full fidelity") {
    val cols = Seq(
      OracleColumn("id", "NUMBER", 22, Some(12), Some(0), nullable = false),
      OracleColumn("amount", "NUMBER", 22, Some(18), Some(4)),
      OracleColumn("note", "VARCHAR2", 100),
      OracleColumn("payload", "RAW", 64),
      OracleColumn("at", "TIMESTAMP(6)", dataScale = Some(6)))
    val schema = TypeMapper.sparkSchema(cols)
    assert(schema("id").dataType == LongType && !schema("id").nullable)
    assert(schema("amount").dataType == DecimalType(18, 4))
    assert(schema("payload").dataType == BinaryType)
    val out =
      java.nio.file.Files.createTempDirectory("graft_rev").toString + "/t"
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      schema).write.parquet(out)
    assert(spark.read.parquet(out).schema("amount").dataType ==
      DecimalType(18, 4))
  }

  test("escape: executable-literal rules, backslash before quote") {
    import graft.functions.Escape
    assert(Escape.sqlLiteral("""it's a \ test""") == """it\'s a \\ test""")
    // idempotence would double-escape; assert single application shape
    assert(Escape.sqlLiteral("""\'""") == """\\\'""")
  }

  test("seeded parquet rules round-trip and resolve with attribution " +
    "(prepare.go:98)") {
    val metaDir =
      java.nio.file.Files.createTempDirectory("graft_meta").toString
    Prepare.seedRules(spark, metaDir)
    val rules = Prepare.loadRules(spark, metaDir)
    // column rule shadows the schema DATE rule on marvin2.ndate...
    assert(rules.resolveScoped("steven", "marvin2",
      OracleColumn("ndate", "DATE")) == ("VARCHAR(30)", "column"))
    // ...but the schema rule is visible from the other table
    assert(rules.resolveScoped("steven", "marvin1lite",
      OracleColumn("created", "DATE")) == ("DATETIME(3)", "schema"))
    // table rule beats the schema rule on the same source type
    assert(rules.resolveScoped("steven", "marvin2",
      num(Some(30), Some(2))) == ("DECIMAL(32,2)", "table"))
    // wildcard NUMBER(*) matches the bare-NUMBER declaration
    assert(rules.resolveScoped("steven", "marvin2",
      num(None, None)) == ("DECIMAL(38,0)", "table"))
    // unmatched columns fall through to the builtin grid
    assert(rules.resolveScoped("steven", "marvin2",
      OracleColumn("dlob", "CLOB")) == ("LONGTEXT", "builtin"))
  }

  test("golden: compatibility artifact renders the diverted kinds " +
    "exactly (compatibility_marvin.sql shape)") {
    val report = Reverse.renderCompatReport(spark, sf)
    val expected =
      """/*
        | oracle partition table maybe mysql has compatibility, will convert to normal table, please manual adjust
        | SCHEMA: marvin
        | ORACLE PARTITION LIST: list_partition_table, hash_rang
        | SUGGEST: Manual Create And Adjust Table
        |*/
        |
        |/*
        | oracle temporary table maybe mysql has compatibility, skip
        | SCHEMA: marvin
        | ORACLE TEMPORARY LIST: gtt_stage
        | SUGGEST: Manual Create
        |*/
        |
        |/*
        | oracle clustered table maybe mysql has compatibility, skip
        | SCHEMA: marvin
        | ORACLE CLUSTERED LIST: iot_lookup
        | SUGGEST: Manual Create
        |*/
        |
        |/*
        | oracle materialized view maybe mysql has compatibility, skip
        | SCHEMA: marvin
        | ORACLE MVIEW LIST: mv_summary
        | SUGGEST: Manual Create
        |*/""".stripMargin
    assert(report == expected,
      s"rendered:\n$report\n--- expected:\n$expected")
    // the REVERSE-routed tables never leak into the compat artifact
    Seq("marvin2", "marvin1lite").foreach(t =>
      assert(!report.contains(t), t))
    // and it lands through the same S9 sink the DDL artifacts use
    val path = java.nio.file.Files.createTempDirectory("graft_compat")
      .toString + "/compatibility_marvin.sql"
    graft.reverse.Ddl.writeArtifact(path, Seq(report))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path)).startsWith("/*\n oracle partition"))
  }
}
