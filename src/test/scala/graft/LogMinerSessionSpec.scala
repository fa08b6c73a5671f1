package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, ResultSet, Statement}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LogMinerSession
import graft.streaming.LogMinerSession.{MinedRow, RedoLog}

/** Statement-level contract test for the live-Oracle LogMiner session
  * plumbing: a recording JDBC connection captures every statement the
  * session issues and serves canned discovery/contents rows, so the
  * EXACT reference statement sequence (`incr.go:314-344`) — discovery
  * → ADD_LOGFILE → START_LOGMNR(options) → V$LOGMNR_CONTENTS fetch →
  * END_LOGMNR — is asserted without a server. Only the PL/SQL's
  * server-side effect remains environment-blocked.
  */
class LogMinerSessionSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def resultSet(rows: Seq[Map[String, Any]]): ResultSet = {
    var idx = -1
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array[Class[_]](classOf[ResultSet]), new InvocationHandler {
        override def invoke(p: AnyRef, m: Method,
            args: Array[AnyRef]): AnyRef = m.getName match {
          case "next" => idx += 1; Boolean.box(idx < rows.size)
          case "getString" => rows(idx)(args(0).asInstanceOf[String])
            .asInstanceOf[String]
          case "getLong" => Long.box(
            rows(idx)(args(0).asInstanceOf[String]) match {
              case l: Long => l
              case i: Int => i.toLong
            })
          case "close" | "wasNull" => Boolean.box(false)
          case n => throw new UnsupportedOperationException(n)
        }
      }).asInstanceOf[ResultSet]
  }

  /** `answer(sql)` serves rows for executeQuery; every executed or
    * queried statement lands in `log` in order.
    */
  private def recordingConnection(
      log: scala.collection.mutable.Buffer[String],
      answer: String => Seq[Map[String, Any]]): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array[Class[_]](classOf[Connection]), new InvocationHandler {
        override def invoke(p: AnyRef, m: Method,
            args: Array[AnyRef]): AnyRef = m.getName match {
          case "createStatement" =>
            Proxy.newProxyInstance(getClass.getClassLoader,
              Array[Class[_]](classOf[Statement]), new InvocationHandler {
                override def invoke(sp: AnyRef, sm: Method,
                    sargs: Array[AnyRef]): AnyRef = sm.getName match {
                  case "execute" =>
                    log += sargs(0).asInstanceOf[String]
                    Boolean.box(false)
                  case "executeQuery" =>
                    val sql = sargs(0).asInstanceOf[String]
                    log += sql
                    resultSet(answer(sql))
                  case "setQueryTimeout" =>
                    log += s"setQueryTimeout:${sargs(0)}"
                    null
                  case "close" => null
                  case n => throw new UnsupportedOperationException(n)
                }
              })
          case "close" => null
          case n => throw new UnsupportedOperationException(n)
        }
      }).asInstanceOf[Connection]

  private val contents = Seq(
    Map[String, Any]("SCN" -> 5001L, "SOURCE_SCHEMA" -> "MARVIN",
      "SOURCE_TABLE" -> "T1", "OPERATION" -> "INSERT",
      "SQL_REDO" -> "insert into \"MARVIN\".\"T1\"(\"K\") values ('1')",
      "SQL_UNDO" -> "delete from \"MARVIN\".\"T1\" where \"K\" = '1'"),
    Map[String, Any]("SCN" -> 5002L, "SOURCE_SCHEMA" -> "MARVIN",
      "SOURCE_TABLE" -> "T2", "OPERATION" -> "DDL",
      "SQL_REDO" -> "DROP TABLE T2 AS \"BIN$abc\"", "SQL_UNDO" -> ""))

  private def answers(archived: Seq[Map[String, Any]])(
      sql: String): Seq[Map[String, Any]] =
    if (sql.contains("v$ARCHIVED_LOG")) archived
    else if (sql.contains("v$LOGFILE"))
      Seq(Map[String, Any]("LOG_FILE" -> "/redo/current01.log",
        "FIRST_CHANGE" -> 4900L, "NEXT_CHANGE" -> 9999L))
    else if (sql.contains("V$LOGMNR_CONTENTS")) contents
    else Seq.empty

  test("mining window issues the reference's exact statement sequence") {
    val log = scala.collection.mutable.Buffer.empty[String]
    val conn = recordingConnection(log, answers(Seq(
      Map[String, Any]("LOG_FILE" -> "/arch/log_42.arc",
        "FIRST_CHANGE" -> 4800L, "NEXT_CHANGE" -> 5100L))))
    val rows = LogMinerSession.mineWindow(conn, "marvin",
      Seq("t1", "t2"), 5000L, queryTimeoutSeconds = 300)
    assert(rows == Seq(
      MinedRow(5001L, "MARVIN", "T1", "INSERT",
        "insert into \"MARVIN\".\"T1\"(\"K\") values ('1')",
        "delete from \"MARVIN\".\"T1\" where \"K\" = '1'"),
      MinedRow(5002L, "MARVIN", "T2", "DDL",
        "DROP TABLE T2 AS \"BIN$abc\"", "")))
    // sequence: discovery → ADD → START → timeout-bound → contents
    // → END (the timeout is all.logminer-query-timeout, incr.go:332)
    assert(log.size == 6, log.mkString("\n---\n"))
    assert(log(3) == "setQueryTimeout:300")
    log.remove(3)
    assert(log(0).contains("v$ARCHIVED_LOG") &&
      log(0).contains("STATUS = 'A'") && log(0).contains("DELETED = 'NO'") &&
      log(0).contains("FIRST_CHANGE# >= 5000") &&
      log(0).contains("ORDER BY FIRST_CHANGE# ASC"))
    assert(log(1).contains("dbms_logmnr.add_logfile") &&
      log(1).contains("'/arch/log_42.arc'") &&
      log(1).contains("options     => dbms_logmnr.NEW"))
    // START at the chosen log's first change, with all six option
    // flags the reference sets (all.go:157-174)
    assert(log(2).contains("dbms_logmnr.start_logmnr(startSCN => 4800"))
    for (opt <- Seq("SKIP_CORRUPTION", "NO_SQL_DELIMITER",
        "NO_ROWID_IN_STMT", "COMMITTED_DATA_ONLY",
        "DICT_FROM_ONLINE_CATALOG", "STRING_LITERALS_IN_STMT"))
      assert(log(2).contains(s"SYS.DBMS_LOGMNR.$opt"), opt)
    // contents query: the reference's filter set (logminer.go:52-63)
    assert(log(3).contains("FROM V$LOGMNR_CONTENTS") &&
      log(3).contains("UPPER(SEG_OWNER) = 'MARVIN'") &&
      log(3).contains("UPPER(TABLE_NAME) IN ('T1', 'T2')") &&
      log(3).contains("OPERATION IN ('INSERT', 'DELETE', 'UPDATE', 'DDL')") &&
      log(3).contains("SCN >= 5000") && log(3).contains("ORDER BY SCN"))
    assert(log(4).contains("dbms_logmnr.end_logmnr()"))
  }

  test("no covering archived log falls back to the CURRENT redo") {
    val log = scala.collection.mutable.Buffer.empty[String]
    val conn = recordingConnection(log, answers(Seq.empty))
    LogMinerSession.mineWindow(conn, "marvin", Seq("t1"), 5000L)
    assert(log(0).contains("v$ARCHIVED_LOG"))
    assert(log(1).contains("v$LOGFILE") && log(1).contains("STATUS='CURRENT'"),
      log(1))
    assert(log(2).contains("'/redo/current01.log'"))
    assert(log(3).contains("startSCN => 4900"))
  }

  test("END_LOGMNR runs even when the contents fetch throws") {
    val log = scala.collection.mutable.Buffer.empty[String]
    val conn = recordingConnection(log, sql =>
      if (sql.contains("V$LOGMNR_CONTENTS"))
        throw new RuntimeException("ORA-01306: miner not started")
      else answers(Seq(Map[String, Any]("LOG_FILE" -> "/arch/a.arc",
        "FIRST_CHANGE" -> 1L, "NEXT_CHANGE" -> 2L)))(sql))
    intercept[RuntimeException] {
      LogMinerSession.mineWindow(conn, "m", Seq("t"), 1L)
    }
    assert(log.last.contains("dbms_logmnr.end_logmnr()"),
      "session must not leak a started miner")
  }

  test("wire-to-target: mined window -> parse -> translate -> apply, " +
    "replay is a no-op") {
    // the COMPLETE all-mode incremental path with only the Oracle
    // server mocked at the wire: the session's statement sequence
    // fetches redo rows (the reference's exact PL/SQL bracket), the
    // rows parse through the oracle-checked c5 grammar, translate to
    // the change-feed shape, and land in a real JDBC target through
    // the guarded sink; re-mining the SAME window and re-applying
    // moves nothing (the overlap-safety the poll loop rides on)
    import graft.streaming.Cdc
    def contentsRow(scn: Long, op: String, sql: String) =
      Map[String, Any]("SCN" -> scn, "SOURCE_SCHEMA" -> "GRAFT",
        "SOURCE_TABLE" -> "EVENTS", "OPERATION" -> op,
        "SQL_REDO" -> sql, "SQL_UNDO" -> "")
    val mined = Seq(
      contentsRow(6001L, "INSERT",
        "insert into \"GRAFT\".\"EVENTS\"(\"KEY\",\"VALUE\") values ('7','1.500');"),
      contentsRow(6002L, "UPDATE",
        "update \"GRAFT\".\"EVENTS\" set \"VALUE\" = '2.250' where \"KEY\" = '7';"),
      contentsRow(6003L, "INSERT",
        "insert into \"GRAFT\".\"EVENTS\"(\"KEY\",\"VALUE\") values ('8','NULL');"),
      contentsRow(6004L, "DELETE",
        "delete from \"GRAFT\".\"EVENTS\" where \"KEY\" = '9';"))
    // knobs-driven: the config's schema/table set, logminer timeout,
    // and insert-batch-size all flow through TaskModes.mineAndApply
    val knobs = graft.operators.TransferdbConfig.knobs(
      graft.operators.TaskModes.ExampleConfigPortable +
        "\n[schema-config]\nsource-schema = \"graft\"\n" +
        "source-include-table = [\"events\"]\n" +
        "[all]\nlogminer-query-timeout = 77\n")
    val wireLog = scala.collection.mutable.Buffer.empty[String]
    def connection() = recordingConnection(wireLog, sql =>
      if (sql.contains("V$LOGMNR_CONTENTS")) mined
      else answers(Seq(Map[String, Any]("LOG_FILE" -> "/arch/log_43.arc",
        "FIRST_CHANGE" -> 6000L, "NEXT_CHANGE" -> 6100L)))(sql))
    val dbDir = graft.operators.Migrate.scratchDbDir("lm_wire")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val c0 = java.sql.DriverManager.getConnection(url)
    try c0.createStatement().execute(
      "CREATE TABLE W (k BIGINT PRIMARY KEY, scn BIGINT, seq BIGINT, v DOUBLE)")
    finally c0.close()
    def applyWindow(): Unit =
      graft.operators.TaskModes.mineAndApply(spark, connection(),
        knobs, 6000L, url, "W")
    def state(): Map[Long, (Long, Option[Double])] = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("SELECT k, scn, v FROM W")
        Iterator.continually(rs).takeWhile(_.next()).map(r =>
          r.getLong(1) -> (r.getLong(2),
            Option(r.getObject(3)).map(_.asInstanceOf[Double]))).toMap
      } finally c.close()
    }
    applyWindow()
    // the config's timeout knob reached the wire
    assert(wireLog.contains("setQueryTimeout:77"), wireLog.mkString("|"))
    val first = state()
    // key 7: last change wins (the 6002 UPDATE); key 8: rendered NULL
    // lands as SQL NULL; key 9: delete of an absent row is a no-op
    assert(first == Map(7L -> (6002L, Some(2.25)), 8L -> (6003L, None)),
      first.toString)
    applyWindow() // the SAME window re-mined and re-applied
    assert(state() == first, "replayed window must move nothing")
  }

  test("mined window lands as the distributed DataFrame handoff") {
    val log = scala.collection.mutable.Buffer.empty[String]
    val conn = recordingConnection(log, answers(Seq(
      Map[String, Any]("LOG_FILE" -> "/arch/log_42.arc",
        "FIRST_CHANGE" -> 4800L, "NEXT_CHANGE" -> 5100L))))
    val df = LogMinerSession.mineWindowToDf(spark, conn, "marvin",
      Seq("t1", "t2"), 5000L)
    assert(df.schema == LogMinerSession.minedSchema)
    val got = df.collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(got == Set((5001L, "INSERT"), (5002L, "DDL")))
  }
}
