package graft.streaming

import java.sql.{Connection, ResultSet}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The live-Oracle LogMiner SESSION plumbing — the one piece of the
  * CDC path that needs a real Oracle server on the other end of the
  * connection, issued with the REFERENCE'S exact statement shapes:
  *
  *  - redo-log discovery: archived logs covering the checkpoint
  *    (`database/oracle/all.go:83-96` — `v$ARCHIVED_LOG` with
  *    STATUS='A', DELETED='NO', FIRST_CHANGE# >= scn, ascending) and
  *    the CURRENT online redo (`all.go:98-124` — `v$LOG ⋈ v$LOGFILE`
  *    on GROUP# where STATUS='CURRENT');
  *  - per-window session bracket (`o2m/incr.go:314-344`):
  *    `DBMS_LOGMNR.ADD_LOGFILE(..., options => dbms_logmnr.NEW)`
  *    (`all.go:144-155`), `DBMS_LOGMNR.START_LOGMNR(startSCN, ...)`
  *    with the reference's six option flags (`all.go:157-174`), the
  *    `V$LOGMNR_CONTENTS` fetch (`public/logminer.go:52-63` — schema
  *    UPPER match, table IN-list, INSERT/DELETE/UPDATE/DDL, SCN >=
  *    checkpoint, ORDER BY SCN), and `DBMS_LOGMNR.END_LOGMNR()`
  *    in a finally (`all.go:176-183`).
  *
  * Why the fetch is driver-side: `V$LOGMNR_CONTENTS` is SESSION-
  * scoped — rows exist only inside the session that ran START_LOGMNR,
  * so a parallel multi-connection Spark scan reads nothing. The
  * reference single-threads this fetch too (`incr.go:326`), and its
  * own docs bound mining rate by redo-disk and PGA (BASELINE.md:5-7).
  * One window's rows are bounded by the redo window; they land in a
  * DataFrame and everything downstream — parse (c5), route (c5b),
  * translate + guarded apply (c6 family) — is the already-distributed
  * path. [[Cdc.mineRedoJdbc]] remains the seam for server-side
  * pushdown mining against LOGMNR-shaped relations that ARE
  * multi-session-visible (e.g. a mining staging table).
  *
  * Everything here is testable against a mock JDBC connection
  * (LogMinerSessionSpec records the issued statements and serves
  * canned rows); only a live Oracle server can exercise the PL/SQL
  * for real — the standing environment gap, now confined to the
  * server side of the wire.
  */
object LogMinerSession {

  final case class RedoLog(file: String, firstChange: Long,
      nextChange: Long)

  /** One mined change record — the reference's Logminer struct
    * (`public/logminer.go:34-43`), minus the name-rule rewrite the
    * caller applies.
    */
  final case class MinedRow(scn: Long, sourceSchema: String,
      sourceTable: String, operation: String, sqlRedo: String,
      sqlUndo: String)

  // ------------------------------------------------------ discovery

  /** `all.go:83-96` — archived logs whose range can cover the
    * checkpoint, oldest first.
    */
  def archivedLogs(conn: Connection, sinceScn: Long): Seq[RedoLog] = {
    val sql =
      s"""SELECT NAME AS LOG_FILE,
         |       NEXT_CHANGE# AS NEXT_CHANGE,
         |       FIRST_CHANGE# AS FIRST_CHANGE
         |  FROM v$$ARCHIVED_LOG
         | WHERE STATUS = 'A'
         |   AND DELETED = 'NO'
         |   AND FIRST_CHANGE# >= $sinceScn ORDER BY FIRST_CHANGE# ASC""".stripMargin
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      val out = Seq.newBuilder[RedoLog]
      while (rs.next()) out += RedoLog(rs.getString("LOG_FILE"),
        rs.getLong("FIRST_CHANGE"), rs.getLong("NEXT_CHANGE"))
      out.result()
    } finally st.close()
  }

  /** `all.go:98-124` — the CURRENT online redo group's file and SCN
    * range.
    */
  def currentRedo(conn: Connection): RedoLog = {
    val sql =
      """SELECT
        |       l.FIRST_CHANGE# AS FIRST_CHANGE,
        |       l.NEXT_CHANGE# AS NEXT_CHANGE,
        |       lf.MEMBER LOG_FILE
        |  FROM v$LOGFILE lf, v$LOG l
        | WHERE l.GROUP# = lf.GROUP#
        | AND l.STATUS='CURRENT'""".stripMargin
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      if (!rs.next())
        throw new IllegalStateException("oracle current redo log can't null")
      RedoLog(rs.getString("LOG_FILE"), rs.getLong("FIRST_CHANGE"),
        rs.getLong("NEXT_CHANGE"))
    } finally st.close()
  }

  // ------------------------------------------------- session bracket

  /** `all.go:144-155` — register the window's log with a fresh miner
    * list (the reference passes `dbms_logmnr.NEW` on its single
    * per-window file).
    */
  def addLogFile(conn: Connection, logFile: String): Unit =
    execBlock(conn,
      s"""BEGIN
         |  dbms_logmnr.add_logfile(logfilename => '$logFile',
         |                          options     => dbms_logmnr.NEW);
         |END;""".stripMargin)

  /** `all.go:157-174` — start mining at the window's first change
    * with the reference's exact option set.
    */
  def startMiner(conn: Connection, startScn: Long): Unit =
    execBlock(conn,
      s"""BEGIN
         |  dbms_logmnr.start_logmnr(startSCN => $startScn,
         |                           options  => SYS.DBMS_LOGMNR.SKIP_CORRUPTION +
         |                                       SYS.DBMS_LOGMNR.NO_SQL_DELIMITER +
         |                                       SYS.DBMS_LOGMNR.NO_ROWID_IN_STMT +
         |                                       SYS.DBMS_LOGMNR.COMMITTED_DATA_ONLY +
         |                                       SYS.DBMS_LOGMNR.DICT_FROM_ONLINE_CATALOG +
         |                                       SYS.DBMS_LOGMNR.STRING_LITERALS_IN_STMT);
         |END;""".stripMargin)

  /** `all.go:176-183`. */
  def endMiner(conn: Connection): Unit =
    execBlock(conn,
      """BEGIN
        |  dbms_logmnr.end_logmnr();
        |END;""".stripMargin)

  private def execBlock(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    try { st.execute(sql); () } finally st.close()
  }

  /** `public/logminer.go:52-63` — the contents fetch: schema
    * UPPER-matched, tables as an UPPER IN-list, the four routed
    * operations, checkpoint lower bound, SCN order. `tables` arrive
    * unquoted and are quoted here the way the reference's
    * StringArrayToCapitalChar renders them.
    */
  def contentsSql(sourceSchema: String, tables: Seq[String],
      sinceScn: Long): String = {
    val inList = tables.map(t => s"'${t.toUpperCase}'").mkString(", ")
    s"""SELECT SCN,
       |       SEG_OWNER AS SOURCE_SCHEMA,
       |       TABLE_NAME AS SOURCE_TABLE,
       |       OPERATION,
       |       SQL_REDO,
       |       SQL_UNDO
       |  FROM V$$LOGMNR_CONTENTS
       | WHERE 1 = 1
       |   AND UPPER(SEG_OWNER) = '${sourceSchema.toUpperCase}'
       |   AND UPPER(TABLE_NAME) IN ($inList)
       |   AND OPERATION IN ('INSERT', 'DELETE', 'UPDATE', 'DDL')
       |   AND SCN >= $sinceScn ORDER BY SCN""".stripMargin
  }

  // ------------------------------------------------------- windows

  /** One full mining window over a live connection (`incr.go's` loop
    * body): choose the log that covers the checkpoint — the oldest
    * covering archived log, else the current redo (`incr.go:346-354`'s
    * fallback order) — bracket the session, fetch, ALWAYS end the
    * miner. Returns the window's rows; the caller advances its
    * per-table watermarks only after the guarded apply commits (C3's
    * rule).
    */
  def mineWindow(conn: Connection, sourceSchema: String,
      tables: Seq[String], checkpointScn: Long,
      queryTimeoutSeconds: Int = 300): Seq[MinedRow] = {
    val log = archivedLogs(conn, checkpointScn).headOption
      .getOrElse(currentRedo(conn))
    addLogFile(conn, log.file)
    startMiner(conn, log.firstChange)
    try {
      val st = conn.createStatement()
      try {
        // `all.logminer-query-timeout` (config.go:109, applied at
        // incr.go:332): a V$LOGMNR_CONTENTS fetch that outlives the
        // bound is cancelled instead of wedging the poll loop
        st.setQueryTimeout(queryTimeoutSeconds)
        val rs = st.executeQuery(
          contentsSql(sourceSchema, tables, checkpointScn))
        val out = Seq.newBuilder[MinedRow]
        while (rs.next()) out += MinedRow(rs.getLong("SCN"),
          rs.getString("SOURCE_SCHEMA"), rs.getString("SOURCE_TABLE"),
          rs.getString("OPERATION"), rs.getString("SQL_REDO"),
          rs.getString("SQL_UNDO"))
        out.result()
      } finally st.close()
    } finally endMiner(conn)
  }

  val minedSchema: StructType = StructType(Seq(
    StructField("scn", LongType), StructField("source_schema", StringType),
    StructField("source_table", StringType),
    StructField("operation", StringType),
    StructField("sql_redo", StringType), StructField("sql_undo", StringType)))

  /** The window's rows as a DataFrame — the handoff from the
    * session-scoped fetch to the distributed path (c5 parse / c5b
    * route / c6 translate+apply). Bounded by the redo window, the
    * same driver-side cardinality class as a chunk plan.
    */
  def mineWindowToDf(spark: SparkSession, conn: Connection,
      sourceSchema: String, tables: Seq[String],
      checkpointScn: Long, queryTimeoutSeconds: Int = 300): DataFrame = {
    val rows = mineWindow(conn, sourceSchema, tables, checkpointScn,
      queryTimeoutSeconds)
      .map(r => Row(r.scn, r.sourceSchema, r.sourceTable, r.operation,
        r.sqlRedo, r.sqlUndo))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 1000)),
      minedSchema)
  }
}
