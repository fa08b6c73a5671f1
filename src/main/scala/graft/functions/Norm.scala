package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine value normalization + order-insensitive checksums.
  *
  * The reference engine compares chunks with an order-insensitive
  * CRC32 *sum* over a canonical string rendering of each row
  * (transferdb `database/oracle/compare.go:146-274`, sum at :262) and
  * normalizes NULL and empty string to the same canonical value
  * (`database/oracle/full.go:418-424`, `compare.go:197-201`).
  *
  * We keep the same shape — `sum(hash64(concat_ws('|', cols)))` — but
  * the hash must be computable bit-identically by the DuckDB oracle,
  * which lacks crc32. We use the top 60 bits of md5 (15 hex chars →
  * non-negative int64 in both engines):
  *   Spark :  conv(substr(md5(x),1,15),16,10)::long
  *   DuckDB:  ('0x' || substr(md5(x),1,15))::BIGINT
  *
  * Every normalization exists twice — as a Spark `Column` and as the
  * equivalent DuckDB SQL text — generated from one `NormCol` spec so
  * the pair cannot drift apart.
  *
  * Scale note: all of this is per-row, codegen'd, shuffle-free; the
  * checksum aggregation is a partial-aggregable `sum`, so at 100 TB it
  * map-side combines and shuffles one row per (group × partition).
  */
object Norm {

  /** 60-bit md5-based hash, identical in Spark and DuckDB. */
  def xhash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def xhash64Sql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  /** Second independent 60-bit hash from the SAME md5 digest (hex
    * chars 16-30): double-hashing families get two bases for one
    * digest evaluation (codegen CSE folds the repeated md5 node).
    */
  def xhash64b(c: Column): Column =
    conv(substring(md5(c), 16, 15), 16, 10).cast("long")

  def xhash64bSql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 16, 15) AS BIGINT)"

  /** Column rendering kinds with stable cross-engine string forms. */
  sealed trait Kind
  case object KLong extends Kind // integral (int32/int64)
  case class KDec(p: Int, s: Int) extends Kind // double rendered as decimal(p,s)
  case object KStr extends Kind // string ('' ≡ NULL, reference semantics)
  case object KBool extends Kind // boolean ('true'/'false' in both engines)
  case object KDate extends Kind // timestamp rendered as yyyy-MM-dd
  case object KTs extends Kind // timestamp rendered to second precision

  case class NormCol(name: String, kind: Kind)

  private val NullLit = "NULL"

  /** ONE rendering per kind, shared by the sentinel and nullable
    * forms in each dialect — four hand-maintained copies would drift.
    */
  private def sparkRendered(nc: NormCol): Column = {
    val c = col(nc.name)
    nc.kind match {
      case KLong => c.cast("long").cast("string")
      case KDec(p, s) => c.cast(DecimalType(p, s)).cast("string")
      case KStr => c
      case KBool => c.cast("string")
      case KDate => date_format(c, "yyyy-MM-dd")
      case KTs => date_format(c, "yyyy-MM-dd HH:mm:ss")
    }
  }

  private def duckRendered(nc: NormCol): String = {
    val c = nc.name
    nc.kind match {
      case KLong => s"CAST(CAST($c AS BIGINT) AS VARCHAR)"
      case KDec(p, s) => s"CAST(CAST($c AS DECIMAL($p,$s)) AS VARCHAR)"
      case KStr => c
      case KBool => s"CAST($c AS VARCHAR)"
      case KDate => s"strftime($c, '%Y-%m-%d')"
      case KTs => s"strftime($c, '%Y-%m-%d %H:%M:%S')"
    }
  }

  /** Spark-side canonical string for one column. */
  def sparkNorm(nc: NormCol): Column = {
    val c = col(nc.name)
    val isEmpty = nc.kind match {
      case KStr => c.isNull || c === lit("")
      case _ => c.isNull
    }
    when(isEmpty, lit(NullLit)).otherwise(sparkRendered(nc))
  }

  /** DuckDB-side canonical string for one column (same semantics). */
  def duckNorm(nc: NormCol): String = {
    val isEmpty = nc.kind match {
      case KStr => s"${nc.name} IS NULL OR ${nc.name} = ''"
      case _ => s"${nc.name} IS NULL"
    }
    s"CASE WHEN $isEmpty THEN '$NullLit' ELSE ${duckRendered(nc)} END"
  }

  /** Nullable canonical rendering: a true NULL (and '' for strings,
    * per reference semantics) stays SQL NULL; values render to their
    * canonical strings. Use where downstream must distinguish NULL
    * from the 4-character string "NULL" — the sentinel form above
    * collapses both, which is fine for checksums but would make
    * fix-SQL synthesis write SQL NULL over a real 'NULL' string.
    */
  def sparkNormNullable(nc: NormCol): Column = nc.kind match {
    case KStr => when(col(nc.name) === lit(""), lit(null).cast("string"))
      .otherwise(sparkRendered(nc))
    case _ => sparkRendered(nc)
  }

  def duckNormNullable(nc: NormCol): String = nc.kind match {
    case KStr =>
      s"CASE WHEN ${nc.name} = '' THEN NULL ELSE ${duckRendered(nc)} END"
    case _ => duckRendered(nc)
  }

  /** Canonical row string: '|'-joined normalized columns. */
  def sparkRow(cols: Seq[NormCol]): Column =
    concat_ws("|", cols.map(sparkNorm): _*)

  def duckRow(cols: Seq[NormCol]): String =
    cols.map(duckNorm).mkString("concat_ws('|', ", ", ", ")")

  /** Order-insensitive row-set checksum (sum of 60-bit hashes).
    * Sum is DECIMAL(38,0) (60-bit terms overflow int64 beyond ~16
    * rows), rendered to its canonical string: only strings are
    * bit-stable across Spark/parquet/pandas/DuckDB value paths.
    */
  def sparkRowChecksum(cols: Seq[NormCol]): Column =
    sum(xhash64(sparkRow(cols)).cast(DecimalType(38, 0)))
      .cast(DecimalType(38, 0)).cast("string")

  def duckRowChecksum(cols: Seq[NormCol]): String =
    s"CAST(CAST(sum(${xhash64Sql(duckRow(cols))}) AS DECIMAL(38,0)) AS VARCHAR)"
}
