package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL-literal escaping (F2) — the reference escapes values embedded
  * in generated fix/DDL SQL (`common/strings.go:453-473`
  * SpecialLettersUsingMySQL: backslash before every punct/symbol rune
  * except %/_; Oracle variant `:504-522` doubles quotes).
  *
  * We escape the two characters that decide executability under
  * default MySQL sql_mode — backslash and single quote — in the strict order
  * backslash-first (escaping quotes first would re-escape its own
  * output). The reference's escape-everything variant is a superset
  * that changes byte content of benign punctuation; ours keeps values
  * byte-identical after a round trip, which the compare engine
  * requires.
  *
  * Exists three ways, generated from one rule so they cannot drift:
  * plain Scala (driver-side DDL artifacts), a Spark `Column`
  * (engine-side fix-SQL synthesis — codegen'd nested replace, no
  * UDF), and DuckDB SQL text (the oracle).
  */
object Escape {

  private val rules: Seq[(String, String)] =
    Seq("\\" -> "\\\\", "'" -> "\\'")

  /** Driver-side escaping for bounded artifact text. */
  def sqlLiteral(s: String): String =
    rules.foldLeft(s) { case (acc, (from, to)) => acc.replace(from, to) }

  /** Engine-side: same rewrite as a codegen'd Column expression. */
  def sqlLiteralCol(c: Column): Column =
    rules.foldLeft(c) { case (acc, (from, to)) =>
      // functions.replace does literal (non-regex) replacement
      replace(acc, lit(from), lit(to))
    }

  /** Oracle-side: identical rewrite in DuckDB SQL. */
  def sqlLiteralSql(expr: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    rules.foldLeft(expr) { case (acc, (from, to)) =>
      s"replace($acc, ${q(from)}, ${q(to)})"
    }
  }
}
