package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.functions.{Escape, Norm}
import graft.functions.Norm.{KLong, KStr, NormCol}

class NormSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("property: escaped literal unescapes back to the original") {
    // inverse of Escape's rules under default MySQL sql_mode: \\ -> \
    // and \' -> ' , scanning left to right
    def unescape(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 1 < s.length &&
          (s.charAt(i + 1) == '\\' || s.charAt(i + 1) == '\'')) {
          sb.append(s.charAt(i + 1)); i += 2
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
    val hostileChar = Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('\\', '\'',
      '"', ',', ' ', '*', '/'))
    val gen = Gen.listOf(hostileChar).map(_.mkString)
    val prop = Prop.forAll(gen) { s =>
      unescape(Escape.sqlLiteral(s)) == s
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("row checksum is invariant to partitioning and row order") {
    val normCols = Seq(NormCol("o_orderkey", KLong),
      NormCol("o_orderstatus", KStr))
    def sum(df: org.apache.spark.sql.DataFrame): String =
      df.agg(Norm.sparkRowChecksum(normCols).as("c"))
        .head.getString(0)
    val o = Tables.load(spark, sf, "orders")
    val base = sum(o.coalesce(1))
    assert(sum(o.repartition(13)) == base)
    assert(sum(o.orderBy(col("o_totalprice").desc)) == base)
  }

  test("sentinel and nullable norms agree except on NULL-vs-'NULL'") {
    import spark.implicits._
    val df = Seq("x", "", null, "NULL").toDF("v")
    val nc = NormCol("v", KStr)
    val rows = df.select(Norm.sparkNorm(nc).as("sentinel"),
      Norm.sparkNormNullable(nc).as("nullable")).collect()
    // "x" renders identically
    assert(rows(0).getString(0) == "x" && rows(0).getString(1) == "x")
    // '' and NULL: sentinel says "NULL", nullable keeps SQL NULL
    assert(rows(1).getString(0) == "NULL" && rows(1).isNullAt(1))
    assert(rows(2).getString(0) == "NULL" && rows(2).isNullAt(1))
    // the literal string "NULL": sentinel COLLAPSES it (the documented
    // checksum-only limitation), nullable preserves it
    assert(rows(3).getString(0) == "NULL" && rows(3).getString(1) == "NULL"
      && !rows(3).isNullAt(1))
  }
}
