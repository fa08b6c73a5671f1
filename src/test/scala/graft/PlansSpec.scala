package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.CharsetConvert
import graft.plans.CharsetEncode

class PlansSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("native charset_encode matches the udf byte-for-byte") {
    import spark.implicits._
    CharsetEncode.register(spark)
    val df = CharsetConvert.fixtures.map(_._2).toDF("s")
    CharsetConvert.supported.foreach { cs =>
      val native = df.select(expr(s"hex(charset_encode(s, '$cs'))"))
        .collect().map(_.getString(0))
      val viaUdf = df.select(hex(CharsetConvert.encodeUdf(col("s"), lit(cs))))
        .collect().map(_.getString(0))
      assert(native.toSeq == viaUdf.toSeq, cs)
    }
  }

  test("charset_encode participates in whole-stage codegen") {
    CharsetEncode.register(spark)
    // a file-backed scan, so the projection really plans a codegen
    // stage (a LocalTableScan would constant-fold instead)
    val plan = Tables.load(spark, sf, "documents")
      .selectExpr("charset_encode(text, 'GBK') AS b")
      .queryExecution.executedPlan.toString
    // '*(1)' prefixes operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [charset_encode("), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // and it actually executes through the generated code path
    val n = Tables.load(spark, sf, "documents")
      .selectExpr("length(charset_encode(text, 'GBK')) AS n")
      .agg(sum(col("n"))).head.getLong(0)
    assert(n > 0)
  }

  test("unknown charset fails at analysis, not per-row at runtime") {
    import spark.implicits._
    CharsetEncode.register(spark)
    intercept[Exception] {
      Seq("x").toDF("s").select(expr("charset_encode(s, 'NOT_A_CS')"))
    }
    // dynamic (non-literal) charset is rejected toward the udf path
    intercept[Exception] {
      Seq(("x", "GBK")).toDF("s", "cs")
        .select(expr("charset_encode(s, cs)"))
    }
  }

  test("single-pass chunk summary equals the two-aggregate form") {
    val onePass = graft.operators.Relational.a2cSummaryOnePass(spark, sf)
    val twoAgg = graft.operators.Relational.a2ChunkChecksum(spark, sf)
    assert(onePass.exceptAll(twoAgg).isEmpty &&
      twoAgg.exceptAll(onePass).isEmpty)
  }
}
