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

  test("native charset_decode inverts charset_encode, matches the udf") {
    import spark.implicits._
    CharsetEncode.register(spark)
    graft.plans.CharsetDecode.register(spark)
    val df = CharsetConvert.fixtures.map(_._2).toDF("s")
    CharsetConvert.supported.foreach { cs =>
      val native = df
        .select(expr(s"charset_decode(charset_encode(s, '$cs'), '$cs')"))
        .collect().map(_.getString(0))
      val viaUdf = df.select(CharsetConvert.decodeUdf(
        CharsetConvert.encodeUdf(col("s"), lit(cs)), lit(cs)))
        .collect().map(_.getString(0))
      assert(native.toSeq == viaUdf.toSeq, cs)
    }
    // Big5 is lossy on simplified CJK: decode must surface the '?'
    // replacement, not silently round-trip
    val lossy = Seq("中文测试").toDF("s")
      .selectExpr("charset_decode(charset_encode(s, 'Big5'), 'Big5') AS r")
      .head.getString(0)
    assert(lossy == "中文??")
  }

  test("charset_decode participates in whole-stage codegen") {
    CharsetEncode.register(spark)
    graft.plans.CharsetDecode.register(spark)
    val plan = Tables.load(spark, sf, "documents")
      .selectExpr("charset_decode(charset_encode(text, 'GBK'), 'GBK') AS t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [charset_decode(charset_encode("),
      plan)
    assert(!plan.contains("ScalaUDF"), plan)
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

  test("ChunkSummaryAgg 128-bit carry arithmetic equals BigInt under " +
    "any reduce/merge split") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.functions.ChunkSummaryAgg.{zero, reduce, merge, finish}
    // terms span the full 60-bit hash range so the low word overflows
    // roughly every 16 terms — the carry path is the test subject, not
    // a rare corner; the split point exercises merge at every ratio
    val gen = for {
      terms <- Gen.nonEmptyListOf(Gen.frequency(
        4 -> Gen.choose(0L, (1L << 60) - 1),
        1 -> Gen.const((1L << 60) - 1)))
      cut <- Gen.choose(0, terms.length)
    } yield (terms, cut)
    val prop = Prop.forAll(gen) { case (terms, cut) =>
      val (l, r) = terms.splitAt(cut)
      val merged = merge(l.foldLeft(zero)(reduce), r.foldLeft(zero)(reduce))
      val (n, sum) = finish(merged)
      n == terms.length &&
        sum == terms.map(BigInt(_)).sum.toString
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("native dot_product is bit-identical to the higher-order fold") {
    graft.plans.DotProduct.register(spark)
    val v = Tables.load(spark, sf, "embeddings")
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
    // same left-to-right IEEE fold ⇒ doubleToLongBits-identical, not
    // just approximately equal — the oracle hashes depend on that
    val both = v.select(
      expr("dot_product(v, v)").as("native"),
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0d, (a, x) -> a + x)")
        .as("hof"))
    val mismatches = both.filter(
      !(col("native") <=> col("hof"))).count()
    assert(mismatches == 0)
  }

  test("dot_product participates in whole-stage codegen") {
    graft.plans.DotProduct.register(spark)
    // array-level cast, NOT transform(x -> cast): lambda higher-order
    // functions are CodegenFallback and would break the stage
    val plan = Tables.load(spark, sf, "embeddings")
      .selectExpr(
        "dot_product(cast(embedding as array<double>), " +
          "cast(embedding as array<double>)) AS d")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dot_product("), plan)
  }

  test("dot_product rejects dimension mismatch instead of truncating") {
    import spark.implicits._
    graft.plans.DotProduct.register(spark)
    val ex = intercept[Exception] {
      Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
        .selectExpr("dot_product(a, b)").collect()
    }
    assert(ex.getMessage != null)
  }
}
