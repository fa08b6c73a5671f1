package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("every registered query runs and the registry is consistent") {
    assert(Relational.oracles.keySet.subsetOf(Relational.queries.keySet))
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("q1 pricing summary aggregates all lineitem rows") {
    val df = Relational.q1PricingSummary(spark, sf)
    val total = df.agg(sum("count_order")).head.getLong(0)
    val expected = Tables.load(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02")).count()
    assert(total == expected)
  }

  test("j2 anti + j3 semi partition the key space sensibly") {
    val customers = Tables.load(spark, sf, "customer").count()
    val without = Relational.j2AntiJoin(spark, sf).count()
    val withOrders = Tables.load(spark, sf, "customer")
      .join(Tables.load(spark, sf, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(without + withOrders == customers)
  }

  test("a2 checksum is order-insensitive: shuffled input gives same sums") {
    val a = Relational.a2ChunkChecksum(spark, sf)
    val li = Tables.load(spark, sf, "lineitem").repartition(7, col("l_partkey"))
    val b = li.groupBy(floor(col("l_orderkey") / 1000).cast("long").as("chunk_id"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Norm.sparkRowChecksum(Relational.lineitemNorm).as("row_checksum"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("a3 guard bounds cover the whole key range") {
    val r = Relational.a3MinMaxGuard(spark, sf).head
    assert(r.getAs[Long]("min_key") <= r.getAs[Long]("max_key"))
  }

  test("w5 emits at most 3 rows per nation, ranked") {
    val df = Relational.w5TopPerGroup(spark, sf)
    val over = df.groupBy("c_nationkey").count().filter(col("count") > 3).count()
    assert(over == 0)
  }

  test("j7 salting stays on the shuffle path and is salt-invariant") {
    val df = Relational.j7SaltedSkewJoin(spark, sf)
    // the hint must hold: this is the pattern for joins too big to
    // broadcast, so the demo has to exercise a shuffle join
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.take(2000))
    // salt-invariance: the salted result equals the plain unsalted join
    val li = Tables.load(spark, sf, "lineitem").select(
      when(pmod(col("l_orderkey"), lit(10)) < 8, lit(0L))
        .otherwise(pmod(col("l_orderkey"), lit(25)).cast("long")).as("dim_key"),
      col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(12, 2)).as("price"))
    val nat = Tables.load(spark, sf, "nation")
      .select(col("n_nationkey").cast("long").as("dim_key"), col("n_name"))
    val plain = li.join(nat, "dim_key").groupBy("n_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price")).cast(org.apache.spark.sql.types.DecimalType(38, 2))
          .cast("string").as("revenue"))
    assert(df.exceptAll(plain).isEmpty && plain.exceptAll(df).isEmpty)
  }

  test("j8 bloom prefilter passes a superset; semi join restores exactness") {
    val orders = Tables.load(spark, sf, "orders")
    val small = Tables.load(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING" && col("c_nationkey") < 5)
      .select("c_custkey")
    val bf = small.stat.bloomFilter("c_custkey", 1 << 17, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContain(k))
    val prefiltered = orders.filter(mightContain(col("o_custkey"))).count()
    val exact = orders.join(small,
      col("o_custkey") === col("c_custkey"), "left_semi").count()
    // no false negatives ever; false positives bounded by fpp
    assert(prefiltered >= exact)
    assert(prefiltered <= orders.count())
    // and the registered query's count matches the exact semi join
    val total = Relational.j8BloomPrejoin(spark, sf)
      .agg(sum("n_orders")).head.getLong(0)
    assert(total == exact)
  }

  test("j6 banding is lossless: banded pairs == naive range-join pairs") {
    val banded = Relational.j6BandedRangeJoin(spark, sf)
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("epoch"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("epoch").as("e_epoch"))
    val view = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("epoch").as("v_epoch"))
    // the O(N·M) plan the banding replaces — fine at sf0.001, the
    // point of j6 is that it never runs at scale
    val naive = err.crossJoin(view)
      .filter(abs(col("e_epoch") - col("v_epoch")) <= 2)
      .select(col("error_id"), col("view_id"),
        (col("v_epoch") - col("e_epoch")).as("delta_s"))
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
  }
}
