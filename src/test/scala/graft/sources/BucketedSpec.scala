package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational

class BucketedSpec extends SparkTestBase {

  test("bucketed tables join without any exchange (co-located join)") {
    val orders = Tables(spark, sfDir, "orders")
    val lineitem = Tables(spark, sfDir, "lineitem")
    Bucketed.writeBucketed(orders.select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", 4)
    Bucketed.writeBucketed(lineitem.select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 4)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.read(spark, "b_orders")
        .join(Bucketed.read(spark, "b_lineitem"), "o_orderkey")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted aggregation equals the plain aggregation") {
    val li = Tables(spark, sfDir, "lineitem")
    val salted = Relational.saltedSumCount(li, "l_returnflag", "l_quantity")
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1)), r.getLong(2)))
    val plain = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count("l_quantity").as("c"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1)), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }
}
