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

  test("compact: appends leave multi-file buckets + local sorts; compaction elides both") {
    import spark.implicits._
    // sorted-bucket scan ordering is only REPORTED under the legacy conf
    // (SPARK-28738: correct only when every bucket is one file — which is
    // exactly the property compact restores); measure sorts under it
    def sortsUnderJoin(table: String, probe: String): Int = {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try {
        val joined = Bucketed.read(spark, table)
          .join(Bucketed.read(spark, probe), "k")
        joined.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.SortExec => s
        }.size
      } finally spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
    val gen1 = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val gen2 = (100L until 200L).map(i => (i, s"v$i")).toDF("k", "v")
    Bucketed.writeBucketed(gen1, "b_compact", "k", 4)
    Bucketed.writeBucketed((200L until 260L).map(i => (i, s"p$i")).toDF("k", "v"),
      "b_probe", "k", 4)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // append a second generation: every bucket now holds two files
      gen2.repartition(4, col("k")).write.mode("append").format("parquet")
        .bucketBy(4, "k").sortBy("k").saveAsTable("b_compact")
      val sortsBefore = sortsUnderJoin("b_compact", "b_probe")

      Bucketed.compact(spark, "b_compact", "k", 4)

      // one data file per bucket again, no rows lost, still exchange-free
      val files = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "b_compact")
        .listFiles().filter(_.getName.startsWith("part-")).map(_.getName).sorted
      assert(files.length == 4,
        s"expected 4 single-file buckets, got:\n${files.mkString("\n")}")
      assert(Bucketed.read(spark, "b_compact").count() == 200L)
      val joined = Bucketed.read(spark, "b_compact")
        .join(Bucketed.read(spark, "b_probe"), "k")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty, s"compacted join shuffles:\n${joined.queryExecution.executedPlan}")

      // the compacted side scans pre-sorted single-file buckets: strictly
      // fewer sorts than the multi-file plan needed
      val sortsAfter = sortsUnderJoin("b_compact", "b_probe")
      assert(sortsAfter < sortsBefore,
        s"compaction did not elide a sort (before=$sortsBefore after=$sortsAfter)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_compact")
      spark.sql("DROP TABLE IF EXISTS b_compact__compact")
      spark.sql("DROP TABLE IF EXISTS b_probe")
    }
  }

  test("recoverCompact heals a swap that died between DROP and RENAME") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    Bucketed.writeBucketed(df, "b_recover", "k", 4)
    try {
      // simulate the crash window: shadow written, live table dropped,
      // rename never ran
      Bucketed.writeBucketed(spark.table("b_recover"), "b_recover__compact", "k", 4)
      spark.sql("DROP TABLE `b_recover`")
      assert(!spark.catalog.tableExists("b_recover"))
      Bucketed.recoverCompact(spark, "b_recover")
      assert(spark.catalog.tableExists("b_recover"))
      assert(Bucketed.read(spark, "b_recover").count() == 50L)
      // idempotent on a healthy table
      Bucketed.recoverCompact(spark, "b_recover")
      assert(Bucketed.read(spark, "b_recover").count() == 50L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_recover")
      spark.sql("DROP TABLE IF EXISTS b_recover__compact")
    }
  }

  test("bucketCount reads the written spec from the catalog") {
    import spark.implicits._
    Bucketed.writeBucketed(Seq((1L, "a")).toDF("k", "v"), "b_count", "k", 8)
    try assert(Bucketed.bucketCount(spark, "b_count") == 8)
    finally spark.sql("DROP TABLE IF EXISTS b_count")
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
