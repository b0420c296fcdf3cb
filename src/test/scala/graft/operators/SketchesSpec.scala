package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("misra-gries: planted heavy hitter survives with a bounded undercount") {
    // 10k copies of "hot" in a 15k-item stream, k=4 → threshold n/5 = 3k;
    // "hot" is way above it and MUST be reported with est >= 10k - 3k
    val hot = spark.range(10000).select(lit("hot").as("tkn"))
    val rest = spark.range(5000)
      .select(concat(lit("w"), (col("id") % 500)).as("tkn"))
    val stream = hot.unionAll(rest).repartition(8) // force multi-partition merges
    val out = stream.agg(graft.functions.mg_summary(col("tkn"), 4).as("cand"))
      .select(explode(col("cand")).as("c"))
      .select(col("c.token"), col("c.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.contains("hot"), s"heavy hitter lost: $out")
    assert(out("hot") <= 10000L, "MG must never overcount")
    assert(out("hot") >= 10000L - 3000L, s"undercount beyond n/(k+1): ${out("hot")}")
    assert(out.size <= 4, s"summary exceeded k: $out")
  }

  test("misra-gries: uniform stream reports nothing above threshold, bound still holds") {
    val uniform = spark.range(9000)
      .select(concat(lit("u"), (col("id") % 30)).as("tkn")).repartition(8)
    val out = uniform.agg(graft.functions.mg_summary(col("tkn"), 5).as("cand"))
      .select(explode(col("cand")).as("c"))
      .select(col("c.est")).as[Long].collect()
    // every estimate is an undercount of a 300-count token, floored at 1
    out.foreach(e => assert(e >= 1L && e <= 300L))
  }

  test("heavyHitters graded contract holds on the real documents table") {
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val row = Sketches.heavyHitters(docs, "text", k = 8).collect().head
    assert(row.getAs[Boolean]("all_heavy_covered"))
    assert(row.getAs[Boolean]("est_within_bound"))
    assert(row.getAs[Long]("n_tokens") > 0)
  }

  test("mg_summary is available on the SQL surface") {
    graft.functions.registerAll(spark)
    val n = spark.sql(
      """SELECT size(mg_summary(c, 4)) FROM VALUES ('a'),('a'),('b'),('c') AS t(c)"""
    ).as[Int].collect().head
    assert(n >= 1 && n <= 4)
  }

  test("sketch pair: hll and percentile stay within tolerance on real data") {
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val v = Sketches.vocabSize(docs, "text").collect().head
    assert(math.abs(v.getLong(1) - v.getLong(0)).toDouble <= v.getLong(0) * 0.1)
    val m = Sketches.tokenMedian(docs, "text").collect().head
    assert(math.abs(m.getDouble(1) - m.getDouble(0)) <= m.getDouble(0) * 0.05)
  }
}
