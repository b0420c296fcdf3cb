package graft.quality

import graft.SparkTestBase
import graft.quality.DataQuality._

class DataQualitySpec extends SparkTestBase {
  import spark.implicits._

  private val good = Seq(("a", "en"), ("b", "de")).toDF("id", "lang")
  private val bad = Seq(("a", "en"), ("a", "xx"), (null, "de")).toDF("id", "lang")

  test("clean data passes unique/not_null/accepted_values") {
    assert(passes(good, Seq(Unique("id"), NotNull("id"),
      AcceptedValues("lang", Seq("en", "de")))))
  }

  test("violations are counted and sampled") {
    val rs = check(bad, Seq(Unique("id"), NotNull("id"),
      AcceptedValues("lang", Seq("en", "de"))))
    val byName = rs.map(r => r.rule -> r).toMap
    assert(byName("unique(id)").violationCount == 1)
    assert(byName("not_null(id)").violationCount == 1)
    assert(byName("accepted_values(lang)").violationCount == 1)
    assert(byName("unique(id)").sample.nonEmpty)
  }

  test("in_range and matches_regex compile into the same single-scan pass") {
    val df = Seq(("u1", 5.0), ("u2", -1.0), ("3x", 50.0), (null, 200.0))
      .toDF("uid", "score")
    val rs = check(df, Seq(
      Unique("uid"), InRange("score", 0d, 100d), MatchesRegex("uid", "^u[0-9]+$")))
    val byName = rs.map(r => r.rule -> r.violationCount).toMap
    assert(byName("in_range(score)") == 2)      // -1 and 200
    assert(byName("matches_regex(uid)") == 2)   // "3x" and null
    assert(byName("unique(uid)") == 0)
    // nulls pass in_range (dbt semantics — pair with NotNull to reject)
    assert(check(Seq((Option.empty[Double], "a")).toDF("v", "k"),
      Seq(InRange("v", 0d, 1d))).head.violationCount == 0)
  }

  test("writeAudited: observed metrics describe exactly the written rows, one pass") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 10L, "en"), (2L, 20L, "de"), (3L, 30L, "en"))
      .toDF("id", "n", "lang")
    val path = java.nio.file.Files.createTempDirectory("audit").toString + "/out"
    val metrics = DataQuality.writeAudited(df, path, Seq(
        "n_rows" -> count(lit(1)),
        "sum_n" -> sum(col("n")),
        "n_en" -> sum(when(col("lang") === "en", 1L).otherwise(0L))))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(metrics == Map("n_rows" -> "3", "sum_n" -> "60", "n_en" -> "2"),
      s"got $metrics")
    // the write really committed, and agrees with the metrics
    val back = spark.read.parquet(path)
    assert(back.count() == 3)
    assert(back.agg(sum("n")).collect().head.getLong(0) == 60L)
  }

  test("benfordAudit: digit extraction, dense rows, and both verdicts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // geometric series 2^(i/64) spans magnitudes multiplicatively ->
    // close to Benford -> not suspicious
    val benfordish = spark.range(0, 1280)
      .select(pow(lit(2.0), col("id") / lit(64.0)).as("v"))
    val ok = DataQuality.benfordAudit(benfordish, "v")
    val okRows = ok.collect()
    assert(okRows.length == 9, "audit must always be 9 dense rows")
    assert(okRows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    assert(!okRows.head.getAs[Boolean]("suspicious"),
      s"multiplicative data flagged: chi2=${okRows.head.getAs[Double]("chi2")}")
    // all-same-digit data is maximally non-Benford -> suspicious
    val flat = spark.range(0, 1000).select((col("id") % 5 + 910).as("v"))
    val bad = DataQuality.benfordAudit(flat, "v").collect()
    assert(bad.head.getAs[Boolean]("suspicious"))
    assert(bad.filter(_.getAs[Int]("digit") == 9).head
      .getAs[Long]("observed") == 1000L)
    assert(bad.filter(_.getAs[Int]("digit") != 9)
      .forall(_.getAs[Long]("observed") == 0L))
    // sub-1 and negative values are excluded from the digit census
    val edge = Seq(0.5d, -123.0d, 0.0d, 19.0d).toDF("v")
    val e = DataQuality.benfordAudit(edge, "v").collect()
    assert(e.map(_.getAs[Long]("n")).head == 1L)
  }
}
