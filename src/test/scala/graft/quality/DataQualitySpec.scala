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
}
