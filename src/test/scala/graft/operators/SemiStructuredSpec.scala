package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SemiStructuredSpec extends SparkTestBase {

  private def jsonDf(rows: String*) = {
    // inline rows via SQL VALUES (REPL/Java17-safe pattern used repo-wide)
    val values = rows.zipWithIndex
      .map { case (j, i) => s"($i, '${j.replace("'", "''")}')" }
      .mkString(", ")
    spark.sql(s"SELECT * FROM VALUES $values AS t(id, js)")
  }

  test("parseJson + shred extracts typed nested paths; missing paths are null") {
    val df = SemiStructured.parseJson(
      jsonDf("""{"a": {"b": 7}, "tags": ["x", "y"]}""", """{"a": {"b": 9}}"""),
      "js")
    val out = SemiStructured.shred(df, "v", Seq(
        ("b", "$.a.b", "long"), ("t1", "$.tags[1]", "string")))
      .orderBy("id").select("b", "t1").collect()
    assert(out.map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ==
      Seq((7L, Some("y")), (9L, None)))
  }

  test("strict parse fails loudly on malformed input; tolerant nulls it") {
    val bad = jsonDf("""{"k": 1}""", """{nope""")
    intercept[Exception] {
      SemiStructured.parseJson(bad, "js").select("v").collect()
    }
    val n = SemiStructured.parseJson(bad, "js", strict = false)
      .filter(col("v").isNull).count()
    assert(n == 1)
  }

  test("shred strict cast fails on type drift; tryShred nulls it") {
    val df = SemiStructured.parseJson(jsonDf("""{"k": "abc"}"""), "js")
    intercept[Exception] {
      SemiStructured.shred(df, "v", Seq(("k", "$.k", "long"))).collect()
    }
    val r = SemiStructured.tryShred(df, "v", Seq(("k", "$.k", "long")))
      .select("k").collect().head
    assert(r.isNullAt(0))
  }

  test("schemaCensus counts records per inferred shape") {
    val df = SemiStructured.parseJson(
      jsonDf("""{"k": 1}""", """{"k": 2}""", """{"k": 1, "x": "s"}"""), "js")
    val census = SemiStructured.schemaCensus(df, "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census.values.toSeq.sorted == Seq(1L, 2L), s"got $census")
  }

  test("variant extraction plan is zero-shuffle and stays in codegen") {
    val df = SemiStructured.shred(
      SemiStructured.parseJson(
        spark.range(100).selectExpr(
          """concat('{"k": ', id, '}') AS js"""), "js"),
      "v", Seq(("k", "$.k", "long")))
      .filter(col("k") > 10).select("k")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"variant shred shuffled:\n$p")
    // `*(n)` node prefixes mark whole-stage-codegen stages
    assert(p.contains("*(1)"), s"no codegen stage in plan:\n$p")
  }
}
