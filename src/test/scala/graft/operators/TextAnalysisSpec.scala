package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens: whitespace split, empty and blank → empty array") {
    val df = Seq("a b  c", "", "   ", "one").toDF("t")
      .select(size(TextAnalysis.tokens(col("t"))).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(3, 0, 0, 1))
  }

  test("qualityScore: empty doc yields NULL ratios, not div-by-zero") {
    val df = Seq((1L, "the cat."), (2L, "")).toDF("id", "text")
    val rows = TextAnalysis.qualityScore(df, "id", "text")
      .orderBy("id").collect()
    assert(rows(0).getAs[Long]("n_tokens") == 2)
    assert(rows(0).getAs[Double]("stopword_ratio") == 0.5)
    assert(rows(0).getAs[Double]("punct_ratio") == math.round(1.0 / 8.0 * 10000) / 10000.0)
    assert(rows(1).getAs[Long]("n_tokens") == 0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("avg_token_len")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("stopword_ratio")))
  }

  test("langId kernel matches the pure-builtin formulation on real docs") {
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val kernel = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
    val hof = docs.select(col("doc_id"), TextAnalysis.langIdHof(col("text")).as("l"))
    assert(kernel.exceptAll(hof).count() == 0)
    assert(hof.exceptAll(kernel).count() == 0)
  }

  test("langId: marker words and CJK dominate; no signal → und") {
    val df = Seq(
      (1L, "the cat is on the mat"),
      (2L, "der Hund ist gut und das ist schön"),
      (3L, "电脑 很 好"),
      (4L, "zzz qqq")).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .orderBy("id").as[(Long, String)].collect().map(_._2)
    assert(out.toSeq == Seq("en", "de", "zh", "und"))
  }

  test("bpe tokenizer: contractions, digit runs, punctuation split") {
    val df = Seq("I'll add 42 items, ok?").toDF("t")
      .select(TextAnalysis.bpeTokens(col("t")).as("p"))
    val pieces = df.as[Seq[String]].collect().head
    // I | 'll | ' add' | ' 42' | ' items' | , | ' ok' | ?
    assert(pieces == Seq("I", "'ll", " add", " 42", " items", ",", " ok", "?"))
  }

  test("fingerprint is case/whitespace canonical") {
    val df = Seq(("A  B\tc", "a b c")).toDF("x", "y")
      .select((TextAnalysis.fingerprint(col("x")) === TextAnalysis.fingerprint(col("y"))).as("eq"))
    assert(df.as[Boolean].collect().head)
  }
}
