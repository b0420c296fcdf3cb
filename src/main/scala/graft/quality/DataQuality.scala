package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dbt-style declarative data tests (schema.yml semantics —
  * dbt/reddit_dbt/models/example/schema.yml:10-22): `unique`, `not_null`,
  * `accepted_values`, generalized into a rule engine.
  *
  * Each rule compiles to one aggregate/filter plan; `check` runs them and
  * returns per-rule violation counts (0 = pass) plus a bounded sample of
  * offending rows, so a 100 TB validation is a handful of scans, not a
  * collect.
  */
object DataQuality {

  sealed trait Rule { def name: String; def violations(df: DataFrame): DataFrame }

  /** dbt `unique`: key values appearing more than once. */
  case class Unique(column: String) extends Rule {
    val name = s"unique($column)"
    def violations(df: DataFrame): DataFrame =
      df.groupBy(col(column).as("id"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
  }

  /** dbt `not_null`. */
  case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
    def violations(df: DataFrame): DataFrame = df.filter(col(column).isNull)
  }

  /** dbt `accepted_values`. */
  case class AcceptedValues(column: String, values: Seq[String]) extends Rule {
    val name = s"accepted_values($column)"
    def violations(df: DataFrame): DataFrame =
      df.filter(!col(column).isin(values.map(lit): _*) || col(column).isNull)
  }

  case class Result(rule: String, violationCount: Long, sample: Seq[String])

  /** Run all rules; sample at most `sampleRows` offending rows per rule.
    *
    * One full scan per rule (the count aggregate) plus an early-exit
    * `take(n)` for the sample — `take` stops reading partitions as soon as
    * it has n rows, so the sample never re-scans a 100 TB relation (and is
    * skipped entirely when sampleRows == 0 or the count is clean).
    */
  def check(df: DataFrame, rules: Seq[Rule], sampleRows: Int = 5): Seq[Result] =
    rules.map { r =>
      val v = r.violations(df)
      val n = v.count()
      val sample =
        if (n == 0 || sampleRows == 0) Seq.empty
        else v.take(sampleRows).map(_.toString).toSeq
      Result(r.name, n, sample)
    }

  def passes(df: DataFrame, rules: Seq[Rule]): Boolean =
    check(df, rules, sampleRows = 0).forall(_.violationCount == 0)
}
