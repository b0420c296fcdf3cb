package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the S8 multi-table star join
    * (revenue per nation) — scan, 3 joins, agg, sort in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.queries("q_sql_revenue_by_nation")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = QueryCatalog.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (xxhash64-based signatures) → driver records a rows-only check. */
  def oracleSql: Map[String, String] = QueryCatalog.oracleSql
}
