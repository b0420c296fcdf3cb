package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC interchange — the second columnar format of the exchange layer.
  *
  * Parquet is this engine's native table format; ORC is what a Hive/Trino
  * shop hands over. The contract mirrors [[JsonLines]]: `write` produces
  * self-describing shards, `read` takes the EXPLICIT expected schema so a
  * foreign writer's type drift (int vs bigint, missing column) surfaces as
  * an analysis error at the boundary instead of corrupting downstream
  * arithmetic.
  *
  * Scale: ORC is splittable and predicate-pushdown-capable in Spark's
  * native reader (min/max stripe stats serve the same role as parquet row
  * groups), so filters still reach the scan — the 100 TB property that a
  * row format like JSONL gives up. Compression is zstd (the modern default
  * for cold interchange data; codec rides in the stripe footer so readers
  * need no out-of-band config).
  */
object Orc {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").orc(path)

  /** Read with the expected schema enforced (by-name projection, the ORC
    * reader resolves columns positionally only for schema-less files —
    * ours carry names). Spark would silently read a column absent from
    * the files as all-NULL; the footer-schema check below turns that
    * drift into a loud boundary failure instead (footer read only — no
    * data scan).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val actual = spark.read.orc(path).schema.fieldNames.toSet
    val missing = schema.fieldNames.filterNot(actual.contains)
    require(missing.isEmpty,
      s"Orc.read: columns missing from $path: ${missing.mkString(", ")}")
    spark.read.schema(schema).orc(path)
  }
}
