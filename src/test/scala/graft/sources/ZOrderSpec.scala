package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("morton2 interleaves bits: hand-checked codes, monotone in both dims") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.morton2(col("a"), col("b")).as("z"))
      .as[Long].collect()
    assert(out.toSeq == Seq(0L, 1L, 2L, 3L, 0xFFFFFFFFL))
  }

  test("z-order layout: a 2-D box touches far fewer files than a 1-D sorted layout") {
    val li = spark.read.parquet(sfDir + "/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val files = 16

    val zDir = Files.createTempDirectory("zorder").toString
    ZOrder.writeZOrdered(li, "l_quantity", "l_extendedprice", zDir, files)
    // 1-D baseline: same file count, range-sorted by quantity only
    val sDir = Files.createTempDirectory("sorted1d").toString
    li.repartitionByRange(files, col("l_quantity"))
      .sortWithinPartitions("l_quantity")
      .write.mode("overwrite").parquet(sDir)

    def filesHit(dir: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir)
        .filter(pred)
        .select(input_file_name()).distinct().count()

    // the off-dimension predicate is where layouts differ: a
    // quantity-sorted layout spreads every price band across ALL files,
    // z-order keeps both dimensions locally clustered
    val priceBand = col("l_extendedprice").between(20000.0, 30000.0)
    val (zPrice, sPrice) = (filesHit(zDir, priceBand), filesHit(sDir, priceBand))
    assert(sPrice >= files - 1,
      s"baseline invalid: 1-D layout should spread the price band, hit $sPrice/$files")
    assert(zPrice < sPrice,
      s"z-order did not prune the off-dimension: z=$zPrice vs 1-D=$sPrice")

    // and the 2-D box stays concentrated under z-order
    val box = col("l_quantity").between(10.0, 15.0) && priceBand
    val zBox = filesHit(zDir, box)
    assert(zBox <= files / 2, s"box rows landed in $zBox of $files z-files")

    // and the layout loses nothing: same box aggregate both ways
    def boxCount(dir: String): Long =
      spark.read.parquet(dir)
        .filter(col("l_quantity").between(10.0, 15.0)
          && col("l_extendedprice").between(20000.0, 30000.0)).count()
    assert(boxCount(zDir) == boxCount(sDir))
  }

  test("writeZOrdered on an empty table writes an empty table, no NPE") {
    val dir = Files.createTempDirectory("zorder_empty").toString
    val empty = spark.range(0).selectExpr("CAST(id AS DOUBLE) a", "CAST(id AS DOUBLE) b")
    ZOrder.writeZOrdered(empty, "a", "b", dir, 4)
    assert(spark.read.parquet(dir).count() == 0L)
  }

  test("rank16 clamps and degenerate range maps to zero") {
    val out = Seq(-5.0, 0.0, 50.0, 100.0, 200.0).toDF("v")
      .select(ZOrder.rank16(col("v"), 0.0, 100.0).as("r")).as[Long].collect()
    assert(out(0) == 0L && out(1) == 0L && out(4) == 65535L)
    assert(out(2) == math.floor(50.0 / 100.0 * 65535.0).toLong)
    val degen = Seq(1.0).toDF("v")
      .select(ZOrder.rank16(col("v"), 7.0, 7.0).as("r")).as[Long].collect()
    assert(degen.head == 0L)
  }
}
