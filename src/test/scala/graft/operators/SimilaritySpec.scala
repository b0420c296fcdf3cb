package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val emb = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")

  test("cosine: unit axes") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    assert(math.abs(df.as[Double].collect().head) < 1e-9)
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0L),
      "vec_id", "embedding", 3)
      .select("neighbor_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("ivf search finds the same top neighbor as brute force on probed cells") {
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", cells = 2)
    val indexed = Similarity.assignCells(emb, "vec_id", "embedding", cents)
    assert(indexed.columns.contains("cell"))
    val out = Similarity.ivfSearch(indexed, emb.filter(col("vec_id") === 0L),
      cents, "vec_id", "embedding", nprobe = 2, k = 1)
      .select("neighbor_id").as[Long].collect()
    assert(out.toSeq == Seq(1L))
  }

  test("on-disk IVF index: probe scans only the probed cells' partitions") {
    val real = spark.read.parquet(sfDir + "/embeddings.parquet")
    val cents = Similarity.ivfCentroids(real, "vec_id", "embedding", cells = 16)
    val indexed = Similarity.assignCells(real, "vec_id", "embedding", cents)
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    Similarity.ivfWriteIndex(indexed, dir)

    // the index landed as one directory per cell
    val cellDirs = new java.io.File(dir).list().count(_.startsWith("cell="))
    assert(cellDirs == 16, s"expected 16 cell partitions, got $cellDirs")

    // a 4-cell probe read (the exact mechanism ivfSearchIndex drives)
    // selects exactly 4 partitions at the scan — planning-time pruning,
    // asserted on the physical scan's file listing
    def scanPartitions(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.selectedPartitions.partitionCount
      }.sum
    val pruned = Similarity.ivfProbeRead(spark, dir, Seq(0L, 3L, 7L, 11L))
    assert(scanPartitions(pruned) == 4,
      s"probe read scanned ${scanPartitions(pruned)} partitions, wanted 4")
    assert(scanPartitions(spark.read.parquet(dir)) == 16)

    // end-to-end: the on-disk probe path returns exactly the in-memory result
    val queries = real.filter(col("vec_id") === 42L)
    val out = Similarity.ivfSearchIndex(spark, dir, queries, cents,
      "vec_id", "embedding", nprobe = 4, k = 5)
    val memory = Similarity.ivfSearch(indexed, queries, cents,
      "vec_id", "embedding", nprobe = 4, k = 5)
    assert(out.collect().toSeq == memory.collect().toSeq,
      "on-disk probe result differs from the in-memory path")
  }

  test("bruteForceTopK plan has no window and no cartesian product") {
    val plan = Similarity.bruteForceTopK(emb, emb.limit(2), "vec_id", "embedding", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    assert(plan.contains("topk_pairs"), "bounded top-k aggregate missing")
  }

  test("ivf assignment is in-row: plan has no join, no window, no exchange before scan") {
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", cells = 2)
    val plan = Similarity.assignCells(emb, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window") && !plan.contains("Exchange"),
      s"ivf assign must be a pure scan:\n$plan")
  }
}
