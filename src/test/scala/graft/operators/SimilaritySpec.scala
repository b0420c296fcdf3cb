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
