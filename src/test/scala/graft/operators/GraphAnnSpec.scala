package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Sharded NSW graph index: build determinism, navigability under
  * content-ordered insertion (stratified beam seeding + the
  * diversity-heuristic bridge property), re-clustering of disturbed
  * layouts, persisted-index equality, result-shape contracts, and the
  * scaling-relevant sublinearity property (visits are ef-bounded — flat
  * while the corpus grows).
  */
class GraphAnnSpec extends SparkTestBase {

  /** `n` vectors in `clusters` well-separated clusters, ids CONTENT-ORDERED
    * (cluster 0 first) — the insertion order that collapses plain best-sim
    * pruning. dim 8; member = one-hot(cluster) + small deterministic noise.
    */
  private def clustered(n: Int, clusters: Int): DataFrame = {
    import spark.implicits._
    val dim = 8
    require(clusters <= dim)
    (0 until n).map { id =>
      val c = id * clusters / n // content-ordered: block of ids per cluster
      val v = Array.tabulate(dim) { j =>
        val base = if (j == c) 1.0f else 0.0f
        base + ((id * 31 + j) % 7) * 0.002f
      }
      (id.toLong, v)
    }.toDF("id", "vec")
  }

  test("build is deterministic: two builds produce identical edge sets") {
    val corpus = clustered(200, 4)
    def edges(g: DataFrame) =
      g.select(col("id"), col("shard"), explode(col("neighbors")).as("nbr"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val g1 = GraphAnn.buildGraph(corpus, "id", "vec", shards = 3)
    val g2 = GraphAnn.buildGraph(corpus, "id", "vec", shards = 3)
    assert(edges(g1) == edges(g2))
    assert(g1.count() == 200)
  }

  test("content-ordered corpus stays navigable (bridges survive pruning)") {
    // ONE shard: entry node is in cluster 0, queries live in the LAST
    // cluster — the walk must cross every cluster boundary through edges
    // the diversity heuristic retained
    val corpus = clustered(400, 4)
    val graph = GraphAnn.buildGraph(corpus, "id", "vec", shards = 1)
    val queries = corpus.filter(col("id") >= 350 && col("id") % 25 === 0)
    val ann = GraphAnn.searchGraph(graph, queries, "id", "vec", k = 5, ef = 16)
      .select("query_id", "neighbor_id")
    val truth = Similarity.bruteForceTopK(corpus, queries, "id", "vec", 5)
      .select("query_id", "neighbor_id")
    val nQ = queries.count()
    val found = truth.join(ann, Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(nQ > 0)
    assert(found == nQ * 5, s"recall ${found.toDouble / (nQ * 5)} < 1.0")
  }

  test("result shape: self excluded, at most k rows per query, rnk dense") {
    val corpus = clustered(120, 3)
    val graph = GraphAnn.buildGraph(corpus, "id", "vec", shards = 2)
    val queries = corpus.filter(col("id") % 30 === 0)
    val res = GraphAnn.searchGraph(graph, queries, "id", "vec", k = 4, ef = 8)
    assert(res.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val perQ = res.groupBy("query_id").agg(count("*").as("c"),
      max("rnk").as("mx"), min("rnk").as("mn")).collect()
    perQ.foreach { r =>
      assert(r.getLong(1) <= 4)
      assert(r.getInt(2) <= 4 && r.getInt(3) == 1)
    }
  }

  test("persisted index searches identically to the in-memory graph") {
    val corpus = clustered(300, 4)
    val graph = GraphAnn.buildGraph(corpus, "id", "vec", shards = 3)
    val queries = corpus.filter(col("id") % 50 === 7)
    val direct = GraphAnn.searchGraph(graph, queries, "id", "vec", k = 5, ef = 12)
    val dir = java.nio.file.Files.createTempDirectory("graph_spec").toString
    try {
      GraphAnn.graphWriteIndex(graph, dir)
      val fromDisk = GraphAnn.searchGraph(GraphAnn.graphReadIndex(spark, dir),
        queries, "id", "vec", k = 5, ef = 12)
      assert(direct.exceptAll(fromDisk).count() == 0)
      assert(fromDisk.exceptAll(direct).count() == 0)
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("a disturbed partitioning is re-clustered, never half-searched") {
    val corpus = clustered(200, 2)
    // 1-shard graph scattered across 4 hash partitions: every partition
    // sees a fragment of shard 0 with edges into the other fragments —
    // searchShards must re-cluster by shard and return results identical
    // to the intact layout (the old contract threw here; silent
    // half-graph search was the failure mode both contracts exclude)
    val graph = GraphAnn.buildGraph(corpus, "id", "vec", shards = 1)
    val broken = graph.repartition(4, col("id"))
    val queries = corpus.filter(col("id") % 40 === 3)
    val intact = GraphAnn.searchGraph(graph, queries, "id", "vec", k = 3, ef = 8)
    val healed = GraphAnn.searchGraph(broken, queries, "id", "vec", k = 3, ef = 8)
    assert(intact.exceptAll(healed).count() == 0)
    assert(healed.exceptAll(intact).count() == 0)
    assert(healed.count() > 0)
  }

  test("search straight off graphReadIndex adds NO exchange (plan-asserted)") {
    val corpus = clustered(240, 3)
    val graph = GraphAnn.buildGraph(corpus, "id", "vec", shards = 3)
    val queries = corpus.filter(col("id") % 60 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graph_plan").toString
    try {
      GraphAnn.graphWriteIndex(graph, dir)
      val loaded = GraphAnn.graphReadIndex(spark, dir)
      val plan = GraphAnn.searchShards(loaded, queries, "id", "vec", k = 3, ef = 8)
        .queryExecution.sparkPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      // exactly the index-load repartition — a lambda-keyed groupByKey
      // would append a synthetic key and re-shuffle the whole index here
      assert(exchanges == 1, s"expected 1 exchange (index load), got $exchanges:\n$plan")
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("visits are ef-bounded: corpus grows 4x, visited stays ~flat") {
    // the property that makes the index sublinear at scale: the beam's
    // work tracks ef and degree, not corpus size
    def avgVisited(n: Int): Double = {
      val corpus = clustered(n, 4)
      val graph = GraphAnn.buildGraph(corpus, "id", "vec", shards = 1)
      val queries = corpus.filter(col("id") % (n / 4) === n / 8)
      GraphAnn.searchShards(graph, queries, "id", "vec", k = 5, ef = 12)
        .agg(avg(col("visited"))).collect()(0).getDouble(0)
    }
    val small = avgVisited(300)
    val large = avgVisited(1200)
    assert(large < small * 2.0,
      s"visited grew ${large / small}x while the corpus grew 4x")
    assert(large < 600, s"visited $large is not sublinear in n=1200")
  }

  test("degenerate corpora: empty graph and single-node shard") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    val g0 = GraphAnn.buildGraph(empty, "id", "vec", shards = 2)
    assert(g0.count() == 0)
    val one = Seq((7L, Array(1.0f, 0.0f))).toDF("id", "vec")
    val g1 = GraphAnn.buildGraph(one, "id", "vec", shards = 2)
    assert(g1.count() == 1)
    // the only node is the query itself: self-excluded → empty result
    val res = GraphAnn.searchGraph(g1, one, "id", "vec", k = 3, ef = 4)
    assert(res.count() == 0)
  }
}
