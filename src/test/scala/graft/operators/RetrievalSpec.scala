package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BM25 retrieval over the persisted postings index ([[Retrieval]]):
  * hand-computed scores, the append lifecycle, the distinct-query-term
  * contract, empty-doc exclusion from the corpus stats, and the
  * exchange-free index side of the probe join.
  */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  // N=3 (the empty doc must not count), total_len=9, avgdl=3;
  // df: apple 1, banana 2, cherry 2, durian 1
  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian"),
    (4L, "   ")).toDF("doc_id", "text")

  private def searched(queries: Seq[(Long, String)], k: Int = 10) = {
    Retrieval.writePostingsIndex(corpus, "doc_id", "text", "bm25_idx_test",
      buckets = 2)
    try Retrieval.bm25Search(spark, "bm25_idx_test",
        queries.toDF("query_id", "qtext"), "query_id", "qtext", k = k)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    finally {
      spark.sql("DROP TABLE IF EXISTS bm25_idx_test")
      spark.sql("DROP TABLE IF EXISTS bm25_idx_test__stats"): Unit
    }
  }

  test("hand-computed scores, ranking, and duplicate query terms counting once") {
    // "apple cherry apple": distinct terms {apple, cherry}; expected scores
    // computed by hand from the BM25 formula (k1=1.2, b=0.75, avgdl=3)
    val rows = searched(Seq((100L, "apple cherry apple")))
    assert(rows == Seq(
      (100L, 1L, 1L, 1L, 1.34864),
      (100L, 2L, 3L, 1L, 0.689339),
      (100L, 3L, 2L, 1L, 0.544215)))
  }

  test("single-term query, empty-text doc excluded from N and avgdl") {
    // idf(durian)=ln(2.5/1.5+1) uses N=3: if the whitespace-only doc
    // counted, N=4 would give ln(3.5/1.5+1)≈1.2528 and score 1.10248
    assert(searched(Seq((7L, "durian"))) == Seq((7L, 1L, 3L, 1L, 0.86313)))
  }

  test("no-match and empty queries produce no rows; k bounds output") {
    assert(searched(Seq((1L, "zzz"), (2L, "  "))).isEmpty)
    assert(searched(Seq((9L, "cherry")), k = 1) == Seq((9L, 1L, 3L, 1L, 0.689339)))
  }

  test("append lifecycle: built-then-appended index scores equal the one-shot index") {
    val queries = Seq((50L, "apple banana cherry durian")).toDF("query_id", "qtext")
    Retrieval.writePostingsIndex(corpus, "doc_id", "text", "bm25_full_test",
      buckets = 2)
    Retrieval.writePostingsIndex(corpus.filter(col("doc_id") <= 2),
      "doc_id", "text", "bm25_app_test", buckets = 2)
    Retrieval.appendPostingsIndex(corpus.filter(col("doc_id") > 2),
      "doc_id", "text", "bm25_app_test")
    try {
      val full = Retrieval.bm25Search(spark, "bm25_full_test", queries,
        "query_id", "qtext").orderBy("rank").collect().toSeq
      val app = Retrieval.bm25Search(spark, "bm25_app_test", queries,
        "query_id", "qtext").orderBy("rank").collect().toSeq
      assert(full == app && full.size == 3)
    } finally {
      Seq("bm25_full_test", "bm25_full_test__stats", "bm25_app_test",
        "bm25_app_test__stats").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t")): Unit
    }
  }

  test("phraseSearch: contiguous-occurrence matching incl. duplicate terms and overlaps") {
    // p1 holds "a b a" at bases 0 AND 2 (overlapping) — must emit ONE pair
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "x a b a y"),
      (3L, "b a b"),
      (4L, "a b")).toDF("doc_id", "text")
    Retrieval.writePositionalIndex(docs.filter(col("doc_id") <= 3),
      "doc_id", "text", "pos_idx_test", buckets = 2)
    Retrieval.appendPositionalIndex(docs.filter(col("doc_id") > 3),
      "doc_id", "text", "pos_idx_test")
    try {
      def search(qs: Seq[(Long, String)]) =
        Retrieval.phraseSearch(spark, "pos_idx_test",
            qs.toDF("query_id", "qtext"), "query_id", "qtext")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // duplicate-term phrase: offsets 0 and 2 are both 'a' — a doc with
      // just one 'a' adjacent to 'b' must NOT pass a term-count shortcut
      assert(search(Seq((10L, "a b a"))) == Set((10L, 1L), (10L, 2L)))
      assert(search(Seq((11L, "b a"))) == Set((11L, 1L), (11L, 2L), (11L, 3L)))
      // single-token phrase, multi-query batch, and the appended doc
      assert(search(Seq((12L, "y"), (13L, "a b"), (14L, "  "))) ==
        Set((12L, 2L), (13L, 1L), (13L, 2L), (13L, 3L), (13L, 4L)))
      // a phrase crossing what would be a doc boundary matches nothing
      assert(search(Seq((15L, "y b"))) == Set.empty)
    } finally spark.sql("DROP TABLE IF EXISTS pos_idx_test"): Unit
  }

  test("probe join: index side pays no exchange") {
    Retrieval.writePostingsIndex(corpus, "doc_id", "text", "bm25_plan_test",
      buckets = 2)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qt = Seq((1L, "cherry")).toDF("query_id", "term")
      val p = Retrieval.probe(
        graft.sources.Bucketed.read(spark, "bm25_plan_test"), qt)
      p.collect()
      val plan = p.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(!exchanges.exists(_.toString.contains("bm25_plan_test")),
        s"index side shuffled:\n$plan")
      assert(plan.toString.contains("BroadcastHashJoin"),
        s"expected a broadcast probe:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS bm25_plan_test")
      spark.sql("DROP TABLE IF EXISTS bm25_plan_test__stats"): Unit
    }
  }

  test("ndcgAtK: ideal ranking scores 1, swaps score less, no-positives scores 0") {
    import spark.implicits._
    val labels = Seq(
      ("q1", 1L, 3), ("q1", 2L, 2), ("q1", 3L, 1),
      ("q2", 1L, 0))  // q2 has judgments but no positive ones
      .toDF("query_id", "doc_id", "rel")
    val ideal = Seq(
      ("q1", 1L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L),
      ("q2", 1L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.ndcgAtK(ideal, labels, k = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("q1") == 1.0)
    assert(got("q2") == 0.0)
    // worst ordering of the same docs: strictly below 1, above 0
    val reversed = Seq(("q1", 3L, 1L), ("q1", 2L, 2L), ("q1", 1L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val r = Retrieval.ndcgAtK(reversed, labels, 10)
      .filter(col("query_id") === "q1").collect().head.getDouble(2)
    assert(r > 0 && r < 1, s"got $r")
    // hand arithmetic: dcg = 1/log2(2) + 3/log2(3) + 7/log2(4)
    val dcg = 1.0 / 1.0 + 3.0 / (math.log(3) / math.log(2)) + 7.0 / 2.0
    val idcg = 7.0 / 1.0 + 3.0 / (math.log(3) / math.log(2)) + 1.0 / 2.0
    assert(math.abs(r - dcg / idcg) < 1e-6, s"got $r want ${dcg / idcg}")
    // unlabeled retrieved docs gain nothing but don't crash the join
    val extra = Seq(("q1", 99L, 1L), ("q1", 1L, 2L)).toDF("query_id", "doc_id", "rank")
    val e = Retrieval.ndcgAtK(extra, labels, 10)
      .filter(col("query_id") === "q1").collect().head.getDouble(2)
    assert(e > 0 && e < 1)
  }

  test("rrfFuse: corroborated ids outrank single-list wins; fixed-point contributions exact") {
    import spark.implicits._
    // doc 1: rank 1 in A only; doc 2: rank 2 in both; doc 3: rank 3+1
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((2L, 2), (3L, 1)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank", kConst = 60, topK = 10)
      .collect().map(r => (r.getAs[Long]("item_id"), r.getAs[Long]("rrf_fp"),
        r.getAs[Long]("n_lists")))
    def c(r: Int) = math.round(1e9 / (60 + r))
    val expect = Seq(
      (3L, c(3) + c(1), 2L),   // 1/63 + 1/61
      (2L, c(2) + c(2), 2L),   // corroborated at rank 2 twice
      (1L, c(1), 1L))          // best single-list rank still loses to fusion
      .sortBy { case (id, s, _) => (-s, id) }
    assert(out.toSeq == expect)
    // both corroborated docs beat the single-list rank-1 doc
    assert(out.takeWhile(_._1 != 1L).forall(_._3 == 2L))
  }
}
