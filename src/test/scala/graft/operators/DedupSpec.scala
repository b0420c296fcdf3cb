package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "THE  quick brown fox jumps over the lazy dog"),  // exact dup of 1 (canonical)
    (4L, "completely different words entirely here now")
  ).toDF("doc_id", "text")

  test("exact dedup groups canonical-equal docs, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
    val dupGroup = out.filter(col("dup_count") > 1).collect()
    assert(dupGroup.length == 1)
    assert(dupGroup.head.getAs[Long]("keep_id") == 1L)
    assert(dupGroup.head.getAs[Long]("dup_count") == 2L)
  }

  test("jaccard: exact set similarity") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(Dedup.jaccard(col("x"), col("y")).as("j"))
    assert(math.abs(df.as[Double].collect().head - 0.5) < 1e-9)
  }

  test("ngramJaccardPairs finds the near-dup pair above threshold") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5, maxId = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("minhashLsh surfaces near-dups and exact-verifies (no false positives)") {
    val out = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleK = 2, numHashes = 32, bands = 16, threshold = 0.5)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 3L)),
      s"expected a near-dup pair, got $pairs")
    // verification step guarantees: every emitted pair really ≥ threshold
    out.collect().foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
  }

  test("lsh banding shuffle carries ids only (tokens re-joined after)") {
    val plan = Dedup.minhashLsh(docs, "doc_id", "text").queryExecution.optimizedPlan.toString
    // the exploded band/bucket relation must not include the token arrays
    assert(!plan.contains("CartesianProduct"))
  }

  test("word_shingles kernel matches the builtin shingles formulation on real docs") {
    val real = spark.read.parquet(sfDir + "/documents.parquet")
    val kernel = real.select(graft.functions.word_shingles(col("text"), 3).as("x"))
    val hof = real.select(Dedup.shingles(col("text"), 3).as("x"))
    assert(kernel.exceptAll(hof).count() == 0)
    assert(hof.exceptAll(kernel).count() == 0)
  }

  test("simhashPairs: identical docs have hamming 0") {
    val two = Seq((1L, "same exact text body"), (2L, "same exact text body"),
      (3L, "another unrelated document")).toDF("doc_id", "text")
    val out = Dedup.simhashPairs(two, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("degenerate corpus: 10k identical docs complete without a quadratic pair explosion") {
    // every doc has the same signature → one over-full bucket per band and
    // per chunk → dropped by the size cap (a 10k-doc bucket would otherwise
    // explode into ~50M pairs); the capped aggregate also bounds the
    // reducer's buffer at cap+1 ids, so this completes scan-bound
    val many = spark.range(10000).select(col("id").as("doc_id"),
      lit("all the same text body repeated here").as("text"))
    assert(Dedup.minhashLsh(many, "doc_id", "text").count() == 0L)
    assert(Dedup.simhashPairs(many, "doc_id", "text").count() == 0L)
  }

  test("bucket cap: small identical groups still pair up, over-full buckets drop") {
    import spark.implicits._
    val emb = (1 to 50).map(i => (i.toLong, Array(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val found = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.99, planes = 4, dims = 3)
    assert(found.count() == 50L * 49 / 2)
    val capped = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.99,
      planes = 4, dims = 3, maxBucketSize = 10)
    assert(capped.count() == 0L)
  }

  test("nearDupClusters: chain merges to one min-labeled component; corpus keeps singletons") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a_id", "b_id")
    val m = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))

    val corpus = spark.range(6).select(col("id").as("doc_id"))
    val lab = Dedup.clusterCorpus(corpus, "doc_id", Seq((1L, 2L)).toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("embeddingNearDup finds identical vectors") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.99, planes = 4, dims = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("fuzzyDupPairs: typo clone found at its edit distance; permutation is not a fuzzy dup") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brewn fox jumps over the lazy dog"),  // 1 substitution
      (3L, "dog lazy the over jumps fox brown quick the"))  // permutation: far in edits
      .toDF("doc_id", "text")
    val pairs = Dedup.fuzzyDupPairs(corpus, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1L)))
  }

  test("exactByPriority: lowest priority wins, then smallest id") {
    val tagged = Seq(
      (1L, "same body", 2L),
      (2L, "same body", 1L),   // better priority → wins
      (3L, "same body", 1L),   // same priority, larger id → loses
      (4L, "unique body", 9L)).toDF("doc_id", "text", "prio")
    val out = Dedup.exactByPriority(tagged, "doc_id", "text", col("prio"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((2L, 1L, 3L), (4L, 9L, 1L)))
  }

  test("duplicateSpans: per-doc shared-shingle census incl. whole-text fallback") {
    // k=8 shingles: docs 1/2 share the 8-token prefix, docs 1/3 share the
    // 8-token suffix; doc 4 is <8 tokens → one unique whole-text shingle
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1.0),    // both shingles shared (prefix w/ 2, suffix w/ 3)
      (2L, 2L, 1L, 0.5),
      (3L, 2L, 1L, 0.5),
      (4L, 1L, 0L, 0.0)))
  }

  test("duplicateSpans: empty-text docs are absent; minDocs raises the bar") {
    val withEmpty = docs.union(Seq((9L, "   ")).toDF("doc_id", "text"))
    val ids = Dedup.duplicateSpans(withEmpty, "doc_id", "text", k = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 4L))
    // minDocs=3: no shingle occurs in 3 docs → zero duplicated spans
    val strict = Dedup.duplicateSpans(docs, "doc_id", "text", k = 8, minDocs = 3)
    assert(strict.agg(sum("n_dup_spans")).as[Long].collect().head == 0L)
  }

  test("semanticDedup: in-cell verification finds the planted dup, nothing else") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),   // centroid of cell 1
      (2L, Array(0.0f, 1.0f)),   // centroid of cell 2
      (3L, Array(1.0f, 0.0f)),   // identical to 1 → same cell, cosine 1
      (4L, Array(0.6f, 0.8f)))   // cell 2, but cosine 0.8 < bar
      .toDF("vec_id", "embedding")
    val pairs = Dedup.semanticDedup(emb, "vec_id", "embedding",
      cells = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 3L, 1.0)))
  }

  test("incremental dedup vs persisted index: index side joins without any exchange") {
    Dedup.writeFingerprintIndex(docs, "doc_id", "text", "fp_idx_test", buckets = 4)
    try {
      val batch = Seq(
        (15L, "a brand new document body"),
        (16L, "the  QUICK brown fox jumps over the lazy dog"), // canonical dup of corpus doc 1
        (17L, "a brand new document body"),                    // within-batch dup of 15
        (18L, "another fresh one entirely")).toDF("doc_id", "text")
      val out = Dedup.dedupAgainstIndex(batch, "doc_id", "text", "fp_idx_test")
      assert(out.select("doc_id").as[Long].collect().toSet == Set(15L, 18L))
      // the corpus-sized index must never sit under a shuffle — only the
      // batch side pays exchanges (AQE off so the plan tree is inspectable,
      // as in BucketedSpec)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val p = Dedup.dedupAgainstIndex(batch, "doc_id", "text", "fp_idx_test")
        val exchanges = p.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(exchanges.nonEmpty, "expected batch-side exchanges")
        assert(!exchanges.exists(_.toString.contains("fp_idx_test")),
          s"index side shuffled:\n${p.queryExecution.executedPlan}")
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")

      // append accepted docs, re-ingest the same batch → everything dropped
      Dedup.appendFingerprintIndex(out, "doc_id", "text", "fp_idx_test", buckets = 4)
      assert(Dedup.dedupAgainstIndex(batch, "doc_id", "text", "fp_idx_test").count() == 0L)
    } finally spark.sql("DROP TABLE IF EXISTS fp_idx_test")
  }

  test("nearDupClustersResult: long-path graph reports convergence honestly") {
    // path 0-1-2-...-12: the min label moves ONE hop per round, so the
    // component diameter bounds the rounds needed — the adversarial case
    // for any fixed round cap
    val path = (0L until 12L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val capped = Dedup.nearDupClustersResult(path, maxRounds = 3)
    assert(!capped.converged, "3 rounds cannot converge a diameter-12 path")
    assert(capped.rounds == 3)
    // unconverged labels are still a valid refinement: labels are component members
    assert(capped.labels.collect().forall(r => r.getLong(1) <= r.getLong(0)))
    val full = Dedup.nearDupClustersResult(path, maxRounds = 50)
    assert(full.converged && full.rounds < 50)
    val labels = full.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 13 && labels.values.forall(_ == 0L),
      s"expected one cluster rooted at 0, got $labels")
  }

  test("incremental near-dup vs LSH band index: clone caught across ingests, index exchange-free") {
    Dedup.writeLshBandIndex(docs, "doc_id", "text", "lsh_idx_test",
      shingleK = 2, numHashes = 32, bands = 16, buckets = 4)
    try {
      // batch 1: one fresh doc — accepted, appended to the index
      val batch1 = Seq((10L, "some wholly original content arrives here today"))
        .toDF("doc_id", "text")
      assert(Dedup.nearDupAgainstIndex(batch1, "doc_id", "text", "lsh_idx_test",
        docs, shingleK = 2, numHashes = 32, bands = 16, threshold = 0.6).count() == 0L)
      Dedup.appendLshBandIndex(batch1, "doc_id", "text", "lsh_idx_test",
        shingleK = 2, numHashes = 32, bands = 16, buckets = 4)

      // batch 2: a near-clone of a CORPUS doc and one of the BATCH-1 doc —
      // the second is only catchable because the append made batch 1 indexed
      val verifyRel = docs.unionByName(batch1)
      val batch2 = Seq(
        (20L, "the quick brown fox jumps over the lazy dog"), // = corpus doc 1
        (21L, "some wholly original content arrives here today some"), // clone of 10
        (22L, "nothing like anything indexed before at all")).toDF("doc_id", "text")
      val hits = Dedup.nearDupAgainstIndex(batch2, "doc_id", "text", "lsh_idx_test",
        verifyRel, shingleK = 2, numHashes = 32, bands = 16, threshold = 0.99)
        .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
      assert(hits.contains((1L, 20L)), s"corpus clone not caught: $hits")
      assert(hits.contains((10L, 21L)), s"batch-1 clone not caught (append broken): $hits")
      assert(!hits.exists(_._2 == 22L), s"false positive on fresh doc: $hits")

      // the corpus-sized index side must never sit under a shuffle
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val p = Dedup.nearDupAgainstIndex(batch2, "doc_id", "text", "lsh_idx_test",
          verifyRel, shingleK = 2, numHashes = 32, bands = 16, threshold = 0.99)
        val exchanges = p.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        // raw index rows must never cross an exchange: any exchange whose
        // subtree reads the index must sit ABOVE the candidate fan-out
        // (explode of the capped id lists), i.e. it moves only the bounded
        // (batch_id, corpus_id) pair relation — never the index itself
        exchanges.filter(_.toString.contains("lsh_idx_test")).foreach { e =>
          assert(e.toString.contains("explode(ids"),
            s"raw index rows crossed an exchange:\n$e")
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    } finally spark.sql("DROP TABLE IF EXISTS lsh_idx_test")
  }

  test("semanticDedup: a degenerate cell is capped, never a pair explosion") {
    val many = spark.range(5000).select(col("id").as("vec_id"),
      array(lit(1.0f), lit(0.0f)).as("embedding"))
    val capped = Dedup.semanticDedup(many, "vec_id", "embedding",
      cells = 4, threshold = 0.99, maxCellSize = 100)
    assert(capped.count() == 0L)
  }

  test("LSH band index: mismatched parameters fail loudly, never silently match nothing") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text")
    Dedup.writeLshBandIndex(docs, "doc_id", "text", "lsh_params_test",
      shingleK = 2, numHashes = 32, bands = 16, buckets = 4)
    try {
      val batch = Seq((10L, "a b c d e")).toDF("doc_id", "text")
      val e = intercept[IllegalArgumentException] {
        Dedup.nearDupAgainstIndex(batch, "doc_id", "text", "lsh_params_test",
          docs, shingleK = 2, numHashes = 32, bands = 32) // wrong bands
      }
      assert(e.getMessage.contains("bands=16"))
      val e2 = intercept[IllegalArgumentException] {
        Dedup.appendLshBandIndex(batch, "doc_id", "text", "lsh_params_test",
          shingleK = 3, numHashes = 32, bands = 16, buckets = 4) // wrong shingleK
      }
      assert(e2.getMessage.contains("shingleK=2"))
      // matching params still work, and survive a compaction (the swap
      // carries the graft.* properties onto the new table)
      Dedup.compactLshBandIndex(spark, "lsh_params_test")
      val hits = Dedup.nearDupAgainstIndex(batch, "doc_id", "text", "lsh_params_test",
        docs, shingleK = 2, numHashes = 32, bands = 16, threshold = 0.9)
      assert(hits.collect().map(_.getLong(1)).toSet == Set(1L))
    } finally spark.sql("DROP TABLE IF EXISTS lsh_params_test")
  }

  test("nearDupAgainstIndex: a batch over the row budget fails fast, before the broadcast") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text")
    Dedup.writeLshBandIndex(docs, "doc_id", "text", "lsh_budget_test",
      shingleK = 2, numHashes = 32, bands = 16, buckets = 4)
    try {
      val bigBatch = spark.range(50).selectExpr(
        "id AS doc_id", "concat('doc number ', id, ' body text') AS text")
      val e = intercept[IllegalArgumentException] {
        Dedup.nearDupAgainstIndex(bigBatch, "doc_id", "text", "lsh_budget_test",
          docs, shingleK = 2, numHashes = 32, bands = 16, maxBatchRows = 10)
      }
      assert(e.getMessage.contains("maxBatchRows"))
      // a batch within budget still works end-to-end
      val ok = Dedup.nearDupAgainstIndex(
        Seq((10L, "a b c d e")).toDF("doc_id", "text"), "doc_id", "text",
        "lsh_budget_test", docs, shingleK = 2, numHashes = 32, bands = 16,
        threshold = 0.9, maxBatchRows = 10)
      assert(ok.collect().map(_.getLong(1)).toSet == Set(1L))
    } finally spark.sql("DROP TABLE IF EXISTS lsh_budget_test")
  }

  test("LSH band index: stripped graft.lsh.* properties refuse validation, not skip it") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text")
    Dedup.writeLshBandIndex(docs, "doc_id", "text", "lsh_noprops_test",
      shingleK = 2, numHashes = 32, bands = 16, buckets = 4)
    try {
      spark.sql("ALTER TABLE lsh_noprops_test UNSET TBLPROPERTIES " +
        "('graft.lsh.shingleK', 'graft.lsh.numHashes', 'graft.lsh.bands')")
      val batch = Seq((10L, "a b c d e")).toDF("doc_id", "text")
      val e = intercept[IllegalStateException] {
        Dedup.nearDupAgainstIndex(batch, "doc_id", "text", "lsh_noprops_test",
          docs, shingleK = 2, numHashes = 32, bands = 16)
      }
      assert(e.getMessage.contains("graft.lsh.shingleK"))
      // the documented backfill path restores usability
      spark.sql("ALTER TABLE lsh_noprops_test SET TBLPROPERTIES " +
        "('graft.lsh.shingleK'='2', 'graft.lsh.numHashes'='32', 'graft.lsh.bands'='16')")
      val hits = Dedup.nearDupAgainstIndex(batch, "doc_id", "text", "lsh_noprops_test",
        docs, shingleK = 2, numHashes = 32, bands = 16, threshold = 0.9)
      assert(hits.collect().map(_.getLong(1)).toSet == Set(1L))
    } finally spark.sql("DROP TABLE IF EXISTS lsh_noprops_test")
  }

  test("semanticDedup on an empty corpus returns empty, not a crash") {
    val empty = spark.range(0).select(col("id").as("vec_id"),
      array(lit(1.0f)).as("embedding"))
    assert(Dedup.semanticDedup(empty, "vec_id", "embedding",
      cells = 4, threshold = 0.9).count() == 0L)
  }

  test("containmentPairs: embedded quote scores 1.0 from the short side, low jaccard") {
    val corpus = Seq(
      (1L, "alpha beta gamma"), // fully contained in 2
      (2L, "intro alpha beta gamma middle words closing tail ending finale"),
      (3L, "nothing shared here at all")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(corpus, "doc_id", "text",
        threshold = 0.9, maxId = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == 1)
    val (a, b, ab, ba) = out.head
    assert((a, b) == ((1L, 2L)))
    assert(ab == 1.0)       // all of doc 1's tokens appear in doc 2
    assert(ba == 0.3)       // 3 of 10
    // the same pair under symmetric jaccard sits far below the threshold
    val j = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.9, 100L).count()
    assert(j == 0L)
  }

  test("corpusDiff: NULL text is a present state — NULL→NULL unchanged, NULL→text changed") {
    val before = Seq((1L, None: Option[String], "s"), (2L, None: Option[String], "s"))
      .toDF("doc_id", "text", "source")
    val after = Seq((1L, None: Option[String], "s"), (2L, Option("now set"), "s"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.corpusDiff(before, after, "doc_id", "text", "source")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("unchanged" -> 1L, "changed" -> 1L))
  }

  test("corpusDiff: added/removed/changed/unchanged partition the union of ids") {
    val before = Seq(
      (1L, "same", "s1"), (2L, "will change", "s1"), (3L, "will vanish", "s2")
    ).toDF("doc_id", "text", "source")
    val after = Seq(
      (1L, "same", "s1"), (2L, "changed!", "s1"), (4L, "brand new", "s2")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.corpusDiff(before, after, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("s1", "unchanged") -> 1L, ("s1", "changed") -> 1L,
      ("s2", "removed") -> 1L, ("s2", "added") -> 1L))
  }

  test("removeDuplicateSpans cuts shared spans, keeps unique text, normalizes whitespace") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta one two three unique tail here"),
      (2L, "intro words alpha beta gamma delta one two three closing"),
      (3L, "totally unrelated content that shares no span at all ok"),
      (4L, "tiny doc"), // shorter than k: untouched
      (5L, "")          // empty: survives as empty
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(corpus, "doc_id", "text", k = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap

    // docs 1+2 share "alpha beta gamma delta one two three" = 4 dup starts
    // of width 4 covering all 7 tokens of the shared run in each doc
    assert(out(1L) == ((10L, 7L, "unique tail here")))
    assert(out(2L) == ((10L, 7L, "intro words closing")))
    assert(out(3L) == ((10L, 0L, "totally unrelated content that shares no span at all ok")))
    assert(out(4L) == ((2L, 0L, "tiny doc")))
    assert(out(5L) == ((0L, 0L, "")))
  }

  test("removeDuplicateSpans: a doc that is entirely duplicated spans empties out") {
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),
      (3L, "x y z w v u")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(corpus, "doc_id", "text", k = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((6L, "")))
    assert(out(2L) == ((6L, "")))
    assert(out(3L) == ((0L, "x y z w v u")))
  }

  test("removeDuplicateSpans: span exchanges carry (doc_id, pos, hash) longs, never shingle text") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val spanExchanges = try {
      val q = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k = 2)
      assert(!q.queryExecution.optimizedPlan.toString.contains("CartesianProduct"))
      // every exchange BELOW the reassembly join (i.e. whose output lacks
      // the token array) must be fixed-width columns only — the exploded
      // span relation is (doc_id, pos, hash64), shingle strings stay in-row
      q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if !e.child.schema.fieldNames.contains("tk") => e.child.schema
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(spanExchanges.nonEmpty)
    // no StringType anywhere below: the only binary column is the bounded
    // per-doc collect_set partial buffer, and positions/hashes are ints
    spanExchanges.foreach { sch =>
      sch.fields.foreach(f => assert(
        !f.dataType.sql.contains("STRING"),
        s"string column ${f.name}: ${f.dataType} crossed a span exchange"))
    }
  }

  test("prefixJaccardPairs: equals brute force with zero candidate loss, and prunes") {
    import spark.implicits._
    // sparse corpus: 3 near-dup families plus unrelated docs
    val docs = (Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta zeta"),     // J(0,1)=4/6
      (2L, "alpha beta gamma delta epsilon"),  // J(0,2)=1.0
      (3L, "one two three four five six"),
      (4L, "one two three four five six"),     // J(3,4)=1.0
      (5L, "unrelated words entirely here")) ++
      (6 until 40).map(i => (i.toLong, s"solo$i filler$i noise$i"))).toDF("doc_id", "text")
    val out = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 2L), (3L, 4L)), s"got $out")
    // brute-force equality at a lower threshold too (J=2/3 pairs appear)
    val lo = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2.0 / 3, 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lo == brute, s"prefix join lost candidates: $brute vs $lo")
    // the pruning is real: candidates a small fraction of all pairs
    val toks = docs.select(col("doc_id"),
      array_distinct(TextAnalysis.tokens(col("text"))).as("toks"))
    val nCand = Dedup.prefixCandidates(toks, 9, 10).count()
    val nAll = 40L * 39 / 2
    assert(nCand <= nAll / 10, s"prefix filter pruned nothing: $nCand of $nAll")
  }

  test("lineDedup: keep-first global semantics, reassembly preserves original bytes") {
    val docs = Seq(
      (10L, "boiler\nunique ten\nboiler"),   // first doc: keeps pos-0 boiler, drops pos-2
      (20L, "boiler\nunique twenty"),        // later doc: boiler removed
      (30L, "boiler \nboiler"),              // trailing space normalizes to the same key
      (40L, "all alone"))                    // under-threshold line untouched
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text", minCount = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((10L, "boiler\nunique ten", 2L, 1L)))
    assert(out(1) == ((20L, "unique twenty", 1L, 1L)))
    // doc 30 loses BOTH occurrences (keeper lives in doc 10) — and had the
    // keeper landed here, the kept line would carry its original trailing
    // space, not the trimmed match key
    assert(out(2) == ((30L, "", 0L, 2L)))
    assert(out(3) == ((40L, "all alone", 1L, 0L)))
    // keeper choice is global-(doc_id,pos) deterministic under repartition
    val again = Dedup.lineDedup(docs.repartition(5), "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == out.toSeq)
  }

  test("cdcChunks: chunks tile the document, realign after an insertion, and honor minLen") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 20
    val docs = Seq((1L, base), (2L, "INSERTED-PREFIX " + base), (3L, ""))
      .toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs, "doc_id", "text", maskBits = 4, minLen = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // chunks tile: starts/lens are contiguous from byte 1 to the doc length
    Seq(1L, 2L).foreach { id =>
      val cs = ch.filter(_._1 == id).sortBy(_._2)
      assert(cs.nonEmpty)
      assert(cs.head._3 == 1L)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4, s"gap in doc $id")
        case _ =>
      }
      val n = docs.filter(col("doc_id") === id).select(
        length(encode(col("text"), "UTF-8"))).as[Int].collect().head
      assert(cs.last._3 + cs.last._4 - 1 == n, s"doc $id doesn't tile to $n")
    }
    // empty doc → zero chunks
    assert(!ch.exists(_._1 == 3L))
    // insertion robustness: once past the prefix, doc 2 re-aligns — the
    // majority of doc 1's chunk keys reappear in doc 2
    val h1 = ch.filter(_._1 == 1L).map(_._5).toSet
    val h2 = ch.filter(_._1 == 2L).map(_._5).toSet
    val sharedFrac = h1.intersect(h2).size.toDouble / h1.size
    assert(sharedFrac > 0.6, s"only ${sharedFrac * 100}% of chunks realigned")
    // minLen pushes boundaries apart (except the forced final chunk)
    val chMin = Dedup.cdcChunks(docs.filter(col("doc_id") === 1L),
        "doc_id", "text", maskBits = 4, minLen = 32)
      .collect().map(r => (r.getLong(1), r.getLong(3))).sortBy(_._1)
    assert(chMin.dropRight(1).forall(_._2 >= 32L),
      s"minLen violated: ${chMin.mkString(",")}")
    // identical input → identical segmentation under repartition
    val again = Dedup.cdcChunks(docs.repartition(7), "doc_id", "text", 4, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    assert(again == ch.map(t => (t._1, t._2, t._5)).toSet)
  }
}
