package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Plan-shape assertions: the properties that keep these operators fast at
  * 100 TB, checked against the actual physical plans on the driver parquet.
  */
class PlanQualitySpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter pushes down to the parquet scan") {
    val df = Relational.filterEq(Tables(spark, sfDir, "lineitem"), "l_returnflag", "R")
      .select("l_orderkey", "l_returnflag")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"),
      s"filter not pushed:\n$p")
  }

  test("projection prunes the read schema") {
    val df = Relational.project(Tables(spark, sfDir, "lineitem"), Seq("l_orderkey", "l_quantity"))
    val p = plan(df)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan reads more than the projection:\n$p")
  }

  test("upsert is a broadcast anti-join (big side never shuffles)") {
    val main = Tables(spark, sfDir, "orders")
    val staging = main.limit(10)
    val p = plan(Relational.upsert(main, staging, "o_orderkey"))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), s"no broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"main side shuffled for upsert:\n$p")
  }

  test("global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.topK(Tables(spark, sfDir, "orders"),
      col("o_totalprice"), col("o_orderkey"), 10))
    assert(p.contains("TakeOrderedAndProject"), s"top-k fell back to global sort:\n$p")
  }

  test("grouped aggregation is two-phase (partial before the exchange)") {
    val df = Relational.groupedSummary(Tables(spark, sfDir, "lineitem"),
      "l_returnflag", "l_extendedprice", "l_quantity")
    val p = plan(df)
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"no partial aggregation:\n$p")
  }

  test("pixel decode/resize shuffle pre-encode ids only; header parse stays in codegen") {
    val docs = spark.range(20).selectExpr("id AS doc_id", "id + 48 AS n_chars")
    val media = Multimodal.withPixelMedia(docs)
    val png = Multimodal.withPngMedia(docs)
    // AQE wraps the tree in AdaptiveSparkPlanExec (opaque to collect) —
    // disable it for the structural assertion only (restore the PRIOR
    // value, not a literal, so a suite configured with AQE off stays off)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Seq(
      // the raw-pixmap builder is NOT spread (trivial per-doc encode):
      // decode/resize stay pure zero-exchange scan jobs
      ("decode", 0) -> Multimodal.decodePixelStats(media).toDF(),
      ("resize", 0) -> Multimodal.decodePixelStats(
        Multimodal.resizeMedia(media, 9, 7)).toDF(),
      // PNG's encode is deliberately NOT spread (a few hundred ops per
      // doc); decode/resize stay pure zero-exchange scan jobs
      ("png-decode", 0) -> Multimodal.decodePixelStats(png).toDF(),
      ("png-resize", 0) -> Multimodal.decodePixelStats(
        Multimodal.resizeMedia(png, 9, 7)).toDF(),
      // Huffman+IDCT in the codec: JPEG decode is per-row CPU over the
      // spread ids, never a payload exchange
      ("jpeg-decode", 1) -> Multimodal.decodePixelStats(
        Multimodal.withJpegMedia(docs)).toDF()
    ).foreach { case ((name, nExpected), df) =>
      // the invariant that matters at 100 TB: media payload bytes never
      // cross an exchange — the only allowed exchange is the narrow
      // pre-encode id spread
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == nExpected,
        s"$name should have $nExpected exchange(s):\n${plan(df)}")
      exchanges.foreach { e =>
        val names = e.output.map(_.name).toSet
        assert(!names.contains("media"),
          s"$name shuffles media payload bytes: $names")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    // the header kernel is a codegen'd expression on the scan, not a UDF
    val meta = plan(media.select(graft.functions.media_header(col("media"))))
    assert(!meta.contains("BatchEvalPython") && !meta.contains("ScalaUDF"),
      s"media_header left codegen:\n$meta")
  }

  test("skew: hot-fingerprint dedup combines map-side; hot LSH buckets stay capped") {
    // a boilerplate-heavy corpus puts millions of rows behind ONE
    // fingerprint — scan-bound only if the aggregate is two-phase (the hot
    // key collapses to one partial row per partition before the exchange)
    val docs = spark.range(1000).select(col("id").as("doc_id"),
      lit("same text").as("text"))
    val p = plan(Dedup.exact(docs, "doc_id", "text"))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"exact dedup is not a two-phase aggregate — a hot fingerprint would ship " +
        s"every row through the exchange:\n$p")
    // the pair generator's reducer state must be capped_collect (O(cap)
    // per bucket), never an unbounded collect_list
    val lsh = plan(Dedup.minhashLsh(docs, "doc_id", "text"))
    assert(lsh.contains("capped_collect"), s"LSH buckets not size-capped:\n$lsh")
    assert(!lsh.contains("collect_list"), s"unbounded bucket state:\n$lsh")
  }

  test("ANN brute force: no window, no cartesian product, bounded aggregate") {
    val emb = Tables(spark, sfDir, "embeddings")
    val p = plan(Similarity.bruteForceTopK(emb, emb.limit(3), "vec_id", "embedding", 5))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), s"unbounded ANN plan:\n$p")
    assert(p.contains("topk_pairs"), s"bounded top-k aggregate missing:\n$p")
  }

  test("PQ search: query LUTs broadcast; ADC shortlist and re-rank are bounded top-k aggregates") {
    val emb = Tables(spark, sfDir, "embeddings")
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, k = 16,
      sampleCap = 256, iters = 2)
    val codes = emb.select(col("vec_id"),
      graft.functions.pq_encode(col("embedding"), cb).as("code"))
    val p = plan(Similarity.pqSearchTopK(codes, emb, emb.limit(3), cb,
      "vec_id", "embedding", "code", k = 3, shortlist = 5))
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"unbounded PQ plan:\n$p")
    // one bounded aggregate for the ADC shortlist, one for the exact re-rank
    assert("topk_pairs".r.findAllIn(p).length >= 2,
      s"ADC shortlist / re-rank not bounded top-k aggregates:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"query/LUT side not broadcast — the corpus-sized codes scan would shuffle:\n$p")
  }

  test("quantized IVF search: probe join broadcasts quantized queries; codes never sort-merge") {
    val emb = Tables(spark, sfDir, "embeddings")
    val cents = Similarity.ivfCentroidsKmeans(emb, "vec_id", "embedding", cells = 4)
    val p = plan(Similarity.ivfSearchQuantized(emb, emb.limit(3), cents,
      "vec_id", "embedding", nprobe = 2, k = 3))
    assert(p.contains("BroadcastHashJoin"), s"cell probe join is not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus codes shuffled for the probe join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"unbounded quantized-IVF plan:\n$p")
    assert(p.contains("topk_pairs"), s"bounded top-k aggregate missing:\n$p")
  }

  test("LSH banding exchange carries ids only (no token/signature arrays)") {
    val docs = Tables(spark, sfDir, "documents")
    // AQE wraps the tree in AdaptiveSparkPlanExec (opaque to collect) —
    // disable it for the structural assertion only (restore the PRIOR value)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val lsh = Dedup.minhashLsh(docs, "doc_id", "text")
      // no exchange anywhere in the LSH plan may carry the shingle arrays —
      // the banding exchange is ids+bucket (+ bounded id-list aggregation
      // buffers) only; shingles/tokens stay partition-local until the
      // (small) candidate verification join
      val exchanges = lsh.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, "no exchanges found in LSH plan")
      exchanges.foreach { e =>
        val names = e.output.map(_.name).toSet
        assert(!names.contains("sh"),
          s"shingle arrays ride an LSH exchange: $names")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("data-quality check compiles every rule into a single scan") {
    import graft.quality.DataQuality._
    val docs = Tables(spark, sfDir, "documents")
    val compiled = compile(docs, Seq(
      Unique("doc_id"), NotNull("doc_id"),
      AcceptedValues("lang", Seq("en", "de", "es", "fr", "zh"))))
    // AQE wraps the tree in AdaptiveSparkPlanExec (opaque to collect) —
    // disable it for the structural assertion only (restore the PRIOR value)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans =
      try compiled.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(scans.length == 1,
      s"expected 1 scan for the whole rule set, got ${scans.length}")
    // and the counts match the per-rule filter formulation
    val row = compiled.collect().head
    assert(row.getAs[Long]("_r0") == Unique("doc_id").violations(docs).count())
    assert(row.getAs[Long]("_r1") == NotNull("doc_id").violations(docs).count())
  }

  test("whole-stage codegen covers the scan-side transform pipeline") {
    val docs = Tables(spark, sfDir, "documents")
    val p = plan(TextAnalysis.qualityScore(docs, "doc_id", "text"))
    // `*(n)` node prefixes mark whole-stage-codegen stages; the final
    // projection with array-lambda HOFs legitimately stays outside (Spark
    // never codegens LambdaFunction), but the scan+common-expr stage must
    // be inside
    assert(p.contains("*(1)"), s"no codegen stage in plan:\n$p")
  }

  test("curation split / hash-sample / PII scrub are zero-shuffle in-row plans") {
    val docs = Tables(spark, sfDir, "documents")
    Seq(
      "splitAssign" -> Curation.splitAssign(docs, "doc_id"),
      "sampleByHash" -> Curation.sampleByHash(docs, "doc_id", 0.1),
      "piiScrub" -> Curation.piiScrub(docs, "doc_id", "text"),
      "rebalanceMix" -> Curation.rebalanceMix(docs, "lang", "doc_id",
        Map("en" -> 0.5, "zh" -> 1.0)),
      "epochsMix" -> Curation.epochsMix(docs, "lang", "doc_id",
        Map("en" -> 2.5, "de" -> 1.0))
    ).foreach { case (name, df) =>
      val p = plan(df)
      assert(!p.contains("Exchange"), s"$name shuffles:\n$p")
    }
  }

  test("tfidf scans the corpus exactly once (df/N derive from the materialized tf)") {
    val df = Curation.tfidfTopTerms(Tables(spark, sfDir, "documents"), "doc_id", "text", 3)
    df.write.mode("overwrite").format("noop").save()
    val p = plan(df)
    // the single scan happens in the tf-materialization job; the main plan
    // reads the checkpointed token-level RDD (ExistingRDD), never parquet
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0 && p.contains("ExistingRDD"),
      s"corpus re-scanned ($scans parquet scans):\n$p")
  }

  test("duplicateSpans shuffles hashed longs only and never re-scans the corpus") {
    val df = Dedup.duplicateSpans(Tables(spark, sfDir, "documents"), "doc_id", "text")
    df.write.mode("overwrite").format("noop").save()
    val p = plan(df)
    // single scan in the shingle-materialization job; the main plan reads
    // the checkpointed (doc_id, hash) RDD and shuffles longs only
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0 && p.contains("ExistingRDD"),
      s"corpus re-scanned ($scans parquet scans):\n$p")
    val keys = "hashpartitioning\\(([A-Za-z_]+)#".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(keys.nonEmpty && keys.subsetOf(Set("h", "doc_id")),
      s"unexpected shuffle keys $keys:\n$p")
  }

  test("lmScore: bigram branches derive from the materialized relation; vocab is one pruned scan") {
    val df = TextAnalysis.lmScore(Tables(spark, sfDir, "documents"), "doc_id", "text")
    df.write.mode("overwrite").format("noop").save()
    val p = plan(df)
    // exactly ONE parquet scan (the text-pruned vocabulary count) — bigram
    // counts, context counts and the scoring join all read the checkpoint
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1 && p.contains("ExistingRDD"),
      s"expected 1 vocab scan + checkpointed bigrams, got $scans scans:\n$p")
  }

  test("encode: vocabulary joins by broadcast, never a corpus-side merge join") {
    val docs = Tables(spark, sfDir, "documents")
    val p = plan(TextAnalysis.encode(docs, "doc_id", "text",
      TextAnalysis.buildVocab(docs, "text", 24)))
    assert(p.contains("BroadcastHashJoin"), s"vocab not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the vocab join:\n$p")
  }

  test("trainingOrder: corpus ranks per-shard; only the 256-row offsets pass one partition") {
    val df = Curation.trainingOrder(Tables(spark, sfDir, "documents").select("doc_id"), "doc_id")
    val p = plan(df)
    // the document-bearing window must partition by _shard (a global
    // row_number would funnel the corpus through a single partition) and
    // the offsets join must be a broadcast, not a corpus shuffle
    assert("hashpartitioning\\(_shard".r.findFirstIn(p).isDefined,
      s"no per-shard rank exchange:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"offsets not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the offsets join:\n$p")
  }

  test("semanticDedup: bounded in-cell pairs, no cartesian and no window") {
    val e = Tables(spark, sfDir, "embeddings")
    val p = plan(Dedup.semanticDedup(e, "vec_id", "embedding", cells = 8, threshold = 0.9))
    assert(!p.contains("CartesianProduct") && !p.contains("Window"),
      s"semanticDedup plan degenerated:\n$p")
  }

  test("contamination exchanges partition on hashed longs, never shingle strings") {
    val docs = Tables(spark, sfDir, "documents")
    val out = Curation.contamination(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text")
    val p = plan(out)
    // every hash-partitioned exchange keys on h (the xxhash64 long) or
    // doc_id — the shingle string attribute `s` must never be a shuffle key
    val keys = "hashpartitioning\\(([A-Za-z_]+)#".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(keys.nonEmpty && keys.subsetOf(Set("h", "doc_id")),
      s"unexpected shuffle keys $keys:\n$p")
  }

  test("domainCap: bounded aggregate + semi join, never a window") {
    val docs = Tables(spark, sfDir, "documents")
    val p = plan(Curation.domainCap(docs, "source", "doc_id", col("n_chars"), 10))
    assert(!p.contains("Window"), s"domain cap fell back to a window:\n$p")
    assert(p.contains("topkpairs") || p.contains("TopKPairs") ||
      p.contains("ObjectHashAggregate"),
      s"no bounded aggregate in the keep-set:\n$p")
    assert(p.contains("LeftSemi"), s"keep-set must semi-join back:\n$p")
  }

  test("spanCorrupt and canonicalizeUrl are zero-shuffle in-row plans") {
    val docs = Tables(spark, sfDir, "documents")
    val p1 = plan(Curation.spanCorrupt(docs, "doc_id", "text"))
    assert(!p1.contains("Exchange"), s"spanCorrupt shuffled:\n$p1")
    val p2 = plan(docs.select(Curation.canonicalizeUrl(col("text")).as("u")))
    assert(!p2.contains("Exchange"), s"canonicalizeUrl shuffled:\n$p2")
    val p3 = plan(docs.select(TextAnalysis.htmlExtract(col("text")).as("c")))
    assert(!p3.contains("Exchange"), s"htmlExtract shuffled:\n$p3")
  }

  test("lineDedup: census/verdict exchange hashed keys and ints, never line text") {
    val docs = Tables(spark, sfDir, "documents")
    val p = plan(Dedup.lineDedup(docs, "doc_id", "text", minCount = 3))
    // shuffle keys are the md5 key and the doc id only
    val keys = "hashpartitioning\\(([A-Za-z_]+)#".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(keys.nonEmpty && keys.subsetOf(Set("k", "doc_id")),
      s"unexpected shuffle keys $keys:\n$p")
  }

  test("funnelStages: no windows — conditional-min aggregates per stage") {
    val ev = Tables(spark, sfDir, "events")
    val p = plan(Temporal.funnelStages(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")))
    assert(!p.contains("Window"), s"funnel fell back to a window:\n$p")
    assert(p.contains("partial_min") || p.contains("HashAggregate"),
      s"no map-side-combined min:\n$p")
  }

  test("one-pass funnel: the event table crosses exactly one exchange, no window, no join") {
    val ev = Tables(spark, sfDir, "events")
    val reached = Sessionize.funnel(ev, "user_id", "ts", "event_id",
      "event_type", Seq("view", "click", "purchase"))
    // assert on the heavy sub-plan (before the tiny stage-count union):
    // the event relation is exchanged once (the user repartition) and
    // scanned once — per-user work happens in the sorted streaming pass
    val p = plan(reached)
    val exchanges = "Exchange hashpartitioning\\(_u#".r.findAllIn(p).size
    assert(exchanges >= 1, s"no user exchange found:\n$p")
    assert(!p.contains("Window"), s"one-pass funnel must not window:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"one-pass funnel must not join the event table:\n${p.take(4000)}")
    val scans = "Scan parquet".r.findAllIn(p).size
    // events scanned once per union branch is the FAILURE mode; the
    // counts relation is computed once and reused as a literal-small agg
    assert(scans <= 3, s"event table re-scanned $scans times:\n${p.take(4000)}")
  }

  test("dynamic partition pruning: a runtime dim filters the month-partitioned fact scan") {
    val li = Tables(spark, sfDir, "lineitem")
      .select(col("l_extendedprice"),
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
    val path = java.nio.file.Files.createTempDirectory("dpp_fact").toString + "/fact"
    graft.sources.Partitioned.write(li, "ship_month", path)
    val fact = graft.sources.Partitioned.read(spark, path)
    val dim = Tables(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ship_month"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("ship_month")).limit(3)
      .select("ship_month")
    val joined = fact.join(dim, Seq("ship_month"))
      .agg(sum(col("l_extendedprice")).as("s"))
    val p = plan(joined)
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning filter on the fact scan:\n${p.take(4000)}")
    // the pruning actually bites: the fact scan must report reading only
    // the dim's 3 partitions once executed
    joined.collect()
    val scanNode = joined.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("fact")).getOrElse("")
    // metric-level check is version-dependent; the plan-level dynamicpruning
    // assert above is the contract, this is a sanity echo
    assert(scanNode.nonEmpty)
  }

  test("bloom probe is in-row: the probed table reaches the verdict filter without any exchange") {
    val orders = Tables(spark, sfDir, "orders")
    val keys = Tables(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).distinct()
    val words = Sketches.bloomCollect(
      Sketches.bloomWords(keys, "c_custkey", 65536, 3), 65536)
    val probed = orders.filter(
      Sketches.bloomProbe(col("o_custkey"), words, 65536, 3))
    val p = plan(probed)
    assert(!p.contains("Exchange"),
      s"bloom probe shuffled the probed table:\n$p")
    assert(!p.contains("Join"), s"bloom probe joined instead of in-row test:\n$p")
  }

  test("priority sample is TakeOrdered-shaped: no global sort, no window") {
    val docs = Tables(spark, sfDir, "documents")
    val p = plan(Curation.prioritySample(docs, "doc_id", col("n_chars"), 20))
    assert(p.contains("TakeOrderedAndProject"),
      s"priority sample fell back to a full sort:\n$p")
    assert(!p.contains("Window"), s"unexpected window in priority sample:\n$p")
  }

  test("per-group priority sample aggregates top-k — never a window over the data") {
    val docs = Tables(spark, sfDir, "documents")
    val p = plan(Curation.prioritySampleByGroup(docs, "source", "doc_id",
      col("n_chars"), 5))
    assert(!p.contains("Window"),
      s"per-group sample used a window over the corpus:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"selected ids not broadcast back onto the scan:\n$p")
  }

  test("shardPack ranks via range partitions — the data never coalesces to one partition") {
    val docs = Tables(spark, sfDir, "documents")
    val df = Curation.shardPack(docs, "doc_id", col("n_chars"), 8)
    val p = plan(df)
    assert(p.contains("Exchange rangepartitioning"),
      s"global rank lost its range sort:\n$p")
    // the only Window runs over the per-partition COUNT relation (rows =
    // number of range partitions), fed by a hash aggregate — never the data
    assert(p.contains("monotonically_increasing_id"),
      s"local ordinal not derived from the sorted stream:\n$p")
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0 && p.indexOf("HashAggregate", winIdx) >= 0,
      s"offsets window is not over the aggregated partition counts:\n$p")
  }

  test("maxsim scores in-row against broadcast queries — no shuffle of the corpus, no window") {
    val emb = Tables(spark, sfDir, "embeddings")
    val p = plan(Similarity.maxSimTopK(emb, emb.filter(col("vec_id") < 4),
      "vec_id", "embedding", chunks = 8, k = 5))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"queries not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled to score:\n$p")
    assert(!p.contains("Window"), s"top-k fell back to a window:\n$p")
  }

  test("TPC-H Q3 shape: filtered customer broadcasts, date filters reach the scans") {
    Tables.registerAll(spark, sfDir)
    val df = spark.sql(QueryCatalog.oracleSql("q_sql_shipping_priority"))
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in Q3:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in Q3:\n$p")
    assert(p.contains("GreaterThan(l_shipdate"),
      s"lineitem date filter not pushed to the scan:\n$p")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"customer segment filter not pushed:\n$p")
  }

  test("featureMoments computes every pair's sums in ONE scan") {
    val li = Tables(spark, sfDir, "lineitem").select(
      col("l_quantity").cast("long").as("qty"),
      floor(col("l_extendedprice")).cast("long").as("price_usd"),
      round(col("l_discount") * 100, 0).cast("long").as("disc_pct"))
    val p = plan(Relational.featureMoments(li, Seq("qty", "price_usd", "disc_pct")))
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"moment matrix rescanned the table:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"global moment agg should not hash-shuffle:\n$p")
  }

  test("bpe encode: broadcast merge table, zero-shuffle segmentation scan") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
    val merges = Seq((0L, "a", "t"), (1L, "t", "a")).toDF("rank", "left", "right")
    val pl = plan(Bpe.encode(docs, "doc_id", "text", merges))
    // the corpus-side segmentation is one scan job: no exchange at all
    assert(!pl.contains("Exchange"), s"segmentation shuffled:\n$pl")
    assert(!pl.contains("Join"), s"merge table joined instead of broadcast var:\n$pl")
  }

  test("script census and encoding quality are zero-shuffle in-row plans") {
    val docs = Tables(spark, sfDir, "documents")
    val p1 = plan(TextAnalysis.scriptCensus(docs, "doc_id", "text"))
    assert(!p1.contains("Exchange"), s"scriptCensus shuffled:\n$p1")
    val p2 = plan(TextAnalysis.encodingQuality(docs, "doc_id", "text"))
    assert(!p2.contains("Exchange"), s"encodingQuality shuffled:\n$p2")
  }

  test("dimStats: one two-phase agg on the dim key; standardize is in-row") {
    val emb = spark.read.parquet(sfDir + "/embeddings.parquet")
    val stats = Similarity.dimStats(emb, "embedding")
    val p1 = plan(stats)
    assert("Exchange".r.findAllIn(p1).size == 1, s"dimStats needs exactly one exchange:\n$p1")
    assert(p1.contains("partial_count") || p1.contains("partial"),
      s"dim agg not partial before the exchange:\n$p1")
    val p2 = plan(Similarity.standardize(emb, "vec_id", "embedding", stats))
    assert(!p2.contains("Exchange") && !p2.contains("Join"),
      s"standardize must be an in-row transform:\n$p2")
  }

  test("dimCrossStats: partition-accumulator kernel — one exchange of dims²-bounded partials") {
    val emb = spark.read.parquet(sfDir + "/embeddings.parquet")
    val p = plan(Similarity.dimCrossStats(emb, "embedding"))
    assert("Exchange".r.findAllIn(p).size == 1,
      s"dimCrossStats needs exactly one exchange (the partial merge):\n$p")
    assert(!p.contains("Generate"),
      s"dimCrossStats must not explode row×pairs (the kernel accumulates in-task):\n$p")
    assert(!p.contains("Join"), s"dimCrossStats must not self-join:\n$p")
  }

  test("ngramRepetition: in-row run-length fold — zero exchanges, no join/window") {
    val docs = Tables(spark, sfDir, "documents")
    val p = plan(TextAnalysis.ngramRepetition(docs, "doc_id", "text", 3))
    // sorted-grams fold: the per-doc row never leaves its input partition —
    // in particular NO gram string (nor anything else) crosses an exchange
    assert(!p.contains("Exchange"),
      s"ngramRepetition must be fully in-row (zero exchanges):\n$p")
    assert(!p.contains("Generate"),
      s"ngramRepetition must not explode grams to rows:\n$p")
    assert(!p.contains("Join"), s"top-gram must ride the fold, not a self-join:\n$p")
    assert(!p.contains("Window"), s"top-gram must ride the fold, not a window:\n$p")
  }

  test("training pipeline: gate and split ride the scan — no join, bounded exchanges") {
    val pl = plan(QueryCatalog.queries("q_training_pipeline")(spark, sfDir))
    assert(!pl.contains("SortMergeJoin") && !pl.contains("BroadcastHashJoin")
      && !pl.contains("BroadcastNestedLoopJoin"),
      s"composed pipeline joined the corpus back to itself:\n$pl")
    val exchanges = "Exchange".r.findAllIn(pl).size
    assert(exchanges <= 3, s"pipeline needs <= 3 exchanges (count agg, shard window, final order), got $exchanges:\n$pl")
  }
}
