package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.SparkTestBase

class RelationalSpec extends SparkTestBase {

  test("profile: one scan, one row per column, nulls and distincts exact") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a")))
      .toDF("k", "v")
    val rows = Relational.profile(df, Seq("k", "v")).orderBy("column").collect()
    val k = rows(0)
    assert(k.getString(0) == "k" && k.getLong(1) == 3 && k.getLong(2) == 0
      && k.getLong(3) == 3 && k.getString(4) == "1" && k.getString(5) == "3")
    val v = rows(1)
    assert(v.getString(0) == "v" && v.getLong(2) == 1 && v.getLong(3) == 1
      && v.getString(4) == "a" && v.getString(5) == "a")
  }
  import spark.implicits._

  test("project keeps only requested columns") {
    val df = Seq((1, "a", 2.0)).toDF("x", "y", "z")
    assert(Relational.project(df, Seq("x", "z")).columns.toSeq == Seq("x", "z"))
  }

  test("bucketize: ranges, overflow, null and lower-edge → NULL (pd.cut)") {
    val df = Seq[Option[Double]](Some(5), Some(10), Some(11), Some(200), Some(0), None)
      .toDF("v")
      .select(Relational.bucketize(col("v"), Seq(10, 50, 100),
        Seq("Low", "Medium", "High", "Viral"), lower = Some(0d)).as("b"))
    assert(df.collect().map(_.getAs[String]("b")).toSeq ==
      Seq("Low", "Low", "Medium", "Viral", null, null))
  }

  test("antiJoin removes matching keys, keeps the rest") {
    val main = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("id", "v")
    val keys = Seq("b").toDF("id")
    val out = Relational.antiJoin(main, keys, Seq("id")).orderBy("id").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "c"))
  }

  test("upsert = last-write-wins by key and is idempotent") {
    val main = Seq(("a", 1), ("b", 2)).toDF("id", "v")
    val batch = Seq(("b", 20), ("c", 30)).toDF("id", "v")
    val once = Relational.upsert(main, batch, "id")
    val twice = Relational.upsert(once, batch, "id")
    val expect = Set(Row("a", 1), Row("b", 20), Row("c", 30))
    assert(once.collect().toSet == expect)
    assert(twice.collect().toSet == expect)
  }

  test("upsert plan broadcasts the staging side (no shuffle of main)") {
    val main = Seq(("a", 1)).toDF("id", "v")
    val batch = Seq(("b", 2)).toDF("id", "v")
    val plan = Relational.upsert(main, batch, "id").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast anti-join, got:\n$plan")
  }

  test("topK matches orderBy-limit semantics deterministically") {
    val df = Seq((1, 5.0), (2, 5.0), (3, 9.0), (4, 1.0)).toDF("id", "s")
    val out = Relational.topK(df, col("s"), col("id"), 2).select("id").as[Int].collect()
    assert(out.toSeq == Seq(3, 1))
  }

  test("nullCensus counts nulls per column") {
    val df = Seq((Some(1), Option.empty[String]), (None, Some("x"))).toDF("a", "b")
    val row = Relational.nullCensus(df).collect().head
    assert(row.getAs[Long]("nulls_a") == 1L && row.getAs[Long]("nulls_b") == 1L)
  }

  test("groupedSummary computes count/avg/max per group") {
    val df = Seq(("g1", 10.0, 1.0), ("g1", 20.0, 3.0), ("g2", 5.0, 0.0))
      .toDF("k", "score", "cnt")
    val m = Relational.groupedSummary(df, "k", "score", "cnt")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("g1").getAs[Long]("post_count") == 2)
    assert(m("g1").getAs[Double]("avg_score") == 15.0)
    assert(m("g1").getAs[Double]("max_score") == 20.0)
  }

  test("stableAvg: negative sums use FLOOR division (DuckDB // mirror), not truncation") {
    // 16 two-decimal values summing to -15.97: avg·10⁴ = -9981.25, so the
    // half-up identity's quotient is -9980.75 — floor gives -9981 (the
    // correct nearest), truncation-toward-zero would give -9980
    val vals = Seq.fill(15)(-1.00) :+ -0.97
    val out = vals.toDF("v").agg(Relational.stableAvg(col("v"), 2).as("a"))
      .collect().head.getDouble(0)
    assert(out == -0.9981, s"expected -0.9981 (floor semantics), got $out")
    // sanity: positive mirror is unchanged
    val pos = vals.map(-_).toDF("v").agg(Relational.stableAvg(col("v"), 2).as("a"))
      .collect().head.getDouble(0)
    assert(pos == 0.9981)
  }

  test("stableAvg: sums past the old BIGINT cliff stay exact (DECIMAL(38) intermediates)") {
    // S = 5e15 + 25 → 2·S·10⁴ = 1.0e20 ≫ 2⁶³: the former BIGINT arithmetic
    // wrapped here; decimal(38,0) keeps the identity exact. All inputs and
    // the double sum are exact multiples of 2⁻⁷ below 2⁵³, so the only
    // question is the integer arithmetic.
    val vals = Seq.fill(99)(5.0e11) :+ (5.0e11 + 0.25)
    val out = vals.toDF("v").agg(Relational.stableAvg(col("v"), 2).as("a"))
      .collect().head.getDouble(0)
    val expected = (5000000000000025L).toDouble / 1e4
    assert(out == expected, s"expected $expected, got $out")
  }

  test("stableAvg: empty group is NULL, not a division error") {
    val out = Seq(1.0).toDF("v").filter(col("v") > 9)
      .agg(Relational.stableAvg(col("v"), 2).as("a")).collect().head
    assert(out.isNullAt(0))
  }

  test("saltedCollectShards: a hot key's rows split across shards, none holds the group") {
    val hot = spark.range(10000)
      .select(lit("hotkey").as("k"), concat(lit("doc"), col("id")).as("v"))
    val cold = Seq(("coldkey", "single")).toDF("k", "v")
    val shards = Relational.saltedCollectShards(hot.union(cold), "k", "v", saltBuckets = 8)
      .collect()
    val hotShards = shards.filter(_.getString(0) == "hotkey")
    assert(hotShards.length == 8, s"expected 8 shards, got ${hotShards.length}")
    val sizes = hotShards.map(_.getSeq[String](2).size)
    assert(sizes.sum == 10000)
    assert(sizes.max < 10000 / 2, s"one shard holds too much: ${sizes.max}")
    // deterministic: same salt → same shard content on re-run
    val again = Relational.saltedCollectShards(hot.union(cold), "k", "v", saltBuckets = 8)
      .collect().filter(_.getString(0) == "hotkey")
      .map(r => r.getInt(1) -> r.getSeq[String](2).sorted).toMap
    val first = hotShards.map(r => r.getInt(1) -> r.getSeq[String](2).sorted).toMap
    assert(first == again)
  }

  test("bloomAntiJoin: exact vs plain anti-join, and the keep branch never joins") {
    val big = spark.read.parquet(sfDir + "/lineitem.parquet")
    val block = spark.read.parquet(sfDir + "/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val fast = Relational.bloomAntiJoin(big, block, "l_orderkey")
    val plain = big.join(block.distinct(), Seq("l_orderkey"), "left_anti")
    assert(fast.count() == plain.count())
    assert(fast.exceptAll(plain).isEmpty && plain.exceptAll(fast).isEmpty)

    // the probe-negative branch must reach the union without ANY join: the
    // whole point is that bloom-definite rows skip the verification join
    val union = fast.queryExecution.optimizedPlan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }
    assert(union.nonEmpty, "expected a two-branch union plan")
    val keepBranch = union.head.children.head
    val joinsBelow = keepBranch.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joinsBelow.isEmpty, s"keep branch has a join:\n$keepBranch")
  }

  test("bloomAntiJoin: probe-positive sliver is matches plus ~fpp, not the corpus") {
    // 100k keys, blocklist of 1k → probe-positives should be ≈ 1k + 1% of 99k
    val big = spark.range(100000).select(col("id").as("k"))
    val block = spark.range(1000).select(col("id").as("k"))
    val bf = block.select(xxhash64(col("k")).as("__h"))
      .stat.bloomFilter("__h", 1000, 0.01)
    val positives = big
      .filter(graft.functions.bloom_might_contain(xxhash64(col("k")), bf))
      .count()
    assert(positives >= 1000, "no false negatives allowed")
    assert(positives <= 1000 + 5000, s"bloom passes too much: $positives")
  }

  test("bloomAntiJoin: oversized blocklist fails loudly") {
    val big = spark.range(10).select(col("id").as("k"))
    val block = spark.range(100).select(col("id").as("k"))
    val e = intercept[IllegalArgumentException] {
      Relational.bloomAntiJoin(big, block, "k", maxItems = 50)
    }
    assert(e.getMessage.contains("maxItems"))
  }

  test("pivotCount: wide crosstab with zeros for absent combinations") {
    import spark.implicits._
    val df = Seq(("s1", "en"), ("s1", "en"), ("s1", "de"), ("s2", "en"))
      .toDF("src", "lang")
    val out = Relational.pivotCount(df, "src", "lang", Seq("de", "en", "fr"))
      .orderBy("src").collect()
    assert(out(0).getAs[Long]("de") == 1L && out(0).getAs[Long]("en") == 2L)
    assert(out(0).getAs[Long]("fr") == 0L) // absent combo is 0, not null
    assert(out(1).getAs[Long]("de") == 0L && out(1).getAs[Long]("en") == 1L)
  }

  test("schemaDrift: added/removed/type_changed/unchanged + null census per side") {
    import spark.implicits._
    val oldDf = Seq((1L, "a", 10), (2L, null.asInstanceOf[String], 20))
      .toDF("id", "name", "v")
    val newDf = Seq((1L, 10.0, "x"), (2L, 20.0, null.asInstanceOf[String]))
      .toDF("id", "v", "tag")
    val out = Relational.schemaDrift(oldDf, newDf).orderBy("col_name").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("id").getString(1) == "unchanged")
    assert(out("name").getString(1) == "removed" && out("name").isNullAt(3))
    assert(out("v").getString(1) == "type_changed")
    assert(out("v").getString(2) == "int" && out("v").getString(3) == "double")
    assert(out("tag").getString(1) == "added" && out("tag").isNullAt(2))
    assert(out("name").getLong(4) == 1L)       // old-side null census
    assert(out("tag").getLong(5) == 1L)        // new-side null census
    assert(out("id").getLong(4) == 0L && out("id").getLong(5) == 0L)
    // identical frames: everything unchanged
    assert(Relational.schemaDrift(oldDf, oldDf)
      .filter(col("status") =!= "unchanged").count() == 0L)
  }

  test("cdcApply: last-writer-wins with out-of-order deletes, updates, inserts") {
    import spark.implicits._
    val snap = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "v", "p")
    val changes = Seq(
      // key 1: delete at seq 2 LOSES to update at seq 3 (out-of-order arrival)
      (1L, 3L, "U", "a2", 11.0),
      (1L, 2L, "D", "a", 10.0),
      // key 2: update at seq 1 loses to delete at seq 2
      (2L, 1L, "U", "b2", 21.0),
      (2L, 2L, "D", "b", 20.0),
      // key 5: pure insert
      (5L, 1L, "I", "e", 50.0)
    ).toDF("k", "seq", "op", "v", "p")
    val out = Relational.cdcApply(snap, changes, "k", "seq", "op")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out == Map(
      1L -> ("a2", 11.0),  // survived: update beat the earlier delete
      3L -> ("c", 30.0),   // untouched passthrough
      4L -> ("d", 40.0),
      5L -> ("e", 50.0)))  // inserted; key 2 deleted
  }

  test("mergeInto: delete / update / insert clauses resolve in order; absent-key delete ignored") {
    import spark.implicits._
    val target = Seq(
      (1L, "a", 100L), (2L, "b", 200L), (3L, "c", 300L), (4L, "d", 400L))
      .toDF("k", "tag", "cents")
    val source = Seq(
      (2L, "D", 0L),    // matched delete
      (3L, "U", 333L),  // matched update
      (5L, "I", 555L),  // unmatched insert
      (6L, "D", 0L))    // delete for an absent key: ignored
      .toDF("k", "op", "new_cents")
    val out = Relational.mergeInto(target, source, "k",
        deleteWhen = col("s_op") === "D",
        updates = Map("cents" -> col("s_new_cents")),
        insertWhen = col("s_op") === "I")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out == Map(
      1L -> (Some("a"), Some(100L)),  // untouched passthrough
      3L -> (Some("c"), Some(333L)),  // updated; unmapped tag kept
      4L -> (Some("d"), Some(400L)),
      5L -> (None, Some(555L))))      // inserted; unmapped tag NULL
  }

  test("mergeInto: identities — empty source is a no-op, delete-all-matched empties the matches") {
    import spark.implicits._
    val target = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "cents")
    val empty = Seq.empty[(Long, String, Long)].toDF("k", "op", "new_cents")
    val same = Relational.mergeInto(target, empty, "k",
        deleteWhen = col("s_op") === "D",
        updates = Map("cents" -> col("s_new_cents")),
        insertWhen = col("s_op") === "I")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(same == Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
    // delete every matched key → only the untouched row remains
    val delAll = Seq((1L, "D", 0L), (2L, "D", 0L)).toDF("k", "op", "new_cents")
    val left = Relational.mergeInto(target, delAll, "k",
        deleteWhen = col("s_op") === "D",
        updates = Map("cents" -> col("s_new_cents")),
        insertWhen = col("s_op") === "I")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(left == Map(3L -> 30L))
    // merge is idempotent for pure updates: applying the same update
    // delta twice equals applying it once
    val upd = Seq((2L, "U", 25L)).toDF("k", "op", "new_cents")
    def apply1(t: org.apache.spark.sql.DataFrame) =
      Relational.mergeInto(t, upd, "k",
        deleteWhen = col("s_op") === "D",
        updates = Map("cents" -> col("s_new_cents")),
        insertWhen = col("s_op") === "I")
    val once = apply1(target).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val twice = apply1(apply1(target)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(once == twice && once == Set((1L, 10L), (2L, 25L), (3L, 30L)))
  }

  test("sequenceFeatures: gaps, quartiles and percent_rank from one window pass") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val ev = Seq(
      (1L, 10L, at(0)), (1L, 11L, at(5)), (1L, 12L, at(5)), (1L, 13L, at(60)),
      (2L, 20L, at(7)))
      .toDF("user_id", "event_id", "ts")
    val out = Relational.sequenceFeatures(ev, "user_id", "ts", "event_id")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getInt(5), r.getDouble(6)))
    assert(out(0) == ((10L, None, Some(5000000L), 1, 0.0)))
    // the ts tie at +5s orders by event_id: 11 before 12, gap 0 between them
    assert(out(1) == ((11L, Some(5000000L), Some(0L), 2, math.rint(1.0 / 3 * 1e6) / 1e6)))
    assert(out(2) == ((12L, Some(0L), Some(55000000L), 3, math.rint(2.0 / 3 * 1e6) / 1e6)))
    assert(out(3) == ((13L, Some(55000000L), None, 4, 1.0)))
    // singleton user: no neighbors, rank 0, first quartile
    assert(out(4) == ((20L, None, None, 1, 0.0)))
  }

  test("selectivityEstimate: exact half-bucket arithmetic; AVI is near-truth on independent columns") {
    import spark.implicits._
    // 8×8 cross product: x and y PERFECTLY independent, each uniform 1..8
    val rows = for (x <- 1 to 8; y <- 1 to 8) yield (x.toDouble, y.toDouble)
    val df = rows.toDF("x", "y")
    val r = Relational.selectivityEstimate(df, "x", 4.0, "y", 5.0, buckets = 8)
      .collect().head
    // cuts at ceil(64·i/8) land on the value i → nbx = 4 boundaries ≤ 4,
    // nby = 4 boundaries < 5
    assert(r.getAs[Long]("x_est_bp") == 4375L)   // (8−4−0.5)/8
    assert(r.getAs[Long]("y_est_bp") == 5625L)   // (4+0.5)/8
    assert(r.getAs[Long]("combined_est_bp") == 4375L * 5625L / 10000L)
    assert(r.getAs[Long]("actual_bp") == 2500L)  // truth: 0.5 · 0.5
    assert(r.getAs[Long]("n_rows") == 64L && r.getAs[Long]("n_match") == 16L)
    // independence → the AVI estimate lands within half a bucket of truth
    assert(math.abs(r.getAs[Long]("combined_est_bp") - 2500L) < 10000L / 8)
  }

  test("weightedMedian: weight-skewed median diverges from the plain median correctly") {
    import spark.implicits._
    // group a: values 1,2,3 with weights 1,1,8 → half of 10 is 5, first
    // value reaching cum≥5 is 3 (plain median would say 2)
    // group b: equal weights → ordinary lower median
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 8L),
      ("b", 10.0, 1L), ("b", 20.0, 1L)).toDF("g", "v", "w")
    val out = Relational.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getAs[Long]("total_weight"))).toMap
    assert(out("a") == ((3.0, 10L)))
    assert(out("b") == ((10.0, 2L)))  // cum(10)=1, 2·1 >= 2 → lower median
  }

  test("featureMomentsBy: per-group moment rows merge component-wise to the global row") {
    import spark.implicits._
    val df = Seq(("a", 1L, 2L), ("a", 3L, 4L), ("b", 5L, 6L), ("b", 7L, 8L))
      .toDF("g", "x", "y")
    val per = Relational.featureMomentsBy(df, "g", Seq("x", "y")).collect()
    val global = Relational.featureMoments(df, Seq("x", "y")).collect().head
    for (f <- Seq("n", "sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy")) {
      assert(per.map(_.getAs[Long](f)).sum == global.getAs[Long](f),
        s"component $f does not merge")
    }
  }

  test("featureMoments: exact sums on a hand-checked table; correlation derivable") {
    import spark.implicits._
    val df = Seq((1L, 2L, 10L), (3L, 4L, 20L), (5L, 6L, 40L))
      .toDF("a", "b", "c")
    val rows = Relational.featureMoments(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = rows(("a", "b"))
    assert(ab.getAs[Long]("n") == 3L)
    assert(ab.getAs[Long]("sum_x") == 9L && ab.getAs[Long]("sum_y") == 12L)
    assert(ab.getAs[Long]("sum_xy") == 2 + 12 + 30)
    assert(ab.getAs[Long]("sum_xx") == 1 + 9 + 25)
    assert(ab.getAs[Long]("sum_yy") == 4 + 16 + 36)
    // Pearson r from the moments must agree with Spark's own corr()
    val m = rows(("a", "c"))
    val (nn, sx, sy, sxy, sxx, syy) = (m.getAs[Long]("n").toDouble,
      m.getAs[Long]("sum_x").toDouble, m.getAs[Long]("sum_y").toDouble,
      m.getAs[Long]("sum_xy").toDouble, m.getAs[Long]("sum_xx").toDouble,
      m.getAs[Long]("sum_yy").toDouble)
    val r = (nn * sxy - sx * sy) /
      math.sqrt((nn * sxx - sx * sx) * (nn * syy - sy * sy))
    val sparkR = df.agg(corr(col("a"), col("c"))).first().getDouble(0)
    assert(math.abs(r - sparkR) < 1e-12, s"moments r=$r vs corr=$sparkR")
  }

  test("abTestProportions: counts, rates and z against a hand computation") {
    import spark.implicits._
    // metric m: arm A 4 of 8 convert, arm B 6 of 8 convert
    val rows = (0 until 8).map(i => ("m", false, i < 4)) ++
      (0 until 8).map(i => ("m", true, i < 6))
    val df = rows.toDF("metric", "is_b", "won")
    val r = Relational.abTestProportions(df, "metric", col("is_b"), col("won"))
      .collect().head
    assert(r.getAs[Long]("n_a") == 8L && r.getAs[Long]("s_a") == 4L)
    assert(r.getAs[Long]("n_b") == 8L && r.getAs[Long]("s_b") == 6L)
    assert(r.getAs[Double]("p_a") == 0.5 && r.getAs[Double]("p_b") == 0.75)
    // z = (0.5-0.75)/sqrt(0.625*0.375*(1/8+1/8)) = -1.032795...
    assert(r.getAs[Double]("z") == -1.032796)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("abTestProportions: a lopsided arm split goes significant") {
    import spark.implicits._
    val rows = (0 until 200).map(i => ("m", false, i < 40)) ++ // 20%
      (0 until 200).map(i => ("m", true, i < 100))             // 50%
    val r = Relational.abTestProportions(rows.toDF("metric", "is_b", "won"),
      "metric", col("is_b"), col("won")).collect().head
    assert(r.getAs[Boolean]("significant"))
    assert(r.getAs[Double]("z") < -1.96)
  }

  test("rfmScores: quintile arithmetic and tie handling on 10 users") {
    import spark.implicits._
    // 10 users, one event each at hour (10 - uid), value = uid dollars:
    // recency_hours = uid - 1 for user uid? build explicitly instead:
    // user u has event at ts = u hours, value = u, plus user 10 has an
    // extra event (frequency signal)
    val ev = ((1 to 10).map(u =>
      (u.toLong, u.toLong * 3600L, u.toDouble)) :+
      ((10L, 36001L * 1L, 10.0d)))
      .toDF("user_id", "tsec", "value")
      .select(col("user_id"), timestamp_seconds(col("tsec")).as("ts"),
        col("value"))
    val out = Relational.rfmScores(ev, "user_id", "ts", "value")
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out.size == 10)
    // user 10: most recent (recency 0), most frequent, highest spend
    assert(out(10L).getAs[Long]("recency_hours") == 0L)
    assert(out(10L).getAs[Long]("frequency") == 2L)
    assert(out(10L).getAs[Long]("rfm") == 555L)
    // user 1: oldest event -> r tile 1
    assert(out(1L).getAs[Long]("r_score") == 1L)
    assert(out(1L).getAs[Long]("m_score") == 1L)
    // ranks are total-ordered: with n=10 each tile holds exactly 2 users
    val rTiles = out.values.groupBy(_.getAs[Long]("r_score"))
      .map { case (k, v) => k -> v.size }
    assert(rTiles == Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2, 5L -> 2))
    // frequency ties (users 1-9 all have 1 event) break by user_id, so
    // f tiles are determined: users 1,2 -> 1 ... user 9,10 -> 5
    assert(out(2L).getAs[Long]("f_score") == 1L)
    assert(out(9L).getAs[Long]("f_score") == 5L)
  }
}
