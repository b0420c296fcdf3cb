package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("misra-gries: planted heavy hitter survives with a bounded undercount") {
    // 10k copies of "hot" in a 15k-item stream, k=4 → threshold n/5 = 3k;
    // "hot" is way above it and MUST be reported with est >= 10k - 3k
    val hot = spark.range(10000).select(lit("hot").as("tkn"))
    val rest = spark.range(5000)
      .select(concat(lit("w"), (col("id") % 500)).as("tkn"))
    val stream = hot.unionAll(rest).repartition(8) // force multi-partition merges
    val out = stream.agg(graft.functions.mg_summary(col("tkn"), 4).as("cand"))
      .select(explode(col("cand")).as("c"))
      .select(col("c.token"), col("c.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.contains("hot"), s"heavy hitter lost: $out")
    assert(out("hot") <= 10000L, "MG must never overcount")
    assert(out("hot") >= 10000L - 3000L, s"undercount beyond n/(k+1): ${out("hot")}")
    assert(out.size <= 4, s"summary exceeded k: $out")
  }

  test("misra-gries: uniform stream reports nothing above threshold, bound still holds") {
    val uniform = spark.range(9000)
      .select(concat(lit("u"), (col("id") % 30)).as("tkn")).repartition(8)
    val out = uniform.agg(graft.functions.mg_summary(col("tkn"), 5).as("cand"))
      .select(explode(col("cand")).as("c"))
      .select(col("c.est")).as[Long].collect()
    // every estimate is an undercount of a 300-count token, floored at 1
    out.foreach(e => assert(e >= 1L && e <= 300L))
  }

  test("heavyHitters graded contract holds on the real documents table") {
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val row = Sketches.heavyHitters(docs, "text", k = 8).collect().head
    assert(row.getAs[Boolean]("all_heavy_covered"))
    assert(row.getAs[Boolean]("est_within_bound"))
    assert(row.getAs[Long]("n_tokens") > 0)
  }

  test("misra-gries survives a >64KB token across a shuffle (no writeUTF limit)") {
    val giant = "x" * 70000
    val stream = spark.range(2000)
      .selectExpr(s"IF(id % 2 = 0, '$giant', concat('w', id)) AS tkn")
      .repartition(8) // force partial-buffer serialization
    val out = stream.agg(graft.functions.mg_summary(col("tkn"), 4).as("c"))
      .select(explode(col("c")).as("x")).select(col("x.token"), col("x.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.contains(giant), "the giant heavy token must survive")
    assert(out(giant) <= 1000L && out(giant) >= 1000L - 2000L / 5)
  }

  test("count-min: grid and estimates equal an independent in-memory replay") {
    import spark.implicits._
    val (depth, width) = (3, 8) // tiny grid → guaranteed collisions
    val stream = Seq("a", "b", "a", "c", "a", "d", "e", "b", "f", "g", "h", "i")
    val items = stream.toDF("token")
    // independent replay: same md5-derived hash, plain Scala fold
    def bucket(r: Int, item: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$r:$item".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % width).toInt
    }
    val grid = Array.ofDim[Long](depth, width)
    stream.foreach(it => (0 until depth).foreach(r => grid(r)(bucket(r, it)) += 1))
    val got = Sketches.countMinSketch(items, "token", depth, width)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet ==
      (for (r <- 0 until depth; b <- 0 until width if grid(r)(b) > 0)
        yield (r, b.toLong, grid(r)(b))).toSet)
    val est = Sketches.cmsEstimate(
        Sketches.countMinSketch(items, "token", depth, width),
        items, "token", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    stream.distinct.foreach { it =>
      val expected = (0 until depth).map(r => grid(r)(bucket(r, it))).min
      assert(est(it) == expected, s"estimate($it)")
      assert(est(it) >= truth(it), s"CMS must never undercount $it")
    }
    // an unseen item estimates from whatever collided into its cells — may
    // be 0 (empty cell path through the left join) or inflated, never null
    val unseen = Sketches.cmsEstimate(
        Sketches.countMinSketch(items, "token", depth, width),
        Seq("zzz").toDF("token"), "token", depth, width)
      .collect().head.getLong(1)
    assert(unseen == (0 until depth).map(r => grid(r)(bucket(r, "zzz"))).min)
    // nulls neither count nor crash
    assert(Sketches.countMinSketch(Seq(Some("a"), None).toDF("token"), "token",
      depth, width).agg(sum("cnt")).collect().head.getLong(0) == depth.toLong)
  }

  test("cmsJoinSizeEstimate: inner-product min equals the replay, never undercounts") {
    import spark.implicits._
    val (depth, width) = (3, 8)
    val as = Seq("a", "a", "b", "c")
    val bs = Seq("a", "b", "b", "d")
    // true |A ⋈ B| = 2·1 (a) + 1·2 (b) = 4
    def bucket(r: Int, item: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$r:$item".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % width).toInt
    }
    def grid(xs: Seq[String]) = {
      val g = Array.ofDim[Long](depth, width)
      xs.foreach(x => (0 until depth).foreach(r => g(r)(bucket(r, x)) += 1))
      g
    }
    val (ga, gb) = (grid(as), grid(bs))
    val expected = (0 until depth)
      .map(r => (0 until width).map(b => ga(r)(b) * gb(r)(b)).sum).min
    val est = Sketches.cmsJoinSizeEstimate(
        Sketches.countMinSketch(as.toDF("k"), "k", depth, width),
        Sketches.countMinSketch(bs.toDF("k"), "k", depth, width), depth)
      .collect().head.getLong(0)
    assert(est == expected && est >= 4)
    // disjoint key sets: the estimate may be 0 and must not lose the row
    val z = Sketches.cmsJoinSizeEstimate(
        Sketches.countMinSketch(Seq("x").toDF("k"), "k", depth, width),
        Sketches.countMinSketch(Seq("y").toDF("k"), "k", depth, width), depth)
      .collect().head.getLong(0)
    assert(z == (0 until depth).map(r =>
      if (bucket(r, "x") == bucket(r, "y")) 1L else 0L).min)
  }

  test("madOutlierStats and winsorizedStats ignore NULL values consistently") {
    import spark.implicits._
    val df = (Seq.fill(3)(("g", None: Option[Double])) ++
      (1 to 100).map(i => ("g", Some(i.toDouble)))).toDF("grp", "v")
    val mad = graft.operators.Relational.madOutlierStats(df, "grp", "v").collect().head
    assert(mad.getAs[Long]("n") == 100L) // NULLs not counted
    val win = graft.operators.Curation.winsorizedStats(df, "grp", "v", 0.1, 0.9)
      .collect().head
    assert(win.getAs[Long]("n") == 100L)
    // clipped sum must not include any NULL-row contribution
    assert(win.getAs[Long]("sum_clipped_cents") <= 5050L * 100)
  }

  test("mg_summary is available on the SQL surface") {
    graft.functions.registerAll(spark)
    val n = spark.sql(
      """SELECT size(mg_summary(c, 4)) FROM VALUES ('a'),('a'),('b'),('c') AS t(c)"""
    ).as[Int].collect().head
    assert(n >= 1 && n <= 4)
  }

  test("topTokens2Pass equals the single-pass exact top-m, even with planted skew") {
    // every true top-5 token must clear n/(k+1): five hots at 2000 each
    // vs 200 rares at 10 each → n = 12000, threshold = 12000/33 ≈ 364
    val docs = spark.range(2000).selectExpr(
      "id AS doc_id",
      "concat('alpha beta gamma delta epsilon w', CAST(id % 200 AS STRING)) AS text")
    val twoPass = Sketches.topTokens2Pass(docs, "text", m = 5, k = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(twoPass == exact)
    assert(twoPass.map(_._1) ==
      Seq("alpha", "beta", "delta", "epsilon", "gamma")) // count ties break on token
    assert(twoPass.forall(_._2 == 2000L))
  }

  test("groupedDistinct: exact matches a hand count, hll verdict true on real data") {
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val rows = Sketches.groupedDistinct(docs, "source", "text").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("hll_ok")))
    val exact = docs.select(col("source"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("source").agg(count_distinct(col("t")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getAs[Long]("n_distinct_exact") == exact(r.getString(0))))
  }

  test("madOutlierStats: planted far outlier counted, clean uniform data mostly inside 3 MAD") {
    import spark.implicits._
    val clean = (1 to 1001).map(i => ("g", i.toDouble))
    val df = (clean :+ (("g", 1e9))).toDF("grp", "v")
    val r = graft.operators.Relational.madOutlierStats(df, "grp", "v").collect().head
    assert(r.getAs[Double]("med") == 501.0)
    assert(r.getAs[Double]("mad") == 250.0) // |x-501| over 1..1001 has median 250
    assert(r.getAs[Long]("n_outliers") >= 1L) // the 1e9
    // uniform data: values beyond 3*250=750 from the median are only the planted one
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("kmv: unsaturated sketch is the exact distinct count; merge ≡ rebuild") {
    import spark.implicits._
    val small = (1 to 50).map(i => s"v${i % 20}").toDF("x") // 20 distinct
    val sk = Sketches.kmvSketch(small, "x", 256)
    assert(sk.count() == 20)
    val est = Sketches.kmvEstimate(sk, 256).collect().head
    assert(est.getLong(0) == 20L && est.getLong(2) == 20L)
    // mergeability: union-of-sketches == sketch-of-union (the O(k) contract)
    val a = (1 to 400).map(i => s"a$i").toDF("x")
    val b = (200 to 600).map(i => s"a$i").toDF("x")
    val direct = Sketches.kmvSketch(a.union(b), "x", 64)
    val viaSketches = Sketches.kmvSketch(a, "x", 64)
      .union(Sketches.kmvSketch(b, "x", 64)).distinct().orderBy("h").limit(64)
    assert(direct.collect().map(_.getLong(0)).toSeq ==
      viaSketches.collect().map(_.getLong(0)).toSeq)
  }

  test("kmv: estimator lands near truth and set ops are consistent on real keys") {
    val orders = spark.read.parquet(sfDir + "/orders.parquet")
      .select(col("o_custkey").as("k"))
    val cust = spark.read.parquet(sfDir + "/customer.parquet")
      .select(col("c_custkey").as("k"))
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(orders, "k", 128), 128)
      .collect().head
    val truth = orders.filter(col("k").isNotNull).distinct().count()
    assert(math.abs(est.getLong(2) - truth).toDouble <= truth * 0.25,
      s"kmv est ${est.getLong(2)} vs true $truth")
    val ops = Sketches.kmvSetOps(
      Sketches.kmvSketch(orders, "k", 128),
      Sketches.kmvSketch(cust, "k", 128), 128).collect().head
    val trueInter = orders.distinct().join(cust.distinct(), Seq("k")).count()
    assert(ops.getLong(2) >= 0L && ops.getLong(1) >= est.getLong(2) / 2)
    assert(math.abs(ops.getLong(2) - trueInter).toDouble <= trueInter * 0.35 + 5,
      s"kmv inter ${ops.getLong(2)} vs true $trueInter")
  }

  test("sketch pair: hll and percentile stay within tolerance on real data") {
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val v = Sketches.vocabSize(docs, "text").collect().head
    assert(math.abs(v.getLong(1) - v.getLong(0)).toDouble <= v.getLong(0) * 0.1)
    val m = Sketches.tokenMedian(docs, "text").collect().head
    assert(math.abs(m.getDouble(1) - m.getDouble(0)) <= m.getDouble(0) * 0.05)
  }

  test("bloom: zero false negatives, bounded false positives, build is partitioning-invariant") {
    import spark.implicits._
    val mBits = 4096; val k = 3
    val members = (0L until 200L).map(i => i * 7L + 1L)
    val keys = members.toDF("k")
    val words = Sketches.bloomCollect(
      Sketches.bloomWords(keys, "k", mBits, k), mBits)
    assert(words.length == mBits / 32)
    assert(words.forall(_ >= 0L), "32-bit words must stay sign-safe in int64")
    // every member passes — the bloom contract
    val memberPass = keys
      .select(Sketches.bloomProbe(col("k"), words, mBits, k).as("p"))
      .filter(!col("p")).count()
    assert(memberPass == 0L, "false negative!")
    // non-members: FP rate must be near theory ((kn/m-ish)^k ≈ 2.4%), not
    // saturated; 10x headroom keeps the assertion noise-proof
    val nonMembers = (100000L until 102000L).toDF("k")
    val fp = nonMembers
      .select(Sketches.bloomProbe(col("k"), words, mBits, k).as("p"))
      .filter(col("p")).count()
    assert(fp.toDouble / 2000 < 0.25, s"fp rate ${fp / 2000.0} looks saturated")
    // bit_or aggregation is order/partitioning-independent
    val again = Sketches.bloomCollect(
      Sketches.bloomWords(keys.repartition(13), "k", mBits, k), mBits)
    assert(again == words)
  }

  test("slidingDistinct: window arithmetic exact; unsaturated sketch IS the exact count") {
    import java.sql.Timestamp
    import spark.implicits._
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // day 1: users 1,2; day 2: users 2,3; day 5: user 9
    val ev = Seq((t(1), 1L), (t(1), 2L), (t(1), 2L), (t(2), 2L), (t(2), 3L),
      (t(5), 9L)).toDF("ts", "user_id")
    val out = Sketches.slidingDistinct(ev, "ts", "user_id",
        windowDays = 3, k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("k_used"),
         r.getAs[Long]("est_distinct"))).toMap
    // window(d) = days d-2..d: w(1)={1,2}, w(2)={1,2,3}, w(5)={9}
    assert(out.keySet == Set("2024-01-01", "2024-01-02", "2024-01-05"))
    assert(out("2024-01-01") == ((2L, 2L, 2L)))
    assert(out("2024-01-02") == ((3L, 3L, 3L)))   // day-1 sketch merged in
    assert(out("2024-01-05") == ((1L, 1L, 1L)))   // day 2 outside the window
    // saturation: 500 users in one day with k=16 still estimates sanely
    val big = (1 to 500).map(u => (t(10), u.toLong)).toDF("ts", "user_id")
    val sat = Sketches.slidingDistinct(big, "ts", "user_id", 3, k = 16)
      .collect().head
    assert(sat.getAs[Long]("k_used") == 16L)
    val est = sat.getAs[Long]("est_distinct")
    assert(est > 100L && est < 2500L, s"KMV estimate wildly off: $est for 500")
  }

  test("groupedHeavyHitters: per-group guarantees with a planted hitter in one group") {
    // group "hotsrc": 600 of 1000 tokens are "boiler" (way above n/9 for
    // k=8); group "flat": 40 tokens uniform over 40 words (none heavy)
    val hot = spark.range(600).select(lit("hotsrc").as("source"), lit("boiler").as("text"))
      .unionAll(spark.range(400).select(lit("hotsrc").as("source"),
        concat(lit("w"), col("id") % 200).as("text")))
    val flat = spark.range(40).select(lit("flat").as("source"),
      concat(lit("u"), col("id")).as("text"))
    val out = Sketches.groupedHeavyHitters(
        hot.unionAll(flat).repartition(8), "source", "text", k = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("hotsrc", "flat"))
    val h = out("hotsrc")
    assert(h.getAs[Long]("n_tokens") == 1000L)
    assert(h.getAs[Long]("n_heavy_exact") == 1L)       // only "boiler"
    assert(h.getAs[Boolean]("all_heavy_covered"))
    assert(h.getAs[Boolean]("est_within_bound"))
    val f = out("flat")
    assert(f.getAs[Long]("n_heavy_exact") == 0L)
    assert(f.getAs[Boolean]("all_heavy_covered") && f.getAs[Boolean]("est_within_bound"))
  }

  test("hll: registers are dense, bounded, and merge = pointwise max = union") {
    val a = spark.range(0, 3000).select(col("id").as("k"))
    val b = spark.range(2000, 5000).select(col("id").as("k"))
    val ra = Sketches.hllRegisters(a, "k", 32)
    val rb = Sketches.hllRegisters(b, "k", 32)
    assert(ra.count() == 32 && rb.count() == 32, "registers must be dense")
    ra.collect().foreach { r =>
      val reg = r.getAs[Long]("reg")
      assert(reg >= 0L && reg <= 43L, s"register out of range: $reg")
    }
    val merged = Sketches.hllMerge(ra, rb)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("reg")).toMap
    val direct = Sketches.hllRegisters(a.unionAll(b), "k", 32)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("reg")).toMap
    assert(merged == direct, "merge must equal the sketch of the union")
  }

  test("hll: estimate is within 3 sigma of a known cardinality") {
    // m=32 -> relative standard error 1.04/sqrt(32) ~ 18.4%; 3 sigma ~ 55%
    val items = spark.range(0, 5000).select(col("id").as("k"))
    val est = Sketches.hllEstimate(Sketches.hllRegisters(items, "k", 32), 32)
      .collect().head.getAs[Long]("est_distinct")
    assert(est > 2250L && est < 7750L, s"estimate off: $est for 5000 distinct")
  }

  test("hll: empty input reports all buckets empty and the known raw bias") {
    val row = Sketches.hllEstimate(
      Sketches.hllRegisters(
        spark.range(0).select(col("id").as("k")), "k", 32), 32)
      .collect().head
    assert(row.getAs[Long]("empty_buckets") == 32L)
    // raw HLL estimate without linear counting is alpha*m = ~22, not 0 —
    // empty_buckets is reported exactly so a caller can apply the
    // small-range correction
    assert(row.getAs[Long]("est_distinct") == 697L * 1024L / 32000L)
  }

  test("hll: duplicate items do not move the registers") {
    val once = spark.range(0, 1000).select(col("id").as("k"))
    val thrice = once.unionAll(once).unionAll(once)
    val r1 = Sketches.hllRegisters(once, "k", 32)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("reg")).toMap
    val r3 = Sketches.hllRegisters(thrice.repartition(8), "k", 32)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("reg")).toMap
    assert(r1 == r3, "multiplicity must not affect a distinct-count sketch")
  }
}
