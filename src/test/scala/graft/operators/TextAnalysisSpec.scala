package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("qualityGate: failed-rule reasons accumulate; NULL signals fail closed") {
    val docs = Seq(
      (1L, ("the quick value " * 20).trim), // 60 tokens, stopwords present → keep
      (2L, "tiny doc"),                     // too short + no stopword signal
      (3L, "")).toDF("doc_id", "text")
    val rows = TextAnalysis.qualityGate(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Boolean]("keep") && rows(0).getAs[String]("failed_rules") == "")
    assert(rows(1).getAs[String]("failed_rules") == "n_tokens_in_range,stopword_ratio_min")
    assert(rows(2).getAs[String]("failed_rules") ==
      "n_tokens_in_range,avg_token_len_in_range,stopword_ratio_min")
  }

  test("qualityClassifier: sigmoid of the fixed-order weighted signal sum") {
    val docs = Seq((2L, "tiny doc")).toDF("doc_id", "text")
    val got = TextAnalysis.qualityClassifier(docs, "doc_id", "text")
      .collect().head.getDouble(1)
    // signals: n_tokens=2, avg_token_len=3.5, stopword=0, punct=0
    val z = -2.0 + 3.5 * 0.5 + 2 * 0.01 + 0.0 * -3.0 + 0.0 * 2.0
    val expected = math.round(1.0 / (1.0 + math.exp(-z)) * 10000) / 10000.0
    assert(got == expected)
  }

  test("buildVocab + encode: rank ids, position order, OOV → unk") {
    val docs = Seq(
      (1L, "b a a c a b"),
      (2L, "a b zz")).toDF("doc_id", "text")
    // counts: a=4, b=3, c=1, zz=1 → vocab(3): a=0, b=1, c=2; zz OOV
    val vocab = TextAnalysis.buildVocab(docs, "text", maxVocab = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(vocab == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    val enc = TextAnalysis.encode(docs, "doc_id", "text",
        TextAnalysis.buildVocab(docs, "text", maxVocab = 3))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(enc.toSeq == Seq(
      (1L, "1 0 0 2 0 1", 6L),
      (2L, "0 1 -1", 3L)))
  }

  test("lmScore: add-1 bigram probabilities match hand computation; short docs absent") {
    // corpus: "a b" ×2, "a c", "z". bigram counts: c(a b)=2, c(a c)=1;
    // context c1(a)=3; vocab {a,b,c,z} → V=4 (the 1-token doc still counts
    // toward vocab even though it has no bigram and is absent from output)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.lmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def r4(x: Double) = math.round(x * 10000) / 10000.0
    assert(rows.toSeq == Seq(
      (1L, 1L, r4(math.log(3.0 / 7))),   // (2+1)/(3+4)
      (2L, 1L, r4(math.log(3.0 / 7))),
      (3L, 1L, r4(math.log(2.0 / 7)))))  // (1+1)/(3+4)
  }

  test("normalize_text: composed, decomposed and cased spellings all collide") {
    val df = Seq(
      (1, "Café"), (2, "Café"), (3, "CAFÉ"), (4, "cafe"),
      (5, "niño"), (6, "nin\u0303o"),
      (7, "日本語"), (8, null: String)).toDF("id", "t")
      .select(col("id"), graft.functions.normalize_text(col("t")).as("n"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert((1 to 4).map(df).toSet == Set("cafe"),
      "composed/decomposed/cased variants of the same word must collide")
    assert(df(5) == "nino" && df(6) == "nino")
    assert(df(7) == "日本語", "CJK text passes through untouched")
    assert(df(8) == null)
  }

  test("tokens: whitespace split, empty and blank → empty array") {
    val df = Seq("a b  c", "", "   ", "one").toDF("t")
      .select(size(TextAnalysis.tokens(col("t"))).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(3, 0, 0, 1))
  }

  test("qualityScore: empty doc yields NULL ratios, not div-by-zero") {
    val df = Seq((1L, "the cat."), (2L, "")).toDF("id", "text")
    val rows = TextAnalysis.qualityScore(df, "id", "text")
      .orderBy("id").collect()
    assert(rows(0).getAs[Long]("n_tokens") == 2)
    assert(rows(0).getAs[Double]("stopword_ratio") == 0.5)
    assert(rows(0).getAs[Double]("punct_ratio") == math.round(1.0 / 8.0 * 10000) / 10000.0)
    assert(rows(1).getAs[Long]("n_tokens") == 0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("avg_token_len")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("stopword_ratio")))
  }

  test("qualityScore kernel matches the pure-builtin formulation on real + edge docs") {
    val real = spark.read.parquet(sfDir + "/documents.parquet")
      .select("doc_id", "text")
    val edges = Seq(
      (90001L, "\ttab-led text the and"),      // Java split leading-empty quirk
      (90002L, "  spaces  around  "),
      (90003L, ""),
      (90004L, "THE Cat, IS... §wörld 电脑!"), // case fold + non-ASCII + CJK
      (90005L, "avertical\ftab\rmix\n"),
      (90006L, "!!! ??? ###")).toDF("doc_id", "text")
    val docs = real.unionByName(edges)
    val kernel = TextAnalysis.qualityScore(docs, "doc_id", "text")
    val hof = TextAnalysis.qualityScoreHof(docs, "doc_id", "text")
    val d1 = kernel.exceptAll(hof).collect()
    val d2 = hof.exceptAll(kernel).collect()
    assert(d1.isEmpty && d2.isEmpty,
      s"kernel-only: ${d1.take(3).mkString(";")} | hof-only: ${d2.take(3).mkString(";")}")
  }

  test("repetitionStats: duplicate/bullet/ellipsis lines and symbol tokens") {
    val df = Seq(
      (1L, "same line\nsame line\n- bullet\nmore...\n"),
      (2L, "one two :: --")).toDF("id", "text")
    val rows = TextAnalysis.repetitionStats(df, "id", "text").orderBy("id").collect()
    assert(rows(0).getAs[Long]("n_lines") == 4)
    assert(rows(0).getAs[Double]("dup_line_frac") == 0.25)
    assert(rows(0).getAs[Double]("bullet_line_frac") == 0.25)
    assert(rows(0).getAs[Double]("ellipsis_line_frac") == 0.25)
    assert(rows(1).getAs[Double]("symbol_token_ratio") == 0.5)
  }

  test("topTokens: lowercased frequency heavy hitters with deterministic ties") {
    val df = Seq((1L, "B b a c"), (2L, "a A d")).toDF("id", "text")
    val top = TextAnalysis.topTokens(df, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("langId kernel matches the pure-builtin formulation on real docs") {
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val kernel = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
    val hof = docs.select(col("doc_id"), TextAnalysis.langIdHof(col("text")).as("l"))
    assert(kernel.exceptAll(hof).count() == 0)
    assert(hof.exceptAll(kernel).count() == 0)
  }

  test("langId: marker words and CJK dominate; no signal → und") {
    val df = Seq(
      (1L, "the cat is on the mat"),
      (2L, "der Hund ist gut und das ist schön"),
      (3L, "电脑 很 好"),
      (4L, "zzz qqq")).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .orderBy("id").as[(Long, String)].collect().map(_._2)
    assert(out.toSeq == Seq("en", "de", "zh", "und"))
  }

  test("bpe tokenizer: contractions, digit runs, punctuation split") {
    val df = Seq("I'll add 42 items, ok?").toDF("t")
      .select(TextAnalysis.bpeTokens(col("t")).as("p"))
    val pieces = df.as[Seq[String]].collect().head
    // I | 'll | ' add' | ' 42' | ' items' | , | ' ok' | ?
    assert(pieces == Seq("I", "'ll", " add", " 42", " items", ",", " ok", "?"))
  }

  test("fingerprint is case/whitespace canonical") {
    val df = Seq(("A  B\tc", "a b c")).toDF("x", "y")
      .select((TextAnalysis.fingerprint(col("x")) === TextAnalysis.fingerprint(col("y"))).as("eq"))
    assert(df.as[Boolean].collect().head)
  }

  test("htmlExtract: blocks drop whole, tags strip, entities decode once") {
    def extract(html: String): String =
      Seq(html).toDF("h")
        .select(TextAnalysis.htmlExtract(col("h")).as("c"))
        .as[String].collect().head
    // head/script/style/comment character data is NOT content
    assert(extract("<html><head><title>nope</title></head><body>" +
      "<script>var a = '<b>x</b>';\nvar b = 2;</script>" +
      "<style>p { color: red }</style><!-- nope -->" +
      "<p>Hello   <b>world</b></p></body></html>") == "Hello world")
    // entities decode exactly once: &amp;lt; is the LITERAL text "&lt;",
    // never a second-round "<" (the double-decode bug)
    assert(extract("<p>a &amp; b &lt;tag&gt; &quot;q&#39; &amp;lt;</p>") ==
      "a & b <tag> \"q' &lt;")
    // attributes with > inside quotes are out of scope by spec; plain
    // attributes strip with the tag
    assert(extract("<a href=\"x\" class='y'>link</a> tail") == "link tail")
    assert(extract("") == "")
  }

  test("rougeN: clipped multiset overlap, hand arithmetic, empty-side zeros") {
    val pairs = Seq(
      (1L, "the cat the", "the cat sat"),
      (2L, "", "the cat"),
      (3L, "the cat", ""))
      .toDF("id", "cand", "ref")
    val r1 = TextAnalysis.rougeN(pairs, "id", "cand", "ref", 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // cand {the:2, cat:1} vs ref {the:1, cat:1, sat:1}: clipped = 1 + 1
    assert(r1(1L) == ((2L, 0.666667, 0.666667, 0.666667)))
    assert(r1(2L) == ((0L, 0.0, 0.0, 0.0)))  // empty candidate
    assert(r1(3L) == ((0L, 0.0, 0.0, 0.0)))  // empty reference
    val r2 = TextAnalysis.rougeN(pairs, "id", "cand", "ref", 2)
      .filter(col("id") === 1).collect().head
    // bigrams: {"the cat","cat the"} vs {"the cat","cat sat"} → overlap 1
    assert((r2.getLong(1), r2.getDouble(4), r2.getDouble(5), r2.getDouble(6)) ==
      ((1L, 0.5, 0.5, 0.5)))
  }

  test("htmlLinks: href/anchor pairs stay aligned, nested markup strips, no links → no rows") {
    val docs = Seq(
      (1L, "<a href=\"https://a.com/1\">one</a><p>x</p>" +
        "<a class=\"z\" href=\"/two\">t<b>w</b>o</a>"),
      (2L, "no links at all"),
      (3L, "<A HREF=\"https://up.com\">CASED TAG</A>"))
      .toDF("doc_id", "h")
    val out = TextAnalysis.htmlLinks(docs, "doc_id", "h")
      .orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, "https://a.com/1", "one"),
      (1L, 1L, "/two", "t w o"),   // nested tags strip to spaces, collapsed
      (3L, 0L, "https://up.com", "CASED TAG")))
  }

  test("sourceEntropy: closed-form checks and summation-order independence") {
    import spark.implicits._
    // uniform over 4 tokens → exactly 2 bits = 2_000_000 µbits
    // (each term: round(1e6 · ¼ · log2 4) = 500000 — no rounding slack);
    // single repeated token → 0 bits
    val df = Seq(
      ("u", "a b c d"), ("u", "c d a b"),
      ("mono", "x x x x x")).toDF("source", "text")
    val out = TextAnalysis.sourceEntropy(df, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_terms"),
         r.getAs[Long]("entropy_ubits"))).toMap
    assert(out("u") == ((8L, 4L, 2000000L)))
    assert(out("mono") == ((5L, 1L, 0L)))
    // per-term fixed-point contributions make the sum independent of
    // partitioning / merge order
    val skewed = TextAnalysis.sourceEntropy(df.repartition(7), "source", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("entropy_ubits")).toMap
    assert(skewed("u") == 2000000L && skewed("mono") == 0L)
  }

  test("jsDivergence: 0 for identical distributions, exactly 1 bit for disjoint ones") {
    import spark.implicits._
    val df = Seq(
      ("a", "w x y z"), ("b", "z y x w"),       // identical distributions
      ("c", "p q r s")                           // disjoint from both
    ).toDF("source", "text")
    val out = TextAnalysis.jsDivergence(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_terms"), r.getAs[Long]("n_shared"),
         r.getAs[Long]("js_ubits"))).toMap
    // identical → every per-term log2(2p/(p+q)) is log2(1) = 0
    assert(out(("a", "b")) == ((4L, 4L, 0L)))
    // disjoint uniform-4 vs uniform-4 → 8 one-sided terms, each
    // round(1e6 · 0.5 · 0.25 · log2 2) = 125000 → exactly 1 bit
    assert(out(("a", "c")) == ((8L, 0L, 1000000L)))
    assert(out(("b", "c")) == ((8L, 0L, 1000000L)))
  }

  test("chrF: hand-checked char-gram counts, whitespace stripped, F2 recall weighting") {
    import spark.implicits._
    val df = Seq(
      (1L, "abc def", "abc def"),       // identical → stripped "abcdef", 3 3-grams, P=R=F2=1
      (2L, "abcdxf", "abcdef"),         // grams abc,bcd,cdx,dxf vs abc,bcd,cde,def → ov 2
      (3L, "ab", "abcdef")              // cand too short → 0 grams, P=0
    ).toDF("id", "cand", "ref")
    val out = TextAnalysis.chrF(df, "id", "cand", "ref", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_overlap"), r.getAs[Long]("n_cand"),
         r.getAs[Double]("precision"), r.getAs[Double]("recall"),
         r.getAs[Double]("f2"))).toMap
    assert(out(1L) == ((4L, 4L, 1.0, 1.0, 1.0)))
    assert(out(2L)._1 == 2L && out(2L)._2 == 4L)
    assert(out(2L)._3 == 0.5 && out(2L)._4 == 0.5)
    // F2 weights recall 4:1 — for asymmetric P/R the score sits near R
    val p = 0.5; val r = 0.5
    assert(math.abs(out(2L)._5 - 5 * p * r / (4 * p + r)) < 1e-9)
    assert(out(3L)._3 == 0.0 && out(3L)._5 == 0.0)
  }

  test("decode: 64k vocab rides a broadcast join, never a plan-literal map") {
    import spark.implicits._
    val vocabBig = spark.range(0, 65536).select(col("id").as("token_id"),
      concat(lit("tk"), col("id")).as("token"))
    val encoded = Seq((0L, "0 65535 999999"), (1L, ""), (2L, "42 42"),
        (3L, "42 42")) // duplicate sequence: both rows must decode
      .toDF("doc_id", "token_ids")
    val out = TextAnalysis.decode(encoded, "token_ids", vocabBig)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("tk60000"), "vocab leaked into the plan as literals")
    assert(plan.length < 200000, s"plan bloat: ${plan.length} chars")
    val got = out.orderBy("doc_id").collect().map(_.getAs[String]("decoded"))
    assert(got(0) == "tk0 tk65535 <unk>")
    assert(got(1) == "<unk>") // "" splits to [""] → unk, both paths
    assert(got(2) == "tk42 tk42")
    assert(got(3) == "tk42 tk42")
    // forced-join path ≡ literal path on the same small vocab
    val vocabSmall = spark.range(0, 10).select(col("id").as("token_id"),
      concat(lit("tk"), col("id")).as("token"))
    val viaLit = TextAnalysis.decode(encoded, "token_ids", vocabSmall)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("decoded"))).toSeq
    val viaJoin = TextAnalysis.decode(encoded, "token_ids", vocabSmall,
        literalMax = 0)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("decoded"))).toSeq
    assert(viaLit == viaJoin)
  }

  test("ngramRepetition: hand-computed trigram signals, deterministic tie-break") {
    import spark.implicits._
    val docs = Seq(
      // "a b a b a b": trigrams [a b a, b a b, a b a, b a b] →
      // n=4, top count 2, tie between "a b a"/"b a b" → lex smallest,
      // dup mass 4 (both grams occur twice)
      (0L, "a b a b a b"),
      // all distinct trigrams
      (1L, "w x y z"),
      // fewer than 3 tokens → no output row
      (2L, "one two"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramRepetition(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(out.length == 2, s"short/empty docs must drop: ${out.toSeq}")
    val r0 = out(0)
    assert(r0.getLong(0) == 0L && r0.getLong(1) == 4L)
    assert(r0.getString(2) == "a b a", "tie must break to the lex-smallest gram")
    assert(r0.getLong(3) == 2L)
    assert(r0.getDouble(4) == 0.5 && r0.getDouble(5) == 1.0)
    val r1 = out(1)
    assert(r1.getLong(1) == 2L && r1.getLong(3) == 1L)
    assert(r1.getString(2) == "w x y")
    assert(r1.getDouble(4) == 0.5 && r1.getDouble(5) == 0.0)
  }

  test("qualityKeep equals qualityGate.keep on the real documents table") {
    val docs = spark.read.parquet(sfDir + "/documents.parquet")
    val viaGate = TextAnalysis.qualityGate(docs, "doc_id", "text")
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaKeep = docs.select(col("doc_id"),
        TextAnalysis.qualityKeep(col("text")).as("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaGate == viaKeep, "in-row verdict drifted from the gate relation")
    assert(viaKeep.values.exists(identity) && viaKeep.values.exists(!_),
      "fixture must exercise both verdicts")
  }

  test("scriptCensus: per-script counts, remainder, dominant with tie priority") {
    import spark.implicits._
    val df = Seq(
      (1L, "hello world"),        // latin 10, space 1
      (2L, "你好 мир"),            // cjk 2, cyrillic 3 → cyrillic wins count
      (3L, "abc 你好世界"),        // latin 3 < cjk 4 → cjk
      (4L, "42 !!"),              // digits only → dominant none
      (5L, "ab 你好")              // latin 2 == cjk 2 → tie → latin (priority)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptCensus(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_latin"), r.getAs[Long]("n_cjk"),
         r.getAs[Long]("n_cyrillic"), r.getAs[Long]("n_digit"),
         r.getAs[Long]("n_other"), r.getAs[String]("dominant_script"))).toMap
    assert(out(1L) == ((10L, 0L, 0L, 0L, 1L, "latin")))
    assert(out(2L) == ((0L, 2L, 3L, 0L, 1L, "cyrillic")))
    assert(out(3L) == ((3L, 4L, 0L, 0L, 1L, "cjk")))
    assert(out(4L)._6 == "none" && out(4L)._4 == 2L && out(4L)._5 == 3L)
    assert(out(5L)._6 == "latin", s"tie must break to latin: ${out(5L)}")
  }

  test("encodingQuality: mojibake signals counted exactly, ppm integer-exact") {
    import spark.implicits._
    val df = Seq(
      (1L, "clean ascii text"),
      (2L, "cafÃ© naÃ¯ve"), // double-encoded é and ï
      (3L, "bad � bytes �"),
      (4L, "ctrl"),
      (5L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.encodingQuality(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[Long]("n_replacement"),
         r.getAs[Long]("n_c1_controls"), r.getAs[Long]("n_double_utf8"),
         r.getAs[Long]("mojibake_ppm"))).toMap
    assert(out(1L) == ((16L, 0L, 0L, 0L, 0L)))
    assert(out(2L)._4 == 2L && out(2L)._2 == 0L, s"doc2 ${out(2L)}")
    assert(out(3L)._2 == 2L)
    assert(out(4L)._3 == 2L)
    assert(out(4L)._5 == 2000000L / 6L) // BIGINT div, length 6
    assert(out(5L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("chrF: grams count CODE POINTS — surrogate pairs never split") {
    import spark.implicits._
    // "a🍕b" is 3 code points but 4 UTF-16 units; with k=2 the codepoint
    // grams are exactly {a🍕, 🍕b}. A code-unit walk would emit 3 grams,
    // one of them a bare surrogate half — and would diverge from the
    // codepoint-based DuckDB substr/length oracle on any non-BMP corpus.
    val df = Seq(
      (1L, "a🍕b", "a🍕b"),  // identical incl. emoji
      (2L, "a🍕b", "a🍕c"),  // share only the a🍕 gram
      (3L, "🍕", "🍕x")      // cand = 1 cp < k → 0 grams
    ).toDF("id", "cand", "ref")
    val out = TextAnalysis.chrF(df, "id", "cand", "ref", k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_overlap"), r.getAs[Long]("n_cand"),
         r.getAs[Long]("n_ref"))).toMap
    assert(out(1L) == ((2L, 2L, 2L)), s"got ${out(1L)}")
    assert(out(2L) == ((1L, 2L, 2L)), s"got ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 1L)), s"got ${out(3L)}")
  }

  test("langConsistency: uniform docs pass, mixed en/de doc flags, short docs chunk sanely") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat is of the and to is the dog of and is to the end"),
      (2L, "the cat is of the and to is der hund und die katze ist das"),
      (3L, "x y")   // 2 tokens → w=1, only 2 live chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langConsistency(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_chunks"), r.getAs[String]("chunk_langs"),
         r.getAs[Boolean]("mixed"))).toMap
    assert(out(1L)._1 == 4L && !out(1L)._3, s"uniform doc flagged: ${out(1L)}")
    assert(out(2L)._3, s"mixed doc not flagged: ${out(2L)}")
    assert(out(2L)._2.split(",").contains("de"))
    assert(out(3L)._1 == 2L)
  }

  test("collocations: counts, PMI sign, hapax filter") {
    import spark.implicits._
    // "a b" appears 3×, "b a" 2×, "b c"/"c a" once (hapax → filtered)
    val df = Seq((1L, "a b a b a b c a")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(df, "text", k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("c_xy"), r.getAs[Long]("c_x"), r.getAs[Long]("c_y"),
         r.getAs[Long]("pmi_ubits"))).toMap
    assert(out.keySet == Set("a b", "b a"))
    assert(out("a b")._1 == 3L && out("a b")._2 == 4L && out("a b")._3 == 3L)
    // PMI("a b") = log2((3/7)/((4/8)·(3/8))) = log2(16/7) > 0 → associated
    assert(out("a b")._4 == math.round(1e6 * math.log(3.0 / 7 / (0.5 * 3.0 / 8)) / math.log(2)))
    assert(out("a b")._4 > 0L)
  }

  test("c4Clean: every line rule and every page rule fires") {
    import spark.implicits._
    val good = "One solid line ends properly.\nA second fine line stays here.\nThird keeper line is good."
    val df = Seq(
      (1L, good),                                            // 3 kept → page kept
      (2L, good + "\nbad line no punct\nJavaScript is bad."), // extra lines drop, page survives
      (3L, good + "\nlorem ipsum"),                          // page marker → dropped
      (4L, good + "\nhas a { brace."),                       // brace → dropped
      (5L, "Only two keepers here today.\nSecond keeper line stays fine.") // 2 < 3 → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Clean(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[Long]("n_lines"),
         r.getAs[Long]("n_kept_lines"), r.getAs[String]("cleaned"))).toMap
    assert(out(1L) == ((true, 3L, 3L, good)))
    // "JavaScript is bad." ends in punct + 3 words but mentions javascript
    assert(out(2L) == ((true, 5L, 3L, good)))
    assert(out(3L)._1 == false && out(3L)._4 == "")
    assert(out(4L)._1 == false)
    assert(out(5L) == ((false, 2L, 2L, "")))
  }

  test("distinctNgrams: hand-checked distinct-1/2 on a repeating doc") {
    import spark.implicits._
    val df = Seq(("s", "a b a b")).toDF("source", "text")
    val out = TextAnalysis.distinctNgrams(df, "source", "text", Seq(1, 2))
      .collect().map(r => r.getAs[Long]("n") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct"),
         r.getAs[Double]("distinct_ratio"))).toMap
    // unigrams: a b a b → 4 windows, 2 distinct; bigrams: "a b","b a","a b"
    assert(out(1L) == ((4L, 2L, 0.5)))
    assert(out(2L) == ((3L, 2L, 0.666667)))
  }

  test("corpusBleu: identical candidate and reference scores 1.0") {
    import spark.implicits._
    val pairs = Seq((1L, "the cat sat on the mat", "the cat sat on the mat"),
      (2L, "a b c d e", "a b c d e")).toDF("id", "cand", "ref")
    val r = TextAnalysis.corpusBleu(pairs, "id", "cand", "ref").collect().head
    (1 to 4).foreach { n =>
      assert(r.getAs[Long](s"match_$n") == r.getAs[Long](s"total_$n"))
      assert(r.getAs[Double](s"p_$n") == 1.0)
    }
    assert(r.getAs[Double]("bp") == 1.0 && r.getAs[Double]("bleu") == 1.0)
  }

  test("corpusBleu: brevity penalty and per-order precisions by hand") {
    import spark.implicits._
    // cand "the cat sat" vs ref "the cat sat on the mat" (maxN=3):
    // p1=3/3, p2=2/2, p3=1/1, bp=exp(1-6/3)=exp(-1)
    val pairs = Seq((1L, "the cat sat", "the cat sat on the mat"))
      .toDF("id", "cand", "ref")
    val r = TextAnalysis.corpusBleu(pairs, "id", "cand", "ref", maxN = 3)
      .collect().head
    assert(r.getAs[Long]("match_1") == 3L && r.getAs[Long]("total_1") == 3L)
    assert(r.getAs[Long]("match_3") == 1L && r.getAs[Long]("total_3") == 1L)
    assert(r.getAs[Double]("bp") == 0.367879) // round(exp(-1), 6)
    assert(r.getAs[Double]("bleu") == 0.367879)
  }

  test("corpusBleu: repeated candidate n-grams are clipped at the reference count") {
    import spark.implicits._
    val pairs = Seq((1L, "the the the the", "the cat")).toDF("id", "cand", "ref")
    val r = TextAnalysis.corpusBleu(pairs, "id", "cand", "ref").collect().head
    assert(r.getAs[Long]("match_1") == 1L, "clip at ref count 1")
    assert(r.getAs[Long]("total_1") == 4L)
    assert(r.getAs[Double]("p_1") == 0.25)
    // no 4-gram in a 2-token ref -> p_4 = 0 -> bleu hard-zeroes
    assert(r.getAs[Double]("bleu") == 0.0)
  }

  test("corpusBleu: empty candidate yields zero score, not a crash") {
    import spark.implicits._
    val pairs = Seq((1L, "", "the cat")).toDF("id", "cand", "ref")
    val r = TextAnalysis.corpusBleu(pairs, "id", "cand", "ref").collect().head
    assert(r.getAs[Long]("cand_len") == 0L)
    assert(r.getAs[Double]("bp") == 0.0 && r.getAs[Double]("bleu") == 0.0)
  }
}
