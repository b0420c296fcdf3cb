package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("simhash64: identical token arrays hash identically; SQL surface works") {
    graft.functions.registerAll(spark)
    val viaSql = spark.sql("SELECT simhash64(array('a','b','c')) AS h").as[Long].collect().head
    val viaCol = Seq(Seq("a", "b", "c")).toDF("t")
      .select(graft.functions.simhash64(col("t"))).as[Long].collect().head
    assert(viaSql == viaCol)
    val other = spark.sql("SELECT simhash64(array('x','y','z')) AS h").as[Long].collect().head
    assert(viaSql != other)
  }

  test("rolling_hash64 is deterministic and content-sensitive") {
    graft.functions.registerAll(spark)
    val Seq(a, b, a2) =
      spark.sql("SELECT rolling_hash64('hello'), rolling_hash64('world'), rolling_hash64('hello')")
        .collect().head.toSeq.map(_.asInstanceOf[Long])
    assert(a == a2 && a != b)
  }

  test("word_ngrams: all windows in order with multiplicity; empty when short") {
    val rows = Seq(
      ("a b a b a", 2, Seq("a b", "b a", "a b", "b a")),
      ("  x   y  ", 2, Seq("x y")),  // whitespace-normalized
      ("one", 2, Seq.empty[String]), // < k tokens → no window, no fallback
      ("", 3, Seq.empty[String]))
    rows.foreach { case (text, k, expected) =>
      val got = Seq(text).toDF("t")
        .select(graft.functions.word_ngrams(col("t"), k).as("g"))
        .as[Seq[String]].collect().head
      assert(got == expected, s"text='$text' k=$k: got $got")
    }
  }

  test("registerAll exposes every kernel on the SQL surface, incl. int-literal args") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      """SELECT size(word_shingles('a b c', 2)), size(word_ngrams('a b a b', 2)),
        |  bounded_levenshtein('kitten', 'sitting', 5),
        |  size(minhash_bands(word_shingles('a b c d e', 2), 64, 16)),
        |  quality_counts('ab cd')[1]""".stripMargin).collect().head
    assert(r.getInt(0) == 2 && r.getInt(1) == 3 && r.getLong(2) == 3L
      && r.getInt(3) == 16 && r.getLong(4) == 2L)
  }

  test("bounded_levenshtein matches the builtin within the band, -1 outside") {
    val pairs = Seq(
      ("kitten", "sitting"), ("abc", "abc"), ("", "ab"), ("ab", ""),
      ("abcdef", "xbcdef"), ("short", "a completely different long string"),
      ("aaaa", "aaab"), ("Qack row scan", "pack row scan"))
      .toDF("a", "b")
    Seq(0, 1, 3, 5).foreach { d =>
      val rows = pairs.select(
        graft.functions.bounded_levenshtein(col("a"), col("b"), d).as("k"),
        levenshtein(col("a"), col("b")).as("ref")).collect()
      rows.foreach { r =>
        val (k, ref) = (r.getLong(0), r.getInt(1))
        if (ref <= d) assert(k == ref, s"d=$d: kernel $k != builtin $ref")
        else assert(k == -1L, s"d=$d: expected -1 for ref=$ref, got $k")
      }
    }
    // real docs: every in-band verdict agrees with the builtin
    val real = spark.read.parquet(sfDir + "/documents.parquet").limit(200)
    val joined = real.select(col("text").as("a"), col("doc_id").as("i"))
      .crossJoin(real.select(col("text").as("b"), col("doc_id").as("j")))
      .filter(col("i") < col("j")).limit(2000)
      .select(graft.functions.bounded_levenshtein(col("a"), col("b"), 3).as("k"),
        levenshtein(col("a"), col("b")).as("ref"))
    assert(joined.filter(
      (col("ref") <= 3 && col("k") =!= col("ref")) ||
      (col("ref") > 3 && col("k") =!= -1L)).count() == 0)
  }

  test("mg_summary buffer: round-trips serialize/deserialize; corrupt frames fail cleanly") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = MisraGriesAgg(Literal("x"), k = 4)
    val buf = agg.createAggregationBuffer()
    buf.update("alpha", 3L); buf.update("beta", 1L)
    val bytes = agg.serialize(buf)
    assert(agg.deserialize(bytes) == buf)

    // corrupt entry count: huge n must be rejected before any allocation
    val badCount = bytes.clone()
    badCount(0) = 0x7f.toByte
    val e1 = intercept[IllegalArgumentException](agg.deserialize(badCount))
    assert(e1.getMessage.contains("entry count"))

    // corrupt token length prefix (first entry's length at offset 4):
    // points past the end of the frame → clean error, not an OOM-class
    // allocation or a read into the next entry's bytes
    val badLen = bytes.clone()
    badLen(4) = 0x7f.toByte
    val e2 = intercept[IllegalArgumentException](agg.deserialize(badLen))
    assert(e2.getMessage.contains("token length"))
  }

  test("topk_pairs keeps k best with deterministic tie-break") {
    val df = Seq((1L, 5.0, 10L), (1L, 5.0, 2L), (1L, 9.0, 7L), (1L, 1.0, 1L))
      .toDF("g", "score", "id")
    val top = df.groupBy("g").agg(graft.functions.topk_pairs(col("score"), col("id"), 2).as("t"))
      .select(explode(col("t"))).select("col.score", "col.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(top.toSeq == Seq((9.0, 7L), (5.0, 2L)))
  }
}
