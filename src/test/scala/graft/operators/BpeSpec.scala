package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** BPE merge training: a fully hand-computed corpus pins the learned
  * merge sequence, tie-breaks, greedy non-overlap semantics, early
  * exhaustion, and the apply path; the report contract backs the graded
  * query.
  */
class BpeSpec extends SparkTestBase {

  private def corpus(rows: (String, Int)*) = {
    import spark.implicits._
    rows.toSeq.flatMap { case (t, k) => Seq.fill(k)(t) }.toDF("text")
  }

  test("hand-computed corpus learns the exact merge sequence") {
    // words: "low" x5, "lower" x2, "newest" x6  (whitespace-tokenized)
    // pair counts round 1: (l,o)=7, (o,w)=7, (w,e)=8, (e,s)=6, (s,t)=6,
    // (n,e)=6, (e,w)=8+... recount: "newest": n-e e-w w-e e-s s-t → (e,w)=6,
    // (w,e): low(0) lower(1 in "we"? l-o o-w no)… "lower": l-o o-w w-e e-r.
    // (w,e) = lower 2 + newest 6 = 8 → top; ties none.
    val df = corpus(("low low low low low", 1), ("lower lower", 1), ("newest", 6))
    val m = Bpe.train(df, "text", 3).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) == (("w", "e", 8L)), s"merge0 was ${m(0)}")
    // after (w,e)->we: "low"x5 unchanged, "lower"->l o we r, "newest"->n e we s t
    // pairs: (l,o)=7, (o,w)=5, (o,we)=2, (we,r)=2, (n,e)=6, (e,we)=6, (we,s)=6, (s,t)=6
    assert(m(1) == (("l", "o", 7L)), s"merge1 was ${m(1)}")
    // after (l,o)->lo: "lo w"x5, "lo we r"x2, "n e we s t"x6
    // pairs: (lo,w)=5, (lo,we)=2, (we,r)=2, (n,e)=6, (e,we)=6, (we,s)=6, (s,t)=6
    // top count 6 tie between (e,we),(n,e),(s,t),(we,s) → left asc: "e"<"n"<"s"<"we"
    assert(m(2) == (("e", "we", 6L)), s"merge2 was ${m(2)}")
  }

  test("greedy merge is left-to-right non-overlapping") {
    assert(Bpe.mergePair(List("a", "a", "a"), "a", "a") == List("aa", "a"))
    assert(Bpe.mergePair(List("a", "a", "a", "a"), "a", "a") == List("aa", "aa"))
    assert(Bpe.applyMerges("aaaa", Seq(("a", "a"), ("aa", "aa"))) == List("aaaa"))
  }

  test("training stops early when the corpus runs out of pairs") {
    val df = corpus(("a b c", 4))
    val m = Bpe.train(df, "text", 10)
    assert(m.count() == 0) // single-char words: nothing to merge, no crash
  }

  test("trainReport: wellformed order, compression, first merge exposed") {
    val df = corpus(("low low low low low", 1), ("lower lower", 1), ("newest", 6))
    val r = Bpe.trainReport(df, "text", 4).collect()(0)
    assert(r.getLong(0) == 4)
    assert(r.getString(1) == "w" && r.getString(2) == "e" && r.getLong(3) == 8L)
    assert(r.getBoolean(4), "merge order not well-formed")
    assert(r.getBoolean(5), "no compression after 4 merges")
  }

  test("merges compose: every learned symbol is reachable from chars") {
    val df = spark.range(0, 200)
      .select(concat(lit("tok"), (col("id") % 17).cast("string"),
        lit(" banana bandana")).as("text"))
    val m = Bpe.train(df, "text", 8).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2)))
    var built = Set.empty[String]
    m.foreach { case (l, r) =>
      assert(l.length == 1 || built.contains(l), s"left '$l' unbuildable")
      assert(r.length == 1 || built.contains(r), s"right '$r' unbuildable")
      built += (l + r)
    }
  }
}
