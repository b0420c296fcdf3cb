package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Chat rendering + loss-mask offsets ([[Conversations]]): hand-computed
  * template strings and spans, null/empty turns, and the mask-role knob.
  */
class ConversationsSpec extends SparkTestBase {
  import spark.implicits._

  // conv 1: system/user/assistant; conv 2: user then an EMPTY assistant
  // turn (null text) then assistant again
  private def turns = Seq(
    (1L, 0L, "system", "be helpful"),
    (1L, 1L, "user", "hi"),
    (1L, 2L, "assistant", "hello there"),
    (2L, 0L, "user", "question"),
    (2L, 1L, "assistant", null: String),
    (2L, 2L, "assistant", "answer")).toDF("conv_id", "turn", "role", "text")

  test("renderChat: ordered template assembly, null text keeps its markers") {
    val out = Conversations.renderChat(turns, "conv_id", "turn", "role", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == (3L,
      "<system>be helpful</s><user>hi</s><assistant>hello there</s>"))
    assert(out(2L) == (3L,
      "<user>question</s><assistant></s><assistant>answer</s>"))
  }

  test("lossMaskSpans: exact character intervals of masked text, markers excluded") {
    val spans = Conversations.lossMaskSpans(turns, "conv_id", "turn", "role", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // conv 1: prefix "<system>be helpful</s><user>hi</s>" = 34 chars;
    // "<assistant>" adds 11 → text at [45, 56)
    // conv 2: "<user>question</s>" = 18; empty assistant text at [29, 29);
    // its piece is 15 chars → next prefix 33, answer at [44, 50)
    assert(spans == Set((1L, 2L, 45L, 56L), (2L, 1L, 29L, 29L), (2L, 2L, 44L, 50L)))
    // the spans really do address the rendered string
    val rendered = Conversations.renderChat(turns, "conv_id", "turn", "role", "text")
      .filter(col("conv_id") === 1L).collect().head.getString(2)
    assert(rendered.substring(45, 56) == "hello there")
  }

  test("preferencePairs: argmax/argmin with deterministic tie-breaks, small groups drop") {
    val cands = Seq(
      (1L, 10L, "best", 9L), (1L, 11L, "mid", 5L), (1L, 12L, "worst", 1L),
      (2L, 20L, "tie-a", 7L), (2L, 21L, "tie-b", 7L), // all-tied scores
      (3L, 30L, "lonely", 4L)                         // single candidate → dropped
    ).toDF("conv_id", "cand_id", "text", "score")
    val out = Conversations.preferencePairs(cands, "conv_id", "cand_id",
        "text", "score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      1L -> (10L, 12L, 8L),
      // tied scores: larger id chosen, smaller rejected, margin 0
      2L -> (21L, 20L, 0L)))
  }

  test("validateChat: every rule fires on its own damage class, in fixed order") {
    val convs = Seq(
      (1L, 0L, "system", "s"), (1L, 1L, "user", "q"), (1L, 2L, "assistant", "a"),
      (2L, 0L, "user", "q"), (2L, 1L, "assistant", "a"),
      (3L, 0L, "system", "s"), (3L, 1L, "user", "q"), (3L, 2L, "user", "q2"),
      (3L, 3L, "assistant", "a"),
      (4L, 0L, "system", "s"), (4L, 1L, "user", "q"), (4L, 2L, "assistant", "  "),
      (5L, 0L, "system", "s"), (5L, 1L, "user", "q"), (5L, 2L, "assistant", "a"),
      (5L, 3L, "user", "follow-up")
    ).toDF("conv_id", "turn", "role", "text")
    val out = Conversations.validateChat(convs, "conv_id", "turn", "role", "text")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getString(3))).toMap
    assert(out == Map(
      1L -> (true, ""),
      2L -> (false, "starts_with_system,min_turns"),
      3L -> (false, "alternation"),
      4L -> (false, "no_empty_assistant"),
      5L -> (false, "ends_with_assistant")))
  }

  test("maskRole selects which side carries loss") {
    val spans = Conversations.lossMaskSpans(turns, "conv_id", "turn", "role", "text",
        maskRole = "user")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(spans == Set((1L, 1L), (2L, 0L)))
  }
}
