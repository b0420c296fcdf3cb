package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversational (SFT/RLHF) training-data preparation: multi-turn chats
  * rendered to model-input strings with LOSS-MASK OFFSETS — the step that
  * turns a conversation table into trainable sequences. The engine's flat
  * `documents` operators (dedup, quality, packing) handle the corpus;
  * this module handles the structured half: role-tagged turns must render
  * deterministically, and the trainer needs exact character spans of the
  * assistant turns because loss is computed only on them.
  *
  * Template (fixed, deterministic): each turn renders as
  * `<role>text</s>`, concatenated in turn order. All offset arithmetic is
  * plain length accumulation, so a SQL oracle replays the whole operator
  * — rendered strings, spans and all — with window sums (the
  * engine-stable discipline: no float, no engine-specific formatting).
  *
  * Scale shape: ONE exchange on the conversation key for both operators;
  * per-key state is the conversation's own turns (conversations are many
  * and individually small — the sessionization argument). The render
  * aggregates sorted structs; spans ride a per-conversation window that
  * shares the same single sort.
  */
object Conversations {

  private def turnPiece(role: Column, text: Column): Column =
    concat(lit("<"), role, lit(">"), text, lit("</s>"))

  /** Render each conversation to one training string: turns ordered by
    * `turnCol`, each as `<role>text</s>`. Output: `conv_id, n_turns,
    * rendered`. Null text renders as the empty string (a present-but-empty
    * turn keeps its markers — dropping it would silently renumber spans).
    */
  def renderChat(turns: DataFrame, convId: String, turnCol: String,
                 role: String, text: String): DataFrame =
    turns.select(col(convId).as("conv_id"),
        struct(col(turnCol).cast("long").as("t"),
          turnPiece(col(role), coalesce(col(text), lit(""))).as("piece")).as("s"))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        array_join(transform(array_sort(collect_list(col("s"))),
          x => x.getField("piece")), "").as("rendered"))

  /** Chat-structure quality gate — the conversational analog of
    * [[TextAnalysis.qualityGate]]: named structural rules per
    * conversation, failed-rule list in a FIXED order so the verdict is
    * engine-stable, `keep` = all pass. Rules:
    * `starts_with_system` (first turn's role), `alternation` (no two
    * consecutive turns share a role), `ends_with_assistant`,
    * `no_empty_assistant` (no assistant turn whose trimmed text is
    * empty), `min_turns` (≥ `minTurns`). One combinable aggregate over
    * sorted turn structs — a single exchange on the conversation key,
    * array HOFs for the adjacency scan, no window.
    */
  def validateChat(turns: DataFrame, convId: String, turnCol: String,
                   role: String, text: String, minTurns: Int = 3): DataFrame = {
    val sorted = array_sort(collect_list(struct(
      col(turnCol).cast("long").as("t"), col(role).as("r"),
      trim(coalesce(col(text), lit(""))).as("tx"))))
    val agg = turns.select(col(convId).as("conv_id"), col(turnCol), col(role), col(text))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"), sorted.as("ts"))
    val roles = transform(col("ts"), x => x.getField("r"))
    val r1 = element_at(roles, 1) === "system"
    val r2 = !exists(
      zip_with(slice(roles, lit(1), size(roles) - 1),
        slice(roles, lit(2), size(roles) - 1), (a, b) => a === b),
      x => x)
    val r3 = element_at(roles, -1) === "assistant"
    val r4 = !exists(col("ts"),
      x => x.getField("r") === "assistant" && x.getField("tx") === "")
    val r5 = col("n_turns") >= minTurns
    agg.select(col("conv_id"), col("n_turns"),
      (r1 && r2 && r3 && r4 && r5).as("keep"),
      concat_ws(",",
        when(!r1, "starts_with_system"),
        when(!r2, "alternation"),
        when(!r3, "ends_with_assistant"),
        when(!r4, "no_empty_assistant"),
        when(!r5, "min_turns")).as("failed_rules"))
  }

  /** Preference-pair (DPO) construction: per conversation, the
    * highest-scored candidate response becomes `chosen` and the lowest
    * `rejected`, with deterministic tie-breaks (equal scores → larger /
    * smaller candidate id). Both argmax and argmin are COMBINABLE
    * min/max-of-struct aggregates — the
    * [[graft.operators.Dedup.exactByPriority]] discipline: one two-phase
    * agg exchange, map-side combined, never a window over the candidate
    * groups. Conversations with fewer than 2 distinct candidates drop
    * (no pair to learn from). Output: conv_id, n_cands, chosen_id,
    * rejected_id, margin (integer score units), and md5s of both texts
    * so the grade proves the right TEXT rode along, not just the right id.
    */
  def preferencePairs(cands: DataFrame, convId: String, candId: String,
                      text: String, score: String): DataFrame = {
    val base = cands.select(col(convId).as("conv_id"),
      struct(col(score).cast("long").as("s"),
        col(candId).cast("long").as("id"),
        coalesce(col(text), lit("")).as("t")).as("c"))
    base.groupBy("conv_id")
      .agg(count(lit(1)).as("n_cands"), max(col("c")).as("ch"),
        min(col("c")).as("rj"))
      .filter(col("n_cands") >= 2 && col("ch.id") =!= col("rj.id"))
      .select(col("conv_id"), col("n_cands"),
        col("ch.id").as("chosen_id"), col("rj.id").as("rejected_id"),
        (col("ch.s") - col("rj.s")).as("margin"),
        md5(col("ch.t").cast("binary")).as("chosen_md5"),
        md5(col("rj.t").cast("binary")).as("rejected_md5"))
  }

  /** Loss-mask spans: for every turn of `maskRole` (default assistant),
    * the 0-based character interval [start_char, end_char) its TEXT
    * occupies inside [[renderChat]]'s rendered string — markers excluded,
    * because loss is computed on the content the model should learn, not
    * on the template. One row per masked turn: `conv_id, turn, start_char,
    * end_char`.
    */
  def lossMaskSpans(turns: DataFrame, convId: String, turnCol: String,
                    role: String, text: String,
                    maskRole: String = "assistant"): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy(col("turn"))
    val pieces = turns.select(col(convId).as("conv_id"),
      col(turnCol).cast("long").as("turn"),
      col(role).as("role"),
      length(coalesce(col(text), lit(""))).cast("long").as("text_len"))
      // piece length = text + <role> + ></s> markers (role length + 6)
      .withColumn("piece_len",
        col("text_len") + length(col("role")) + lit(6L))
    pieces
      .withColumn("prefix",
        coalesce(sum(col("piece_len")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("role") === maskRole)
      .select(col("conv_id"), col("turn"),
        (col("prefix") + length(col("role")) + 2L).as("start_char"),
        (col("prefix") + length(col("role")) + 2L + col("text_len")).as("end_char"))
  }
}
