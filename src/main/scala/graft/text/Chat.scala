package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chat-template rendering for SFT corpora: ordered (role, text) turns
  * become one training sequence per conversation PLUS the
  * assistant-only loss spans — the half-open character ranges a
  * trainer masks loss to (supervise the assistant's tokens, not the
  * user's). Every SFT pipeline runs this transform; getting the span
  * arithmetic wrong silently trains on user text.
  *
  * Template: each turn renders as `<|role|>text<|end|>`; the
  * conversation is the in-order concatenation. A turn's content starts
  * at (sum of prior rendered lengths) + len("<|role|>") — pure
  * running-sum window arithmetic, exactly reproducible in SQL, no UDF.
  *
  * Shape: ONE (conversation)-keyed sort carries both the offset window
  * and the final assembly aggregate; spans ride the same rows. Long
  * conversations are bounded by turns-per-conversation, never by the
  * corpus.
  */
object Chat {

  /** One row per (conversation, assistant turn): the fully rendered
    * conversation text plus that turn's half-open loss span [s, e).
    * Conversations whose turns are all non-assistant still emit their
    * text once with a null span (they carry context shards a packer
    * may still want).
    */
  def renderWithLossSpans(turns: DataFrame, conv: String, idx: String,
      role: String, text: String): DataFrame = {
    val rendered = concat(lit("<|"), col(role), lit("|>"), col(text),
      lit("<|end|>"))
    // the offset window's tie order MUST equal the assembly's
    // array_sort order ((turn_idx, rendered)): a duplicate turn_idx
    // with divergent tie-breaks would point a loss span into the
    // NEIGHBORING turn's characters with no error raised
    val w = Window.partitionBy(col("conv_id"))
      .orderBy(col("turn_idx"), col("r"))
    val withOff = turns
      .select(col(conv).as("conv_id"), col(idx).as("turn_idx"),
        col(role).as("role"), col(text).as("t"),
        rendered.as("r"))
      .withColumn("off",
        coalesce(sum(length(col("r")))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val assembled = withOff
      .groupBy(col("conv_id"))
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("turn_idx"), col("r")))),
          x => x.getField("r")), "").as("text"))
    val spans = withOff
      .where(col("role") === "assistant")
      .select(col("conv_id"), col("turn_idx").as("span_turn"),
        (col("off") + length(col("role")) + lit(4L)).as("s"),
        (col("off") + length(col("role")) + lit(4L) + length(col("t")))
          .as("e"))
    assembled.join(spans, Seq("conv_id"), "left")
      .select(col("conv_id"), col("text"), col("span_turn"), col("s"),
        col("e"))
  }

  /** Alternation audit — the validity gate ahead of rendering: per
    * conversation, flags for the turn-structure defects SFT trainers
    * reject (first turn not `user`, consecutive same-role turns, no
    * assistant turn at all, gaps in the turn index).
    */
  def alternationAudit(turns: DataFrame, conv: String, idx: String,
      role: String): DataFrame = {
    val w = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    turns
      .select(col(conv).as("conv_id"), col(idx).as("turn_idx"),
        col(role).as("role"))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("prev_idx", lag(col("turn_idx"), 1).over(w))
      .groupBy(col("conv_id"))
      .agg(
        (min_by(col("role"), col("turn_idx")) =!= lit("user"))
          .as("bad_opening"),
        max(when(col("prev_role") === col("role"), 1).otherwise(0))
          .cast("boolean").as("repeated_role"),
        (sum(when(col("role") === "assistant", 1).otherwise(0)) === 0)
          .as("no_assistant"),
        max(when(col("prev_idx").isNotNull &&
            col("turn_idx") =!= col("prev_idx") + 1, 1).otherwise(0))
          .cast("boolean").as("index_gap"))
  }
}
