package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each key's event stream into sessions at
  * inactivity gaps (the batch twin of the streaming
  * `session_window` drain in `graft.streaming`). Two stacked window
  * functions over ONE (key, order) sort — lag to flag gap-openers, a
  * running sum to number sessions — so the whole assignment costs a
  * single hash-partition-and-sort per key; Spark plans both windows in
  * one Window exec over one exchange.
  *
  * Scale: state is per-key and the shuffle is keyed by the session key,
  * so a 100 TB event log sessionizes with per-task input bounded by the
  * largest single key (a genuinely hot key wants a pre-split by day —
  * compose with a date column in `keyCols`).
  */
object Sessionize {

  /** Tag every event with its `session_no` (1-based, per key, in
    * (`tsCol`, `tieCol`) order): a session opens on the first event or
    * after a gap > `gapNs`. `tsCol` must be an integral epoch column
    * (nanos here — full precision; a µs/ms column works with a scaled
    * gap); `tieCol` makes ties deterministic.
    */
  def assign(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, gapNs: Long): DataFrame = {
    require(keyCols.nonEmpty, "keyCols required")
    require(gapNs > 0, "gapNs must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val opens = when(
      col(tsCol) - lag(col(tsCol), 1).over(w) > gapNs, 1L)
      .otherwise(when(lag(col(tsCol), 1).over(w).isNull, 1L)
        .otherwise(0L))
    df.withColumn("session_no",
      sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session roll-up: event count, start, and duration (same time
    * unit as `tsCol`). One keyed aggregate after [[assign]] — the
    * aggregate shuffles on (key, session_no), a superset of the window
    * key, so AQE coalesces rather than re-shuffles wide rows.
    */
  def stats(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, gapNs: Long): DataFrame =
    assign(df, keyCols, tsCol, tieCol, gapNs)
      .groupBy((keyCols :+ "session_no").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration"))
}
