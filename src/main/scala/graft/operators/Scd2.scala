package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-oriented change data capture: the reference pipeline
  * refreshes dimension-like parquet datasets by full re-export, and the
  * two operations a consumer of successive exports needs are (1) the
  * row-level DIFF between two snapshots — what was inserted, deleted,
  * or updated, and in which columns — and (2) the SCD-type-2 HISTORY
  * that a stack of snapshots compresses into (one row per unchanged
  * run, versioned validity interval, current-flag).
  *
  * Both are single-shuffle shapes: the diff is one keyed full-outer
  * join (co-bucketable with the snapshots' storage layout), the
  * history build is lag + lead over ONE (key)-partitioned version sort.
  * Null-safe comparison (`<=>`) throughout — a NULL→value transition
  * is an update, not noise.
  */
object Scd2 {

  private def neq(a: Column, b: Column): Column = !(a <=> b)

  /** Row-level diff of two same-schema snapshots on `keys`, comparing
    * `compareCols`. Output: keys..., change_type ∈
    * insert | delete | update, changed_cols (comma-joined subset of
    * `compareCols`, empty for insert/delete), and the old/new value of
    * every compared column (`<c>_old`, `<c>_new`). Unchanged rows are
    * dropped — at snapshot scale they are the overwhelming majority and
    * the diff's whole point is to not carry them.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select((keys ++ compareCols).map(col): _*).as("o")
    val n = newSnap.select((keys ++ compareCols).map(col): _*).as("n")
    val joinCond = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val inOld = keys.map(k => col(s"o.$k").isNotNull).reduce(_ && _)
    val inNew = keys.map(k => col(s"n.$k").isNotNull).reduce(_ && _)
    val anyChange = compareCols
      .map(c => neq(col(s"o.$c"), col(s"n.$c"))).reduce(_ || _)
    // concat_ws drops NULLs, so each unchanged column contributes
    // nothing and the joined string lists exactly the changed ones in
    // declaration order
    val changedCols = concat_ws(",", compareCols.map(c =>
      when(neq(col(s"o.$c"), col(s"n.$c")), lit(c))): _*)
    o.join(n, joinCond, "full_outer")
      .withColumn("change_type",
        when(!inOld, lit("insert"))
          .when(!inNew, lit("delete"))
          .when(anyChange, lit("update")))
      .where(col("change_type").isNotNull)
      .select(
        keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) ++ Seq(
          col("change_type"),
          when(col("change_type") === "update", changedCols)
            .otherwise(lit("")).as("changed_cols")) ++
        compareCols.flatMap(c => Seq(
          col(s"o.$c").as(s"${c}_old"), col(s"n.$c").as(s"${c}_new"))): _*)
  }

  /** Apply a [[snapshotDiff]] back onto the OLD snapshot to reproduce
    * the NEW one — the patch-shipping path: at 100 TB you move the
    * (tiny) diff between sites, not the snapshot, and `applyDiff(old,
    * diff(old, new)) == new` is the contract that makes that sound
    * (Scd2Spec proves the round-trip, including a property-style sweep).
    * One keyed left join with the diff (diff-sized broadcast in the
    * common case) — deletes drop, updates substitute `<c>_new`,
    * inserts append.
    */
  def applyDiff(oldSnap: DataFrame, diff: DataFrame,
      keys: Seq[String], compareCols: Seq[String]): DataFrame = {
    val d = diff.select(
      (keys.map(col) :+ col("change_type")) ++
        compareCols.map(c => col(s"${c}_new")): _*)
    val joined = oldSnap.join(broadcast(d), keys, "left")
    val survivors = joined
      .where(col("change_type").isNull || col("change_type") =!= "delete")
      .select(keys.map(col) ++ compareCols.map(c =>
        when(col("change_type") === "update", col(s"${c}_new"))
          .otherwise(col(c)).as(c)): _*)
    val inserts = d.where(col("change_type") === "insert")
      .select(keys.map(col) ++
        compareCols.map(c => col(s"${c}_new").as(c)): _*)
    survivors.unionByName(inserts)
  }

  /** Compress versioned rows `(keys..., versionCol, attrs...)` into
    * SCD2 history: one row per run of consecutive versions with
    * identical attrs, with `valid_from` (the run's first version),
    * `valid_to` (the NEXT run's first version, exclusive — null while
    * current) and `is_current`. Missing intermediate versions for a key
    * are fine: runs are over the versions the key actually has.
    */
  def buildHistory(rows: DataFrame, keys: Seq[String], versionCol: String,
      attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol))
    val changed = attrs
      .map(c => neq(col(c), lag(col(c), 1).over(w))).reduce(_ || _) ||
      lag(col(versionCol), 1).over(w).isNull
    val starts = rows
      .select((keys :+ versionCol).map(col) ++ attrs.map(col): _*)
      .withColumn("__start", changed)
      .where(col("__start"))
      .drop("__start")
    // both windows share the (keys, version) sort — one exchange, the
    // second window rides the first's partitioning
    starts
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(versionCol)
  }
}
