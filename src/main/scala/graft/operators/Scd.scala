package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: turn an append-only
  * changelog of per-key observations into validity intervals — the shape
  * a feature store or warehouse dimension needs for point-in-time-correct
  * joins ("what was this user's segment WHEN the event happened?").
  *
  * Semantics (the standard SCD-2 contract):
  *   1. order each key's observations by (ts, tie) — `tie` must be
  *      unique per key so every ordering is deterministic;
  *   2. compress runs: an observation opens a new version only when at
  *      least one tracked column differs (null-safely) from the previous
  *      observation — the first observation always opens one;
  *   3. each version is valid [its ts, next version's ts); the last
  *      version per key has `valid_to = null` and `is_current = true`.
  *
  * Scale: ONE hash exchange on the key; the run-compression lag and the
  * interval lead are windows over the same (key, ts, tie) order, so the
  * second window reuses the first's partitioning and sort — no second
  * shuffle (spec-pinned). Per-key history length bounds window state,
  * not corpus size.
  */
object Scd {

  /** Build the version table. Output: key, tracked columns, `valid_from`
    * / `valid_to` (the ts column's type; `valid_to` null on the open
    * version), `is_current`.
    */
  def history(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      trackedCols: Seq[String],
  ): DataFrame = {
    require(trackedCols.nonEmpty, "SCD-2 needs at least one tracked column")
    require(!trackedCols.contains(keyCol) && !trackedCols.contains(tsCol)
        && !trackedCols.contains(tieCol),
      s"trackedCols must be disjoint from key/ts/tie: $trackedCols")
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // null-safe change test, so a null→value or value→null transition
    // opens a version too; row 1 opens unconditionally
    val changed: Column = trackedCols
      .map(c => !(lag(col(c), 1).over(order) <=> col(c)))
      .reduce(_ || _)
    df
      .select((Seq(keyCol, tsCol, tieCol) ++ trackedCols).map(col): _*)
      .withColumn("graft_opens", row_number().over(order) === 1 || changed)
      .filter(col("graft_opens"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(order))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCol +: trackedCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
