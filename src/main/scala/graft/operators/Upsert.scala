package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot maintenance (SCD type 1): apply a CDC changeset — upserts
  * and deletes — to the previous snapshot of a table, producing the next
  * snapshot. The refresh step every periodically-rebuilt training corpus
  * runs between crawls: re-fetched documents replace their old versions,
  * takedowns disappear, new documents append.
  *
  * Formulation: the next snapshot is
  * `(target ANTI-JOIN changeset-keys) UNION (changeset minus deletes)`.
  * The anti-join is the only exchange, and it is the cheap kind: a
  * changeset is normally a small fraction of the snapshot, so AQE
  * broadcasts it and the snapshot streams through map-side — the
  * MERGE-INTO plan every lakehouse engine bottoms out in. The union is
  * shuffle-free.
  *
  * Changeset keys must be unique (one verdict per key per batch); this
  * is asserted only in [[mergeChecked]] because the check costs an extra
  * aggregation over the changeset.
  */
object Upsert {

  /** @param deleteFlagCol optional boolean column on `changes`: rows
    *                      with true remove their key from the snapshot,
    *                      rows with false upsert. Absent = all upserts.
    */
  def merge(
      target: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      deleteFlagCol: Option[String] = None,
  ): DataFrame = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val changeData = deleteFlagCol match {
      case Some(f) => changes.filter(!col(f)).drop(f)
      case None => changes
    }
    require(changeData.columns.sorted.sameElements(target.columns.sorted),
      s"changeset columns ${changeData.columns.sorted.mkString(",")} must match " +
        s"target columns ${target.columns.sorted.mkString(",")}")
    target
      .join(changes.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
      .unionByName(changeData.select(target.columns.map(col): _*))
  }

  /** [[merge]] plus a loud failure when the changeset carries two rows
    * for one key — silent nondeterminism otherwise (which row wins
    * would depend on partitioning).
    */
  def mergeChecked(
      target: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      deleteFlagCol: Option[String] = None,
  ): DataFrame = {
    val dupes = changes.groupBy(keyCols.map(col): _*).count().filter(col("count") > 1)
    val firstDupe = dupes.limit(1).collect()
    require(firstDupe.isEmpty,
      s"changeset has multiple rows for key ${firstDupe.headOption.mkString}")
    merge(target, changes, keyCols, deleteFlagCol)
  }
}
