package graft.sinks

import graft.model.{NodeRow, RelationOrientation, Schema}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Relational export (reference database/export/sql.py:47-371),
  * re-expressed set-wise: group tables are oid-keyed pivots, FK columns
  * come from a join on REL member oids, BOTH-oriented relations become
  * junction tables — the reference's per-row recursive INSERT with
  * SELECT-before-INSERT dedup disappears entirely.
  */
object SqlExporter {

  /** default_pk_factory (export/sql.py:35-44). */
  def pkColumn(table: String): String = s"architxt_${table}ID"

  /** Exported tables + DDL. Each table frame is backed by a persisted
    * (MEMORY_AND_DISK) pre-cast intermediate that the cast-inference
    * pass already materialized — consuming a table re-reads that cache
    * rather than re-running its pivot + FK-join chain. Call `release()`
    * once the tables are written: disk-spilled cache blocks are freed
    * only by unpersist or session end, so a session exporting corpus
    * after corpus would otherwise accumulate them without bound.
    */
  final case class Export(
      tables: Map[String, DataFrame],
      ddl: Seq[String],
      release: () => Unit = () => ())

  def export(nodes: Dataset[NodeRow], schema: Schema): Export = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration

    val groupTables = scala.collection.mutable.Map.empty[String, DataFrame]

    // (group instance × child entity) rows for every exported group at
    // once: the per-group pivot COLUMNS all derive from one aggregation
    // pass instead of a distinct().collect() job per group — at export
    // scale the cost is job count, not data size
    val groupNames = schema.groups.map(_.name).toSeq
    val groupRows = nodes
      .filter(col("nodeType") === "GROUP" && col("name").isin(groupNames: _*))
      .select(
        col("treeId").as("gTree"), col("nodeId").as("gNode"),
        col("name").as("gName"), col("oid").as("gOid"))
    val entRows = nodes
      .filter(col("nodeType") === "ENT")
      .select(col("treeId"), col("parentId"), col("name").as("entName"), col("value"))
    val groupEnts = entRows.join(
      groupRows, col("treeId") === col("gTree") && col("parentId") === col("gNode"))
    val entColsByGroup: Map[String, Seq[String]] = groupEnts
      .groupBy("gName").agg(collect_set(col("entName")).as("cols"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).sorted.toSeq).toMap

    for (group <- schema.groups) {
      val df = groupTable(groupEnts, group.name, entColsByGroup.getOrElse(group.name, Nil))
      groupTables(group.name) = df
    }

    val junctions = scala.collection.mutable.Map.empty[String, DataFrame]
    for (rel <- schema.relations) {
      val pairs = relationPairs(nodes, rel.name, rel.left, rel.right)
      rel.orientation match {
        case RelationOrientation.Both =>
          junctions(rel.name) = pairs
            .select(
              col("leftOid").as(pkColumn(rel.left)),
              col("rightOid").as(pkColumn(rel.right)))
            .dropDuplicates()
        case orientation =>
          // LEFT: source=left gets an FK to right; RIGHT: source=right
          val (srcName, tgtName, srcCol, tgtCol) =
            if (orientation == RelationOrientation.Left)
              (rel.left, rel.right, "leftOid", "rightOid")
            else (rel.right, rel.left, "rightOid", "leftOid")
          val fkName = if (srcName == tgtName) rel.name else pkColumn(tgtName)
          val fk = pairs
            .select(col(srcCol).as(pkColumn(srcName)), col(tgtCol).as(fkName))
            .dropDuplicates(pkColumn(srcName))
          groupTables(srcName) = groupTables(srcName).join(fk, Seq(pkColumn(srcName)), "left")
      }
    }

    val all = groupTables.toMap ++ junctions.toMap
    // cast inference runs one eager aggregation per table; submit them
    // CONCURRENTLY (Spark schedules jobs from any thread) so the wall
    // cost is the widest table, not the sum over tables. Each pre-cast
    // frame is persisted first: the inference agg materializes it, and
    // the caller's consumption then reuses that result instead of
    // re-running the pivot + FK-join chain.
    val castedWithCache = Await.result(
      Future.traverse(all.toSeq) { case (name, df) =>
        Future {
          val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          (name, castOnExport(cached, pkColumns = df.columns.filter(_.startsWith("architxt_")).toSet), cached)
        }
      }, Duration.Inf)
    val casted = castedWithCache.map { case (name, table, _) => name -> table }.toMap
    Export(casted, ddlFor(schema, casted),
      () => castedWithCache.foreach { case (_, _, cached) => cached.unpersist() })
  }

  /** One row per distinct group oid, columns = entity names + oid PK.
    * `groupEnts` = the shared (group instance × child entity) join;
    * `entCols` = this group's pivot columns, precomputed in one pass
    * for all groups by [[export]].
    */
  private def groupTable(groupEnts: DataFrame, groupName: String, entCols: Seq[String]): DataFrame =
    groupEnts
      .filter(col("gName") === groupName)
      .groupBy(col("gOid").as(pkColumn(groupName)))
      .pivot("entName", entCols)
      .agg(max("value"))

  /** (relOid, leftOid, rightOid) per REL instance, sides matched by group
    * name (export/sql.py:216-236).
    */
  private def relationPairs(nodes: Dataset[NodeRow], relName: String, left: String, right: String): DataFrame = {
    val rels = nodes
      .filter(col("nodeType") === "REL" && col("name") === relName)
      .select(col("treeId").as("rTree"), col("nodeId").as("rNode"))
    val members = nodes
      .filter(col("nodeType") === "GROUP")
      .select(col("treeId"), col("parentId"), col("name").as("gName"), col("oid"))
      .join(rels, col("treeId") === col("rTree") && col("parentId") === col("rNode"))
    members.filter(col("gName") === left)
      .select(col("rTree"), col("rNode"), col("oid").as("leftOid"))
      .join(
        members.filter(col("gName") === right)
          .select(col("rTree").as("t2"), col("rNode").as("n2"), col("oid").as("rightOid")),
        col("rTree") === col("t2") && col("rNode") === col("n2"))
      .select("leftOid", "rightOid")
  }

  /** Value re-casting (export/sql.py:262-300) lifted to column level: a
    * column gets the strongest type every non-null value satisfies, in
    * the reference's precedence (boolean, int, float, datetime, date),
    * else stays string. try_cast keeps it null-safe.
    */
  def castOnExport(df: DataFrame, pkColumns: Set[String]): DataFrame = {
    // try_* variants everywhere: ANSI mode (Spark 4 default) makes plain
    // cast throw on malformed values
    val candidates: Seq[(String, String => Column)] = Seq(
      "boolean" -> (n => when(lower(col(n)).isin("true", "false"), lower(col(n)).cast("boolean"))),
      "bigint" -> (n => expr(s"try_cast(`$n` AS BIGINT)")),
      "double" -> (n => expr(s"try_cast(`$n` AS DOUBLE)")),
      "timestamp" -> (n => expr(s"try_to_timestamp(`$n`, 'yyyy-MM-dd HH:mm:ss')")),
      "date" -> (n => expr(s"try_cast(`$n` AS DATE)")))

    val valueCols = df.columns.filterNot(pkColumns.contains)
    if (valueCols.isEmpty) return df

    // one aggregation pass: count non-null per column and per candidate
    val checks = valueCols.flatMap { name =>
      count(col(name)).as(s"n__$name") +: candidates.map { case (t, f) =>
        count(f(name)).as(s"${t}__$name")
      }
    }
    val row = df.agg(checks.head, checks.tail: _*).head()

    val castCols = df.columns.map { name =>
      if (pkColumns.contains(name)) col(name)
      else {
        val n = row.getAs[Long](s"n__$name")
        val chosen = candidates.collectFirst {
          case (t, f) if n > 0 && row.getAs[Long](s"${t}__$name") == n => f(name)
        }
        chosen.getOrElse(col(name)).as(name)
      }
    }
    df.select(castCols.toIndexedSeq: _*)
  }

  private def ddlFor(schema: Schema, tables: Map[String, DataFrame]): Seq[String] = {
    val relNames = schema.relations.map(_.name)
    tables.toSeq.sortBy(_._1).map { case (name, df) =>
      val isJunction = relNames.contains(name)
      val cols = df.schema.fields.map { f =>
        val sqlType = f.dataType.simpleString match {
          case "string" => "VARCHAR"
          case "bigint" => "BIGINT"
          case "double" => "DOUBLE"
          case "boolean" => "BOOLEAN"
          case "timestamp" => "TIMESTAMP"
          case "date" => "DATE"
          case other => other.toUpperCase
        }
        val pk = if (f.name == pkColumn(name) && !isJunction) " PRIMARY KEY" else ""
        s"  ${f.name} $sqlType$pk"
      }
      s"CREATE TABLE $name (\n${cols.mkString(",\n")}\n);"
    }
  }

  /** Write every exported table as parquet under `outDir/<table>`. */
  def writeParquet(nodes: Dataset[NodeRow], schema: Schema, outDir: String): Export = {
    val ex = export(nodes, schema)
    ex.tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }
    ex
  }
}
