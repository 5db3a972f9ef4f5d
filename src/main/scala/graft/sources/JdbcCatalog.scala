package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

/** JDBC catalog reflection — the Spark-side analogue of the reference's
  * SQLAlchemy `MetaData.reflect` (database/loader/sql.py:18-48): one
  * driver-side metadata connection discovers tables, primary keys and
  * foreign keys, and produces the same [[DbConfig]] the parquet path
  * consumes, so a live database and a lake snapshot feed ONE loader.
  *
  * Scale notes: reflection reads catalog metadata only (bounded by
  * schema size, never by data), on the driver, through a single
  * short-lived connection. The data itself is read by the executors via
  * `spark.read.jdbc` in [[RelationalLoader.loadJdbc]].
  */
object JdbcCatalog {

  /** Reflect every base table of `schema` into a [[DbConfig]].
    *
    * Table/column names are reported exactly as the catalog stores them
    * (quoted lowercase DDL → lowercase names; unquoted DDL in
    * upper-casing engines → uppercase) — they become metamodel labels,
    * so the caller controls casing through its DDL.
    */
  def reflect(url: String, schema: String, props: Properties = new Properties()): DbConfig = {
    val conn = DriverManager.getConnection(url, props)
    try reflect(conn, schema)
    finally conn.close()
  }

  def reflect(conn: Connection, schema: String): DbConfig = {
    val md = conn.getMetaData
    val tables = Vector.newBuilder[String]
    val rs = md.getTables(null, schema, "%", Array("TABLE"))
    try while (rs.next()) tables += rs.getString("TABLE_NAME")
    finally rs.close()

    val defs = tables.result().map { t =>
      val pks = Vector.newBuilder[(Short, String)]
      val pkRs = md.getPrimaryKeys(null, schema, t)
      try while (pkRs.next()) pks += pkRs.getShort("KEY_SEQ") -> pkRs.getString("COLUMN_NAME")
      finally pkRs.close()

      val fks = Vector.newBuilder[Fk]
      val fkRs = md.getImportedKeys(null, schema, t)
      try while (fkRs.next()) fks += Fk(
        column = fkRs.getString("FKCOLUMN_NAME"),
        refTable = fkRs.getString("PKTABLE_NAME"),
        refColumn = fkRs.getString("PKCOLUMN_NAME"))
      finally fkRs.close()

      TableDef(t, pks.result().sortBy(_._1).map(_._2), fks.result().sortBy(_.column))
    }
    DbConfig(schema, defs)
  }
}
