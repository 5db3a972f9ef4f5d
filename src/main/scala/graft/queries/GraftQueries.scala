package graft.queries

import graft.metrics.{FdMetrics, ForestInspector}
import graft.model.{Forest, NodeRow, Schema}
import graft.sources.{DbConfig, RelationalLoader, Testdata}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** The registered correctness/bench queries and their DuckDB oracles.
  *
  * Every ArchiTXT-pipeline query goes through the real metamodel path
  * (loader → forest → nodes DF → schema/pivot/metric); the oracle SQL
  * re-derives the same answer relationally from the raw parquet tables,
  * so a hash match certifies loader + derivation end to end.
  *
  * Oracle/Spark stringification contract (verified empirically for this
  * corpus): Spark `cast(x as string)` ≡ DuckDB `CAST(x AS VARCHAR)` for
  * int/bigint/double/varchar/timestamp values appearing here.
  */
object GraftQueries {

  // ---- forest memoization (Verify runs many queries per session) ----
  private val cache = scala.collection.concurrent.TrieMap.empty[(String, String), Dataset[NodeRow]]

  private def nodes(spark: SparkSession, dir: String, cfgName: String, cfg: DbConfig): Dataset[NodeRow] =
    cache.getOrElseUpdate((dir, cfgName), {
      val n = Forest.toNodesDF(RelationalLoader.load(spark, dir, cfg))
      n.persist(StorageLevel.MEMORY_AND_DISK)
    })

  private def customerNodes(s: SparkSession, d: String) = nodes(s, d, "customerDb", Testdata.customerDb)
  private def ordersNodes(s: SparkSession, d: String) = nodes(s, d, "ordersDb", Testdata.ordersDb)
  private def tpchNodes(s: SparkSession, d: String) = nodes(s, d, "tpch", Testdata.tpch)

  // ---- oracle SQL helpers ----
  private def castCols(cols: Seq[String]): String =
    cols.sorted.map(c => s"CAST($c AS VARCHAR) AS $c").mkString(", ")

  /** DuckDB SQL for FdMetrics.confidenceTable over `SELECT DISTINCT
    * <casts> FROM <table>` restricted to `cols`.
    */
  private def confidenceOracle(table: String, cols: Seq[String]): String = {
    val sorted = cols.sorted
    val ds = s"SELECT DISTINCT ${castCols(cols)} FROM $table"
    val per = sorted.map { consequent =>
      val ants = sorted.filterNot(_ == consequent)
      s"""SELECT '$consequent' AS consequent,
         | (SELECT CAST(sum(m) AS DOUBLE) / (SELECT count(*) FROM ds)
         |  FROM (SELECT max(cnt) AS m
         |        FROM (SELECT ${sorted.mkString(", ")}, count(*) AS cnt FROM ds GROUP BY ${sorted.mkString(", ")})
         |        GROUP BY ${ants.mkString(", ")})) AS confidence""".stripMargin
    }
    s"WITH ds AS ($ds)\n" + per.mkString("\nUNION ALL\n")
  }

  // ---- the registry ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 extract_datasets over the §2.1 loader forests
    "extract_customer" -> ((s, d) => Schema.extractDataset(customerNodes(s, d), "customer")),
    "extract_nation_referenced" -> ((s, d) => Schema.extractDataset(customerNodes(s, d), "nation")),
    "extract_region_referenced" -> ((s, d) => Schema.extractDataset(customerNodes(s, d), "region")),
    "extract_orders" -> ((s, d) => Schema.extractDataset(ordersNodes(s, d), "orders")),
    "extract_lineitem" -> ((s, d) => Schema.extractDataset(tpchNodes(s, d), "lineitem")),
    "extract_part_referenced" -> ((s, d) => Schema.extractDataset(tpchNodes(s, d), "part")),

    // §2.4 schema derivation surface
    "schema_productions_customer" -> { (s, d) =>
      import s.implicits._
      Schema.fromForest(customerNodes(s, d), keepUnlabelled = false)
        .productions.map(p => (p.lhs, p.rhs.mkString(" "))).toDF("lhs", "rhs")
    },
    "schema_relations_customer" -> { (s, d) =>
      import s.implicits._
      Schema.fromForest(customerNodes(s, d), keepUnlabelled = false)
        .relations.toSeq.map(r => (r.name, r.left, r.right, r.orientation.toString))
        .toDF("name", "left_group", "right_group", "orientation")
    },

    // §2.6 FD metrics over extracted datasets
    "fd_confidence_orders" -> ((s, d) =>
      FdMetrics.confidenceTable(Schema.extractDataset(ordersNodes(s, d), "orders"))),
    "fd_confidence_customer_nokey" -> ((s, d) =>
      FdMetrics.confidenceTable(
        Schema.extractDataset(customerNodes(s, d), "customer").drop("c_custkey"))),

    // §2.4 ForestInspector core counts
    "inspect_counts_customer" -> ((s, d) =>
      ForestInspector.inspectTable(customerNodes(s, d))
        .filter(org.apache.spark.sql.functions.col("stat").startsWith("total_"))),
  )

  val oracleSql: Map[String, String] = Map(
    "extract_customer" ->
      s"SELECT DISTINCT ${castCols(Seq("c_acctbal", "c_custkey", "c_mktsegment", "c_name"))} FROM customer",
    "extract_nation_referenced" ->
      s"""SELECT DISTINCT ${castCols(Seq("n_name", "n_nationkey"))} FROM nation
         |WHERE n_nationkey IN (SELECT c_nationkey FROM customer)""".stripMargin,
    "extract_region_referenced" ->
      s"""SELECT DISTINCT ${castCols(Seq("r_name", "r_regionkey"))} FROM region
         |WHERE r_regionkey IN (SELECT n_regionkey FROM nation
         |                      WHERE n_nationkey IN (SELECT c_nationkey FROM customer))""".stripMargin,
    "extract_orders" ->
      s"SELECT DISTINCT ${castCols(Seq("o_orderdate", "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))} FROM orders",
    "extract_lineitem" ->
      s"SELECT DISTINCT ${castCols(Seq("l_discount", "l_extendedprice", "l_linenumber", "l_linestatus", "l_quantity", "l_returnflag", "l_shipdate", "l_tax"))} FROM lineitem",
    "extract_part_referenced" ->
      s"""SELECT DISTINCT ${castCols(Seq("p_brand", "p_name", "p_partkey", "p_retailprice", "p_size", "p_type"))} FROM part
         |WHERE p_partkey IN (SELECT l_partkey FROM lineitem)""".stripMargin,

    "schema_productions_customer" ->
      """SELECT 'GROUP::customer' AS lhs, 'ENT::c_acctbal ENT::c_custkey ENT::c_mktsegment ENT::c_name' AS rhs
        |WHERE EXISTS (SELECT 1 FROM customer)
        |UNION ALL SELECT 'GROUP::nation', 'ENT::n_name ENT::n_nationkey'
        |WHERE EXISTS (SELECT 1 FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |UNION ALL SELECT 'GROUP::region', 'ENT::r_name ENT::r_regionkey'
        |WHERE EXISTS (SELECT 1 FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey)
        |UNION ALL SELECT 'REL::customer<->nation', 'GROUP::customer GROUP::nation'
        |WHERE EXISTS (SELECT 1 FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |UNION ALL SELECT 'REL::nation<->region', 'GROUP::nation GROUP::region'
        |WHERE EXISTS (SELECT 1 FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey)""".stripMargin,

    "schema_relations_customer" ->
      """WITH cn AS (SELECT c_custkey, n_nationkey FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |     nr AS (SELECT n.n_nationkey, r.r_regionkey
        |            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |            JOIN region r ON n.n_regionkey = r.r_regionkey),
        |     cn_lm AS (SELECT EXISTS (SELECT 1 FROM cn GROUP BY c_custkey HAVING count(DISTINCT n_nationkey) > 1) AS v),
        |     cn_rm AS (SELECT EXISTS (SELECT 1 FROM cn GROUP BY n_nationkey HAVING count(DISTINCT c_custkey) > 1) AS v),
        |     nr_lm AS (SELECT EXISTS (SELECT 1 FROM nr GROUP BY n_nationkey HAVING count(DISTINCT r_regionkey) > 1) AS v),
        |     nr_rm AS (SELECT EXISTS (SELECT 1 FROM nr GROUP BY r_regionkey HAVING count(DISTINCT n_nationkey) > 1) AS v)
        |SELECT 'customer<->nation' AS name, 'customer' AS left_group, 'nation' AS right_group,
        |       CASE WHEN (SELECT v FROM cn_lm) = (SELECT v FROM cn_rm) THEN 'Both'
        |            WHEN (SELECT v FROM cn_lm) THEN 'Left' ELSE 'Right' END AS orientation
        |WHERE EXISTS (SELECT 1 FROM cn)
        |UNION ALL
        |SELECT 'nation<->region', 'nation', 'region',
        |       CASE WHEN (SELECT v FROM nr_lm) = (SELECT v FROM nr_rm) THEN 'Both'
        |            WHEN (SELECT v FROM nr_lm) THEN 'Left' ELSE 'Right' END
        |WHERE EXISTS (SELECT 1 FROM nr)""".stripMargin,

    "fd_confidence_orders" -> confidenceOracle(
      "orders", Seq("o_orderdate", "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")),
    "fd_confidence_customer_nokey" -> confidenceOracle(
      "customer", Seq("c_acctbal", "c_mktsegment", "c_name")),

    // Loader node-count identities (no nulls in this corpus): per tree the
    // customer group materializes once standalone + once per REL; nation
    // 2× per matched pair + 1× inside the nation<->region REL; region 2×
    // per matched chain. ents = groups × their column counts.
    "inspect_counts_customer" ->
      """WITH c AS (SELECT CAST(count(*) AS BIGINT) v FROM customer),
        |     m AS (SELECT CAST(count(*) AS BIGINT) v FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |     mr AS (SELECT CAST(count(*) AS BIGINT) v
        |            FROM customer JOIN nation ON c_nationkey = n_nationkey
        |            JOIN region ON n_regionkey = r_regionkey)
        |SELECT 'total_trees' AS stat, (SELECT v FROM c) AS value
        |UNION ALL SELECT 'total_entities',
        |  ((SELECT v FROM c) + (SELECT v FROM m)) * 4
        |  + (2 * (SELECT v FROM m) + (SELECT v FROM mr)) * 2
        |  + 2 * (SELECT v FROM mr) * 2
        |UNION ALL SELECT 'total_groups',
        |  (SELECT v FROM c) + (SELECT v FROM m)
        |  + 2 * (SELECT v FROM m) + (SELECT v FROM mr)
        |  + 2 * (SELECT v FROM mr)
        |UNION ALL SELECT 'total_relations', (SELECT v FROM m) + (SELECT v FROM mr)
        |UNION ALL SELECT 'total_collections', CAST(0 AS BIGINT)
        |UNION ALL SELECT 'total_nodes',
        |  (SELECT v FROM c)
        |  + ((SELECT v FROM c) + (SELECT v FROM m) + 2 * (SELECT v FROM m) + (SELECT v FROM mr) + 2 * (SELECT v FROM mr))
        |  + ((SELECT v FROM m) + (SELECT v FROM mr))
        |  + (((SELECT v FROM c) + (SELECT v FROM m)) * 4
        |     + (2 * (SELECT v FROM m) + (SELECT v FROM mr)) * 2
        |     + 2 * (SELECT v FROM mr) * 2)""".stripMargin,
  )
}
