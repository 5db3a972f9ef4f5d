package graft.sources

import graft.SparkSpec
import graft.model.Forest
import org.scalatest.funsuite.AnyFunSuite

import java.sql.DriverManager

/** Live-database ingestion, differential against the parquet path: the
  * sf0.001 customer tables are loaded into an EMBEDDED Derby instance
  * (the engine already on the classpath for the Hive metastore), the
  * DbConfig is REFLECTED from Derby's JDBC catalog, and the reflected
  * loadJdbc forest must equal the parquet-path forest tree for tree —
  * the reference's reflection goldens
  * (tests/database/test_read_database.py:17-110) re-expressed as a
  * same-engine differential.
  */
class JdbcLoaderSpec extends AnyFunSuite with SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def quoted(name: String) = s""""$name""""

  /** Copy the three customer tables from parquet into Derby with quoted
    * lowercase identifiers (so reflected names match the parquet
    * config's), then declare the same keys.
    */
  private lazy val derbyReady: Unit = {
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer"))
      spark.read.parquet(s"$dir/$t.parquet")
        .write.mode("append").jdbc(url, quoted(t), new java.util.Properties())

    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      def ddl(sql: String): Unit = st.executeUpdate(sql)
      for ((t, pk) <- Seq("region" -> "r_regionkey", "nation" -> "n_nationkey",
          "customer" -> "c_custkey")) {
        ddl(s"""ALTER TABLE "$t" ALTER COLUMN "$pk" NOT NULL""")
        ddl(s"""ALTER TABLE "$t" ADD PRIMARY KEY ("$pk")""")
      }
      ddl("""ALTER TABLE "nation" ADD FOREIGN KEY ("n_regionkey") REFERENCES "region" ("r_regionkey")""")
      ddl("""ALTER TABLE "customer" ADD FOREIGN KEY ("c_nationkey") REFERENCES "nation" ("n_nationkey")""")
      st.close()
    } finally conn.close()
  }

  test("catalog reflection recovers the hand-declared DbConfig") {
    derbyReady
    val cfg = JdbcCatalog.reflect(url, "APP")
    val byName = cfg.tables.map(t => t.name -> t).toMap
    assert(byName.keySet == Set("region", "nation", "customer"))
    assert(byName("region") == TableDef("region", Seq("r_regionkey"), Seq.empty))
    assert(byName("nation") ==
      TableDef("nation", Seq("n_nationkey"), Seq(Fk("n_regionkey", "region", "r_regionkey"))))
    assert(byName("customer") ==
      TableDef("customer", Seq("c_custkey"), Seq(Fk("c_nationkey", "nation", "n_nationkey"))))
    assert(cfg.rootTables.map(_.name) == Seq("customer"))
  }

  test("loadJdbc over the reflected config equals the parquet-path forest") {
    derbyReady
    val reflected = JdbcCatalog.reflect(url, "APP")
    val viaJdbc = RelationalLoader.loadJdbc(spark, url, reflected, dbtable = quoted)
    val viaParquet = RelationalLoader.load(spark, "/root/testdata/sf0.001", Testdata.customerDb)
    // tree ids are positional (partitioning differs between sources);
    // the forests must agree as multisets of rendered trees
    def rendered(f: org.apache.spark.sql.Dataset[graft.model.TreeRow]) =
      Forest.collectTrees(f).map(_.render).sorted
    val (j, p) = (rendered(viaJdbc), rendered(viaParquet))
    assert(j.size == 150)
    assert(j == p)
  }

  test("partitioned JDBC read returns the same forest through parallel range scans") {
    derbyReady
    val reflected = JdbcCatalog.reflect(url, "APP")
    val part = Map("customer" ->
      RelationalLoader.JdbcPartitioning("c_custkey", 1L, 150L, 4))
    // the SCAN itself must fan out over the declared range (downstream
    // stages may coalesce a 150-row forest — that's AQE doing its job)
    val scan = spark.read.jdbc(url, quoted("customer"), "c_custkey", 1L, 150L, 4,
      new java.util.Properties())
    assert(scan.rdd.getNumPartitions == 4)
    assert(scan.count() == 150)
    val viaPartitioned = RelationalLoader.loadJdbc(
      spark, url, reflected, partitioning = part, dbtable = quoted)
    val viaSingle = RelationalLoader.loadJdbc(spark, url, reflected, dbtable = quoted)
    assert(Forest.collectTrees(viaPartitioned).map(_.render).sorted ==
      Forest.collectTrees(viaSingle).map(_.render).sorted)
  }
}
