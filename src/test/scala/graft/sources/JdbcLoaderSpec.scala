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

  test("FK-cycle catalog: reflection picks the max-FK cycle member as root; live load equals the parquet path") {
    // employee <-> department cycle (employee carries MORE FKs, so it is
    // the designated cycle root per database/loader/sql.py:51-102) plus
    // an acyclic badge dimension; mutual rows land via a nullable FK +
    // post-insert UPDATE, the standard cyclic-insert idiom
    val curl = "jdbc:derby:memory:graftcycle;create=true"
    val conn = DriverManager.getConnection(curl)
    try {
      val st = conn.createStatement()
      def ddl(sql: String): Unit = st.executeUpdate(sql)
      ddl("""CREATE TABLE "badge" ("badge_id" INT PRIMARY KEY, "b_kind" VARCHAR(16))""")
      ddl("""CREATE TABLE "department" ("dept_id" INT PRIMARY KEY, "d_name" VARCHAR(16), "manager_id" INT)""")
      ddl("""CREATE TABLE "employee" ("emp_id" INT PRIMARY KEY, "e_name" VARCHAR(16),
            | "dept_id" INT REFERENCES "department" ("dept_id"),
            | "badge_id" INT REFERENCES "badge" ("badge_id"))""".stripMargin)
      ddl("""ALTER TABLE "department" ADD FOREIGN KEY ("manager_id") REFERENCES "employee" ("emp_id")""")
      for (i <- 1 to 3) ddl(s"""INSERT INTO "badge" VALUES ($i, 'kind$i')""")
      ddl("""INSERT INTO "department" VALUES (10, 'eng', NULL), (20, 'ops', NULL)""")
      ddl("""INSERT INTO "employee" VALUES (101, 'alice', 10, 1), (102, 'bob', 10, 2), (201, 'carol', 20, 3)""")
      ddl("""UPDATE "department" SET "manager_id" = 101 WHERE "dept_id" = 10""")
      ddl("""UPDATE "department" SET "manager_id" = 201 WHERE "dept_id" = 20""")
      st.close()
    } finally conn.close()

    val cfg = JdbcCatalog.reflect(curl, "APP")
    val byName = cfg.tables.map(t => t.name -> t).toMap
    assert(byName("employee").fks.map(_.refTable).toSet == Set("badge", "department"))
    assert(byName("department").fks.map(_.refTable) == Seq("employee"))
    // every table is FK-referenced, so the only roots are cycle roots —
    // and the cycle designates its max-FK member, employee (2 FKs vs 1)
    assert(cfg.rootTables.map(_.name) == Seq("employee"))

    val viaJdbc = RelationalLoader.loadJdbc(spark, curl, cfg, dbtable = quoted)
    val jdbcRendered = Forest.collectTrees(viaJdbc).map(_.render).sorted
    assert(jdbcRendered.size == 3) // one tree per employee row

    // parquet-path differential: same tables snapshotted to parquet and
    // loaded through the SAME reflected config must yield the same forest
    val tmp = java.nio.file.Files.createTempDirectory("graft_cycle").toString
    for (t <- cfg.tables.map(_.name))
      spark.read.jdbc(curl, quoted(t), new java.util.Properties())
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    val viaParquet = RelationalLoader.load(spark, tmp, cfg)
    assert(jdbcRendered == Forest.collectTrees(viaParquet).map(_.render).sorted)
  }
}
