package graft.sources

/** FK-graph configs for the driver-generated test corpus
  * (/root/testdata/sf*, see TESTDATA.md). The reference obtains this via
  * SQLAlchemy reflection; parquet has no FK catalog, so the star schema
  * is declared here once.
  */
object Testdata {
  val namespace = "graft-testdata"

  val region = TableDef("region", Seq("r_regionkey"), Nil)
  val nation = TableDef("nation", Seq("n_nationkey"), Seq(Fk("n_regionkey", "region", "r_regionkey")))
  val customer = TableDef("customer", Seq("c_custkey"), Seq(Fk("c_nationkey", "nation", "n_nationkey")))
  val supplier = TableDef("supplier", Seq("s_suppkey"), Seq(Fk("s_nationkey", "nation", "n_nationkey")))
  val part = TableDef("part", Seq("p_partkey"), Nil)
  val orders = TableDef("orders", Seq("o_orderkey"), Seq(Fk("o_custkey", "customer", "c_custkey")))
  // NOTE: unlike real TPC-H, the synthetic corpus does not keep
  // (l_orderkey, l_linenumber) unique — only the 4-column key is. A
  // non-unique declared PK collides deterministic oids (and tree ids),
  // which the loader relies on for identity.
  val lineitem = TableDef(
    "lineitem",
    Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
    Seq(
      Fk("l_orderkey", "orders", "o_orderkey"),
      Fk("l_partkey", "part", "p_partkey"),
      Fk("l_suppkey", "supplier", "s_suppkey")))

  /** Full star schema — root table is `lineitem`. */
  val tpch = DbConfig(namespace, Seq(region, nation, customer, supplier, part, orders, lineitem))

  /** Dimension-only subset — root table is `customer`; small forests for
    * cheap correctness queries.
    */
  val customerDb = DbConfig(namespace, Seq(region, nation, customer))

  /** Orders subset — root table is `orders`. */
  val ordersDb = DbConfig(namespace, Seq(region, nation, customer, orders))
}
