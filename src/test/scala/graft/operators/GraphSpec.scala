package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite with SparkSpec {

  private def edges(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("src", "dst")
  }

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // symmetric star 2—1—3 (every node appears as a source)
  private val star = edges((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))

  test("one integer PageRank round matches hand arithmetic") {
    // deg(1)=2, deg(2)=deg(3)=1; node 1 receives 1e6+1e6, leaves receive 5e5
    assert(ranks(Graph.pageRankMicro(spark, star, iterations = 1)) == Map(
      1L -> 1850000L, // 150000 + (850 * 2_000_000) div 1000
      2L -> 575000L, // 150000 + (850 * 500_000) div 1000
      3L -> 575000L))
  }

  test("second round uses first-round ranks with truncating division") {
    // node 1: 150000 + (850 * (575000 + 575000)) div 1000 = 1_127_500
    // leaves: 150000 + (850 * (1850000 div 2)) div 1000 = 936_250
    assert(ranks(Graph.pageRankMicro(spark, star, iterations = 2)) == Map(
      1L -> 1127500L,
      2L -> 936250L,
      3L -> 936250L))
  }

  test("partSupplierEdges dedupes pairs, disjoins id spaces, and symmetrizes") {
    import spark.implicits._
    val li = Seq((10L, 4L), (10L, 4L), (11L, 4L)).toDF("l_partkey", "l_suppkey")
    val out = Graph.partSupplierEdges(li).as[(Long, Long)].collect().toSet
    assert(out == Set(
      (20L, 9L), (9L, 20L), // part 10 <-> supp 4
      (22L, 9L), (9L, 22L))) // part 11 <-> supp 4
  }
}
