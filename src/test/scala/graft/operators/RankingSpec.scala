package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class RankingSpec extends AnyFunSuite with SparkSpec {

  private def df(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "score")
  }

  private def ranks(d: org.apache.spark.sql.DataFrame, partitions: Int = 0) =
    Ranking.globalRank(d, "id", "score", partitions).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("ranks are 1-based, contiguous, ordered by (score, id)") {
    val out = ranks(df((10L, 5L), (11L, 3L), (12L, 5L), (13L, 1L)))
    assert(out == Map(13L -> 1L, 11L -> 2L, 10L -> 3L, 12L -> 4L))
  }

  test("the result is independent of the partition count") {
    val rows = (1L to 500L).map(i => (i, (i * 37) % 101))
    val expected = rows.sortBy { case (id, s) => (s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    Seq(1, 3, 8).foreach { p =>
      assert(ranks(df(rows: _*), partitions = p) == expected, s"partitions=$p")
    }
  }

  test("the plan never uses a single-task global window") {
    val plan = Ranking.globalRank(df((1L, 1L), (2L, 2L)), "id", "score")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global rank must not plan a window:\n$plan")
  }

  test("empty input ranks nothing") {
    assert(ranks(df()) == Map.empty)
  }
}
