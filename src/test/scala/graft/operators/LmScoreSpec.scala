package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Boolean)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("add-one bigram surprisal in tenth-milli-nats, short docs kept at zero") {
    // tokens: doc1 [a,b], doc2 [a,c], doc3 [x]; uni a:2 b:1 c:1 x:1, V=4
    // score(a,b) = score(a,c) = round(ln((2+4)/(1+1)) * 1e4) = round(ln 3 * 1e4) = 10986
    val out = rows(LmScore.bigramSurprisal(spark, docs((1L, "a b"), (2L, "a c"), (3L, "x"))))
    assert(out == Map(
      1L -> ((1L, 10986L, true)),
      2L -> ((1L, 10986L, true)),
      3L -> ((0L, 0L, true))))
  }

  test("keep flag compares mean surprisal against the threshold in integer form") {
    val out = rows(LmScore.bigramSurprisal(spark,
      docs((1L, "a b"), (2L, "a c"), (3L, "x")), maxMeanSurprisalE4 = 10000L))
    assert(out(1L)._3 == false) // 10986 > 10000 * 1
    assert(out(3L)._3 == true) // 0 <= 0
  }

  test("repeated transitions multiply the per-transition cost") {
    // doc "a b a b": tokens [a,b,a,b]; bigrams (a,b)x2, (b,a)x1
    // uni a:2 b:2, V=2; score(a,b)=round(ln((2+2)/(2+1))*1e4)=round(2876.8207...)=2877
    // score(b,a)=round(ln((2+2)/(1+1))*1e4)=round(6931.4718...)=6931
    val out = rows(LmScore.bigramSurprisal(spark, docs((1L, "a b a b"))))
    assert(out(1L) == ((3L, 2 * 2877L + 6931L, true)))
  }
}
