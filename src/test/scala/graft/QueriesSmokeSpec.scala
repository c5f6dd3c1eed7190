package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1 smoke (SURVEY.md §5): every declared batch query runs at sf0.001 and
  * returns rows; a few exact spot checks pin values the oracle also checks.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  Queries.declared.foreach { case (name, fn, _) =>
    test(s"$name returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0)
    }
  }

  test("q1 spot values: 6 flag/status groups, counts sum to filtered rows") {
    val rows = Queries.q1(spark, sf).collect()
    assert(rows.length == 6)
    val totalCnt = rows.map(_.getAs[Long]("cnt")).sum
    val expected = Tables.load(spark, sf, "lineitem")
      .filter("l_shipdate <= TIMESTAMP '1998-09-02'").count()
    assert(totalCnt == expected)
  }

  test("q14 top-k is ordered desc by o_totalprice") {
    val prices = Queries.q14(spark, sf).collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 25)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q23 survivors <= total events") {
    val survivors = Queries.q23(spark, sf).head().getAs[Long]("survivors")
    val total = Tables.load(spark, sf, "events").count()
    assert(survivors > 0 && survivors <= total)
  }
}
