package graft

import org.scalatest.funsuite.AnyFunSuite

/** Typed row model for the Dataset[T] surface (SURVEY.md §1.2: DataFrame
  * for dynamic schemas, Dataset[T] where compile-time fields help). */
case class LineitemRow(
    l_orderkey: Long,
    l_quantity: Double,
    l_extendedprice: Double,
    l_returnflag: String)

/** The typed Dataset API over the same tables: case-class Encoders, lambda
  * filters, and groupByKey must agree exactly with the untyped
  * (Catalyst-optimizable) DataFrame formulation — the library supports both
  * surfaces, and the untyped one stays the default for pushdown reasons.
  */
class TypedApiSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("Dataset[LineitemRow] filter/groupByKey equals the DataFrame plan") {
    val df = Tables.load(spark, TestSpark.sf, "lineitem")
    val ds = df
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
      .as[LineitemRow]

    val typed = ds.filter(_.l_quantity > 30)
      .groupByKey(_.l_returnflag)
      .count()
      .collect().toMap

    val untyped = df.filter($"l_quantity" > 30)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(typed == untyped && typed.nonEmpty)
  }

  test("typed map stays a Dataset (encoder round-trip)") {
    val ds = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
      .as[LineitemRow]
    val revenue = ds.map(r => r.l_extendedprice * (if (r.l_quantity > 30) 1 else 0))
    assert(revenue.columns.sameElements(Array("value")))
    assert(revenue.count() == ds.count())
  }
}
