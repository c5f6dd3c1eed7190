package graft.functions

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the codegen'd vector expressions (ADVICE.md item 3):
  * interpreted `nullSafeEval` vs the codegen path that whole-stage-codegen
  * compiles, plus null/empty/mismatch/zero-norm edges and the SQL
  * registration surface.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def floatLit(xs: Seq[Float]): Literal =
    Literal.create(new GenericArrayData(xs.map(x => x: Any).toArray), ArrayType(FloatType))
  private def doubleLit(xs: Seq[Double]): Literal =
    Literal.create(new GenericArrayData(xs.map(x => x: Any).toArray), ArrayType(DoubleType))

  // ---- interpreted path (nullSafeEval via Literal.eval) -------------------

  test("cosine: interpreted eval matches hand-computed value (float)") {
    val v = CosineSimilarity(floatLit(Seq(1f, 2f, 3f)), floatLit(Seq(4f, 5f, 6f)))
      .eval(null).asInstanceOf[Double]
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(v - expected) < 1e-12)
  }

  test("cosine: mixed float/double inputs compute in double") {
    val v = CosineSimilarity(floatLit(Seq(1f, 0f)), doubleLit(Seq(1.0, 0.0)))
      .eval(null).asInstanceOf[Double]
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("cosine: length mismatch, empty input, and zero-norm all yield NULL") {
    assert(CosineSimilarity(floatLit(Seq(1f)), floatLit(Seq(1f, 2f))).eval(null) == null)
    assert(CosineSimilarity(floatLit(Nil), floatLit(Nil)).eval(null) == null)
    assert(CosineSimilarity(floatLit(Seq(0f, 0f)), floatLit(Seq(1f, 2f))).eval(null) == null)
  }

  test("cosine: NULL input propagates NULL") {
    val nullArr = Literal.create(null, ArrayType(FloatType))
    assert(CosineSimilarity(nullArr, floatLit(Seq(1f))).eval(null) == null)
  }

  test("dot: interpreted eval; mismatch yields NULL; empty yields 0") {
    assert(DotProduct(doubleLit(Seq(1.0, 2.0)), doubleLit(Seq(3.0, 4.0))).eval(null) == 11.0)
    assert(DotProduct(doubleLit(Seq(1.0)), doubleLit(Seq(1.0, 2.0))).eval(null) == null)
    assert(DotProduct(doubleLit(Nil), doubleLit(Nil)).eval(null) == 0.0)
  }

  test("l2_norm: interpreted eval; empty yields 0") {
    assert(L2Norm(doubleLit(Seq(3.0, 4.0))).eval(null) == 5.0)
    assert(L2Norm(doubleLit(Nil)).eval(null) == 0.0)
  }

  // ---- codegen path (through a DataFrame, whole-stage codegen on) ---------

  test("codegen results equal interpreted results on float vectors") {
    val rows = Seq(
      (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      (Seq(0.5f, -0.25f), Seq(-1f, 2f)),
      (Seq(0f, 0f), Seq(1f, 1f)) // zero-norm → null cosine
    )
    val df = rows.toDF("a", "b").select(
      GraftFunctions.cosine_sim(col("a"), col("b")).as("cos"),
      GraftFunctions.dot_product(col("a"), col("b")).as("dot"),
      GraftFunctions.l2_norm(col("a")).as("norm"))
    val got = df.collect()
    rows.zip(got).foreach { case ((a, b), Row(cos, dot, norm)) =>
      val interC = CosineSimilarity(floatLit(a), floatLit(b)).eval(null)
      val interD = DotProduct(floatLit(a), floatLit(b)).eval(null)
      val interN = L2Norm(floatLit(a)).eval(null)
      assert(cos == interC, s"cosine codegen vs interpreted for $a, $b")
      assert(dot == interD)
      assert(norm == interN)
    }
  }

  test("codegen handles mismatched lengths and nulls like interpreted") {
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(1f, 2f, 3f))),
      (None: Option[Seq[Float]], Some(Seq(1f)))
    ).toDF("a", "b").select(
      GraftFunctions.cosine_sim(col("a"), col("b")).as("cos"),
      GraftFunctions.dot_product(col("a"), col("b")).as("dot"))
    assert(df.collect().forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  // ---- array_predecessor (binary search) ----------------------------------

  test("array_predecessor: interpreted binary search over longs") {
    def longArr(xs: Seq[Long]): Literal =
      Literal.create(new GenericArrayData(xs.map(x => x: Any).toArray),
        ArrayType(LongType))
    def pred(xs: Seq[Long], v: Long): Any =
      ArrayPredecessor(longArr(xs), Literal(v)).eval(null)
    val a = Seq(10L, 20L, 30L, 40L)
    assert(pred(a, 25L) == 20L)
    assert(pred(a, 40L) == 40L)   // exact hit, last element
    assert(pred(a, 10L) == 10L)   // exact hit, first element
    assert(pred(a, 9L) == null)   // all greater
    assert(pred(a, 99L) == 40L)   // past the end
    assert(pred(Seq.empty[Long], 5L) == null)
  }

  test("array_predecessor: codegen path through a DataFrame equals interpreted") {
    val df = Seq(
      (Seq(1L, 5L, 9L), 6L), (Seq(1L, 5L, 9L), 0L), (Seq(2L), 2L)
    ).toDF("arr", "v")
      .select(GraftFunctions.array_predecessor(col("arr"), col("v")).as("p"))
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
      == Seq(5L, null, 2L))
  }

  test("array_predecessor: int-backed arrays work") {
    val df = Seq((Seq(1, 3, 7), 5)).toDF("arr", "v")
      .select(GraftFunctions.array_predecessor(col("arr"), col("v")).as("p"))
    assert(df.head().getInt(0) == 3)
  }

  // ---- SQL registration surface -------------------------------------------

  test("registered SQL names are callable") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       l2_norm(array(3.0D, 4.0D)) AS n""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 5.0)
  }
}
