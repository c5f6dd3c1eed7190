package graft.functions

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Int8Quantize kernel: parity with the HOF formulation it replaced (k13's
  * r5 shape — same math, five interpreted lambdas), codegen-vs-interpreted
  * parity, and null/empty/clamp edges.
  */
class Int8QuantizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def floatLit(xs: Seq[Float]): Literal =
    Literal.create(new GenericArrayData(xs.map(x => x: Any).toArray), ArrayType(FloatType))

  test("interpreted eval: scale, lanes, sum, and error match hand math") {
    val r = Int8Quantize(floatLit(Seq(1.0f, -0.5f, 0.25f)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val scale = r.getDouble(1)
    assert(math.abs(scale - 1.0 / 127.0) < 1e-15)
    val q = r.getArray(0).toIntArray()
    assert(q.toSeq == Seq(127, -63, 32)) // floor(-63.5+0.5) = -63; floor(31.75+0.5)=32
    assert(r.getLong(2) == 96L)
    val maxErr = r.getDouble(3)
    assert(maxErr <= scale * 0.5 + 1e-12)
  }

  test("clamp: the negative extreme lands exactly on -127") {
    val r = Int8Quantize(floatLit(Seq(2.0f, -2.0f)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(r.getArray(0).toIntArray().toSeq == Seq(127, -127))
  }

  test("NULL and empty inputs yield NULL") {
    assert(Int8Quantize(Literal.create(null, ArrayType(FloatType))).eval(null) == null)
    assert(Int8Quantize(floatLit(Nil)).eval(null) == null)
  }

  test("codegen path (DataFrame) equals interpreted eval") {
    val rows = Seq(
      Seq(1f, 2f, 3f),
      Seq(-0.001f, 0.002f, 0f),
      Seq(42f),
      Seq(0f, 0f)) // all-zero vector: scale floors at 1e-12/127
    val got = rows.toDF("v")
      .select(GraftFunctions.int8_quantize(col("v")).as("z"))
      .select(col("z.q"), col("z.scale"), col("z.q_sum"), col("z.max_abs_err"))
      .collect()
    rows.zip(got).foreach { case (xs, Row(q, scale, qSum, maxErr)) =>
      val ir = Int8Quantize(floatLit(xs))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      assert(q.asInstanceOf[scala.collection.Seq[Int]].toSeq ==
        ir.getArray(0).toIntArray().toSeq, s"$xs")
      assert(scale == ir.getDouble(1) && qSum == ir.getLong(2) &&
        maxErr == ir.getDouble(3), s"$xs")
    }
  }

  test("kernel equals the r5 HOF formulation lane-for-lane on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(Seq.fill(1 + rnd.nextInt(16))(
      (rnd.nextFloat() - 0.5f) * rnd.nextInt(100)))
    val df = rows.toDF("embedding")
    val hof = df
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .filter(size(col("v")) > 0)
      .withColumn("scale",
        greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-12)) / lit(127.0))
      .withColumn("q",
        transform(col("v"), x =>
          least(greatest(floor(x / col("scale") + lit(0.5)), lit(-127.0)),
            lit(127.0)).cast("int")))
      .select(col("q"), col("scale"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"))
      .collect()
    val kern = df
      .select(GraftFunctions.int8_quantize(col("embedding")).as("z"))
      .select(col("z.q"), col("z.scale"), col("z.q_sum"))
      .collect()
    hof.zip(kern).foreach { case (Row(qh, sh, sumh), Row(qk, sk, sumk)) =>
      assert(qh == qk && sh == sk && sumh == sumk)
    }
  }

  test("SQL registration surface: int8_quantize resolves") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT int8_quantize(array(CAST(1.0 AS FLOAT))).q_sum AS s").collect()
    assert(r.head.getLong(0) == 127L)
  }
}
