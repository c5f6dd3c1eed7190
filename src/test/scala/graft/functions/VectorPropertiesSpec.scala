package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Scalacheck properties (SURVEY.md §5 "property" tier) over the interpreted
  * eval path — no Spark jobs, so hundreds of cases stay fast. Plain
  * scalacheck [[Properties]]: the scalatest bridge artifact isn't in the
  * offline cache, and sbt runs this framework natively.
  */
object VectorPropertiesSpec extends Properties("VectorExpressions") {

  private def lit(xs: Seq[Double]): Literal =
    Literal.create(new GenericArrayData(xs.map(x => x: Any).toArray), ArrayType(DoubleType))

  private val vecGen: Gen[List[Double]] =
    Gen.chooseNum(1, 32).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)))

  property("cosine bounded in [-1,1]") = forAll(vecGen, vecGen) { (a, b0) =>
    val b = b0.take(a.length).padTo(a.length, 1.0)
    val v = CosineSimilarity(lit(a), lit(b)).eval(null)
    v == null || {
      val d = v.asInstanceOf[Double]
      d >= -1.0 - 1e-9 && d <= 1.0 + 1e-9
    }
  }

  property("cos(v,v) ≈ 1 for non-zero v") = forAll(vecGen) { a =>
    a.forall(_ == 0.0) || {
      val v = CosineSimilarity(lit(a), lit(a)).eval(null).asInstanceOf[Double]
      math.abs(v - 1.0) < 1e-9
    }
  }

  property("dot symmetric + Cauchy–Schwarz") = forAll(vecGen, vecGen) { (a0, b0) =>
    val n = math.min(a0.length, b0.length)
    val (a, b) = (a0.take(n), b0.take(n))
    val ab = DotProduct(lit(a), lit(b)).eval(null).asInstanceOf[Double]
    val ba = DotProduct(lit(b), lit(a)).eval(null).asInstanceOf[Double]
    val na = L2Norm(lit(a)).eval(null).asInstanceOf[Double]
    val nb = L2Norm(lit(b)).eval(null).asInstanceOf[Double]
    ab == ba && math.abs(ab) <= na * nb + 1e-6
  }

  property("l2_norm absolutely homogeneous") =
    forAll(vecGen, Gen.chooseNum(-10.0, 10.0)) { (a, c) =>
      val scaled = L2Norm(lit(a.map(_ * c))).eval(null).asInstanceOf[Double]
      val base = L2Norm(lit(a)).eval(null).asInstanceOf[Double]
      math.abs(scaled - math.abs(c) * base) < 1e-6 * (1 + base)
    }
}
