package graft.expressions

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, FloatType}

/** Property tests for the native kernels against straight Scala models:
  * interpreted `eval` must agree with the reference arithmetic for ANY
  * input arrays (the ScalaTest suite separately proves codegen ==
  * interpreted and HOF == native on executed plans).
  */
object ExpressionProps extends Properties("GraftExpressions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200) // pure expression eval — cheap, be thorough

  private def longArr(xs: Seq[Long]) =
    Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
  private def floatArr(xs: Seq[Float]) =
    Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(FloatType))

  private val genPair = for {
    n <- Gen.choose(0, 64)
    a <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
    b <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
  } yield (a, b)

  property("graft_dot_i64 == Scala sum of products") = forAll(genPair) { case (a, b) =>
    DotProductI64(longArr(a), longArr(b)).eval(InternalRow.empty) ==
      a.zip(b).map { case (x, y) => x * y }.sum
  }

  property("graft_agree_i64 == Scala equal-slot count") = forAll(genPair) { case (a, b) =>
    ArrayAgreeI64(longArr(a), longArr(b)).eval(InternalRow.empty) ==
      a.zip(b).count { case (x, y) => x == y }.toLong
  }

  property("graft_agree_i64 is symmetric and bounded by length") = forAll(genPair) {
    case (a, b) =>
      val ab = ArrayAgreeI64(longArr(a), longArr(b)).eval(InternalRow.empty).asInstanceOf[Long]
      val ba = ArrayAgreeI64(longArr(b), longArr(a)).eval(InternalRow.empty).asInstanceOf[Long]
      val self = ArrayAgreeI64(longArr(a), longArr(a)).eval(InternalRow.empty).asInstanceOf[Long]
      ab == ba && ab >= 0 && ab <= a.length && self == a.length.toLong
  }

  private val genFloatPair = for {
    n <- Gen.choose(1, 64)
    a <- Gen.listOfN(n, Gen.choose(-100.0f, 100.0f))
    b <- Gen.listOfN(n, Gen.choose(-100.0f, 100.0f))
  } yield (a, b)

  property("graft_cos_f32 == Scala double cosine (1e-12)") = forAll(genFloatPair) {
    case (a, b) =>
      val got = CosineSimF32(floatArr(a), floatArr(b)).eval(InternalRow.empty)
        .asInstanceOf[Double]
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = a.map(x => x.toDouble * x.toDouble).sum
      val nb = b.map(x => x.toDouble * x.toDouble).sum
      val want = dot / math.sqrt(na * nb)
      (got.isNaN && want.isNaN) || math.abs(got - want) < 1e-12
  }
}
