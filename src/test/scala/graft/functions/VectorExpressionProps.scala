package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.SearchEngine

/** ScalaCheck properties for the codegen vector expressions (SURVEY.md §5
  * item 1). These exercise the interpreted `eval` path directly — no Spark
  * session — so hundreds of generated cases run in milliseconds; the
  * Spark-side (codegen) path of the same expressions is covered by the
  * DataFrame suites and the DuckDB oracle queries (q30-q37). */
object VectorExpressionProps extends Properties("VectorExpressions") {

  private def vecN(n: Int): Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](n, Gen.chooseNum(-8f, 8f))

  private val vec: Gen[Array[Float]] = Gen.choose(1, 130).flatMap(vecN)

  private val pair: Gen[(Array[Float], Array[Float])] =
    for { n <- Gen.choose(1, 130); a <- vecN(n); b <- vecN(n) } yield (a, b)

  private val triple: Gen[(Array[Float], Array[Float], Array[Float])] =
    for { n <- Gen.choose(1, 130); a <- vecN(n); b <- vecN(n); c <- vecN(n) } yield (a, b, c)

  private def litF(a: Array[Float]) =
    Literal(new GenericArrayData(a), ArrayType(FloatType, containsNull = false))
  private def litL(a: Array[Long]) =
    Literal(new GenericArrayData(a), ArrayType(LongType, containsNull = false))

  private def dot(a: Array[Float], b: Array[Float]): Double =
    DotProductFloat(litF(a), litF(b)).eval().asInstanceOf[Double]
  private def pack(a: Array[Float]): Array[Long] =
    PackSignBits(litF(a)).eval().asInstanceOf[GenericArrayData].toLongArray()
  private def ham(a: Array[Long], b: Array[Long]): Int =
    HammingDistPacked(litL(a), litL(b)).eval().asInstanceOf[Int]
  private def simhash(hs: Array[Long]): Long =
    SimHash64(litL(hs)).eval().asInstanceOf[Long]

  property("dot matches sequential double accumulation") = forAll(pair) { case (a, b) =>
    val expected = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    dot(a, b) == expected
  }

  property("dot is symmetric") = forAll(pair) { case (a, b) => dot(a, b) == dot(b, a) }

  property("pack sets bit i iff v(i) > 0") = forAll(vec) { a =>
    val words = pack(a)
    a.indices.forall { i =>
      (((words(i >> 6) >>> (i & 63)) & 1L) == 1L) == (a(i) > 0f)
    } && words.length == (a.length + 63) / 64
  }

  property("pack agrees with SearchEngine.packQuery (stage-0 driver path)") =
    forAll(vec) { a => pack(a).sameElements(SearchEngine.packQuery(a)) }

  property("pack is invariant under positive scaling") =
    forAll(vec, Gen.chooseNum(0.01f, 100f)) { (a, s) =>
      pack(a.map(_ * s)).sameElements(pack(a))
    }

  property("hamming(a,a) == 0") = forAll(vec) { a =>
    ham(pack(a), pack(a)) == 0
  }

  property("hamming is symmetric") = forAll(pair) { case (a, b) =>
    ham(pack(a), pack(b)) == ham(pack(b), pack(a))
  }

  property("hamming satisfies the triangle inequality") = forAll(triple) { case (a, b, c) =>
    ham(pack(a), pack(c)) <= ham(pack(a), pack(b)) + ham(pack(b), pack(c))
  }

  property("hamming counts differing sign bits (reference semantics, VectorTable.php:126-139)") =
    forAll(pair) { case (a, b) =>
      val expected = a.zip(b).count { case (x, y) => (x > 0f) != (y > 0f) }
      ham(pack(a), pack(b)) == expected
    }

  property("simhash is invariant under input permutation") =
    forAll(Gen.nonEmptyListOf(Gen.long), Gen.long) { (hs, seed) =>
      val arr = hs.toArray
      val shuffled = new scala.util.Random(seed).shuffle(hs).toArray
      simhash(arr) == simhash(shuffled)
    }

  property("simhash of a single hash is (almost) the hash: 1-bits preserved") =
    forAll(Gen.long) { h =>
      // one input: bit set -> vote +1 -> bit set; bit clear -> vote -1 -> clear
      simhash(Array(h)) == h
    }
}
