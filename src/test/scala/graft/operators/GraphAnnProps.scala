package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the Vamana RobustPrune kernel — pure
  * driver-side logic, so hundreds of generated candidate sets run in
  * milliseconds; the Spark-side build/serve paths are covered by
  * GraphAnnSuite/GraphIndexSuite and the q345/q349/q350 oracles. */
object GraphAnnProps extends Properties("GraphAnn.robustPrune") {

  private val cand: Gen[(Long, Double, Seq[Float])] = for {
    id <- Gen.choose(0L, 500L)
    cos <- Gen.chooseNum(-1.0, 1.0)
    v <- Gen.containerOfN[Seq, Float](6, Gen.chooseNum(-4f, 4f))
  } yield (id, cos, v)

  private val cands: Gen[List[(Long, Double, Seq[Float])]] = for {
    n <- Gen.choose(0, 40)
    cs <- Gen.listOfN(n, cand)
  } yield cs.groupBy(_._1).map(_._2.head).toList // distinct candidate ids

  private val rGen = Gen.choose(1, 12)
  private val alphaGen = Gen.chooseNum(1.0, 2.0)

  property("kept size bounded by r, all kept came from the pool") =
    forAll(cands, rGen, alphaGen) { (cs, r, a) =>
      val kept = GraphAnn.robustPrune(cs, r, a)
      kept.size <= r && kept.size <= cs.size &&
        kept.forall(k => cs.exists(c => c._1 == k._1 && c._2 == k._2))
    }

  property("kept ids distinct") =
    forAll(cands, rGen, alphaGen) { (cs, r, a) =>
      val kept = GraphAnn.robustPrune(cs, r, a)
      kept.map(_._1).distinct.size == kept.size
    }

  property("the closest candidate (ties id-asc) is always kept first") =
    forAll(cands, rGen, alphaGen) { (cs, r, a) =>
      cs.isEmpty || {
        val best = cs.minBy { case (id, cos, _) => (-cos, id) }
        GraphAnn.robustPrune(cs, r, a).headOption.map(_._1).contains(best._1)
      }
    }

  property("input order never matters (the id-asc tie rule pins the walk)") =
    forAll(cands, rGen, alphaGen) { (cs, r, a) =>
      GraphAnn.robustPrune(cs, r, a) ==
        GraphAnn.robustPrune(cs.reverse, r, a)
    }

  property("alpha -> infinity disables coverage pruning: exactly min(r, n) kept") =
    forAll(cands, rGen) { (cs, r) =>
      // keep-iff alpha*d(kept,c) > d(p,c): with a huge alpha the test
      // passes for every generated candidate (d(kept,c) = 0 would need
      // bit-identical random vectors), so only the degree bound cuts —
      // the closest-K degenerate case the gossip rounds rely on
      GraphAnn.robustPrune(cs, r, 1e9).size == math.min(r, cs.size)
    }
}
