package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RankEvalSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private val ln2 = math.log(2.0)
  private def gainAt(rel: Int, pos: Int) =
    r6((math.pow(2.0, rel.toDouble) - 1.0) / (math.log(pos + 1.0) / ln2))

  test("rankEval: hand-computed nDCG/RR/recall; unjudged and no-positive queries") {
    val run = Seq(
      // q1: judged doc at rank 2 (grade 2); 40 (grade 1) never retrieved
      ("q1", 10L, 1), ("q1", 20L, 2), ("q1", 30L, 3),
      // q2: no judgments at all -> all zeros, n_rel 0
      ("q2", 10L, 1),
      // q3: perfect single hit at rank 1
      ("q3", 40L, 1)
    ).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(
      ("q1", 20L, 2), ("q1", 40L, 1),
      ("q3", 40L, 1)
    ).toDF("query_id", "doc_id", "rel")
    val got = RankEval.rankEval(run, qrels, k = 3)
      .orderBy(col("query_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val dcg1 = gainAt(2, 2) // only the rank-2 hit gains
    val idcg1 = BigDecimal(gainAt(2, 1)) + BigDecimal(gainAt(1, 2))
    val ndcg1 = r6(dcg1 / idcg1.toDouble)
    assert(got === Seq(
      ("q1", 2L, ndcg1, 0.5, 0.5),
      ("q2", 0L, 0.0, 0.0, 0.0),
      ("q3", 1L, 1.0, 1.0, 1.0)))
    // k cuts the run AND the ideal: at k=1, q1's dcg is 0 (hit at rank
    // 2 falls off) and idcg is the single best judgment
    val atK1 = RankEval.rankEval(run, qrels, k = 1)
      .filter(col("query_id") === "q1").collect().head
    assert(atK1.getDouble(2) == 0.0 && atK1.getDouble(3) == 0.0)
    intercept[IllegalArgumentException](RankEval.rankEval(run, qrels, 0))
  }

  test("rankEvalSummary: exact means over the per-query frame") {
    val pq = Seq(
      ("q1", 2L, 0.5, 1.0, 0.5),
      ("q2", 1L, 0.25, 0.5, 1.0)
    ).toDF("query_id", "n_rel", "ndcg", "rr", "recall")
    val s = RankEval.rankEvalSummary(pq).collect().head
    assert(s.getLong(0) == 2L && s.getDouble(1) == 0.375 &&
      s.getDouble(2) == 0.75 && s.getDouble(3) == 0.75)
  }
}
