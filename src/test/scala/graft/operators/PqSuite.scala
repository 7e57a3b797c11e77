package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PqSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 8-dim vectors, m=2 subspaces of 4, k=2 codes: row i's halves sit near
  // one of two well-separated anchors so expected codes are obvious
  private def v(a: Float, b: Float): (Long, Seq[Float]) = (0L, Seq.fill(4)(a) ++ Seq.fill(4)(b))
  private lazy val embs = Seq(
    (0L, Seq.fill(4)(0f) ++ Seq.fill(4)(10f)),   // seed 0: codebook (0..., 10...)
    (1L, Seq.fill(4)(10f) ++ Seq.fill(4)(0f)),   // seed 1: codebook (10..., 0...)
    (2L, Seq.fill(4)(0.4f) ++ Seq.fill(4)(9.6f)), // near seed 0 in both halves
    (3L, Seq.fill(4)(9.9f) ++ Seq.fill(4)(0.2f)), // near seed 1 in both halves
    (4L, Seq.fill(4)(0.1f) ++ Seq.fill(4)(0.1f))  // half 0 -> code 0, half 1 -> code 1
  ).toDF("vec_id", "embedding")

  private lazy val books = Pq.seedCodebooks(embs, "vec_id", "embedding", m = 2, k = 2)

  test("seedCodebooks slices the first k vectors per subspace in id order") {
    assert(books.length == 2 && books(0).length == 2)
    assert(books(0)(0).toSeq == Seq.fill(4)(0f) && books(1)(0).toSeq == Seq.fill(4)(10f))
    assert(books(0)(1).toSeq == Seq.fill(4)(10f) && books(1)(1).toSeq == Seq.fill(4)(0f))
  }

  test("encode assigns each subspace to its nearest codebook entry, ties -> lowest") {
    val codes = Pq.encode(embs, "embedding", books).select($"vec_id", $"codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) == Seq(0, 0) && codes(1L) == Seq(1, 1), "seeds encode to themselves")
    assert(codes(2L) == Seq(0, 0) && codes(3L) == Seq(1, 1))
    assert(codes(4L) == Seq(0, 1), "mixed halves pick per-subspace nearest")
    // exact tie: equidistant from both centroids in subspace 0 -> code 0
    val tie = Seq((9L, (Seq.fill(4)(5f) ++ Seq.fill(4)(0f)))).toDF("vec_id", "embedding")
    val tc = Pq.encode(tie, "embedding", books).select($"codes").head().getSeq[Int](0)
    assert(tc.head == 0, s"tie must break to the lowest code, got $tc")
  }

  test("adcTopK equals brute-force LUT distance and never reads the vector column") {
    val query = Array.fill(4)(0.5f) ++ Array.fill(4)(9.5f)
    val encoded = Pq.encode(embs, "embedding", books).select($"vec_id", $"codes")
    val got = Pq.adcTopK(encoded, "vec_id", "codes", books, query, topK = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // hand-computed: lut(j)(c) = ||q_j - books(j)(c)||^2
    def lut(j: Int, c: Int) = {
      val q = if (j == 0) Seq.fill(4)(0.5) else Seq.fill(4)(9.5)
      q.zip(books(j)(c).map(_.toDouble)).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    val expect = Map(
      0L -> (lut(0, 0) + lut(1, 0)), 2L -> (lut(0, 0) + lut(1, 0)),
      1L -> (lut(0, 1) + lut(1, 1)), 3L -> (lut(0, 1) + lut(1, 1)),
      4L -> (lut(0, 0) + lut(1, 1)))
    got.foreach { case (id, d) =>
      assert(math.abs(d - expect(id)) < 1e-6, s"id $id: $d vs ${expect(id)}") }
    assert(got.head._1 == 0L || got.head._2 == got(1)._2,
      "nearest-to-query rows sort first (0 and 2 share codes)")
  }

  test("ivfAdcTopK prunes to nprobe coarse lists, then matches plain ADC on the survivors") {
    val query = Array.fill(4)(0.5f) ++ Array.fill(4)(9.5f)
    val coarse = Seq(
      Array.fill(4)(0f) ++ Array.fill(4)(10f),
      Array.fill(4)(10f) ++ Array.fill(4)(0f))
    // nprobe = all lists -> identical to plain ADC over everything
    val all = Pq.ivfAdcTopK(embs, "vec_id", "embedding", coarse, books, query,
      nprobe = 2, topK = 5).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val plain = Pq.adcTopK(Pq.encode(embs, "embedding", books), "vec_id", "codes",
      books, query, topK = 5).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(all == plain)
    // nprobe = 1: only the list the query is nearest to (coarse 0) survives
    val one = Pq.ivfAdcTopK(embs, "vec_id", "embedding", coarse, books, query,
      nprobe = 1, topK = 5).collect().map(_.getLong(0)).toSet
    assert(one.nonEmpty && one.subsetOf(Set(0L, 2L, 4L)),
      s"rows assigned to the unprobed list must be pruned, got $one")
  }

  test("lloydRefine moves centroids to member means and reduces quantization error") {
    def mse(b: Pq.Codebooks): Double = {
      val coded = Pq.encode(embs, "embedding", b)
        .select($"embedding", $"codes").collect()
      coded.map { r =>
        val vec = r.getSeq[Float](0).toArray
        val cs = r.getSeq[Int](1)
        (0 until 2).map { j =>
          val cent = b(j)(cs(j))
          val sub = vec.slice(j * 4, j * 4 + 4)
          sub.zip(cent).map { case (x, c) => (x - c).toDouble * (x - c) }.sum
        }.sum
      }.sum / coded.length
    }
    val refined = Pq.lloydRefine(embs, "embedding", books)
    assert(mse(refined) <= mse(books) + 1e-12, "refinement must not increase MSE")
    // subspace 0 / code 0 members: rows 0, 2, 4 with values 0, 0.4, 0.1
    val expected = (0f + 0.4f + 0.1f).toDouble / 3
    assert(math.abs(refined(0)(0)(0) - expected) < 1e-6)
  }
}
