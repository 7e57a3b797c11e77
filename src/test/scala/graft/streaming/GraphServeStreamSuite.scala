package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.GraphAnn
import graft.sources.GraphIndex

/** Pins the streaming graph serve's parity with the batch
  * [[GraphIndex.searchTopK]] (code-shared, so scoring parity is
  * structural — this suite proves the stream plumbing: replay guard,
  * per-batch freshness of tombstones, output shape) through a real
  * file-stream micro-batch run. */
class GraphServeStreamSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(31)
  private val vecs: Seq[(Long, Seq[Float])] =
    (0L until 32L).map(i => i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f))
  private lazy val embs = vecs.toDF("vec_id", "embedding")
    .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))

  test("streamed answers == batch searchTopK per query; replays skip; tombstones live") {
    val dir = Files.createTempDirectory("graft_gserve").toString
    val gi = new GraphIndex(spark, s"$dir/g", buckets = 8)
    val adj = GraphAnn.buildVamana(embs, "vec_id", "embedding", r = 5, rounds = 2)
    gi.build(adj)
    graft.util.Pins.release(adj)
    def serve(qv: Array[Float]) = gi.searchTopK(embs, "vec_id", "embedding",
        qv, k = 4, beamWidth = 12, entryId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // expected answers captured at the same store states the stream
    // sees: q100/q101 answer PRE-tombstone, q102 POST-tombstone
    val pre100 = serve(vecs(3)._2.toArray)
    val pre101 = serve(vecs(9)._2.toArray)
    val qDir = s"$dir/queries"
    def qdf(rows: Seq[(Long, Seq[Float])]) = rows.toDF("query_id", "qv")
      .withColumn("qv", col("qv").cast(ArrayType(FloatType)))
    qdf(Seq(100L -> vecs(3)._2, 101L -> vecs(9)._2))
      .write.mode("append").parquet(qDir)
    val query = GraphServeStream.start(spark, qDir, s"$dir/ckpt",
      s"$dir/out", s"$dir/g", embs, "vec_id", "embedding",
      k = 4, beamWidth = 12, entryId = Some(0L), buckets = 8)
    val post102 = try {
      query.processAllAvailable()
      // second file: one replayed id (must not answer twice), one new
      // query, and a tombstone landed BETWEEN batches — the next batch
      // must see it with no restart (the best hit for vecs(3)'s own
      // vector is node 3 itself, so the delete visibly changes the
      // answer)
      gi.delete(Seq(3L).toDF("id"))
      val expected = serve(vecs(3)._2.toArray)
      qdf(Seq(100L -> vecs(3)._2, 102L -> vecs(3)._2))
        .write.mode("append").parquet(qDir)
      query.processAllAvailable()
      expected
    } finally query.stop()
    val out = spark.read.parquet(s"$dir/out")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("vec_id")),
        r.getDouble(r.fieldIndex("cosine")),
        r.getInt(r.fieldIndex("rank"))))
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._4).map(t => (t._2, t._3)).toSeq }
    assert(out.keySet === Set(100L, 101L, 102L))
    assert(out(100L) === pre100, "batch-1 answer == the batch serve then")
    assert(out(101L) === pre101)
    assert(out(102L) === post102,
      "the tombstone landed between batches binds the next batch, no restart")
    assert(pre100.map(_._1).contains(3L) && !post102.map(_._1).contains(3L),
      "the fixture exercises the delete: node 3 was a hit, then only routes")
    assert(out(100L).size === 4, "the replayed query id answered exactly once")
  }
}
