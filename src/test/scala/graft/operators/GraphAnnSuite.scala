package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphAnnSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val dim = 8
  private val vecs: Seq[(Long, Seq[Float])] =
    (0L until 40L).map(i => i -> Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
  private lazy val embs = vecs.toDF("vec_id", "embedding")
    .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
  private val query = vecs(3)._2.toArray

  /** Exact m-NN digraph over `e` — the SQL-expressible adjacency the
    * gated row uses; here built independently for the serve tests. */
  private def knnGraph(e: org.apache.spark.sql.DataFrame, m: Int) = {
    val a = e.select(col("vec_id").as("src"), col("embedding").as("sv"))
    val b = e.select(col("vec_id").as("dst"), col("embedding").as("dv"))
    a.join(b, col("src") =!= col("dst"))
      .withColumn("cos", graft.functions.VectorFunctions.vecCosine(col("sv"), col("dv")))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst").asc)))
      .filter(col("__rk") <= m)
      .select(col("src"), col("dst"))
  }

  test("robustPrune: closest kept, covered direction dropped, diverse kept, degree bound") {
    // p's candidates: b points exactly a's way but sits farther from p
    // (d(a,b) ~ 1e-13 from the eps guard, d(p,b) = 0.001), so a covers
    // it: alpha*d(a,b) <= d(p,b) prunes; c is orthogonal — diversity
    // the prune must preserve
    val a = (10L, 1.0, Seq(2f, 0f))
    val b = (11L, 0.999, Seq(2f, 0f))
    val c = (12L, 0.0, Seq(0f, 1f))
    val kept = GraphAnn.robustPrune(Seq(c, b, a), r = 3, alpha = 1.2)
    assert(kept.map(_._1) === Seq(10L, 12L),
      "a closest, covers b, c survives on diversity")
    assert(GraphAnn.robustPrune(Seq(c, b, a), r = 1, alpha = 1.2)
      .map(_._1) === Seq(10L), "degree bound cuts after the closest")
  }

  test("buildVamana: degree bound, no self edges, deterministic, ids real") {
    val g = GraphAnn.buildVamana(embs, "vec_id", "embedding", r = 6, rounds = 2)
    val deg = g.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(deg <= 6, s"out-degree capped at r, saw $deg")
    assert(g.filter(col("src") === col("dst")).count() === 0L)
    val ids = vecs.map(_._1).toSet
    assert(g.select("dst").distinct().collect().map(_.getLong(0))
      .forall(ids), "every edge lands on a real node")
    val g2 = GraphAnn.buildVamana(embs, "vec_id", "embedding", r = 6, rounds = 2)
    assert(g.orderBy("src", "dst").collect().toSeq ===
      g2.orderBy("src", "dst").collect().toSeq, "hash-seeded build replays")
    graft.util.Pins.release(g); graft.util.Pins.release(g2)
  }

  test("beamSearchTopK: exhaustive beam on the kNN graph == exact scan") {
    val adj = knnGraph(embs, 5).localCheckpoint(true)
    val got = GraphAnn.beamSearchTopK(adj, embs, "vec_id", "embedding",
        query, k = 5, beamWidth = Int.MaxValue, entryId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Ann.bruteForceTopK(embs, "vec_id", "embedding", query, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the 40-node 5-NN graph is connected from node 0 (if it weren't,
    // both sides would see the same component — the gated row's oracle
    // mirrors reachability; HERE we assert full agreement to also pin
    // scoring and the tie rule)
    assert(got === exact)
    graft.util.Pins.release(adj)
  }

  test("beamSearchTopK: narrow beam still returns k ranked rows; vamana recall sane") {
    val g = GraphAnn.buildVamana(embs, "vec_id", "embedding", r = 6, rounds = 2)
    val got = GraphAnn.beamSearchTopK(g, embs, "vec_id", "embedding",
        query, k = 5, beamWidth = 12, entryId = Some(0L))
      .collect().map(_.getLong(0)).toSeq
    assert(got.size === 5)
    val exact = Ann.bruteForceTopK(embs, "vec_id", "embedding", query, 5)
      .collect().map(_.getLong(0)).toSet
    val recall = got.count(exact) / 5.0
    assert(recall >= 0.6, s"graph+beam recall@5 on the fixture, got $recall")
    graft.util.Pins.release(g)
  }

  test("driver-side bounded walk == distributed exhaustive walk when the beam covers the reachable set") {
    // beamWidth <= DriverWalkMaxBeam runs the r22 driver-orchestrated
    // walk; Int.MaxValue runs the distributed loop. With a beam wider
    // than the whole graph the window never cuts, so both must visit
    // the identical set and return identical (id, cosine) rows — this
    // pins the driver path's scoring, tie rule and convergence against
    // the distributed implementation it replaced for bounded beams.
    val adj = knnGraph(embs, 5).localCheckpoint(true)
    assert(embs.count() <= GraphAnn.DriverWalkMaxBeam)
    val driver = GraphAnn.beamSearchTopK(adj, embs, "vec_id", "embedding",
        query, k = 7, beamWidth = GraphAnn.DriverWalkMaxBeam,
        entryId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val dist = GraphAnn.beamSearchTopK(adj, embs, "vec_id", "embedding",
        query, k = 7, beamWidth = Int.MaxValue, entryId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(driver === dist)
    graft.util.Pins.release(adj)
  }

  test("beamSweep: recall non-decreasing in beam, exhaustive beam exact on a connected graph") {
    val adj = knnGraph(embs, 5).localCheckpoint(true)
    val qs = Seq(3L -> vecs(3)._2.toArray, 9L -> vecs(9)._2.toArray)
    val got = GraphAnn.beamSweep(adj, embs, "vec_id", "embedding", qs,
        k = 5, beamWidths = Seq(5, 12, Int.MaxValue), entryId = Some(0L))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) === Seq(5, 12, Int.MaxValue))
    assert(got.forall(_._2 === 2L))
    val recalls = got.map(_._3)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not fall as beam widens: $recalls")
    assert(recalls.last === 1.0,
      "the exhaustive walk on a connected graph is the exact scan")
    graft.util.Pins.release(adj)
    intercept[IllegalArgumentException](GraphAnn.beamSweep(
      adj, embs, "vec_id", "embedding", qs, k = 5, beamWidths = Seq(4)))
    intercept[IllegalArgumentException](GraphAnn.beamSweep(
      adj, embs, "vec_id", "embedding", Seq.empty, k = 5, beamWidths = Seq(8)))
    intercept[IllegalArgumentException](GraphAnn.beamSweep(
      adj, embs, "vec_id", "embedding", qs :+ qs.head, k = 5,
      beamWidths = Seq(8)))
  }

  test("medoid: the most central vector of an axis cluster") {
    val cluster = Seq(
      (1L, Seq(1f, 0.1f)), (2L, Seq(1f, 0f)), (3L, Seq(1f, -0.1f)),
      (4L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
    // mean ≈ (0.75, 0.25): id 1 (tilted toward +y) aligns best
    assert(GraphAnn.medoid(cluster, "vec_id", "embedding") === 1L)
  }

  test("guards: degree, alpha, rounds, k/beam/hops bounds reject") {
    intercept[IllegalArgumentException](
      GraphAnn.buildVamana(embs, "vec_id", "embedding", r = 0))
    intercept[IllegalArgumentException](
      GraphAnn.buildVamana(embs, "vec_id", "embedding", r = 4, alpha = 0.9))
    intercept[IllegalArgumentException](
      GraphAnn.buildVamana(embs, "vec_id", "embedding", r = 4, rounds = 0))
    val adj = Seq((0L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException](GraphAnn.beamSearchTopK(
      adj, embs, "vec_id", "embedding", query, k = 0, beamWidth = 4))
    intercept[IllegalArgumentException](GraphAnn.beamSearchTopK(
      adj, embs, "vec_id", "embedding", query, k = 5, beamWidth = 4))
    intercept[IllegalArgumentException](GraphAnn.beamSearchTopK(
      adj, embs, "vec_id", "embedding", query, k = 1, beamWidth = 4,
      maxHops = 0))
  }
}
