package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AnnSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val dim = 8
  private val vecs: Seq[(Long, Seq[Float])] =
    (0L until 40L).map(i => i -> Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
  private lazy val embs = vecs.toDF("vec_id", "embedding")
    .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
  private val query = vecs(3)._2.toArray // use a stored vector as the query

  private def topIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSeq

  test("bruteForceTopK returns the exact top-k, self first") {
    val top = topIds(Ann.bruteForceTopK(embs, "vec_id", "embedding", query, 5))
    assert(top.head == 3L, "the query's own vector has cosine ~1")
    assert(top.size == 5)
  }

  test("knnJoin ranks per query and matches single-query brute force") {
    val out = Ann.knnJoin(embs.filter($"vec_id" === 3L), embs.filter($"vec_id" =!= 3L),
      "vec_id", "vec_id", "embedding", "embedding", 4)
    val got = out.orderBy($"rank").select("neighbor_id").collect().map(_.getLong(0)).toSeq
    val expected = topIds(Ann.bruteForceTopK(embs.filter($"vec_id" =!= 3L),
      "vec_id", "embedding", query, 4))
    assert(got == expected)
  }

  test("lshTopK with enough probes returns only bucket-compatible candidates, ranked exactly") {
    val got = Ann.lshTopK(embs, "vec_id", "embedding", query, k = 3, bits = 4, probeHamming = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.nonEmpty && got.head._1 == 3L)
    // every returned candidate's 4-bit sign bucket is within hamming 1 of the query's
    val qb = (0 until 4).map(i => query(i) > 0f)
    got.foreach { case (id, _) =>
      val v = vecs(id.toInt)._2
      val hd = (0 until 4).count(i => (v(i) > 0f) != qb(i))
      assert(hd <= 1, s"id=$id bucket distance $hd")
    }
  }

  test("ivfAssign + ivfTopK: full-probe equals brute force; fewer probes subset the lists") {
    val cents = Seq(vecs(0)._2.toArray, vecs(10)._2.toArray, vecs(20)._2.toArray)
    val assigned = Ann.ivfAssign(embs, "embedding", cents)
    val lists = assigned.select("ivf_list").distinct().collect().map(_.getInt(0)).toSet
    assert(lists.subsetOf(Set(0, 1, 2)))

    val full = topIds(Ann.ivfTopK(assigned, "vec_id", "embedding", cents, query, 5, nprobe = 3))
    val brute = topIds(Ann.bruteForceTopK(embs, "vec_id", "embedding", query, 5))
    assert(full == brute, "probing every list is exact")

    val one = Ann.ivfTopK(assigned, "vec_id", "embedding", cents, query, 5, nprobe = 1)
    val probedList = one.select("vec_id").collect().map(_.getLong(0)).toSet
    val listOf = assigned.select("vec_id", "ivf_list").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(probedList.map(listOf).size == 1, "nprobe=1 scans exactly one inverted list")
  }

  test("trainCentroids + ivfAssign separates well-separated blobs") {
    // two tight blobs far apart; k=2 must split them cleanly
    val blob = (off: Float, ids: Range) => ids.map(i =>
      (i.toLong, Seq.fill(dim)(off + (i % 3) * 0.01f)))
    val blobs = (blob(10f, 0 until 20) ++ blob(-10f, 20 until 40))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
    val cents = Ann.trainCentroids(blobs, "embedding", k = 2)
    assert(cents.length == 2)
    val assigned = Ann.ivfAssign(blobs, "embedding", cents)
      .select("vec_id", "ivf_list").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val listA = (0 until 20).map(i => assigned(i.toLong)).toSet
    val listB = (20 until 40).map(i => assigned(i.toLong)).toSet
    assert(listA.size == 1 && listB.size == 1 && listA != listB,
      s"each blob maps to exactly one distinct list: $listA vs $listB")
  }

  test("bucketsWithin enumerates all strings within the flip budget") {
    val b = Ann.bucketsWithin("0101", 1)
    assert(b.toSet == Set("0101", "1101", "0001", "0111", "0100"))
    assert(Ann.bucketsWithin("01", 2).toSet.size == 4, "all 2-bit strings")
  }

  test("lshTopK rejects bucket widths past the query or embedding dimension") {
    val short = Array.fill(4)(1.0f)
    val e1 = intercept[IllegalArgumentException] {
      Ann.lshTopK(embs, "vec_id", "embedding", short, k = 3, bits = 8)
    }
    assert(e1.getMessage.contains("query dimension"))
    val e2 = intercept[IllegalArgumentException] {
      Ann.lshTopK(embs, "vec_id", "embedding", Array.fill(32)(1.0f), k = 3, bits = 16)
    }
    assert(e2.getMessage.contains("embedding dimension"), s"dim=$dim vs bits=16: ${e2.getMessage}")
  }

  test("lloydIter: means move toward the assigned members, k*dim rows out") {
    // two obvious blobs around +1 and -1; centroids start off-center
    val blob = ((0L until 10L).map(i => i -> Seq.fill(dim)(1.0f)) ++
      (10L until 20L).map(i => i -> Seq.fill(dim)(-1.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
    val init = Seq(Array.fill(dim)(0.5f), Array.fill(dim)(-0.5f))
    val rows = Ann.lloydIter(blob, "embedding", init).collect()
    assert(rows.length == 2 * dim)
    val means = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    (0 until dim).foreach { d =>
      assert(means((0, d)) == 1.0, "cluster 0 mean snaps to the +1 blob")
      assert(means((1, d)) == -1.0, "cluster 1 mean snaps to the -1 blob")
    }
  }

  test("lloydTrain converges on separated blobs and keeps empty clusters' centroids") {
    val blob = ((0L until 10L).map(i => i -> Seq.fill(dim)(1.0f + 0.01f * i)) ++
      (10L until 20L).map(i => i -> Seq.fill(dim)(-1.0f - 0.01f * (i - 10))))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
    val cents = Ann.lloydTrain(blob, "vec_id", "embedding", k = 2, iters = 5)
    assert(cents.length == 2)
    // init = first 2 vectors (both in the +blob); one centroid should
    // migrate to each blob OR one cluster may stay empty and keep its init —
    // either way assignment must split the blobs consistently
    val assignedLists = Ann.ivfAssign(blob, "embedding", cents)
      .select("vec_id", "ivf_list").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val plus = (0L until 10L).map(assignedLists).toSet
    val minus = (10L until 20L).map(assignedLists).toSet
    assert(plus.size == 1 && minus.size == 1 && plus != minus,
      s"blobs end in distinct clusters: $plus vs $minus")
  }

  test("ivfStats: list population and decimal-exact mean cosine to centroid") {
    val cents = Seq(Array(1f, 0f), Array(0f, 1f))
    val embs = Seq(
      (0L, Seq(2f, 0f)),  // list 0, cos 1.0
      (1L, Seq(3f, 4f)),  // list 0 (dot 3 > 4? no: dot c0=3, c1=4 -> list 1!)
      (2L, Seq(0f, 7f))   // list 1, cos 1.0
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
    val out = Ann.ivfStats(embs, "vec_id", "embedding", cents)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // [3,4]: dot to [1,0] is 3, to [0,1] is 4 -> list 1; cos to [0,1] = 4/5
    assert(out(0) === ((1L, 1.0)))
    assert(out(1) === ((2L, 0.9)))  // (1.0 + 0.8) / 2
  }

  test("meanPool: sorted sequential fold gives the exact per-dim mean") {
    val embs = Seq(
      (0L, Seq(1f, 3f)), (2L, Seq(3f, 5f)),  // group 0 -> mean [2, 4]
      (1L, Seq(10f, 0f))                     // group 1 -> itself
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
    val out = Ann.meanPool(embs, col("vec_id") % 2, col("vec_id"), "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[Double](2)))).toMap
    assert(out(0L) === ((2L, Seq(2.0, 4.0))))
    assert(out(1L) === ((1L, Seq(10.0, 0.0))))
  }

  test("matryoshkaTopK with full-corpus candidates equals brute force; recallAtK bounds") {
    val rnd = new scala.util.Random(3)
    val embs = (0L until 60L).map(id =>
      (id, Seq.fill(32)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
    val q = Array.fill(32)(rnd.nextFloat() * 2 - 1)
    val exact = Ann.bruteForceTopK(embs, "vec_id", "embedding", q, k = 10)
    // candidates = corpus size -> the funnel cannot lose anything
    val funnelAll = Ann.matryoshkaTopK(embs, "vec_id", "embedding", q,
      prefixDims = 8, candidates = 60, k = 10)
    assert(funnelAll.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      exact.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    val r = Ann.recallAtK(exact, funnelAll, "vec_id", 10).head()
    assert(r.getLong(0) === 10L && r.getDouble(1) === 1.0)
    // a tight funnel can only lose recall, never exceed 1
    val tight = Ann.matryoshkaTopK(embs, "vec_id", "embedding", q,
      prefixDims = 4, candidates = 12, k = 10)
    val r2 = Ann.recallAtK(exact, tight, "vec_id", 10).head()
    assert(r2.getDouble(1) >= 0.0 && r2.getDouble(1) <= 1.0)
  }

  test("centroidDrift: identical groups at cosine ~1, orthogonal at ~0, counts carried") {
    import spark.implicits._
    val embs = Seq(
      (1L, 0, Array(1f, 0f)), (2L, 0, Array(1f, 0f)),
      (3L, 1, Array(1f, 0f)),                        // same centroid as group 0
      (4L, 2, Array(0f, 2f)), (5L, 2, Array(0f, 4f)) // orthogonal centroid (0,3)
    ).toDF("vec_id", "label", "embedding")
    val out = Ann.centroidDrift(embs, col("label"), "vec_id", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet === Set((0, 1), (0, 2), (1, 2)))
    assert(out((0, 1))._3 > 0.999999, s"identical centroids: ${out((0, 1))}")
    assert(math.abs(out((0, 2))._3) < 1e-6, s"orthogonal centroids: ${out((0, 2))}")
    assert(out((0, 1))._1 == 2L && out((0, 1))._2 == 1L)
  }

  test("rrfFuse: both-leg consensus wins, single-leg ids still fuse, exact reciprocals") {
    import spark.implicits._
    val legA = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val legB = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("id", "rank")
    val out = Ann.rrfFuse(Seq(legA, legB), "id", k = 4)
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Int]),
        Option(r.get(2)).map(_.asInstanceOf[Int]), r.getDouble(3)))
    def rrf(rs: Seq[Option[Int]]) = BigDecimal.valueOf(
        rs.map(_.fold(0.0)(x => 1.0 / (60.0 + x))).reduce(_ + _))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = Map(
      10L -> rrf(Seq(Some(1), Some(3))), 20L -> rrf(Seq(Some(2), Some(1))),
      30L -> rrf(Seq(Some(3), None)), 40L -> rrf(Seq(None, Some(2))))
    assert(out.map(t => t._1 -> t._4).toMap === expect)
    // consensus ids outrank single-leg ids; id 20 (ranks 2+1) edges id 10 (1+3)
    assert(out.map(_._1).toSeq === Seq(20L, 10L, 40L, 30L))
    assert(out.find(_._1 == 30L).get._3.isEmpty, "leg-B rank must be null for 30")
  }

  test("coverageHistogram: exact match in top bucket, unmatched bucket -1, in-bucket partial") {
    val ref = Seq((10L, Array(1f, 1f, 1f)), (11L, Array(1f, -1f, 1f))).toDF("id", "vec")
    val neu = Seq(
      (1L, Array(1f, 1f, 1f)),    // bucket 11, cosine 1.0 with ref 10 -> bucket 9
      (2L, Array(-1f, -1f, 1f)),  // bucket 00: no reference at all -> -1
      (3L, Array(1f, -1f, -1f))   // bucket 10, cosine 1/3 with ref 11 -> bucket 3
    ).toDF("id", "vec")
    val got = Ann.coverageHistogram(neu, ref, "id", "vec", bits = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2)))
    assert(got.toSeq == Seq(
      (-1, None, 1L), (3, Some(0.3), 1L), (9, Some(0.9), 1L)), s"got ${got.toSeq}")
  }

  test("jlProject: hand-computed fold, seed-deterministic, redraw changes the matrix") {
    val embs = Seq((1L, Array(1f, 2f, 4f))).toDF("id", "vec")
    def proj(seed: String) = Ann.jlProject(embs, "vec", inDim = 3, outDim = 2, seed = seed)
      .select("proj").head().getSeq[Double](0)
    def r6(x: Double) =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scale = math.sqrt(2.0)
    val expect = (0 until 2).map { j =>
      r6((1.0 * Ann.jlSign("jl", j, 0) + 2.0 * Ann.jlSign("jl", j, 1) +
        4.0 * Ann.jlSign("jl", j, 2)) / scale)
    }
    assert(proj("jl") == expect, s"got ${proj("jl")} want $expect")
    assert(proj("jl") == proj("jl"), "same seed must reproduce")
    // with 6 independent sign draws, at least one differs overwhelmingly
    assert(proj("jl2") != proj("jl"), "a fresh seed should redraw the matrix")
  }

  test("jlProject: realistic dims (1024->256) plan fast and match the jlSign fold") {
    val rnd = new scala.util.Random(42)
    val vec = Array.fill(1024)(rnd.nextFloat() * 2f - 1f)
    val embs = Seq((1L, vec)).toDF("id", "vec")
    // the old literal-matrix formulation built ~262k expression nodes here
    // and stalled analysis/codegen; the broadcast kernel must plan quickly
    val t0 = System.nanoTime()
    val frame = Ann.jlProject(embs, "vec", inDim = 1024, outDim = 256)
    frame.queryExecution.executedPlan // force analysis + physical planning
    val planSec = (System.nanoTime() - t0) / 1e9
    assert(planSec < 15.0, f"planning took $planSec%.1fs — literal-tree regression?")
    val got = frame.select("proj").head().getSeq[Double](0)
    assert(got.length == 256)
    def r6(x: Double) =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scale = math.sqrt(256.0)
    Seq(0, 17, 255).foreach { j =>
      var acc = 0.0
      (0 until 1024).foreach(i => acc += vec(i).toDouble * Ann.jlSign("jl", j, i))
      assert(got(j) == r6(acc / scale), s"dim $j mismatch")
    }
  }

  test("jlProject: a vector shorter than inDim yields null, not garbage") {
    val embs = Seq((1L, Array(1f, 2f)), (2L, Array(1f, 2f, 3f))).toDF("id", "vec")
    val got = Ann.jlProject(embs, "vec", inDim = 3, outDim = 2)
      .orderBy("id").select("proj").collect()
    assert(got(0).isNullAt(0), "short vector must project to null")
    assert(!got(1).isNullAt(0))
  }

  test("hardNegatives: same-group twins excluded, cross-group ranked by cosine") {
    val e = Seq(
      (1L, "g1", Array(1f, 0f)),
      (2L, "g1", Array(1f, 0.01f)),  // near-identical but SAME group: a positive, not a negative
      (3L, "g2", Array(0.9f, 0.1f)), // close and out-of-group: the hard negative
      (4L, "g2", Array(0f, 1f)),
      (5L, "g3", Array(-1f, 0f))).toDF("id", "grp", "vec")
    val got = Ann.hardNegatives(e.filter($"id" === 1L), e,
        "id", "id", "vec", "vec", "grp", "grp", k = 3)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getInt(4)))
    assert(got.toSeq == Seq((3L, "g2", 1), (4L, "g2", 2), (5L, "g3", 3)), s"got ${got.toSeq}")
    assert(!got.exists(_._1 == 2L), "the same-group twin leaked in as a negative")
  }

  test("hardNegatives: null groups form one ungrouped pseudo-group (null-safe exclusion)") {
    val e = Seq(
      (1L, Option("g1"), Array(1f, 0f)),
      (2L, None, Array(1f, 0.01f)),  // ungrouped: a negative for grouped anchors
      (3L, None, Array(0.9f, 0.1f)),
      (4L, Option("g2"), Array(0.5f, 0.5f))).toDF("id", "grp", "vec")
    // grouped anchor: ungrouped rows are candidates (=!= used to drop them)
    val fromG1 = Ann.hardNegatives(e.filter($"id" === 1L), e,
        "id", "id", "vec", "vec", "grp", "grp", k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(fromG1 == Set(2L, 3L, 4L), s"got $fromG1")
    // ungrouped anchor: excludes only the other ungrouped rows
    val fromNull = Ann.hardNegatives(e.filter($"id" === 2L), e,
        "id", "id", "vec", "vec", "grp", "grp", k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(fromNull == Set(1L, 4L), s"got $fromNull")
  }

  test("embeddingHealth: hand-computed per-dim mean/variance/sign balance; dead dim flagged") {
    val embs = Seq(
      (1L, Array(1f, -1f, 0.5f)),
      (2L, Array(3f, 1f, 0.5f))).toDF("id", "embedding")
    val got = Ann.embeddingHealth(embs, "embedding").orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      // dim0: mean (1+3)/2 = 2, var (1+9)/2 - 4 = 1, both positive
      (0, 2L, 2.0, 1.0, 1.0),
      // dim1: mean 0, var 1, one of two positive
      (1, 2L, 0.0, 1.0, 0.5),
      // dim2 is a DEAD dimension: zero variance, the collapse signal
      (2, 2L, 0.5, 0.0, 1.0)), s"got ${got.toSeq}")
  }

  test("nprobeSweep: hand-checked recall curve, monotone, full-probe hits 1.0") {
    // two clean clusters: list 0 = x-axis (ids 1-3), list 1 = y-axis (4-6)
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.8f, 0.2f)),
      (4L, Array(0.0f, 1.0f)), (5L, Array(0.1f, 0.9f)), (6L, Array(0.2f, 0.8f))
    ).toDF("vec_id", "embedding")
    val cents = Seq(Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    // query = y-axis: probe order [1, 0]; exact top-4 = {4,5,6,3}
    val out = Ann.nprobeSweep(df, "vec_id", "embedding", cents,
      queries = Seq((100, Array(0.0f, 1.0f))), k = 4, nprobes = Seq(1, 2))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // nprobe 1 reads only list 1 -> 3 of the exact 4; nprobe 2 is exact
    assert(out.toSeq == Seq((1, 1L, 0.75, 0.5), (2, 1L, 1.0, 1.0)), s"got ${out.toSeq}")

    // two queries from opposite clusters: mean recall still 1.0 at full probe,
    // and the curve is non-decreasing per construction
    val two = Ann.nprobeSweep(df, "vec_id", "embedding", cents,
      queries = Seq((0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f))),
      k = 2, nprobes = Seq(1, 2))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(two.map(_._2).forall(_ == 2L), "both queries graded at every nprobe")
    assert(two.last._3 == 1.0, "nprobe = nlists is exact")
    assert(two.map(_._3).sliding(2).forall(s => s.head <= s.last), "monotone recall")
    // k=2 within each cluster: nprobe 1 already finds both -> flat curve at 1.0
    assert(two.head._3 == 1.0, s"clean clusters: top-2 lives in the probed list: $two")

    intercept[IllegalArgumentException](Ann.nprobeSweep(df, "vec_id", "embedding",
      cents, Seq((0, Array(1.0f, 0.0f))), 0, Seq(1)))
    intercept[IllegalArgumentException](Ann.nprobeSweep(df, "vec_id", "embedding",
      cents, Seq((0, Array(1.0f, 0.0f))), 2, Seq(0)))
    intercept[IllegalArgumentException](Ann.nprobeSweep(df, "vec_id", "embedding",
      cents, Seq((0, Array(1.0f, 0.0f))), 2, Seq(3)))
    intercept[IllegalArgumentException](Ann.nprobeSweep(df, "vec_id", "embedding",
      cents, Seq((7, Array(1.0f, 0.0f)), (7, Array(0.0f, 1.0f))), 2, Seq(1)))
  }

  test("prototypeScores: centroid-aligned members score high, outliers low") {
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(-1.0f, 0.0f)), (5L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val assign = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 1))
      .toDF("id", "cluster")
    val out = Ann.prototypeScores(embs, "vec_id", "embedding", assign)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // cluster 0 centroid (2/3, 1/3): the two aligned members tie above
    // the orthogonal outlier; cluster 1 is degenerate — cos exactly 1
    assert(out(1L)._2 === out(2L)._2)
    assert(out(1L)._2 > out(3L)._2 + 0.3)
    assert(out(4L)._2 === 1.0 && out(5L)._2 === 1.0)
    // partitioning cannot move a score (decimal centroid accumulation)
    val out2 = Ann.prototypeScores(embs.repartition(5), "vec_id", "embedding",
      assign.repartition(3)).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.map { case (k, v) => k -> v._2 } === out2)
    intercept[IllegalArgumentException](
      Ann.prototypeScores(embs, "vec_id", "embedding",
        assign.withColumnRenamed("cluster", "cl")))
  }

  test("prototypePrune: hard keeps outliers, easy keeps prototypes, every cluster >= 1") {
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(-1.0f, 0.0f)), (5L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val assign = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 1))
      .toDF("id", "cluster")
    def kept(mode: String, frac: Double) =
      Ann.prototypePrune(embs, "vec_id", "embedding", assign, frac, mode)
        .filter(col("keep")).select("id").as[Long].collect().toSet
    // keepFrac 0.4: cluster0 keeps ceil(1.2)=2, cluster1 keeps ceil(0.8)=1
    // hard: the orthogonal outlier 3 ranks first in cluster 0
    assert(kept("hard", 0.4) === Set(3L, 1L, 4L))
    // easy: the aligned pair leads, outlier 3 dropped
    assert(kept("easy", 0.4) === Set(1L, 2L, 4L))
    // tiny fraction still retains one member per cluster (ceil floor)
    assert(kept("hard", 0.01).size === 2)
    intercept[IllegalArgumentException](
      Ann.prototypePrune(embs, "vec_id", "embedding", assign, 0.0, "hard"))
    intercept[IllegalArgumentException](
      Ann.prototypePrune(embs, "vec_id", "embedding", assign, 0.5, "middle"))
  }

  test("mmrRerank: diversity beats a redundant higher-relevance hit") {
    // query between two clusters: ids 1 and 2 near-dups along e1 (2 the
    // most relevant), id 3 along e2. Pure relevance: [2, 1, 3] — MMR at
    // λ=0.5 must pick the DIVERSE 3 second (1's sim-to-2 ≈ 1 kills it).
    val q = Array(1f, 1f)
    val embs = Seq(
      (1L, Array(1f, 0.2f)),
      (2L, Array(1f, 0.22f)),
      (3L, Array(0.2f, 1f))
    ).toDF("vec_id", "embedding")
    val rel = Ann.bruteForceTopK(embs, "vec_id", "embedding", q, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(rel === Seq(2L, 1L, 3L), "sanity: pure relevance ranks the near-dup second")
    val got = Ann.mmrRerank(embs, "vec_id", "embedding", q, m = 3, k = 3, lambda = 0.5)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got === Seq((1, 2L), (2, 3L), (3, 1L)))
    // λ=1 is pure relevance: MMR must reproduce the relevance order
    val pure = Ann.mmrRerank(embs, "vec_id", "embedding", q, m = 3, k = 3, lambda = 1.0)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    assert(pure === rel)
    // rank 1 has no penalty (empty selected set): mmr = λ·rel exactly
    val r1 = Ann.mmrRerank(embs, "vec_id", "embedding", q, 3, 1, 0.5).collect().head
    assert(r1.getLong(1) == 2L)
    assert(math.abs(r1.getDouble(3) - 0.5 * r1.getDouble(2)) < 1e-6)
    intercept[IllegalArgumentException](
      Ann.mmrRerank(embs, "vec_id", "embedding", q, 0, 1, 0.5))
    intercept[IllegalArgumentException](
      Ann.mmrRerank(embs, "vec_id", "embedding", q, 3, 4, 0.5))
    intercept[IllegalArgumentException](
      Ann.mmrRerank(embs, "vec_id", "embedding", q, 3, 1, 1.5))
    // λ = 0 would break the pure-relevance first-pick contract
    intercept[IllegalArgumentException](
      Ann.mmrRerank(embs, "vec_id", "embedding", q, 3, 1, 0.0))
  }

  private def chunkDf(rows: Seq[(Long, Long, Seq[Float])]) =
    rows.toDF("doc_id", "chunk_id", "embedding")
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))

  test("maxSimTopK: hand-computed raw-dot MaxSim; per-token max, cross-token sum") {
    // doc 1: axis-aligned unit chunks; doc 2: a strong x chunk + weak y
    val chunks = chunkDf(Seq(
      (1L, 10L, Seq(1f, 0f)), (1L, 11L, Seq(0f, 1f)),
      (2L, 20L, Seq(2f, 0f)), (2L, 21L, Seq(0f, 0.5f))))
    val toks = Seq(Array(1f, 0f), Array(0f, 1f))
    val out = Ann.maxSimTopK(chunks, col("doc_id"), "embedding", toks,
      k = 2, normalized = false).collect()
    // doc1 = max(1,0) + max(0,1) = 2.0; doc2 = max(2,0) + max(0,0.5) = 2.5
    assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((2L, 2.5), (1L, 2.0)))
  }

  test("maxSimTopK: cosine mode ties break by ascending doc id") {
    // normalized: both docs have a perfect chunk per token (magnitude
    // cancels), so both score 2.0 — doc 1 must rank first
    val chunks = chunkDf(Seq(
      (2L, 20L, Seq(2f, 0f)), (2L, 21L, Seq(0f, 0.5f)),
      (1L, 10L, Seq(1f, 0f)), (1L, 11L, Seq(0f, 1f))))
    val toks = Seq(Array(1f, 0f), Array(0f, 1f))
    val out = Ann.maxSimTopK(chunks, col("doc_id"), "embedding", toks, k = 2)
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L), "tie rule: id asc")
    assert(out.forall(_.getDouble(1) === 2.0))
  }

  test("maxSimTopK: one token over singleton docs matches bruteForceTopK") {
    val got = Ann.maxSimTopK(embs, col("vec_id"), "embedding",
        Seq(query), k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expected = Ann.bruteForceTopK(embs, "vec_id", "embedding", query, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }

  test("maxSimTopK plan: one exchange, no vector crosses it, heap top-k") {
    val out = Ann.maxSimTopK(embs, col("vec_id") % 5, "embedding",
      Seq(query, vecs(7)._2.toArray), k = 3)
    out.collect() // materialize so AQE settles on the final plan
    // AQE hides exchanges inside QueryStage wrappers (node collect sees
    // nothing), so audit the final-plan text, the PlanAuditSuite way
    val plan = out.queryExecution.executedPlan.toString
    val finalSection = plan.split("== Initial Plan ==").head
    val exchanges = finalSection.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
      .toList
    assert(exchanges.size === 1, s"exactly the doc-key aggregation exchange:\n$plan")
    val partialLines = finalSection.linesIterator
      .filter(_.contains("partial_max")).toList
    assert(partialLines.nonEmpty, "map-side partial MAX before the shuffle")
    assert(partialLines.forall { l =>
        val outCols = l.substring(l.lastIndexOf("output=["))
        !outCols.contains("embedding")
      }, "only partial maxima shuffle — chunk vectors stay map-side")
    assert(finalSection.contains("TakeOrderedAndProject"),
      "top-k is a per-partition heap merge, not a global sort")
  }

  test("maxSimTopK guards: empty/oversized token sets and k <= 0 reject") {
    intercept[IllegalArgumentException](
      Ann.maxSimTopK(embs, col("vec_id"), "embedding", Seq.empty, 3))
    intercept[IllegalArgumentException](
      Ann.maxSimTopK(embs, col("vec_id"), "embedding",
        Seq.fill(Ann.MaxSimMaxQueryTokens + 1)(query), 3))
    intercept[IllegalArgumentException](
      Ann.maxSimTopK(embs, col("vec_id"), "embedding", Seq(query), 0))
  }
}
