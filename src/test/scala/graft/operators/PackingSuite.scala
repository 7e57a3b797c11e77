package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PackingSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packAssignments: dense prefix sum in order, pack boundaries correct") {
    // token counts 60,50,30,80,10 with capacity 100:
    // before: 0,60,110,140,220 -> packs 0,0,1,1,2; doc 2 spans 0->1 (60..109)
    val docs = Seq((1L, 60L), (2L, 50L), (3L, 30L), (4L, 80L), (5L, 10L))
      .toDF("doc_id", "n_tokens").repartition(3)
    val out = Packing.packAssignments(docs, "doc_id", "n_tokens", 100L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L), (2L, 60L, 0L, 1L), (3L, 110L, 1L, 1L),
      (4L, 140L, 1L, 2L), (5L, 220L, 2L, 2L)))
  }

  test("packAssignments handles zero-token docs and is partitioning-invariant") {
    val a = Packing.packAssignments(
      Seq((1L, 0L), (2L, 5L), (3L, 0L)).toDF("doc_id", "n_tokens").repartition(1),
      "doc_id", "n_tokens", 4L).orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Packing.packAssignments(
      Seq((1L, 0L), (2L, 5L), (3L, 0L)).toDF("doc_id", "n_tokens").repartition(5),
      "doc_id", "n_tokens", 4L).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b, "result independent of input partitioning")
    // doc 2 occupies tokens 0..4 -> starts pack 0, ends pack 1
    assert(a(1) == Seq(2L, 5L, 0L, 0L, 1L))
    // zero-token doc 3 sits at boundary 5 -> pack 1, pack_last 1
    assert(a(2) == Seq(3L, 0L, 5L, 1L, 1L))
  }

  test("rejects non-positive capacity") {
    intercept[IllegalArgumentException](
      Packing.packAssignments(Seq((1L, 1L)).toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", 0L))
  }

  test("property: prefix-sum invariant holds on random sizes and partitionings") {
    val rnd = new scala.util.Random(13)
    val counts = (1L to 500L).map(i => i -> rnd.nextInt(300).toLong)
    val df = counts.toDF("doc_id", "n_tokens").repartition(rnd.nextInt(7) + 2)
    val out = Packing.packAssignments(df, "doc_id", "n_tokens", 1000L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    var running = 0L
    out.foreach { case (id, n, before, pack, packLast) =>
      assert(before == running, s"doc $id: tokens_before $before != $running")
      assert(pack == before / 1000L)
      assert(packLast == (if (n > 0) (before + n - 1) / 1000L else before / 1000L))
      running += n
    }
    assert(running == counts.map(_._2).sum)
  }

  test("packSlices: hand-computed cut list; spanning docs cut at pack boundaries") {
    // capacity 10; counts 4,8,0,25 -> before 0,4,12,12
    // d1: pack0 [0,4) | d2: pack0 [0,6) pack1 [6,8) | d3: none
    // d4 (before 12): pack1 [0,8) pack2 [8,18) pack3 [18,25)
    val asg = Packing.packAssignments(
      Seq((1L, 4L), (2L, 8L), (3L, 0L), (4L, 25L)).toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens", 10L)
    val got = Packing.packSlices(asg, "doc_id", "n_tokens", 10L)
      .orderBy("doc_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 4L),
      (2L, 0L, 0L, 6L), (2L, 1L, 6L, 8L),
      (4L, 1L, 0L, 8L), (4L, 2L, 8L, 18L), (4L, 3L, 18L, 25L)), s"got ${got.toSeq}")
  }

  test("packSlices property: slices tile every doc; packs fill to capacity") {
    val rnd = new scala.util.Random(77)
    val counts = (1L to 60L).map(id => (id, rnd.nextInt(250).toLong))
    val cap = 100L
    val asg = Packing.packAssignments(
      counts.toDF("doc_id", "n_tokens").repartition(7), "doc_id", "n_tokens", cap)
    val slices = Packing.packSlices(asg, "doc_id", "n_tokens", cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per doc: ranges are contiguous from 0 to n_tokens
    val byDoc = slices.groupBy(_._1)
    counts.foreach { case (id, n) =>
      val rs = byDoc.getOrElse(id, Array.empty).sortBy(_._2)
      if (n == 0) assert(rs.isEmpty, s"doc $id: zero tokens must emit no slices")
      else {
        assert(rs.head._3 == 0L && rs.last._4 == n, s"doc $id: ends wrong")
        rs.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4 == b._3, s"doc $id: gap between slices")
            assert(a._2 + 1 == b._2, s"doc $id: non-adjacent packs")
          case _ => ()
        }
      }
    }
    // per pack: total sliced tokens == capacity for all but the last pack
    val byPack = slices.groupBy(_._2).view
      .mapValues(_.map(s => s._4 - s._3).sum).toMap
    val lastPack = byPack.keys.max
    byPack.foreach { case (p, tot) =>
      if (p < lastPack) assert(tot == cap, s"pack $p holds $tot != $cap")
      else assert(tot <= cap, s"final pack overfull: $tot")
    }
  }

  test("truncateTokens: head/tail/edges on a hand fixture; under-budget passes through") {
    // "a b c d e f" (6 tokens), budget 4: head=a b c d, tail=c d e f,
    // edges=ceil(4/2)=2 head + 2 tail = a b e f
    val docs = Seq((1L, "A b  C d e F"), (2L, "x y")).toDF("doc_id", "text")
    def run(policy: String) =
      Packing.truncateTokens(docs, "doc_id", col("text"), 4, policy)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))
        .toSeq
    assert(run("head") == Seq((1L, 6L, 4L, true, "a b c d"), (2L, 2L, 2L, false, "x y")))
    assert(run("tail") == Seq((1L, 6L, 4L, true, "c d e f"), (2L, 2L, 2L, false, "x y")))
    assert(run("edges") == Seq((1L, 6L, 4L, true, "a b e f"), (2L, 2L, 2L, false, "x y")))
  }

  test("truncateTokens: exact-budget boundary and odd-budget ceil/floor split") {
    // n == max: untouched, truncated=false; n == max+1 with max=3 edges:
    // head ceil(3/2)=2 + tail 1
    val docs = Seq((1L, "a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = Packing.truncateTokens(docs, "doc_id", col("text"), 3, "edges")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3), r.getString(4))).toSeq
    assert(got == Seq((1L, false, "a b c"), (2L, true, "a b d")))
  }

  test("truncateTokens: empty doc survives every policy; bad args rejected") {
    val docs = Seq((1L, "")).toDF("doc_id", "text")
    Seq("head", "tail", "edges").foreach { p =>
      val r = Packing.truncateTokens(docs, "doc_id", col("text"), 5, p).head()
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && !r.getBoolean(3)
        && r.getString(4) == "", s"policy $p on empty doc: $r")
    }
    intercept[IllegalArgumentException](
      Packing.truncateTokens(docs, "doc_id", col("text"), 0, "head"))
    intercept[IllegalArgumentException](
      Packing.truncateTokens(docs, "doc_id", col("text"), 5, "middle"))
  }

  test("fimSpans: cuts are ordered, in range, deterministic, and tile the doc") {
    val docs = (1L to 50L).map(i => (i, (1 to (i % 7 + 1).toInt).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    def run() = Packing.fimSpans(docs, "doc_id", col("text"), fimRate = 0.5, seed = "k")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSeq
    val a = run()
    assert(a == run(), "same seed must give identical spans")
    a.foreach { case (id, n, _, pEnd, sStart, mid) =>
      assert(0L <= pEnd && pEnd <= sStart && sStart <= n, s"doc $id: cuts out of range")
      val midN = if (mid.isEmpty) 0 else mid.split(" ").length
      assert(midN == sStart - pEnd, s"doc $id: middle '$mid' != [$pEnd,$sStart)")
    }
    // rate 0.5 must actually split the population (md5 gate, not all/none)
    val nFim = a.count(_._3)
    assert(nFim > 0 && nFim < a.size, s"fim gate degenerate: $nFim of ${a.size}")
    // different seed must move at least one cut
    val b = Packing.fimSpans(docs, "doc_id", col("text"), 0.5, "other")
      .orderBy("doc_id").collect().map(r => (r.getLong(3), r.getLong(4))).toSeq
    assert(b != a.map(t => (t._4, t._5)), "seed must perturb the cuts")
  }

  test("fimSpans: rate 0 and 1 are total; empty doc gets the trivial span") {
    val docs = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val all = Packing.fimSpans(docs, "doc_id", col("text"), 1.0, "s").collect()
    assert(all.forall(_.getBoolean(2)), "rate 1.0 must select every doc")
    val none = Packing.fimSpans(docs, "doc_id", col("text"), 0.0, "s").collect()
    assert(none.forall(!_.getBoolean(2)), "rate 0.0 must select none")
    val empty = Packing.fimSpans(docs, "doc_id", col("text"), 1.0, "s")
      .filter(col("doc_id") === 2L).head()
    assert(empty.getLong(1) == 0L && empty.getLong(3) == 0L
      && empty.getLong(4) == 0L && empty.getString(5) == "")
    intercept[IllegalArgumentException](
      Packing.fimSpans(docs, "doc_id", col("text"), 1.5, "s"))
  }

  test("null token counts fail with a clear message, not an opaque NPE") {
    val docs = Seq((1L, Some(5L)), (2L, Option.empty[Long])).toDF("doc_id", "n_tokens")
    val e = intercept[org.apache.spark.SparkException] {
      Packing.packAssignments(docs, "doc_id", "n_tokens", 10L).collect()
    }
    assert(e.getMessage.contains("n_tokens") ||
      Option(e.getCause).exists(_.getMessage.contains("n_tokens")),
      s"error must name the column: ${e.getMessage}")
  }

  test("lengthBucketBatches: caps are the smallest power of two that fits") {
    val docs = Seq(1, 2, 3, 4, 5, 8, 9, 16, 17).zipWithIndex.map { case (k, i) =>
      ((i + 1).toLong, (0 until k).map(j => s"t$j").mkString(" ")) }
      .toDF("doc_id", "text")
    val caps = Packing.lengthBucketBatches(docs, "doc_id", col("text"), 8, 1, "s")
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(caps == Seq((1L, 1L), (2L, 2L), (3L, 4L), (4L, 4L), (5L, 8L),
      (8L, 8L), (9L, 16L), (16L, 16L), (17L, 32L)),
      "cap = next power of two, exact at the power itself")
  }

  test("lengthBucketBatches: batches bounded, ids dense, pad accounting exact") {
    val docs = (1L to 100L).map(i =>
      (i, (0 until (4 + (i % 5)).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text").repartition(7)
    def run(shards: Int) = Packing.lengthBucketBatches(
        docs, "doc_id", col("text"), 8, shards, "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    val a = run(4)
    assert(a == run(4), "same seed must batch identically (and survive repartition)")
    a.groupBy(t => (t._3, t._4, t._5)).foreach { case ((cap, sh, b), rows) =>
      assert(rows.size <= 8, s"batch ($cap,$sh,$b) exceeds batchSize")
      val mx = rows.map(_._2).max
      assert(rows.forall(_._6 == mx), s"batch ($cap,$sh,$b) batch_max wrong")
      rows.foreach { r =>
        assert(math.abs(r._7 - (1.0 - r._2.toDouble / mx)) < 1e-6,
          s"doc ${r._1}: pad_frac off") }
      assert(rows.exists(_._7 == 0.0), s"batch ($cap,$sh,$b) longest doc pads 0")
    }
    a.groupBy(t => (t._3, t._4)).foreach { case ((cap, sh), rows) =>
      val ids = rows.map(_._5).toSet
      assert(ids == (0L until ids.size).toSet,
        s"($cap,$sh): batch ids must be dense from 0")
      // every batch but the last is FULL - the padding-efficiency contract
      assert(rows.size - (ids.size - 1) * 8 >= 1,
        s"($cap,$sh): only the last batch may be short")
      assert(rows.groupBy(_._5).filter(_._2.size < 8).keySet
        .forall(_ == ids.size - 1L), s"($cap,$sh): short batch must be the last")
    }
    assert(a.map(_._4).toSet.size > 1, "4 shards must actually split the load")
    // shard count only regroups rows; caps and token counts are unchanged
    assert(run(1).map(t => (t._1, t._2, t._3)).sortBy(_._1)
      == a.map(t => (t._1, t._2, t._3)).sortBy(_._1))
    intercept[IllegalArgumentException](
      Packing.lengthBucketBatches(docs, "doc_id", col("text"), 0, 1, "s"))
    intercept[IllegalArgumentException](
      Packing.lengthBucketBatches(docs, "doc_id", col("text"), 8, 0, "s"))
  }

  test("writeShards: shard=N layout + manifest on disk, idempotent overwrite") {
    val docs = (1L to 20L).map(i => (i, Seq.fill(3)(s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val asg = Packing.packAssignments(
      docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", 8L)
    val slices = Packing.packSlices(asg, "doc_id", "n_tokens", 8L)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_test").toString
    val manifest = Packing.writeShards(slices, dir, packsPerShard = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // 20 docs x 3 tokens / cap 8 = 60 tokens -> 8 packs -> 4 shards of <= 2
    assert(manifest.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(manifest.map(_._2).forall(_ <= 2), "packs per shard capped")
    assert(manifest.map(_._5).sum == 60L, "token accounting adds up")
    // the on-disk layout is shard-partitioned and readable per shard
    val onDisk = spark.read.parquet(s"$dir/shards")
    assert(onDisk.select("shard").distinct().count() == 4)
    assert(onDisk.count() == slices.count())
    val diskManifest = spark.read.parquet(s"$dir/manifest").orderBy("shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(diskManifest == manifest, "manifest on disk equals the returned one")
    // re-export is a pure overwrite: identical result, no duplication
    val again = Packing.writeShards(slices, dir, packsPerShard = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(again == manifest)
    assert(spark.read.parquet(s"$dir/shards").count() == slices.count())
    intercept[IllegalArgumentException](Packing.writeShards(slices, dir, 0L))
  }

  test("readShards: pieces reassemble every doc; shard filter prunes; " +
      "tampered manifest fails validation") {
    val docs = (1L to 20L).map(i =>
      (i, (1 to 3).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val asg = Packing.packAssignments(
      docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", 8L)
    val slices = Packing.packSlices(asg, "doc_id", "n_tokens", 8L)
    val dir = java.nio.file.Files.createTempDirectory("graft_shard_rd").toString
    Packing.writeShards(slices, dir, packsPerShard = 2L)

    // full read: per-doc pieces concatenated in slice order == the doc text
    val all = Packing.readShards(spark, dir, docs, "doc_id", col("text"), 2L)
    val rebuilt = all.orderBy("doc_id", "tok_start")
      .groupBy("doc_id").agg(concat_ws(" ", collect_list(col("piece"))).as("txt"))
    val mismatch = rebuilt.join(docs, Seq("doc_id"))
      .filter(lower(col("txt")) =!= lower(col("text"))).count()
    assert(mismatch == 0, "concatenated pieces must reassemble every document")
    // every pack except the last fills to capacity exactly
    val packTotals = all.groupBy("pack_id").agg(sum("n_tokens").as("n"))
      .orderBy("pack_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(packTotals.dropRight(1).forall(_._2 == 8L))

    // shard filter returns only the requested packs and still validates
    val some = Packing.readShards(spark, dir, docs, "doc_id", col("text"), 2L,
      shards = Seq(1L))
    assert(some.select("shard").distinct().collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(some.select("pack_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))

    // a tampered manifest (wrong fingerprint) must fail fast, before text
    val m = spark.read.parquet(s"$dir/manifest")
      .withColumn("content_fp", col("content_fp") + 1L)
    val tmp = java.nio.file.Files.createTempDirectory("graft_shard_tm").toString
    m.write.parquet(s"$tmp/m")
    spark.read.parquet(s"$tmp/m").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/manifest")
    val e = intercept[RuntimeException](
      Packing.readShards(spark, dir, docs, "doc_id", col("text"), 2L))
    assert(e.getMessage.contains("manifest validation failed"))
  }

  test("capacityPlan: hand-checked grid; one pass grades every candidate") {
    // token counts 60,50,30,80,10 (total 230), zero-token doc excluded
    val docs = Seq((1L, 60L), (2L, 50L), (3L, 30L), (4L, 80L), (5L, 10L), (6L, 0L))
      .toDF("doc_id", "n_tokens").repartition(3)
    val out = Packing.capacityPlan(docs, "doc_id", "n_tokens", Seq(100L, 300L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    // cap 100: before 0,60,110,140,220 -> p0 0,0,1,1,2; p1 of (1..5):
    // 59->0, 109->1, 139->1, 219->2, 229->2 -> splits: docs 2 and 4
    // packs = 3, waste = 300-230 = 70
    // cap 300: one pack, no splits, waste 70
    assert(out == Seq(
      (100L, 3L, 2L, 0.4, 70L),
      (300L, 1L, 0L, 0.0, 70L)), s"got $out")
    // grid equals running packAssignments per capacity (the one-pass claim)
    val alone = Packing.packAssignments(docs.filter(col("n_tokens") > 0),
      "doc_id", "n_tokens", 100L)
      .select(col("pack_id"), col("pack_last")).collect()
    assert(alone.count(r => r.getLong(1) > r.getLong(0)) == 2L)
    assert(alone.map(_.getLong(1)).max + 1 == 3L)
    intercept[IllegalArgumentException](
      Packing.capacityPlan(docs, "doc_id", "n_tokens", Nil))
    intercept[IllegalArgumentException](
      Packing.capacityPlan(docs, "doc_id", "n_tokens", Seq(0L)))
    intercept[IllegalArgumentException](
      Packing.capacityPlan(docs, "doc_id", "n_tokens", Seq(100L, 100L)))
  }
}
