package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the q127 first-run spike (round-14 "What's
  * wrong" #1): per-stage stopwatch around the GIF mux/demux pipeline in
  * a FRESH JVM, after the exact Bench warmup, so whatever initializes
  * once per process shows up attributed to a stage instead of hiding
  * inside one bench row. Not part of the driver contract. */
object ProfileQ127 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // the exact Bench warmups
    time("warmup imageio single") {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      Seq("png", "gif", "bmp").foreach { fmt =>
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, bos)
        javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bos.toByteArray))
      }
    }
    time("warmup gif sequence") {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      (0 until 2).foreach { _ =>
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null) }
      w.endWriteSequence(); ios.close(); w.dispose()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      val r = javax.imageio.ImageIO.getImageReaders(iis).next()
      r.setInput(iis)
      val it = r.readAll(null)
      while (it.hasNext) it.next()
      r.dispose(); iis.close()
    }
    time("warmup q22 relational") {
      SparkEntry.queries("q22_count_star")(spark, sfDir).collect()
    }

    val docs = time("read documents") {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      d.count(); d
    }
    // Stage A: render + GIF mux alone (force with a cheap byte-length agg
    // so decode never runs)
    time("A mux fromTextAsGifs") {
      graft.operators.Multimodal.fromTextAsGifs(docs, "doc_id", "text")
        .agg(sum(length(col("payload")))).collect()
    }
    // Stage B: the full q127 (mux + demux); B − A ≈ demux cost
    time("B full q127 run 1") {
      SparkEntry.queries("q127_gif_frames")(spark, sfDir).collect()
    }
    time("C full q127 run 2") {
      SparkEntry.queries("q127_gif_frames")(spark, sfDir).collect()
    }
    spark.stop()
  }
}
