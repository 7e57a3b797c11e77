package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The driver owns /root/testdata and regenerates it between rounds; it
  * has already changed events.parquet's physical timestamp type once
  * (pinned by EventsFixtureSuite). This suite extends the same pattern to
  * the other regenerated tables: every plausible integer-width drift in
  * embeddings/documents must load to the engine's canonical long-keyed
  * shape, and any type the engine cannot honestly absorb (notably a
  * float64 embedding column, which a silent cast would hash-diverge from
  * the DuckDB oracle) must fail fast with the loaded type named. */
class FixtureShapeSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dir(name: String): String =
    Files.createTempDirectory(s"fixture_shape_$name").toString

  test("embeddings: int32 vec_id normalizes to long; float32 vectors pass through") {
    val d = dir("emb_i32")
    Seq((1, Seq(1f, 2f), 0), (2, Seq(3f, 4f), 1))
      .toDF("vec_id", "embedding", "label")
      .withColumn("vec_id", col("vec_id").cast(IntegerType))
      .write.mode(SaveMode.Overwrite).parquet(s"$d/embeddings.parquet")
    val loaded = SparkEntry.t(spark, d, "embeddings")
    assert(loaded.schema("vec_id").dataType === LongType,
      "vec_id must normalize to LONG whatever integer width ships")
    assert(loaded.schema("embedding").dataType === ArrayType(FloatType, containsNull = true))
    assert(loaded.select("vec_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("embeddings: a float64 embedding column fails fast, never silently casts") {
    val d = dir("emb_f64")
    Seq((1L, Seq(1.0, 2.0), 0)).toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/embeddings.parquet")
    val err = intercept[RuntimeException](SparkEntry.t(spark, d, "embeddings"))
    assert(err.getMessage.contains("unsupported type"))
    assert(err.getMessage.contains("DoubleType"))
    assert(err.getMessage.contains("oracle"),
      "the message must say WHY a cast is not the fix")
  }

  test("documents: int32 doc_id/n_chars normalize to long; strings pinned") {
    val d = dir("docs_i32")
    Seq((7, "hello world", "en", "src0", 11))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .select(col("doc_id").cast(IntegerType).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars").cast(IntegerType).as("n_chars"))
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    val loaded = SparkEntry.t(spark, d, "documents")
    assert(loaded.schema("doc_id").dataType === LongType)
    assert(loaded.schema("n_chars").dataType === LongType)
    assert(loaded.head().getLong(0) == 7L)
  }

  test("documents: a non-string text column fails fast with the loaded type named") {
    val d = dir("docs_bin")
    Seq((7L, Array[Byte](1, 2), "en", "src0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$d/documents.parquet")
    val err = intercept[RuntimeException](SparkEntry.t(spark, d, "documents"))
    assert(err.getMessage.contains("unsupported type"))
    assert(err.getMessage.contains("text"))
  }

  test("the shipped sf0.001 fixtures load through the dispatch unchanged") {
    val sf = "/root/testdata/sf0.001"
    val emb = SparkEntry.t(spark, sf, "embeddings")
    assert(emb.schema("vec_id").dataType === LongType)
    assert(emb.schema("embedding").dataType.isInstanceOf[ArrayType])
    val docs = SparkEntry.t(spark, sf, "documents")
    assert(docs.schema("doc_id").dataType === LongType)
    assert(docs.schema("n_chars").dataType === LongType)
    assert(docs.count() > 0 && emb.count() > 0)
  }
}
