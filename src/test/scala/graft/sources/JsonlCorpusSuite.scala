package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JsonlCorpusSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("valid lines parse against the explicit schema; broken lines quarantine, not fail") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    Files.writeString(Paths.get(s"$dir/part0.jsonl"),
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "crawl"}
        |{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "crawl"}
        |{not json at all
        |{"doc_id": "not-a-long", "text": "type clash", "lang": "en", "source": "crawl"}
        |""".stripMargin)

    val (valid, corrupt) = JsonlCorpus.splitCorrupt(JsonlCorpus.read(spark, dir))
    val docs = valid.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(docs === Map(1L -> "hello world", 2L -> "bonjour"))
    assert(!valid.columns.contains(JsonlCorpus.CorruptCol))

    val raw = corrupt.as[String].collect()
    assert(raw.length === 2, s"both the non-JSON line and the type clash quarantine: ${raw.toSeq}")
    assert(raw.exists(_.contains("not json")))
    assert(raw.exists(_.contains("not-a-long")))
  }

  test("non-object JSON values quarantine instead of becoming all-null valid rows") {
    val dir = Files.createTempDirectory("graft_jsonl_null").toString
    Files.writeString(Paths.get(s"$dir/part0.jsonl"),
      """null
        |42
        |{"doc_id": 7, "text": "real", "lang": "en", "source": "crawl"}
        |""".stripMargin)
    val (valid, corrupt) = JsonlCorpus.splitCorrupt(JsonlCorpus.read(spark, dir))
    assert(valid.select("doc_id").as[Long].collect().toSeq === Seq(7L))
    assert(corrupt.as[String].collect().toSet === Set("null", "42"))
  }

  test("read rejects a schema that collides with the corrupt column, any case") {
    import org.apache.spark.sql.types._
    intercept[IllegalArgumentException] {
      JsonlCorpus.read(spark, "/tmp/nope", StructType(Seq(
        StructField(JsonlCorpus.CorruptCol, StringType))))
    }
    intercept[IllegalArgumentException] {
      JsonlCorpus.read(spark, "/tmp/nope", StructType(Seq(
        StructField("_Corrupt_Json", StringType))))
    }
  }
}
