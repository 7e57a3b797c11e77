package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IngestCatalogSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("V7: JSON-lines ingest parses the reference wire format; egress round-trips") {
    val dir = Files.createTempDirectory("graft_ingest").toString
    val lines = Seq(
      """{"post_id":1,"sequence_no":0,"vector":"[0.5,-1.25,3.0]","vector_type":"m1"}""",
      """{"post_id":2,"sequence_no":0,"vector":"not json","vector_type":"m1"}""")
    Files.write(java.nio.file.Paths.get(s"$dir/req.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

    val parsed = VectorIngest.readJsonLines(spark, s"$dir/req.jsonl")
    val byId = parsed.collect().map(r => r.getAs[Long]("post_id") -> r).toMap
    assert(byId(1L).getSeq[Float](byId(1L).fieldIndex("vector")) == Seq(0.5f, -1.25f, 3f))
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("vector")),
      "malformed JSON -> null vector, load does not fail")

    val roundtrip = VectorIngest.toJsonVector(parsed.filter($"post_id" === 1L))
      .select("vector_json").head().getString(0)
    assert(roundtrip == "[0.5,-1.25,3.0]")
  }

  test("S11: catalog create / exists / drop over a store path") {
    val dir = Files.createTempDirectory("graft_cat").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$dir/t")
    val cat = new StoreCatalog(spark)
    val name = "graft_cat_test_table"
    try {
      assert(!cat.tableExists(name))
      cat.createTable(name, s"$dir/t")
      assert(cat.tableExists(name))
      assert(spark.table(name).count() == 2, "registered table is queryable via the catalog")
      assert(spark.sql(s"SELECT MAX(id) FROM $name").head().getLong(0) == 2L)
      intercept[IllegalArgumentException](cat.createTable("bad name; drop", s"$dir/t"))
    } finally cat.dropTable(name)
    assert(!cat.tableExists(name))
  }
}
