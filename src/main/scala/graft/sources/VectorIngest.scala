package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** V7 ingest/egress parity: the reference stores vectors as JSON array
  * strings and decodes at every use (`src/VectorTable.php:91-93,161,166,
  * 356,524-526`). The engine keeps vectors native `ArrayType(FloatType)`
  * everywhere and touches JSON only at the boundary — these helpers ARE
  * that boundary. */
object VectorIngest {

  val rawSchema: StructType = StructType(Seq(
    StructField("post_id", LongType, nullable = false),
    StructField("sequence_no", IntegerType, nullable = false),
    StructField("vector", StringType, nullable = true), // JSON array of floats
    StructField("vector_type", StringType, nullable = true)))

  /** Parse a JSON-array-of-floats string column into a native float array
    * (ingest direction). Malformed JSON -> null vector (try-parse
    * semantics), surfaced for quarantine rather than failing the load. */
  def parseJsonVector(df: DataFrame, jsonCol: String = "vector",
      out: String = "vector"): DataFrame =
    df.withColumn(out, from_json(col(jsonCol).cast(StringType),
      ArrayType(FloatType, containsNull = false)))

  /** Read newline-delimited JSON embed requests
    * `{"post_id":1,"sequence_no":0,"vector":"[0.1,...]","vector_type":"m"}`
    * with vector as a JSON-encoded string (reference wire format). */
  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    parseJsonVector(spark.read.schema(rawSchema).json(path))

  /** Egress direction: native array back to the reference's JSON string. */
  def toJsonVector(df: DataFrame, vecCol: String = "vector",
      out: String = "vector_json"): DataFrame =
    df.withColumn(out, to_json(col(vecCol)))
}
