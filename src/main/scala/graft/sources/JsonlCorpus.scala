package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document-corpus source — the interchange format crawl dumps and
  * training corpora actually arrive in (one JSON object per line).
  *
  * Read discipline for 100 TB of crawler output, where malformed lines
  * are a certainty, not an edge case:
  *  - EXPLICIT schema (never `inferSchema` — inference is a full extra
  *    pass over the data and pins the schema to whatever the first files
  *    happened to contain);
  *  - PERMISSIVE mode with a corrupt-record column, so one bad line
  *    quarantines instead of failing a 1000-executor job
  *    (FAILFAST) or silently vanishing (DROPMALFORMED);
  *  - the caller splits valid from quarantined with [[splitCorrupt]] and
  *    routes the rejects to a dead-letter sink for inspection.
  */
object JsonlCorpus {

  val CorruptCol = "_corrupt_json"

  /** Default document schema (mirrors the engine's documents table). */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** Read a JSONL corpus with quarantine. The returned frame carries
    * [[CorruptCol]]: null for parsed rows, the raw line for rejects.
    *
    * Implemented as a TEXT scan + `from_json` expression rather than the
    * JSON datasource: the datasource refuses plans that reference only
    * the corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    * COLUMN), which is exactly what a dead-letter sink does — and the
    * text+expression form parses each line once inside whole-stage
    * codegen with no second pass. */
  def read(spark: SparkSession, path: String,
      schema: StructType = DocumentSchema): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val full = schema.add(StructField(CorruptCol, StringType))
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0) // blank lines are not documents
      .select(from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)).as("__j"))
      .select(col("__j.*"))
  }

  /** (valid, quarantined) split of a [[read]] frame. Valid rows drop the
    * corrupt column; quarantined rows keep only the raw line (for a
    * dead-letter sink). */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col(CorruptCol).isNull).drop(CorruptCol),
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line")))
}
